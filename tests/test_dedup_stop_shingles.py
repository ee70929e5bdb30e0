"""Pins for the stop-shingle cap on ``ngram_jaccard_pairs`` (r10 skew fix).

The registered ``dedup_ngram_jaccard`` passes ``max_doc_freq=64`` because
the r10 skew probe measured the uncapped kernel OOM-dying on a corpus where
one boilerplate shingle sits in 124,962 documents (a 125k-id collect_list
and a 7.8e9-pair explode inside single tasks).  These tests pin the cap's
SEMANTICS on a corpus small enough to compare against the uncapped truth:

- shingles above the cap contribute nothing to intersections, and the
  derived union (sz_a + sz_b - inter) therefore GROWS — the capped jaccard
  is a conservative underestimate, so a pair whose overlap is mostly
  boilerplate cannot sneak over the threshold;
- per-doc sizes still count every shingle;
- pairs with enough organic overlap survive the cap;
- a cap no shingle exceeds is a bit-exact no-op (the witnessed-SF case).
"""

from __future__ import annotations

from sqlserver_cdc_to_kafka_spark.pipeline.dedup import ngram_jaccard_pairs

# 12 words -> 10 distinct 3-gram shingles shared by every boilerplated doc
_BOILER = "all rights reserved subscribe to our newsletter for updates terms of service"

# 12 organic words for the true-dup pair: 24 total words -> 22 shingles of
# which 10 organic + 2 seam-bridge survive the cap -> capped jaccard
# 12/(22+22-12) = 0.375 >= 0.3 while boilerplate-only pairs stay far below
_DUP_TEXT = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"


def _corpus(spark):
    # 30 docs share the boilerplate suffix (df=30 per boilerplate shingle);
    # docs 0 and 1 are true near-dups (identical organic text); every other
    # doc's organic text is unique (distinct word streams)
    rows = []
    for i in range(30):
        organic = (
            _DUP_TEXT if i in (0, 1) else " ".join(f"w{i}x{j}" for j in range(12))
        )
        rows.append((i, organic + " " + _BOILER))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cap_drops_boilerplate_only_pairs_keeps_true_dups(spark):
    docs = _corpus(spark)
    capped = ngram_jaccard_pairs(docs, "doc_id", threshold=0.3, max_doc_freq=20)
    got = {(r.doc_a, r.doc_b): r for r in capped.collect()}
    # the true-dup pair survives on organic overlap alone...
    assert (0, 1) in got
    # ...and no pair qualifies via boilerplate overlap
    assert set(got) == {(0, 1)}
    # uncapped, every boilerplated pair shares >= 10 shingles and the truly
    # identical pair scores 1.0 — the cap is what separates boilerplate
    # from duplication
    uncapped = {
        (r.doc_a, r.doc_b): r
        for r in ngram_jaccard_pairs(docs, "doc_id", threshold=0.3).collect()
    }
    assert uncapped[(0, 1)].jaccard == 1.0


def test_capped_jaccard_is_a_conservative_underestimate(spark):
    docs = _corpus(spark)
    row = (
        ngram_jaccard_pairs(docs, "doc_id", threshold=0.3, max_doc_freq=20)
        .filter("doc_a = 0 AND doc_b = 1")
        .collect()[0]
    )
    # 22 distinct shingles per doc; the 10 boilerplate-only ones (df=30 >
    # cap) are excluded from inter, so inter = 10 organic + 2 seam-bridge
    assert row.inter == 12
    # union is DERIVED from the capped inter (sz_a + sz_b - inter): the cap
    # inflates it from the true 22 to 32 — jaccard shrinks on both counts
    assert row.union_size == 32
    assert abs(row.jaccard - 12 / 32) < 1e-9


def test_cap_is_noop_when_no_shingle_exceeds_it(spark):
    docs = _corpus(spark)
    capped = ngram_jaccard_pairs(docs, "doc_id", threshold=0.3, max_doc_freq=1000)
    uncapped = ngram_jaccard_pairs(docs, "doc_id", threshold=0.3)
    assert sorted(map(tuple, capped.collect())) == sorted(
        map(tuple, uncapped.collect())
    )
