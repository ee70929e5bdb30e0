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


def test_containment_cap_same_discipline(spark):
    """dedup_containment_pairs carries the same stop-shingle contract: a doc
    fully contained in another qualifies on organic 5-grams alone; pairs
    sharing only boilerplate do not appear."""
    rows = [(0, _DUP_TEXT + " " + _BOILER)]  # 12 organic words + boiler
    rows += [(1, _DUP_TEXT + " unique tail words here also " + _BOILER)]
    rows += [
        (i, " ".join(f"w{i}x{j}" for j in range(12)) + " " + _BOILER)
        for i in range(2, 30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # drive the candidate kernel on the fixture corpus (the same shapes the
    # registered query builds inline, with a cap the boilerplate exceeds)
    from pyspark.sql import functions as F
    from sqlserver_cdc_to_kafka_spark.pipeline.text import word_shingles

    sh = docs.select("doc_id", word_shingles("text", 5).alias("shingles"))
    idx = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    grouped = (
        idx.groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("docs"))
        .filter((F.size("docs") > 1) & (F.size("docs") <= 20))
    )
    pairs = grouped.select(
        F.explode(
            F.expr(
                "flatten(transform(docs, (x, i) -> "
                "transform(filter(docs, y -> y != x), "
                "y -> struct(x AS doc_a, y AS doc_b))))"
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b").distinct()
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    # doc 0's organic text is a prefix of doc 1's -> organic 5-grams shared;
    # candidates contain (0,1)/(1,0) and NO boilerplate-only pair
    assert (0, 1) in got and (1, 0) in got
    assert got == {(0, 1), (1, 0)}


def test_simhash_width_guard_and_wide_fingerprints(spark):
    """The pair fingerprint must reject widths a signed bigint cannot hold
    and produce 60-bit fingerprints whose identical-text docs collide while
    distinct-text docs (on this fixture) do not — the blocking property the
    16-bit width lost at 500k docs."""
    import pytest as _pytest

    from sqlserver_cdc_to_kafka_spark.pipeline.dedup import (
        simhash_fingerprints,
        simhash_hamming_pairs,
    )

    docs = spark.createDataFrame(
        [(0, _DUP_TEXT), (1, _DUP_TEXT)]
        + [(i, " ".join(f"w{i}x{j}" for j in range(12))) for i in range(2, 10)],
        "doc_id long, text string",
    )
    with _pytest.raises(ValueError):
        simhash_fingerprints(docs, "doc_id", bits=64)  # > 60
    with _pytest.raises(ValueError):
        simhash_fingerprints(docs, "doc_id", bits=58)  # not a multiple of 4
    fps = {
        r.doc_id: r.simhash
        for r in simhash_fingerprints(docs, "doc_id", bits=60).collect()
    }
    assert fps[0] == fps[1]  # identical text -> identical fingerprint
    assert fps[0] < (1 << 60) and fps[0] >= 0
    assert len(set(fps.values())) == 9  # the 8 distinct texts don't collide
    pairs = {
        (r.doc_a, r.doc_b)
        for r in simhash_hamming_pairs(docs, "doc_id", bits=60, n_bands=4).collect()
    }
    assert (0, 1) in pairs  # hamming 0 -> always a candidate (pigeonhole)


def test_decontamination_cap_same_discipline(spark):
    """cross_split_contamination carries the r11 stop-shingle cap: shingles
    in more than max_doc_freq TRAIN docs are boilerplate and contribute
    neither overlap counts nor train-doc counts; organic contamination
    survives; a cap nothing exceeds is a bit-exact no-op."""
    from sqlserver_cdc_to_kafka_spark.pipeline.dedup import (
        cross_split_contamination,
    )

    rows = []
    # train docs 0..27: doc 0's organic text is the contamination source,
    # the rest unique; all carry the boilerplate suffix (train df = 28)
    for i in range(28):
        organic = _DUP_TEXT if i == 0 else " ".join(
            f"w{i}x{j}" for j in range(12)
        )
        rows.append((i, organic + " " + _BOILER, "train"))
    # eval doc 28 repeats doc 0's full text (genuine contamination);
    # eval doc 29 shares ONLY the boilerplate suffix
    rows.append((28, _DUP_TEXT + " " + _BOILER, "eval"))
    rows.append((29, " ".join(f"e29y{j}" for j in range(12)) + " " + _BOILER, "eval"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, split string")

    capped = {
        r.doc_id: r
        for r in cross_split_contamination(
            docs, "doc_id", "text", "split", k=4, max_doc_freq=20
        ).collect()
    }
    # 24 words -> 21 distinct 4-grams: 9 organic + 3 seam + 9 boilerplate;
    # the boilerplate 4-grams (train df 28 > 20) are dropped, so doc 28
    # keeps its 12 organic+seam overlaps, all against train doc 0 alone
    assert capped[28].n_overlap_shingles == 12
    assert capped[28].n_train_docs == 1
    # doc 29's only overlap was boilerplate -> absent from the report
    assert 29 not in capped

    uncapped = {
        r.doc_id: r
        for r in cross_split_contamination(
            docs, "doc_id", "text", "split", k=4
        ).collect()
    }
    # uncapped, boilerplate drowns the report: doc 29 "collides" with every
    # train doc - the false-contamination noise the cap removes
    assert uncapped[29].n_overlap_shingles == 9
    assert uncapped[29].n_train_docs == 28
    assert uncapped[28].n_overlap_shingles == 21

    # a cap no shingle exceeds is a bit-exact no-op
    noop = {
        r.doc_id: tuple(r)
        for r in cross_split_contamination(
            docs, "doc_id", "text", "split", k=4, max_doc_freq=1000
        ).collect()
    }
    assert noop == {r: tuple(v) for r, v in uncapped.items()}
