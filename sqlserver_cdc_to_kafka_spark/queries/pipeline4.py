"""Training-data pipeline operators, part 4: model-based quality filtering
(a fixed-weight logistic classifier over engineered text features — the
fastText/quality-classifier shape without a learned model file) and
importance resampling toward a target domain mixture (the DSIR/DoReMi
direction restated as deterministic hash sampling). Both are pure built-in
column expressions — no Python on the data path — and hash-checked against
DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.queries.pipeline import _docs
from sqlserver_cdc_to_kafka_spark.registry import query

# fixed, interpretable weights (a stand-in for trained coefficients; at
# 100 TB the same expression applies a coefficient vector loaded from a
# model artifact — the plan shape is identical)
_W_BIAS = -1.2
_W_LEN = 2.0  # saturating length component
_W_STOP = 1.5  # stopword presence (English-like prose signal)
_W_PUNCT = -3.0  # punctuation density penalty
_W_DIGIT = -2.0  # digit density penalty (boilerplate/table signal)

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


@query(
    "pipeline_quality_classifier",
    bench=True,
    oracle=f"""
WITH feats AS (
  SELECT source,
         len(string_split(text, ' ')) AS n_tok,
         len(list_filter(string_split(text, ' '),
             x -> list_contains({list(_STOPWORDS)!r}, x)))
           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio,
         length(regexp_replace(text, '[^0-9]', '', 'g'))
           / CAST(length(text) AS DOUBLE) AS digit_ratio,
         length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
           / CAST(length(text) AS DOUBLE) AS punct_ratio
  FROM documents),
scored AS (
  SELECT source,
         1.0 / (1.0 + exp(-({_W_BIAS}
                            + {_W_LEN} * least(n_tok / 100.0, 1.0)
                            + {_W_STOP} * least(stop_ratio * 5.0, 1.0)
                            + {_W_PUNCT} * punct_ratio
                            + {_W_DIGIT} * digit_ratio))) AS p
  FROM feats)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (WHERE p >= 0.5) AS BIGINT) AS n_keep,
       ROUND(AVG(p), 4) AS avg_p
FROM scored GROUP BY source
""",
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filter: a logistic classifier over engineered
    features (length saturation, stopword ratio, punctuation density, digit
    density), applied as ONE whole-stage-codegen projection + grouped
    aggregate — the C4/CCNet 'quality classifier' stage with the model
    inlined. One scan, one shuffle on source; at 100 TB the coefficient
    vector is a broadcast scalar and nothing else changes."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks).cast("double")
    quoted = ", ".join(f"'{s}'" for s in _STOPWORDS)
    stop_ratio = F.expr(
        f"size(filter(split(text, ' '), x -> x IN ({quoted})))"
    ) / n_tok
    text_len = F.length("text").cast("double")
    digit_ratio = F.regexp_count(F.col("text"), F.lit(r"[0-9]")) / text_len
    punct_ratio = F.regexp_count(F.col("text"), F.lit(r"[^a-zA-Z0-9 ]")) / text_len
    z = (
        F.lit(_W_BIAS)
        + F.lit(_W_LEN) * F.least(n_tok / 100.0, F.lit(1.0))
        + F.lit(_W_STOP) * F.least(stop_ratio * 5.0, F.lit(1.0))
        + F.lit(_W_PUNCT) * punct_ratio
        + F.lit(_W_DIGIT) * digit_ratio
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return (
        docs.select("source", p.alias("p"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_if(F.col("p") >= 0.5).alias("n_keep"),
            F.round(F.avg("p"), 4).alias("avg_p"),
        )
    )


# target mixture the resampler steers toward: uniform across domains — the
# interesting case, since the corpus is NOT uniform (at 100 TB this is a
# config map, broadcast as a literal or tiny table)
_SAMPLE_GRAIN = 1_000_000


@query(
    "pipeline_importance_weights",
    oracle=f"""
WITH counts AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
tot AS (SELECT SUM(n) AS total, COUNT(*) AS n_domains FROM counts),
weighted AS (
  SELECT source, n,
         (1.0 / n_domains) / (n / CAST(total AS DOUBLE)) AS w
  FROM counts CROSS JOIN tot),
sampled AS (
  SELECT d.doc_id, d.source, w.w
  FROM documents d JOIN weighted w USING (source)
  WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':resample'), 1, 8)
             AS BIGINT) % {_SAMPLE_GRAIN}
        < CAST(least(w.w, 1.0) * {_SAMPLE_GRAIN} AS BIGINT))
SELECT w.source,
       CAST(w.n AS BIGINT) AS n_docs,
       ROUND(w.w, 4) AS weight,
       CAST(COUNT(s.doc_id) AS BIGINT) AS n_sampled
FROM weighted w LEFT JOIN sampled s ON w.source = s.source
GROUP BY w.source, w.n, w.w
""",
)
def q_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance resampling toward a target domain mixture (uniform here):
    per-domain weight = target_share / corpus_share, then deterministic
    Bernoulli(min(w,1)) acceptance by content-stable hash — never rand(),
    so reruns and retries keep the same sample (the DSIR/DoReMi reweighting
    shape). Plan: one grouped count (tiny), the weight table re-joined onto
    the corpus — AQE broadcasts it (one row per domain) — and a second
    grouped count of survivors. Upweighting (w > 1) is reported in `weight`
    for the epoch-repeat stage; acceptance caps at 1."""
    docs = _docs(spark, sf_dir)
    counts = docs.groupBy("source").agg(F.count("*").alias("n"))
    tot = counts.agg(
        F.sum("n").alias("total"), F.count("*").alias("n_domains")
    )
    weighted = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        (
            (F.lit(1.0) / F.col("n_domains"))
            / (F.col("n") / F.col("total").cast("double"))
        ).alias("w"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":resample"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % _SAMPLE_GRAIN
    )
    sampled = (
        docs.join(weighted.select("source", "w"), "source")
        .filter(
            bucket
            < (F.least(F.col("w"), F.lit(1.0)) * _SAMPLE_GRAIN).cast("bigint")
        )
        .select("doc_id", "source")
    )
    return (
        weighted.join(
            sampled.groupBy("source").agg(F.count("*").alias("n_sampled")),
            "source",
            "left",
        )
        .select(
            "source",
            F.col("n").cast("bigint").alias("n_docs"),
            F.round("w", 4).alias("weight"),
            F.coalesce(F.col("n_sampled"), F.lit(0)).cast("bigint").alias("n_sampled"),
        )
    )


@query(
    "stream_static_dedup_drain",
    oracle="""
WITH side AS (
  SELECT doc_id, source, md5(text) AS fp,
         CASE WHEN doc_id % 5 = 0 THEN 'incoming' ELSE 'corpus' END AS side
  FROM documents),
cor AS (SELECT DISTINCT fp FROM side WHERE side = 'corpus')
SELECT s.source, CAST(COUNT(*) AS BIGINT) AS n_new
FROM side s LEFT JOIN cor c USING (fp)
WHERE s.side = 'incoming' AND c.fp IS NULL
GROUP BY s.source
""",
)
def q_stream_static_dedup_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING ingest-time dedup, end-to-end: the incoming batch (doc_id %
    5 == 0) arrives as a multi-file stream; each micro-batch is LEFT ANTI
    stream-static joined against the static corpus fingerprint store
    (distinct content hashes of everything already kept) and the surviving
    NEW documents append to a parquet sink. Stateless — no state store, no
    driver accumulation; the 100 TB form swaps the staged files for the
    real arrival bus and the fingerprint relation for the incrementally
    maintained store (bucketed on fp for a shuffle-free join). The drained
    sink must hash-match the batch anti-join oracle: streaming and batch
    join semantics are the same plan."""
    from sqlserver_cdc_to_kafka_spark.streaming.stream_static import (
        incremental_dedup_stream_drain,
    )

    docs = _docs(spark, sf_dir).withColumn("fp", F.md5("text"))
    incoming = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id", "source", "fp")
    corpus_fps = (
        docs.filter(F.col("doc_id") % 5 != 0).select("fp").distinct()
    )
    drained = incremental_dedup_stream_drain(spark, incoming, corpus_fps)
    return drained.groupBy("source").agg(F.count("*").alias("n_new"))


_QUALITY_P_SQL = f"""1.0 / (1.0 + exp(-({_W_BIAS}
    + {_W_LEN} * least(len(string_split(text, ' ')) / 100.0, 1.0)
    + {_W_STOP} * least((len(list_filter(string_split(text, ' '),
                     x -> list_contains({list(_STOPWORDS)!r}, x)))
                   / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 5.0, 1.0)
    + {_W_PUNCT} * (length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
                   / CAST(length(text) AS DOUBLE))
    + {_W_DIGIT} * (length(regexp_replace(text, '[^0-9]', '', 'g'))
                   / CAST(length(text) AS DOUBLE)))))"""


def quality_prob() -> F.Column:
    """The logistic quality probability as a single column expression
    (shared by pipeline_quality_classifier and the corpus-build funnel)."""
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks).cast("double")
    quoted = ", ".join(f"'{s}'" for s in _STOPWORDS)
    stop_ratio = F.expr(
        f"size(filter(split(text, ' '), x -> x IN ({quoted})))"
    ) / n_tok
    text_len = F.length("text").cast("double")
    digit_ratio = F.regexp_count(F.col("text"), F.lit(r"[0-9]")) / text_len
    punct_ratio = F.regexp_count(F.col("text"), F.lit(r"[^a-zA-Z0-9 ]")) / text_len
    z = (
        F.lit(_W_BIAS)
        + F.lit(_W_LEN) * F.least(n_tok / 100.0, F.lit(1.0))
        + F.lit(_W_STOP) * F.least(stop_ratio * 5.0, F.lit(1.0))
        + F.lit(_W_PUNCT) * punct_ratio
        + F.lit(_W_DIGIT) * digit_ratio
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


@query(
    "pipeline_corpus_build_funnel",
    bench=True,
    oracle=f"""
WITH base AS (
  SELECT doc_id, source, text,
         CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                   AS BIGINT) % 100 < 95 THEN 'train' ELSE 'eval' END AS split,
         {_QUALITY_P_SQL} AS p
  FROM documents),
train AS (SELECT * FROM base WHERE split = 'train'),
qual AS (SELECT * FROM train WHERE p >= 0.5),
keep AS (SELECT MIN(doc_id) AS doc_id FROM qual GROUP BY md5(text)),
dedup AS (SELECT q.* FROM qual q JOIN keep k USING (doc_id)),
evs AS (
  SELECT DISTINCT unnest(CASE WHEN len(ws) >= 4 THEN
           list_distinct(list_transform(range(1, len(ws) - 2),
                         i -> array_to_string(ws[i:i+3], ' ')))
           ELSE [] END) AS shingle
  FROM (SELECT string_split(text, ' ') AS ws FROM base WHERE split = 'eval')),
cont AS (
  SELECT DISTINCT d.doc_id
  FROM (SELECT doc_id, unnest(CASE WHEN len(ws) >= 4 THEN
          list_distinct(list_transform(range(1, len(ws) - 2),
                        i -> array_to_string(ws[i:i+3], ' ')))
          ELSE [] END) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM dedup)) d
  JOIN evs USING (shingle)),
clean AS (SELECT * FROM dedup WHERE doc_id NOT IN (SELECT doc_id FROM cont))
SELECT * FROM (
  SELECT 'corpus' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs FROM base
  UNION ALL SELECT 'train_split', COUNT(*) FROM train
  UNION ALL SELECT 'quality_kept', COUNT(*) FROM qual
  UNION ALL SELECT 'exact_deduped', COUNT(*) FROM dedup
  UNION ALL SELECT 'decontaminated', COUNT(*) FROM clean)
""",
)
def q_corpus_build_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END corpus build as one attrition funnel crossing operator
    families: deterministic 95/5 split → model-based quality filter (the
    logistic classifier) → exact content dedup (min-doc-id per md5, the
    canonical-representative rule) → eval-decontamination (drop survivors
    sharing any word-4-gram with the eval split). One cached slim
    projection feeds every stage; each later stage is a semi/anti join off
    the previous — the integration shape a real 100 TB build runs, with
    per-stage row counts as the build report. Stage relations reuse the
    exact expressions of their standalone operators
    (pipeline_quality_classifier, dedup_exact, pipeline_decontaminate_train),
    so this funnel is also a consistency witness across them."""
    from sqlserver_cdc_to_kafka_spark.pipeline.text import word_shingles
    from sqlserver_cdc_to_kafka_spark.queries.pipeline3 import _with_split

    docs = _with_split(_docs(spark, sf_dir))
    # one slim pass: everything later stages need, cached so the five stage
    # counts share the dominant quality scan.  The returned frame is LAZY
    # (registry contract — plan audits must see the real exchanges, see
    # tools/plan_audit.py) and reads this cache, so an in-function release
    # is impossible; like the six other caller-managed persist sites
    # (row_compare.py:98, cdc.py:102, ...) release is LRU-evict or the
    # harness's clearCache between timed reps (bench.py clears the cache
    # after every rep precisely so warm reruns cannot silently skip the
    # quality scan — the r9 25.8 s -> 4.2 s warm-inflation hazard).
    base = docs.select("doc_id", "source", "text", "split", quality_prob().alias("p")).persist()
    # NOTE (r15): a min-window over the md5(text) partition was tried here
    # instead of agg + semi-join and MEASURED SLOWER (isolated best-of-2
    # 2.96 → 3.33 s): the semi-join's build side is doc_ids only (AQE
    # broadcasts it, so qual's text payload is never exchanged), while the
    # window shuffles the full text column by md5 once per consumer branch.
    #
    # r15 wave 3 — count algebra (guide §1.2 "don't compute things you
    # throw away"). The funnel reports COUNTS, not rows, so three whole
    # subtrees of the r14 plan were materializing relations only to count
    # them:
    #   * corpus / train_split / quality_kept were three separate scans of
    #     the cache → ONE aggregate pass with conditional counts, unpivoted
    #     by stack();
    #   * |dedup| = |keep| (keep's doc_ids are distinct and all inside
    #     qual; doc_id is unique in documents) = the number of md5(text)
    #     groups in qual → count_distinct, no semi-join; the coalesce
    #     sentinel ('∅' is outside md5's hex alphabet) keeps a NULL-text
    #     group countable exactly as GROUP BY would;
    #   * cont ⊆ dedup by construction and doc_id is unique, so
    #     |clean| = |dedup| − |cont| → the anti-join branch (which re-ran
    #     the entire keep+semi+explode+semi+distinct chain) is pure
    #     arithmetic on two scalars.
    # PRECONDITION (same class as graph.py's nonnegative-key note): doc_id
    # unique per row — holds for the documents table by generation; a
    # duplicated id would break the |clean| subtraction.
    is_train = F.col("split") == "train"
    is_qual = is_train & (F.col("p") >= 0.5)
    qual = base.filter(is_qual)
    keep = qual.groupBy(F.md5("text").alias("fp")).agg(F.min("doc_id").alias("doc_id"))
    dedup = qual.join(keep.select("doc_id"), "doc_id", "leftsemi")
    evs = (
        base.filter(F.col("split") == "eval")
        .select(F.explode(word_shingles("text", 4)).alias("shingle"))
        .distinct()
    )
    cont = (
        dedup.select("doc_id", F.explode(word_shingles("text", 4)).alias("shingle"))
        .join(evs, "shingle", "leftsemi")
        .select("doc_id")
        .distinct()
    )

    head = base.agg(
        F.count(F.lit(1)).alias("n_corpus"),
        F.count(F.when(is_train, F.lit(1))).alias("n_train"),
        F.count(F.when(is_qual, F.lit(1))).alias("n_qual"),
    ).selectExpr(
        "stack(3, 'corpus', n_corpus, 'train_split', n_train,"
        " 'quality_kept', n_qual) AS (stage, n_docs)"
    )
    dn = qual.agg(
        F.count_distinct(F.coalesce(F.md5("text"), F.lit("∅"))).alias("n_dedup")
    )
    cn = cont.agg(F.count(F.lit(1)).alias("n_cont"))
    tail = dn.crossJoin(cn).selectExpr(
        "stack(2, 'exact_deduped', n_dedup,"
        " 'decontaminated', n_dedup - n_cont) AS (stage, n_docs)"
    )
    return head.unionAll(tail)


_SUBSTR_K = 8  # window length in tokens (the ExactSubstr overlap unit)


@query(
    "dedup_substring_windows",
    oracle=f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
           WHERE len(string_split(text, ' ')) >= {_SUBSTR_K}),
win AS (
  SELECT doc_id, unnest(list_transform(range(1, len(ws) - {_SUBSTR_K - 2}),
                 i -> array_to_string(ws[i:i+{_SUBSTR_K - 1}], ' '))) AS win
  FROM w),
shared AS (
  SELECT win FROM (SELECT win, COUNT(DISTINCT doc_id) AS c FROM win GROUP BY win)
  WHERE c >= 2)
SELECT win.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(COUNT(s.win) AS BIGINT) AS n_shared,
       ROUND(COUNT(s.win) / CAST(COUNT(*) AS DOUBLE), 4) AS shared_frac
FROM win LEFT JOIN shared s USING (win)
GROUP BY win.doc_id
""",
)
def q_dedup_substring_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style overlap detection (the 'remove 50-token repeated
    spans' direction of Lee et al.'s dedup, restated Spark-first): hash
    every positional 8-token window — NON-distinct, so coverage is
    positional — find windows occurring in ≥2 distinct documents via one
    grouped count over the inverted window index, and report each
    document's shared-window coverage fraction. Two shuffles total (by
    window, by doc). At 100 TB the window index is the operator's state:
    hash the window string to 8 bytes, cap the hot windows with the same
    max_doc_freq guard as the shingle joins, and the span-REMOVAL pass is a
    second positional join against the flagged windows."""
    docs = _docs(spark, sf_dir)
    wins = F.expr(
        f"transform(array(split(text, ' ')), ws -> "
        f"transform(sequence(0, size(ws) - {_SUBSTR_K}), "
        f"i -> concat_ws(' ', slice(ws, i + 1, {_SUBSTR_K}))))[0]"
    )
    win = (
        docs.filter(F.size(F.split(F.col("text"), " ")) >= _SUBSTR_K)
        .select("doc_id", F.explode(wins).alias("win"))
    )
    shared = (
        win.groupBy("win")
        .agg(F.count_distinct("doc_id").alias("c"))
        .filter(F.col("c") >= 2)
        .select("win")
        .withColumn("__shared", F.lit(1))
    )
    return (
        win.join(shared, "win", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_windows"),
            F.count(F.col("__shared")).alias("n_shared"),
            F.round(
                F.count(F.col("__shared")) / F.count("*").cast("double"), 4
            ).alias("shared_frac"),
        )
    )


@query(
    "multimodal_resize",
    oracle="""
WITH dims AS (
  SELECT doc_id,
         4 + doc_id % 13 AS w,
         3 + doc_id % 7 AS h,
         (doc_id * 31) % 256 AS seed
  FROM documents),
px AS (
  SELECT doc_id,
         (seed + (((i.i // 24) * h // 5) * w + ((i.i // 3) % 8) * w // 8) * 3
          + i.i % 3) % 256 AS v
  FROM dims CROSS JOIN (SELECT unnest(range(0, 120)) AS i) i)
SELECT d.doc_id,
       CAST(w AS INT) AS in_w,
       CAST(h AS INT) AS in_h,
       CAST(8 AS INT) AS out_w,
       CAST(5 AS INT) AS out_h,
       CAST(strlen('P6' || chr(10) || '8 5' || chr(10) || '255' || chr(10))
            + 120 AS INT) AS n_bytes,
       AVG(p.v) AS px_mean,
       CAST(SUM(p.v) AS BIGINT) AS px_sum
FROM dims d JOIN px p USING (doc_id)
GROUP BY d.doc_id, w, h
""",
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal RESIZE stage, real end-to-end: decode each PPM payload,
    nearest-neighbor resample to a fixed 8x5 thumbnail in numpy (index
    arithmetic the oracle reproduces exactly), re-encode, and report the
    thumbnail's size and pixel stats — the decode → transform → re-encode
    round trip of a thumbnail/tiling ingest stage, Arrow-batched
    (pipeline.multimodal.resize_features)."""
    from sqlserver_cdc_to_kafka_spark.pipeline.multimodal import (
        attach_ppm_payload,
        resize_features,
    )

    docs = _docs(spark, sf_dir)
    return resize_features(attach_ppm_payload(docs, "doc_id"), out_w=8, out_h=5)
