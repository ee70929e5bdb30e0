"""Round-6 (continued) pipeline additions — tokenizer-training, curriculum,
sampling, and audit operators a large-scale training-data pipeline needs.

Text/tokenizer: BPE pair counting over the weighted word vocabulary;
tokenizer fertility; compression-ratio (distinct 4-gram) quality signal.
Curriculum & sampling: difficulty-quartile staging; log2 length histogram;
quality-proportional rejection sampling (md5 coin, never rand()).
Dedup forensics: cross-source duplicate matrix; Jaccard threshold sweep;
survivorship policy (best-member canonical).
Embedding audits: ANN recall@k vs exact top-k; train/eval centroid drift;
label-margin and kNN label-agreement noise detection — all hash-exact via
integer micro-unit sum vectors and decimal(38,0) accumulators.
Scale ops: join-key skew diagnostic; shard manifest with commutative
checksums; event-type co-occurrence lift; order-backlog interval counting;
exact dwell-time percentiles.

All are engine-portable (md5-derived hashes, integer ppm ratios, rounded
cosines with id tie-breaks) so the driver's hash-exact gate applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import int_div
from sqlserver_cdc_to_kafka_spark.registry import query
from sqlserver_cdc_to_kafka_spark.tables import ensure_parallel, load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ensure_parallel(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# BPE pair counts
# ---------------------------------------------------------------------------

@query(
    "pipeline_bpe_pair_counts",
    oracle="""
WITH words AS (
  SELECT w AS word, COUNT(*) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE length(w) >= 2
  GROUP BY w),
pairs AS (
  SELECT substr(word, CAST(i AS INT), 2) AS pair, freq
  FROM words, LATERAL unnest(range(1, CAST(length(word) AS BIGINT))) AS t(i)),
agg AS (
  SELECT pair, CAST(SUM(freq) AS BIGINT) AS pair_count,
         CAST(COUNT(*) AS BIGINT) AS n_word_types
  FROM pairs GROUP BY pair)
SELECT pair, pair_count, n_word_types
FROM agg
QUALIFY row_number() OVER (ORDER BY pair_count DESC, pair) <= 40
""",
    bench=True,
)
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-training inner step: count adjacent symbol pairs over
    the corpus and surface the top merge candidates.  Uses the standard
    vocabulary compression: first reduce the corpus to a (word, freq)
    table — one token explode + one shuffle on the word — then expand each
    DISTINCT word into its adjacent character pairs and sum pair counts
    weighted by word frequency.  At 100 TB the (word, freq) table is
    bounded by vocabulary size (Heaps' law, ~millions), so the per-pair
    shuffle is tiny no matter the corpus size; the raw-token explode
    pre-aggregates map-side.  Top-40 by (count, pair) with the pair as a
    deterministic tie-break."""
    docs = _docs(spark, sf_dir)
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1),"
                   " i -> substring(word, i, 2))")
        ).alias("pair"),
        "freq",
    )
    agg = pairs.groupBy("pair").agg(
        F.sum("freq").cast("bigint").alias("pair_count"),
        F.count("*").cast("bigint").alias("n_word_types"),
    )
    # top-40 via orderBy+limit (TakeOrderedAndProject: per-partition heaps,
    # no single-partition rank window — the pair space is charset²-bounded
    # anyway, but this shape is free)
    return agg.orderBy(F.col("pair_count").desc(), "pair").limit(40).select(
        "pair", "pair_count", "n_word_types"
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility
# ---------------------------------------------------------------------------

_TOK_RE = "[a-z]+|[0-9]|[^a-z0-9 ]"


@query(
    "pipeline_tokenizer_fertility",
    oracle=f"""
WITH per_doc AS (
  SELECT source,
         CAST(len(regexp_extract_all(text, '{_TOK_RE}')) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(string_split(text, ' '), w -> length(w) > 0))
              AS BIGINT) AS n_words,
         CAST(length(text) AS BIGINT) AS n_bytes
  FROM documents
  WHERE length(replace(text, ' ', '')) > 0)
SELECT source,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens,
       CAST(SUM(n_words) AS BIGINT) AS words,
       CAST(SUM(n_bytes) AS BIGINT) AS bytes,
       CAST(SUM(n_tokens) * 1000000 // SUM(n_words) AS BIGINT)
         AS fertility_ppm,
       CAST(SUM(n_bytes) * 1000000 // SUM(n_tokens) AS BIGINT)
         AS bytes_per_token_ppm
FROM per_doc GROUP BY source
""",
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY audit per source: tokens-per-word and
    bytes-per-token under a regex tokenizer (lowercase runs, single
    digits, single punctuation — the GPT-2-style pre-tokenizer shape).
    High fertility on a source means the tokenizer fragments it (costly
    context window); the per-source rollup is what drives tokenizer
    retraining or corpus re-weighting decisions.  Pure built-in
    expressions (regexp_count + integer ppm ratios), single grouped
    aggregate — one map-side-combinable shuffle at any scale."""
    docs = _docs(spark, sf_dir).filter(
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) > 0
    )
    per_doc = docs.select(
        "source",
        F.expr(f"cast(regexp_count(text, '{_TOK_RE}') as bigint)").alias(
            "n_tokens"
        ),
        F.expr(
            "cast(size(filter(split(text, ' '), w -> length(w) > 0)) as bigint)"
        ).alias("n_words"),
        F.length("text").cast("bigint").alias("n_bytes"),
    )
    return per_doc.groupBy("source").agg(
        F.sum("n_tokens").cast("bigint").alias("tokens"),
        F.sum("n_words").cast("bigint").alias("words"),
        F.sum("n_bytes").cast("bigint").alias("bytes"),
        F.expr("cast(sum(n_tokens) * 1000000 div sum(n_words) as bigint)").alias(
            "fertility_ppm"
        ),
        F.expr(
            "cast(sum(n_bytes) * 1000000 div sum(n_tokens) as bigint)"
        ).alias("bytes_per_token_ppm"),
    )


# ---------------------------------------------------------------------------
# Curriculum staging
# ---------------------------------------------------------------------------

@query(
    "pipeline_curriculum_stages",
    oracle="""
WITH scored AS (
  SELECT doc_id,
         CAST(length(replace(text, ' ', '')) * 1000000
              // len(list_filter(string_split(text, ' '),
                                 w -> length(w) > 0))
              AS BIGINT) AS difficulty_ppm
  FROM documents
  WHERE len(list_filter(string_split(text, ' '), w -> length(w) > 0)) > 0),
staged AS (
  SELECT doc_id, difficulty_ppm,
         CAST(ntile(4) OVER (ORDER BY difficulty_ppm, doc_id) AS BIGINT)
           AS stage
  FROM scored)
SELECT doc_id, difficulty_ppm, stage FROM staged
""",
)
def q_curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning STAGE assignment: score each document's
    difficulty (mean word length in ppm — a cheap syntactic-complexity
    proxy), then ntile(4) into easy→hard training stages with (score,
    doc_id) ordering so ties are deterministic.  The stage assignment is
    EXACT ntile(4) semantics computed scalably: global_ntile (range-
    bucketed rank + the SQL-standard tile formula) — the plain ntile
    window funnels every document through ONE task (the r11 single-
    partition-window audit class), this form parallelizes across buckets
    and is equality-pinned to F.ntile.  Stage is the shuffle/sort key the
    training dataloader consumes."""
    from sqlserver_cdc_to_kafka_spark.operators.merge import global_ntile

    docs = _docs(spark, sf_dir).filter(
        F.expr("size(filter(split(text, ' '), w -> length(w) > 0)) > 0")
    )
    scored = docs.select(
        "doc_id",
        F.expr(
            "cast(length(replace(text, ' ', '')) * 1000000 div "
            "size(filter(split(text, ' '), w -> length(w) > 0)) as bigint)"
        ).alias("difficulty_ppm"),
    )
    return global_ntile(
        scored,
        [F.col("difficulty_ppm"), F.col("doc_id")],
        F.col("difficulty_ppm").cast("double"),
        4,
        "stage",
    ).select("doc_id", "difficulty_ppm", "stage")


# ---------------------------------------------------------------------------
# Log2 length histogram
# ---------------------------------------------------------------------------

@query(
    "pipeline_length_histogram",
    oracle="""
WITH b AS (
  SELECT source,
         CAST(length(bin(n_chars)) - 1 AS BIGINT) AS log2_bucket,
         n_chars
  FROM documents WHERE n_chars > 0),
h AS (
  SELECT source, log2_bucket,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         CAST(MIN(n_chars) AS BIGINT) AS min_chars,
         CAST(MAX(n_chars) AS BIGINT) AS max_chars
  FROM b GROUP BY source, log2_bucket)
SELECT source, log2_bucket, n_docs, sum_chars, min_chars, max_chars,
       CAST(SUM(n_docs) OVER (PARTITION BY source ORDER BY log2_bucket
                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_docs
FROM h
""",
)
def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOG2 length histogram per source with a cumulative count — the
    sequence-length distribution that sizes packing buckets and batch
    shapes (how many docs fit a 2^k context window).  The bucket is
    computed integer-exactly as bit-length minus one (length(bin(n)) - 1),
    never floor(log2(x)) on doubles, so engines agree at exact powers of
    two.  One grouped aggregate plus a tiny per-source window over ≤64
    bucket rows — nothing here grows with corpus size except the first
    map-side-combined shuffle."""
    docs = _docs(spark, sf_dir)
    b = docs.filter(F.col("n_chars") > 0).select(
        "source",
        (F.length(F.bin("n_chars")) - 1).cast("bigint").alias("log2_bucket"),
        "n_chars",
    )
    h = b.groupBy("source", "log2_bucket").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("log2_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return h.select(
        "source",
        "log2_bucket",
        "n_docs",
        "sum_chars",
        "min_chars",
        "max_chars",
        F.sum("n_docs").over(w).cast("bigint").alias("cum_docs"),
    )


# ---------------------------------------------------------------------------
# Quality-proportional rejection sampling
# ---------------------------------------------------------------------------

@query(
    "pipeline_rejection_sample",
    oracle="""
WITH scored AS (
  SELECT doc_id, source,
         CAST(len(list_distinct(list_filter(string_split(text, ' '),
                                            w -> length(w) > 0))) * 100
              // len(list_filter(string_split(text, ' '),
                                 w -> length(w) > 0))
              AS BIGINT) AS quality_pct,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 17, 8) AS BIGINT)
           % 100 AS coin
  FROM documents
  WHERE len(list_filter(string_split(text, ' '), w -> length(w) > 0)) > 0)
SELECT s.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(s.quality_pct) AS BIGINT) AS sum_quality_pct,
       CAST(COUNT(*) FILTER (WHERE s.coin < s.quality_pct) AS BIGINT)
         AS n_kept,
       CAST(SUM(s.quality_pct) // 100 AS BIGINT) AS expected_kept
FROM scored s GROUP BY s.source
""",
)
def q_rejection_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-PROPORTIONAL rejection sampling audit: each doc is kept
    with probability quality/100 where quality is its type-token ratio
    (distinct words / words, a lexical-diversity proxy), decided by a
    deterministic md5 coin (chars 17-24 of the id hash — a hash slice
    DISJOINT from the split and shard hashes, so sampling is independent
    of both) — NEVER rand(): reruns, retries and any partitioning keep
    the exact same docs.  The per-source audit compares actual keeps to
    the analytic expectation sum(quality)/100, the drift check run after
    every sampling job.  One scan, one grouped aggregate."""
    docs = _docs(spark, sf_dir)
    words = "filter(split(text, ' '), w -> length(w) > 0)"
    docs = docs.filter(F.expr(f"size({words}) > 0"))
    scored = docs.select(
        "doc_id",
        "source",
        F.expr(
            f"cast(size(array_distinct({words})) * 100 div size({words})"
            " as bigint)"
        ).alias("quality_pct"),
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 17, 8),
                16,
                10,
            ).cast("bigint")
            % 100
        ).alias("coin"),
    )
    return scored.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("quality_pct").cast("bigint").alias("sum_quality_pct"),
        F.sum(F.when(F.col("coin") < F.col("quality_pct"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.expr("cast(sum(quality_pct) div 100 as bigint)").alias(
            "expected_kept"
        ),
    )


# ---------------------------------------------------------------------------
# ANN recall audit
# ---------------------------------------------------------------------------

_RECALL_K = 5


@query(
    "ann_recall_audit",
    oracle=f"""
WITH ev AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         CAST(CASE WHEN embedding[1] >= 0 THEN 4 ELSE 0 END
              + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
              + CASE WHEN embedding[3] >= 0 THEN 1 ELSE 0 END AS BIGINT)
           AS bucket
  FROM embeddings),
q AS (SELECT * FROM ev WHERE vec_id % 10 = 0 AND vec_id < 10000),
exact AS (
  SELECT vec_id, c_id FROM (
    SELECT q.vec_id, c.vec_id AS c_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY ROUND(list_cosine_similarity(q.v, c.v), 6) DESC,
                      c.vec_id
           ) AS rnk
    FROM q JOIN ev c ON c.vec_id <> q.vec_id)
  WHERE rnk <= {_RECALL_K}),
cand AS (
  SELECT q.vec_id, c.vec_id AS c_id, q.v AS qv, c.v AS cv
  FROM q JOIN ev c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id),
ncand AS (
  SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_candidates
  FROM cand GROUP BY vec_id),
approx AS (
  SELECT vec_id, c_id FROM (
    SELECT vec_id, c_id,
           row_number() OVER (
             PARTITION BY vec_id
             ORDER BY ROUND(list_cosine_similarity(qv, cv), 6) DESC, c_id
           ) AS rnk
    FROM cand)
  WHERE rnk <= {_RECALL_K}),
hits AS (
  SELECT e.vec_id, CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM exact e JOIN approx a ON e.vec_id = a.vec_id AND e.c_id = a.c_id
  GROUP BY e.vec_id)
SELECT q.vec_id,
       CAST(COALESCE(n.n_candidates, 0) AS BIGINT) AS n_candidates,
       CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
       CAST(COALESCE(h.n_hit, 0) * 1000000 // {_RECALL_K} AS BIGINT)
         AS recall_ppm
FROM q
LEFT JOIN ncand n ON n.vec_id = q.vec_id
LEFT JOIN hits h ON h.vec_id = q.vec_id
""",
)
def q_ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index RECALL@k audit: for a deterministic query sample (every
    10th vector), compare the exact cosine top-{_RECALL_K} against the
    top-{_RECALL_K} retrieved from a sign-bucket index (3 leading-
    dimension signs → 8 buckets — the smallest honest stand-in for the
    LSH/IVF candidate generators in pipeline/similarity.py, chosen here
    because it is reproducible in portable SQL).  Output per query:
    candidate-set size, hits, recall in ppm.  This is the evaluation loop
    that gates replacing brute force with an approximate index.  Scale
    shape: the query side is broadcast both times; the exact arm is the
    documented O(q·n) baseline you run on a sample, the bucket arm's join
    is an equality join on the bucket key.  Ranks tie-break on
    (rounded cosine, id) so engines agree under float jitter."""
    from sqlserver_cdc_to_kafka_spark.pipeline.similarity import (
        as_double_array,
        dot,
        l2_norm,
    )

    emb = ensure_parallel(load_table(spark, sf_dir, "embeddings"))
    ev = emb.select(
        "vec_id",
        as_double_array("embedding").alias("v"),
        (
            F.when(F.element_at("embedding", 1) >= 0, 4).otherwise(0)
            + F.when(F.element_at("embedding", 2) >= 0, 2).otherwise(0)
            + F.when(F.element_at("embedding", 3) >= 0, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("bucket"),
    ).withColumn("nrm", l2_norm(F.col("v")))
    q = ev.filter((F.col("vec_id") % 10 == 0) & (F.col("vec_id") < 10000)).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("bucket").alias("q_bucket"),
    )
    cos = F.round(
        dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id"))

    exact = (
        ev.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", cos.alias("cos"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _RECALL_K)
        .select("q_id", F.col("vec_id").alias("e_cid"))
    )
    cand = (
        ev.join(
            F.broadcast(q), F.col("bucket") == F.col("q_bucket"), "inner"
        )
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", cos.alias("cos"))
    )
    ncand = cand.groupBy("q_id").agg(
        F.count("*").cast("bigint").alias("n_candidates")
    )
    approx = (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _RECALL_K)
        .select(F.col("q_id").alias("a_qid"), F.col("vec_id").alias("a_cid"))
    )
    hits = (
        exact.join(
            approx,
            (exact.q_id == approx.a_qid) & (exact.e_cid == approx.a_cid),
            "inner",
        )
        .groupBy(exact.q_id)
        .agg(F.count("*").cast("bigint").alias("n_hit"))
    )
    base = q.select(F.col("q_id").alias("vec_id"))
    out = (
        base.join(ncand, base.vec_id == ncand.q_id, "left")
        .drop(ncand.q_id)
        .join(hits, base.vec_id == hits.q_id, "left")
        .drop(hits.q_id)
    )
    return out.select(
        "vec_id",
        F.coalesce(F.col("n_candidates"), F.lit(0)).cast("bigint").alias(
            "n_candidates"
        ),
        F.coalesce(F.col("n_hit"), F.lit(0)).cast("bigint").alias("n_hit"),
        F.expr(
            f"cast(coalesce(n_hit, 0) * 1000000 div {_RECALL_K} as bigint)"
        ).alias("recall_ppm"),
    )


# ---------------------------------------------------------------------------
# Cross-source duplicate overlap matrix
# ---------------------------------------------------------------------------

@query(
    "dedup_cross_source_matrix",
    oracle="""
WITH h AS (
  SELECT md5(substr(text, 1, 80)) AS th, source,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CASE WHEN a.source = b.source THEN a.c * (a.c - 1) // 2
              ELSE a.c * b.c END AS np
  FROM h a JOIN h b ON a.th = b.th AND a.source <= b.source
  WHERE a.source < b.source OR (a.source = b.source AND a.c > 1))
SELECT source_a, source_b, CAST(SUM(np) AS BIGINT) AS n_dup_pairs
FROM pairs GROUP BY source_a, source_b
""",
)
def q_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-SOURCE duplicate overlap matrix — corpus forensics: for every
    source pair (a ≤ b), how many duplicate document pairs (by leading-span fingerprint —
    md5 of the first 80 chars, the cheap prefix key crawl forensics uses
    because scraped copies share openings even when tails diverge) span
    them.  High off-diagonal cells mean two crawls scraped the same sites
    (drop one); high diagonal cells mean a source self-duplicates.

    Never materializes document pairs: docs reduce to per-(hash, source)
    COUNTS first, and the matrix sums c_a·c_b products over the hash join
    — the join fan-out per hash is bounded by the number of sources
    holding that text, so the shuffle is O(distinct texts · sources), not
    O(duplicate pairs).  Same-source cells use C(c,2)."""
    docs = _docs(spark, sf_dir)
    h = docs.groupBy(
        F.md5(F.substring("text", 1, 80)).alias("th"), "source"
    ).agg(F.count("*").cast("bigint").alias("c"))
    a = h.select(
        F.col("th"),
        F.col("source").alias("source_a"),
        F.col("c").alias("ca"),
    )
    b = h.select(
        F.col("th").alias("th_b"),
        F.col("source").alias("source_b"),
        F.col("c").alias("cb"),
    )
    pairs = (
        a.join(
            b,
            (a.th == b.th_b) & (a.source_a <= b.source_b),
            "inner",
        )
        .filter(
            (F.col("source_a") < F.col("source_b"))
            | ((F.col("source_a") == F.col("source_b")) & (F.col("ca") > 1))
        )
        .select(
            "source_a",
            "source_b",
            F.when(
                F.col("source_a") == F.col("source_b"),
                F.expr("ca * (ca - 1) div 2"),
            )
            .otherwise(F.col("ca") * F.col("cb"))
            .alias("np"),
        )
    )
    return pairs.groupBy("source_a", "source_b").agg(
        F.sum("np").cast("bigint").alias("n_dup_pairs")
    )


# ---------------------------------------------------------------------------
# Dedup threshold sensitivity sweep
# ---------------------------------------------------------------------------

@query(
    "dedup_threshold_sweep",
    oracle="""
WITH docsh AS (
  SELECT doc_id, CASE WHEN len(words) >= 3 THEN
    list_distinct(list_transform(range(1, len(words) - 1),
                  i -> array_to_string(words[i:i+2], ' ')))
    ELSE [] END AS shingles
  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)),
shingled AS (SELECT doc_id, unnest(shingles) AS shingle FROM docsh),
rare AS (SELECT shingle FROM shingled GROUP BY shingle
         HAVING COUNT(*) <= 64),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingled GROUP BY doc_id),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
          FROM shingled a JOIN shingled b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          JOIN rare r ON r.shingle = a.shingle
          GROUP BY 1, 2),
banded AS (
  SELECT CAST(inter * 10 // (sa.sz + sb.sz - inter) AS BIGINT) AS band
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b),
hist AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS n_pairs
         FROM banded GROUP BY band)
SELECT band, n_pairs,
       CAST(SUM(n_pairs) OVER (ORDER BY band DESC
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS n_pairs_at_or_above
FROM hist
""",
)
def q_threshold_sweep(
    spark: SparkSession, sf_dir: str, max_doc_freq: int | None = 64
) -> DataFrame:
    """Dedup THRESHOLD SENSITIVITY sweep: the full Jaccard-similarity
    histogram of candidate pairs in integer deciles (band = ⌊10·J⌋), with
    a descending cumulative column = exactly how many pairs a threshold
    of band/10 would flag.  This is the one-pass answer to "what does
    moving the dedup threshold from 0.8 to 0.7 cost?" — otherwise
    answered by re-running the dedup once per candidate threshold.

    Same single-shuffle inverted-index candidate generation as
    ngram_jaccard_pairs (grouped shingle → in-group pair explode), no
    similarity filter at the end — every co-shingled pair lands in one
    decile bucket, the histogram is ≤11 rows, and the cumulative window
    runs over those 11 rows on one partition."""
    from sqlserver_cdc_to_kafka_spark.pipeline.text import word_shingles

    docs = _docs(spark, sf_dir)
    sh = docs.select("doc_id", word_shingles("text").alias("shingles"))
    sizes = sh.select("doc_id", F.size("shingles").alias("sz"))
    idx = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    grouped = idx.groupBy("shingle").agg(
        F.sort_array(F.collect_list("doc_id")).alias("docs")
    )
    if max_doc_freq is not None:
        # stop-shingle cap (pipeline/dedup.py pattern), DEFAULT 64 since
        # r10 and mirrored in the oracle: on the skewed probe corpus the
        # uncapped sweep's candidate stage has the identical 125k-doc
        # hot-shingle shape that heap-OOM'd dedup_ngram_jaccard (measured);
        # 64 binds on zero shingles at every organically-witnessed SF, so
        # the histogram there is unchanged
        grouped = grouped.filter(F.size("docs") <= max_doc_freq)
    pairs = (
        grouped.filter(F.size("docs") > 1)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(docs, (x, i) -> "
                    "transform(slice(docs, i + 2, size(docs)), y -> "
                    "struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
    )
    inter = pairs.groupBy("doc_a", "doc_b").agg(F.count("*").alias("inter"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    banded = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            F.expr("cast(inter * 10 div (sz_a + sz_b - inter) as bigint)").alias(
                "band"
            )
        )
    )
    hist = banded.groupBy("band").agg(
        F.count("*").cast("bigint").alias("n_pairs")
    )
    # no-partition window, bounded by contract: the windowed relation is the
    # Jaccard-decile band histogram — <= 11 rows at ANY data size (the
    # runtime "WindowExec: No Partition Defined" warning is benign here)
    w = (
        Window.orderBy(F.col("band").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return hist.select(
        "band",
        "n_pairs",
        F.sum("n_pairs").over(w).cast("bigint").alias("n_pairs_at_or_above"),
    )


# ---------------------------------------------------------------------------
# Join-key skew diagnostic
# ---------------------------------------------------------------------------

@query(
    "audit_key_skew",
    oracle="""
WITH freq AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY user_id),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_keys FROM freq),
ranked AS (
  SELECT user_id, n,
         row_number() OVER (ORDER BY n DESC, user_id) AS rnk
  FROM freq)
SELECT r.rnk AS rank, r.user_id, r.n,
       CAST(r.n * 1000000 // t.total AS BIGINT) AS share_ppm,
       CAST(r.n * t.n_keys * 1000 // t.total AS BIGINT)
         AS x1000_vs_uniform,
       t.n_keys
FROM ranked r CROSS JOIN tot t
WHERE r.rnk <= 10
""",
)
def q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-KEY SKEW diagnostic — the "should this join be salted?"
    report: top-10 heaviest keys of the events user_id (the engine's most
    common join/window partition key) with each key's traffic share in
    ppm and its multiple of the uniform expectation (×1000).  A key at
    many times uniform is exactly what AQE's skew-join split or the
    salted-join operator (operators/skew.py) exists for; this query is
    the measurement that justifies turning either on.  Shape: one
    map-side-combined count shuffle (|keys| rows), a scalar total, and a
    top-10 over the per-key counts — the full-key frequency table never
    leaves the executors unranked."""
    ev = load_table(spark, sf_dir, "events")
    freq = ev.groupBy("user_id").agg(F.count("*").cast("bigint").alias("n"))
    tot = freq.agg(
        F.sum("n").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("n_keys"),
    )
    # distributed top-10 first (TakeOrderedAndProject), THEN rank the 10
    # surviving rows — a global rank window over the full key-frequency
    # table would single-partition |keys| rows at scale; the no-partition
    # window below sees <= 10 rows by contract, so its runtime "WindowExec:
    # No Partition Defined" warning is benign
    top10 = freq.orderBy(F.col("n").desc(), "user_id").limit(10)
    ranked = top10.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.col("n").desc(), "user_id")),
    )
    return ranked.crossJoin(F.broadcast(tot)).select(
        F.col("rank").cast("bigint").alias("rank"),
        "user_id",
        "n",
        F.expr("cast(n * 1000000 div total as bigint)").alias("share_ppm"),
        F.expr("cast(n * n_keys * 1000 div total as bigint)").alias(
            "x1000_vs_uniform"
        ),
        "n_keys",
    )


# ---------------------------------------------------------------------------
# Shard manifest with order-independent checksums
# ---------------------------------------------------------------------------

_MANIFEST_SHARDS = 16
_CKSUM_MOD = 2_147_483_647


@query(
    "pipeline_shard_manifest",
    oracle=f"""
WITH assigned AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8) AS BIGINT)
           % {_MANIFEST_SHARDS} AS shard,
         CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) AS content_h,
         CAST(length(text) AS BIGINT) AS n_bytes
  FROM documents)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_bytes) AS BIGINT) AS n_bytes,
       CAST(SUM(content_h) % {_CKSUM_MOD} AS BIGINT) AS content_checksum,
       CAST(SUM(doc_id) % {_CKSUM_MOD} AS BIGINT) AS id_checksum
FROM assigned GROUP BY shard
""",
)
def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATALOADER MANIFEST: per output shard (same content-stable hash as
    pipeline_shard_assignment, so the two agree), the row count, byte
    size, and two ORDER-INDEPENDENT checksums — a modular sum of per-doc
    content hashes and of doc ids.  This is the artifact a training job
    verifies before reading a shard (did the writer drop/duplicate/corrupt
    rows?) and the equality witness between two independently-produced
    copies of the corpus: commutative sums mean any partitioning or write
    order yields the same manifest.  One grouped aggregate; the checksums
    are 31-bit modular so they never overflow bigint accumulation."""
    docs = _docs(spark, sf_dir)
    shard = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 9, 8), 16, 10
    ).cast("bigint") % _MANIFEST_SHARDS
    content_h = F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10).cast(
        "bigint"
    )
    assigned = docs.select(
        "doc_id",
        shard.alias("shard"),
        content_h.alias("content_h"),
        F.length("text").cast("bigint").alias("n_bytes"),
    )
    return assigned.groupBy("shard").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_bytes").cast("bigint").alias("n_bytes"),
        (F.sum("content_h") % _CKSUM_MOD).cast("bigint").alias(
            "content_checksum"
        ),
        (F.sum("doc_id") % _CKSUM_MOD).cast("bigint").alias("id_checksum"),
    )


# ---------------------------------------------------------------------------
# Embedding distribution drift between splits
# ---------------------------------------------------------------------------

@query(
    "pipeline_embedding_drift",
    bench=True,
    oracle="""
WITH e AS (
  SELECT d.source,
         CASE WHEN CAST('0x' || substr(md5(CAST(v.vec_id AS VARCHAR)), 1, 8)
                   AS BIGINT) % 100 < 95
              THEN 'train' ELSE 'eval' END AS split,
         list_transform(v.embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings v JOIN documents d ON d.doc_id = v.vec_id),
pm AS (
  SELECT source, split, CAST(i AS BIGINT) AS pos,
         CAST(SUM(CAST(floor(vec[CAST(i AS INT)] * 1000000 + 0.5)
                       AS BIGINT)) AS BIGINT) AS sv
  FROM e, LATERAL unnest(range(1, 1 + len(vec))) AS t(i)
  GROUP BY 1, 2, 3),
tr AS (SELECT source, pos, sv FROM pm WHERE split = 'train'),
ev AS (SELECT source, pos, sv FROM pm WHERE split = 'eval'),
dotp AS (
  SELECT tr.source,
         SUM(CAST(tr.sv AS DECIMAL(38,0)) * CAST(ev.sv AS DECIMAL(38,0)))
           AS dp,
         SUM(CAST(tr.sv AS DECIMAL(38,0)) * CAST(tr.sv AS DECIMAL(38,0)))
           AS na,
         SUM(CAST(ev.sv AS DECIMAL(38,0)) * CAST(ev.sv AS DECIMAL(38,0)))
           AS nb
  FROM tr JOIN ev ON tr.source = ev.source AND tr.pos = ev.pos
  GROUP BY tr.source),
counts AS (
  SELECT source,
         CAST(COUNT(*) FILTER (WHERE split = 'train') AS BIGINT)
           AS n_train_vecs,
         CAST(COUNT(*) FILTER (WHERE split = 'eval') AS BIGINT)
           AS n_eval_vecs
  FROM e GROUP BY source)
SELECT c.source, c.n_train_vecs, c.n_eval_vecs,
       ROUND(CAST(d.dp AS DOUBLE)
             / (sqrt(CAST(d.na AS DOUBLE)) * sqrt(CAST(d.nb AS DOUBLE))),
             6) AS centroid_cos
FROM counts c JOIN dotp d ON c.source = d.source
""",
)
def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding DISTRIBUTION DRIFT between the train and eval splits, per
    source: cosine between the two split centroids — the shift audit run
    before trusting an eval set (centroid_cos ≪ 1 means the split is not
    i.i.d. and eval loss will mislead).  Uses the same md5 split hash as
    pipeline_split_train_eval so it audits the REAL split.

    Hash-exact by construction: per-dimension values quantize to integer
    micro-units (floor(x·1e6 + 0.5), the engine-portable rounding used by
    the int8 quantizer) and only their exact integer SUMS cross the
    shuffle; because cosine is scale-invariant, cos(centroid_a,
    centroid_b) = cos(sum_a, sum_b), so no division by counts ever
    happens and the one floating-point expression is the final cosine of
    identical integers in both engines.  Shape (r15): ONE posexplode
    shuffle to (source, dim) groups carrying the train/eval sums as
    conditional aggregates side by side — the r14 form split the per-
    (source, split, pos) sums into two relations and equality-joined them
    back (plus a second scan+join of both tables for the vector counts);
    pivoting the split into columns makes the join disappear, and the
    counts fall out of the same exploded pass (each vector contributes
    exactly one pos=1 row, so counting those IS counting vectors). The raw
    embedding matrix is read once; same integer sums, same final cosine."""
    emb = ensure_parallel(load_table(spark, sf_dir, "embeddings"))
    docs = _docs(spark, sf_dir).select("doc_id", "source")
    bucket = F.conv(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint") % 100
    e = emb.join(docs, emb.vec_id == docs.doc_id).select(
        "source",
        F.when(bucket < 95, "train").otherwise("eval").alias("split"),
        "embedding",
    )
    exploded = e.select(
        "source",
        "split",
        F.posexplode(F.col("embedding")).alias("pos0", "x"),
    ).select(
        "source",
        "split",
        (F.col("pos0") + 1).cast("bigint").alias("pos"),
        F.floor(F.col("x").cast("double") * 1000000 + 0.5)
        .cast("bigint")
        .alias("micro"),
    )
    # split pivoted into columns: per (source, pos) the exact integer sums
    # of both splits side by side, plus per-split vector counts tallied on
    # the pos=1 rows (one row per vector — dim >= 1 always).  PRECONDITION
    # (r15 ADVICE): a zero-length embedding would contribute no pos=1 row
    # and silently vanish from the counts; the embeddings fixture is
    # fixed-dim (TESTDATA.md) so none exist — a source with variable-dim
    # vectors must count from the pre-explode frame instead.
    pm = exploded.groupBy("source", "pos").agg(
        F.sum(F.when(F.col("split") == "train", F.col("micro")).otherwise(0))
        .cast("bigint")
        .alias("tv0"),
        F.sum(F.when(F.col("split") == "eval", F.col("micro")).otherwise(0))
        .cast("bigint")
        .alias("evv0"),
        F.count_if((F.col("split") == "train") & (F.col("pos") == 1))
        .alias("ntr"),
        F.count_if((F.col("split") == "eval") & (F.col("pos") == 1))
        .alias("nev"),
    )
    joined = pm.select(
        "source",
        "pos",
        "ntr",
        "nev",
        F.col("tv0").cast("decimal(19,0)").alias("tv"),
        F.col("evv0").cast("decimal(19,0)").alias("evv"),
    )
    dotp = joined.groupBy("source").agg(
        F.sum(F.col("tv") * F.col("evv")).alias("dp"),
        F.sum(F.col("tv") * F.col("tv")).alias("na"),
        F.sum(F.col("evv") * F.col("evv")).alias("nb"),
        F.max(F.when(F.col("pos") == 1, F.col("ntr")))
        .cast("bigint")
        .alias("n_train_vecs"),
        F.max(F.when(F.col("pos") == 1, F.col("nev")))
        .cast("bigint")
        .alias("n_eval_vecs"),
    )
    # the r14 tr⋈ev inner join silently DROPPED a source whose eval (or
    # train) side is empty; the pivoted form keeps such groups as zero sums,
    # so the equivalent filter is explicit — both splits non-empty
    return (
        dotp.filter((F.col("n_train_vecs") > 0) & (F.col("n_eval_vecs") > 0))
        .select(
            "source",
            "n_train_vecs",
            "n_eval_vecs",
            F.round(
                F.col("dp").cast("double")
                / (
                    F.sqrt(F.col("na").cast("double"))
                    * F.sqrt(F.col("nb").cast("double"))
                ),
                6,
            ).alias("centroid_cos"),
        )
    )


# ---------------------------------------------------------------------------
# Compression-ratio quality signal
# ---------------------------------------------------------------------------

@query(
    "text_compression_ratio",
    oracle="""
WITH g AS (
  SELECT doc_id,
         CAST(length(text) - 3 AS BIGINT) AS n_grams,
         CAST(len(list_distinct(list_transform(
                range(1, CAST(length(text) AS BIGINT) - 2),
                i -> substr(text, CAST(i AS INT), 4)))) AS BIGINT)
           AS n_distinct
  FROM documents WHERE length(text) >= 4)
SELECT doc_id, n_grams, n_distinct,
       CAST(n_distinct * 1000000 // n_grams AS BIGINT) AS distinct_ppm
FROM g
""",
)
def q_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPRESSIBILITY proxy quality signal: distinct character-4-grams
    over total 4-grams per document, in ppm — the dependency-free stand-in
    for the gzip-ratio filter every web-corpus pipeline runs (template/
    boilerplate text compresses well → low distinct ratio → drop or
    downweight).  Pure array expressions (transform + array_distinct),
    no shuffle at all beyond the scan — embarrassingly parallel at any
    scale."""
    docs = _docs(spark, sf_dir).filter(F.length("text") >= 4)
    return docs.select(
        "doc_id",
        (F.length("text") - 3).cast("bigint").alias("n_grams"),
        F.expr(
            "cast(size(array_distinct(transform("
            "sequence(1, length(text) - 3),"
            " i -> substring(text, i, 4)))) as bigint)"
        ).alias("n_distinct"),
    ).select(
        "doc_id",
        "n_grams",
        "n_distinct",
        F.expr("cast(n_distinct * 1000000 div n_grams as bigint)").alias(
            "distinct_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# Dedup survivorship policy
# ---------------------------------------------------------------------------

@query(
    "dedup_survivorship",
    oracle="""
WITH fp AS (
  SELECT doc_id, n_chars, md5(substr(text, 1, 80)) AS grp
  FROM documents),
sized AS (SELECT grp, COUNT(*) AS n FROM fp GROUP BY grp HAVING COUNT(*) > 1),
ranked AS (
  SELECT fp.grp, fp.doc_id, fp.n_chars,
         row_number() OVER (PARTITION BY fp.grp
                            ORDER BY fp.n_chars DESC, fp.doc_id) AS rnk
  FROM fp JOIN sized USING (grp))
SELECT grp AS group_hash,
       CAST(MAX(CASE WHEN rnk = 1 THEN doc_id END) AS BIGINT)
         AS canonical_doc_id,
       CAST(MAX(CASE WHEN rnk = 1 THEN n_chars END) AS BIGINT)
         AS canonical_chars,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
FROM ranked GROUP BY grp
""",
)
def q_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup SURVIVORSHIP policy: within each duplicate group (leading-span
    fingerprint), keep the BEST document — longest content, doc_id as the
    deterministic tie-break — not the arbitrary min-id the naive dedup
    picks.  This is the curation-quality refinement every production
    dedup ends up needing (the shortest copy is usually the truncated
    scrape).  Per-group window partitioned on the fingerprint (no global
    sort); groups are pre-filtered to size > 1 so the window only runs
    over actual duplicates."""
    docs = _docs(spark, sf_dir)
    fp = docs.select(
        "doc_id",
        "n_chars",
        F.md5(F.substring("text", 1, 80)).alias("grp"),
    )
    sized = fp.groupBy("grp").agg(F.count("*").alias("n")).filter(
        F.col("n") > 1
    )
    ranked = fp.join(sized, "grp").withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("grp").orderBy(
                F.col("n_chars").desc(), "doc_id"
            )
        ),
    )
    return ranked.groupBy(F.col("grp").alias("group_hash")).agg(
        F.max(F.when(F.col("rnk") == 1, F.col("doc_id")))
        .cast("bigint")
        .alias("canonical_doc_id"),
        F.max(F.when(F.col("rnk") == 1, F.col("n_chars")))
        .cast("bigint")
        .alias("canonical_chars"),
        F.count("*").cast("bigint").alias("n_members"),
        (F.count("*") - 1).cast("bigint").alias("n_dropped"),
    )


# ---------------------------------------------------------------------------
# Inter-event dwell-time percentiles (exact, discrete)
# ---------------------------------------------------------------------------

@query(
    "events_dwell_percentiles",
    oracle="""
WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
            FROM events),
gaps AS (
  SELECT event_type,
         us - lag(us) OVER (PARTITION BY user_id
                            ORDER BY us, event_id) AS gap_us
  FROM ev),
g AS (SELECT event_type, gap_us FROM gaps WHERE gap_us IS NOT NULL),
ranked AS (
  SELECT event_type, gap_us,
         row_number() OVER (PARTITION BY event_type ORDER BY gap_us) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM g)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_gaps,
       CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN gap_us END) AS BIGINT)
         AS p50_gap_us,
       CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN gap_us END) AS BIGINT)
         AS p90_gap_us,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
FROM ranked GROUP BY event_type
""",
)
def q_dwell_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT discrete dwell-time percentiles: the inter-event gap (time
    since the user's previous event, attributed to the later event's
    type) profiled as p50/p90/max per event type — the latency-
    distribution audit behind session-gap and debounce threshold choices.
    Percentiles are EXACT order statistics (value at rank ⌈p·n⌉ via
    row_number), not percentile_approx: approximate sketches cannot pass
    a hash-exact gate and the per-type rank window partitions on the
    type, so nothing sorts globally.  Integer microseconds throughout."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
        epoch_micros,
    )

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_type",
        epoch_micros(ev, "ts").alias("us"),
        "event_id",
    )
    gaps = base.withColumn(
        "gap_us",
        F.col("us")
        - F.lag("us").over(
            Window.partitionBy("user_id").orderBy("us", "event_id")
        ),
    ).filter(F.col("gap_us").isNotNull())
    ranked = (
        gaps.select("event_type", "gap_us")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("gap_us")
            ),
        )
        .withColumn(
            "n", F.count("*").over(Window.partitionBy("event_type"))
        )
    )
    return ranked.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_gaps"),
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("gap_us"))
        )
        .cast("bigint")
        .alias("p50_gap_us"),
        F.max(
            F.when(
                F.col("rn") == F.expr("(9 * n + 9) div 10"), F.col("gap_us")
            )
        )
        .cast("bigint")
        .alias("p90_gap_us"),
        F.max("gap_us").cast("bigint").alias("max_gap_us"),
    )


# ---------------------------------------------------------------------------
# Event-type co-occurrence (market-basket lift)
# ---------------------------------------------------------------------------

@query(
    "events_type_cooccurrence",
    oracle="""
WITH s AS (SELECT DISTINCT user_id, event_type FROM events),
u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM events),
singles AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM s GROUP BY event_type),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM s a JOIN s b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT p.type_a, p.type_b, p.n_both,
       sa.n AS n_a, sb.n AS n_b,
       CAST(p.n_both * u.n_users * 1000 // (sa.n * sb.n) AS BIGINT)
         AS lift_x1000
FROM pairs p
JOIN singles sa ON sa.event_type = p.type_a
JOIN singles sb ON sb.event_type = p.type_b
CROSS JOIN u
""",
)
def q_type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type CO-OCCURRENCE with market-basket lift: for every type
    pair, the number of users exhibiting both, and the lift ratio
    P(a∧b)/(P(a)·P(b)) in integer thousandths — the association signal
    behind recommendation and funnel-design decisions.  The self-join
    runs on the DISTINCT (user, type) set — at most |types| rows per user
    — so its size is bounded by 5·|users|, never |events|²; singles and
    the user total are tiny broadcast relations.  Headroom: the
    n_both·n_users·1000 numerator stays under 2^63 through ~3e9 users;
    past that promote it to decimal(38,0)."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.select("user_id", "event_type").distinct()
    u = ev.agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users")
    )
    singles = s.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n")
    )
    a = s.select("user_id", F.col("event_type").alias("type_a"))
    b = s.select(
        F.col("user_id").alias("b_uid"), F.col("event_type").alias("type_b")
    )
    pairs = (
        a.join(
            b,
            (a.user_id == b.b_uid) & (F.col("type_a") < F.col("type_b")),
        )
        .groupBy("type_a", "type_b")
        .agg(F.count("*").cast("bigint").alias("n_both"))
    )
    sa = singles.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("n_a")
    )
    sb = singles.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("n_b")
    )
    return (
        pairs.join(sa, "type_a")
        .join(sb, "type_b")
        .crossJoin(F.broadcast(u))
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            F.expr(
                "cast(n_both * n_users * 1000 div (n_a * n_b) as bigint)"
            ).alias("lift_x1000"),
        )
    )


# ---------------------------------------------------------------------------
# Order backlog time series (interval counting)
# ---------------------------------------------------------------------------

@query(
    "olap_order_backlog",
    oracle="""
WITH o AS (
  SELECT o_orderkey,
         CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS start_day
  FROM orders),
c AS (
  SELECT l_orderkey,
         CAST(MAX(epoch_us(l_shipdate) // 86400000000) AS BIGINT) AS end_day
  FROM lineitem GROUP BY l_orderkey),
iv AS (SELECT o.start_day, c.end_day
       FROM o JOIN c ON c.l_orderkey = o.o_orderkey),
deltas AS (
  SELECT day, SUM(opened) AS n_opened, SUM(closed) AS n_closed
  FROM (
    SELECT start_day AS day, 1 AS opened, 0 AS closed FROM iv
    UNION ALL
    SELECT end_day + 1 AS day, 0 AS opened, 1 AS closed FROM iv) d
  GROUP BY day)
SELECT day,
       CAST(n_opened AS BIGINT) AS n_opened,
       CAST(n_closed AS BIGINT) AS n_closed,
       CAST(SUM(n_opened - n_closed) OVER (ORDER BY day
                                           ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS backlog
FROM deltas
""",
)
def q_order_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order BACKLOG time series by interval counting: each order is open
    from its order date until its last lineitem ships; the daily backlog
    is the running sum of +1/−1 boundary deltas — the classic O(n)
    interval-counting rewrite of the quadratic "count intervals covering
    each day" join.  Raw orders/lineitems reduce to per-DAY deltas before
    any ordered window runs, so the global cumulative sum touches only
    |distinct days| rows (bounded by the calendar, ~2.4k here) — the same
    bounded-domain exception the gap-fill queries document.  Day is
    integer epoch-days; no session-timezone dependence."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
        epoch_micros,
    )

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o = orders.select(
        "o_orderkey",
        int_div(epoch_micros(orders, "o_orderdate"), 86400000000)
        .alias("start_day"),
    )
    c = li.select(
        "l_orderkey",
        int_div(epoch_micros(li, "l_shipdate"), 86400000000)
        .alias("ship_day"),
    ).groupBy("l_orderkey").agg(F.max("ship_day").alias("end_day"))
    iv = o.join(c, o.o_orderkey == c.l_orderkey).select(
        "start_day", "end_day"
    )
    deltas = (
        iv.select(
            F.col("start_day").alias("day"),
            F.lit(1).alias("opened"),
            F.lit(0).alias("closed"),
        )
        .unionAll(
            iv.select(
                (F.col("end_day") + 1).alias("day"),
                F.lit(0).alias("opened"),
                F.lit(1).alias("closed"),
            )
        )
        .groupBy("day")
        .agg(
            F.sum("opened").cast("bigint").alias("n_opened"),
            F.sum("closed").cast("bigint").alias("n_closed"),
        )
    )
    # no-partition window, bounded by contract: one row per calendar DAY
    # (~1e4 over three decades), aggregated before the window — the runtime
    # "WindowExec: No Partition Defined" warning is benign here
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return deltas.select(
        "day",
        "n_opened",
        "n_closed",
        F.sum(F.col("n_opened") - F.col("n_closed"))
        .over(w)
        .cast("bigint")
        .alias("backlog"),
    )


# ---------------------------------------------------------------------------
# Label-margin confidence audit
# ---------------------------------------------------------------------------

@query(
    "pipeline_label_margin",
    bench=True,
    oracle="""
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                                  AS BIGINT)) AS vm
  FROM embeddings),
cent AS (
  SELECT label, CAST(i AS BIGINT) AS pos,
         CAST(SUM(vm[CAST(i AS INT)]) AS BIGINT) AS sv
  FROM e, LATERAL unnest(range(1, 1 + len(vm))) AS t(i)
  GROUP BY 1, 2),
cnorm AS (
  SELECT label,
         SUM(CAST(sv AS DECIMAL(38,0)) * CAST(sv AS DECIMAL(38,0))) AS nc
  FROM cent GROUP BY label),
vx AS (
  SELECT vec_id, label AS own_label, CAST(i AS BIGINT) AS pos,
         vm[CAST(i AS INT)] AS x
  FROM e, LATERAL unnest(range(1, 1 + len(vm))) AS t(i)),
vnorm AS (
  SELECT vec_id,
         SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))) AS nv
  FROM vx GROUP BY vec_id),
dots AS (
  SELECT v.vec_id, v.own_label, c.label AS cand_label,
         SUM(CAST(v.x AS DECIMAL(38,0)) * CAST(c.sv AS DECIMAL(38,0))) AS dp
  FROM vx v JOIN cent c ON c.pos = v.pos
  GROUP BY 1, 2, 3),
cos AS (
  SELECT d.vec_id, d.own_label, d.cand_label,
         ROUND(CAST(d.dp AS DOUBLE)
               / (sqrt(CAST(vn.nv AS DOUBLE)) * sqrt(CAST(cn.nc AS DOUBLE))),
               6) AS c
  FROM dots d
  JOIN vnorm vn ON vn.vec_id = d.vec_id
  JOIN cnorm cn ON cn.label = d.cand_label)
SELECT vec_id, CAST(own_label AS BIGINT) AS label,
       MAX(CASE WHEN cand_label = own_label THEN c END) AS own_cos,
       MAX(CASE WHEN cand_label <> own_label THEN c END) AS best_other_cos,
       ROUND(MAX(CASE WHEN cand_label = own_label THEN c END)
             - MAX(CASE WHEN cand_label <> own_label THEN c END), 6)
         AS margin
FROM cos GROUP BY vec_id, own_label
""",
)
def q_label_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LABEL-MARGIN confidence audit (nearest-class-mean classifier):
    every vector's cosine to its OWN label centroid minus its best cosine
    to any OTHER label centroid — negative margin flags probable label
    noise, the per-example signal behind confident-learning cleanup.

    Numerics follow pipeline_embedding_drift: vectors quantize once to
    integer micro-units, centroids stay as exact integer SUM vectors
    (cosine's scale-invariance makes dividing by counts unnecessary), dot
    products and norms accumulate in decimal(38,0) so nothing overflows
    at any corpus size, and the only float op is the final cosine of
    identical integers.

    Physical shape (r15): the centroid matrix is |labels|·dim bigints —
    bounded driver state, exactly the kmeans-centroid pattern — so it is
    aggregated once (ONE exploded (label, pos) shuffle with map-side
    partials), collected, and re-attached as a single broadcast array row;
    every per-vector cosine then evaluates as a decimal(38,0) fold inside
    one map-only projection. The r14 form materialized the per-(vector,
    label, dim) dot-product relation — |vecs|·dim·|labels| exploded join
    rows through a 64-key equality join plus three aggregate/join exchanges
    of the corpus — to compute the same integer sums this projection folds
    in place (measured 2.62 → 1.47 s isolated; 6 hash shuffles → 1).
    Decimal(38,0) add/multiply is exact integer arithmetic, so the fold
    equals the oracle's SUM in any order."""
    emb = ensure_parallel(load_table(spark, sf_dir, "embeddings"))
    e = emb.select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding,"
            " x -> cast(floor(cast(x as double) * 1000000 + 0.5) as bigint))"
        ).alias("vm"),
    )
    cent = (
        e.select("label", F.posexplode("vm").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.sum("x").cast("bigint").alias("sv"))
        .groupBy("label")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, sv))), s -> s.sv)"
            ).alias("sv_vec")
        )
    )
    import decimal

    rows = cent.collect()  # |labels|·dim bigints — bounded driver state
    cents = sorted(
        (
            int(r["label"]),
            [int(s) for s in r["sv_vec"]],
            decimal.Decimal(sum(int(s) * int(s) for s in r["sv_vec"])),
        )
        for r in rows
    )
    cents_df = spark.createDataFrame(
        [(cents,)],
        "cents array<struct<label: bigint, sv: array<bigint>, nc: decimal(38,0)>>",
    )
    dfold = (
        "aggregate(zip_with(vm, {v}, (a, b) -> "
        "cast(a as decimal(38,0)) * cast(b as decimal(38,0))), "
        "cast(0 as decimal(38,0)), (acc, x) -> acc + x)"
    )
    scored = (
        e.crossJoin(F.broadcast(cents_df))
        .withColumn("nv", F.expr(dfold.format(v="vm")))
        .withColumn(
            "cs",
            F.expr(
                "transform(cents, c -> struct(c.label AS cand_label, "
                "round(cast(" + dfold.format(v="c.sv") + " as double)"
                " / (sqrt(cast(nv as double)) * sqrt(cast(c.nc as double))), 6)"
                " AS c))"
            ),
        )
    )
    own = F.expr("filter(cs, s -> s.cand_label = label)[0].c")
    other = F.expr(
        "array_max(transform(filter(cs, s -> s.cand_label != label), s -> s.c))"
    )
    return scored.select(
        "vec_id",
        F.col("label").cast("bigint").alias("label"),
        own.alias("own_cos"),
        other.alias("best_other_cos"),
        F.round(own - other, 6).alias("margin"),
    )


# ---------------------------------------------------------------------------
# kNN label-noise detection
# ---------------------------------------------------------------------------

@query(
    "pipeline_knn_label_agreement",
    oracle=f"""
WITH ev AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
q AS (SELECT * FROM ev WHERE vec_id % 10 = 0 AND vec_id < 10000),
nn AS (
  SELECT vec_id, n_label FROM (
    SELECT q.vec_id, c.label AS n_label,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY ROUND(list_cosine_similarity(q.v, c.v), 6) DESC,
                      c.vec_id
           ) AS rnk
    FROM q JOIN ev c ON c.vec_id <> q.vec_id)
  WHERE rnk <= {_RECALL_K})
SELECT q.vec_id, CAST(q.label AS BIGINT) AS label,
       CAST(COUNT(*) FILTER (WHERE nn.n_label = q.label) AS BIGINT)
         AS n_same_label,
       CAST(COUNT(*) FILTER (WHERE nn.n_label = q.label) * 1000000
            // {_RECALL_K} AS BIGINT) AS agree_ppm
FROM q JOIN nn ON nn.vec_id = q.vec_id
GROUP BY q.vec_id, q.label
""",
)
def q_knn_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN LABEL AGREEMENT — noisy-label detection: for the bounded query
    sample, what fraction of each vector's exact top-{_RECALL_K} cosine
    neighbors share its label.  Low agreement flags the examples
    confident-learning workflows re-annotate first.  Same bounded-sample
    broadcast + exact-top-k arm as ann_recall_audit (ranks tie-break on
    (rounded cosine, id)); the label join rides the same row, so the
    whole audit is one scan over the corpus per query batch."""
    from sqlserver_cdc_to_kafka_spark.pipeline.similarity import (
        as_double_array,
        dot,
        l2_norm,
    )

    emb = ensure_parallel(load_table(spark, sf_dir, "embeddings"))
    ev = emb.select(
        "vec_id", "label", as_double_array("embedding").alias("v")
    ).withColumn("nrm", l2_norm(F.col("v")))
    q = ev.filter(
        (F.col("vec_id") % 10 == 0) & (F.col("vec_id") < 10000)
    ).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    cos = F.round(
        dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("vec_id")
    )
    nn = (
        ev.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "q_label",
            "vec_id",
            F.col("label").alias("n_label"),
            cos.alias("cos"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _RECALL_K)
    )
    return nn.groupBy(
        F.col("q_id").alias("vec_id"),
        F.col("q_label").cast("bigint").alias("label"),
    ).agg(
        F.sum(F.when(F.col("n_label") == F.col("q_label"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_same_label"),
        F.expr(
            f"cast(sum(case when n_label = q_label then 1 else 0 end)"
            f" * 1000000 div {_RECALL_K} as bigint)"
        ).alias("agree_ppm"),
    )


# ---------------------------------------------------------------------------
# Pareto revenue coverage
# ---------------------------------------------------------------------------

@query(
    "olap_revenue_pareto",
    oracle="""
WITH rev AS (
  SELECT o.o_custkey AS custkey, n.n_name AS nation,
         CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                       AS DECIMAL(18,2)) * 100) AS BIGINT) AS rev_cents
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2),
ranked AS (
  SELECT nation, custkey, rev_cents,
         SUM(rev_cents) OVER (PARTITION BY nation
                              ORDER BY rev_cents DESC, custkey
                              ROWS UNBOUNDED PRECEDING) AS cum_cents,
         SUM(rev_cents) OVER (PARTITION BY nation) AS tot_cents,
         row_number() OVER (PARTITION BY nation
                            ORDER BY rev_cents DESC, custkey) AS rnk
  FROM rev),
hit AS (
  SELECT nation, rnk, cum_cents, tot_cents,
         CASE WHEN cum_cents * 5 >= tot_cents * 4 THEN 1 ELSE 0 END
           AS covered
  FROM ranked)
SELECT nation,
       CAST(MAX(rnk) AS BIGINT) AS n_customers,
       CAST(MIN(CASE WHEN covered = 1 THEN rnk END) AS BIGINT)
         AS n_for_80pct,
       CAST(MIN(CASE WHEN covered = 1 THEN rnk END) * 1000000
            // MAX(rnk) AS BIGINT) AS concentration_ppm
FROM hit GROUP BY nation
""",
)
def q_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REVENUE PARETO concentration per nation: the smallest number of
    customers whose (descending) revenue covers 80% of the nation's total
    — the 80/20 concentration audit behind account-prioritization and
    risk analysis.  The 80% test is integer-exact (cum·5 ≥ tot·4 on
    cents, no float share).  Revenue first collapses to one row per
    customer (hash aggregate), so the per-nation rank window runs over
    customers, not lineitems; partitioning by nation keeps every sort
    local to its group."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("o_custkey").alias("custkey"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).cast("decimal(18,2)")
                * 100
            )
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    wcum = (
        Window.partitionBy("nation")
        .orderBy(F.col("rev_cents").desc(), "custkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("nation")
    wrnk = Window.partitionBy("nation").orderBy(
        F.col("rev_cents").desc(), "custkey"
    )
    ranked = rev.select(
        "nation",
        F.sum("rev_cents").over(wcum).alias("cum_cents"),
        F.sum("rev_cents").over(wtot).alias("tot_cents"),
        F.row_number().over(wrnk).alias("rnk"),
    ).withColumn(
        "covered",
        F.when(
            F.col("cum_cents") * 5 >= F.col("tot_cents") * 4, 1
        ).otherwise(0),
    )
    return ranked.groupBy("nation").agg(
        F.max("rnk").cast("bigint").alias("n_customers"),
        F.min(F.when(F.col("covered") == 1, F.col("rnk")))
        .cast("bigint")
        .alias("n_for_80pct"),
        F.expr(
            "cast(min(case when covered = 1 then rnk end) * 1000000"
            " div max(rnk) as bigint)"
        ).alias("concentration_ppm"),
    )


# ---------------------------------------------------------------------------
# Vocabulary pruning sweep (coverage curve)
# ---------------------------------------------------------------------------

_VOCAB_SWEEP = (16, 32, 64, 128)


@query(
    "pipeline_vocab_prune_sweep",
    oracle=f"""
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
freq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY w),
ranked AS (
  SELECT n,
         row_number() OVER (ORDER BY n DESC, w) AS rnk,
         SUM(n) OVER (ORDER BY n DESC, w ROWS UNBOUNDED PRECEDING) AS cum
  FROM freq),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_words FROM freq),
ks AS (SELECT unnest([{", ".join(str(k) for k in _VOCAB_SWEEP)}]) AS vocab_k)
SELECT CAST(k.vocab_k AS BIGINT) AS vocab_k,
       CAST(LEAST(k.vocab_k, t.n_words) AS BIGINT) AS n_vocab_words,
       CAST(MAX(r.cum) AS BIGINT) AS covered_tokens,
       t.total AS total_tokens,
       CAST(MAX(r.cum) * 1000000 // t.total AS BIGINT) AS coverage_ppm
FROM ks k CROSS JOIN tot t
JOIN ranked r ON r.rnk <= k.vocab_k
GROUP BY k.vocab_k, t.n_words, t.total
""",
)
def q_vocab_prune_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary PRUNING SWEEP — the tokenizer-sizing curve: corpus token
    coverage at vocab sizes {_VOCAB_SWEEP}, from ONE frequency pass (the
    per-K alternative re-joins the corpus once per candidate size).  The
    rank/cumulative window runs over the word-frequency table — bounded
    by vocabulary (Heaps' law), not corpus size — and each sweep point
    reads its cumulative coverage off that one relation via a 4-row
    broadcast join.  Integer ppm output."""
    docs = _docs(spark, sf_dir)
    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    # only ranks <= max sweep point matter downstream, so take the top-K
    # DISTRIBUTED first (TakeOrderedAndProject — per-partition heaps, no
    # shuffle of the full vocabulary) and window over those <=K rows; the
    # previous form ran rank+cumsum over the ENTIRE word-frequency table
    # through one task (Heaps-bounded, but ~1e9 words at 100 TB of text —
    # the r11 single-partition-window audit's worst offender)
    top_k = freq.orderBy(F.col("n").desc(), "w").limit(max(_VOCAB_SWEEP))
    # the ~13 runtime "WindowExec: No Partition Defined" warnings in a full
    # oracle sweep fire from HERE and are benign: the windowed relation is
    # pre-limited to max(_VOCAB_SWEEP) rows, so PLANSCAN's winSP=0 is
    # correct — no Exchange SinglePartition of unbounded data feeds these
    wrank = Window.orderBy(F.col("n").desc(), "w")
    ranked = top_k.select(
        "n",
        F.row_number().over(wrank).alias("rnk"),
        F.sum("n")
        .over(wrank.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
    )
    tot = freq.agg(
        F.sum("n").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("n_words"),
    )
    ks = docs.sparkSession.createDataFrame(
        [(k,) for k in _VOCAB_SWEEP], "vocab_k int"
    )
    return (
        ranked.join(
            F.broadcast(ks), F.col("rnk") <= F.col("vocab_k"), "inner"
        )
        .crossJoin(F.broadcast(tot))
        .groupBy(
            F.col("vocab_k").cast("bigint").alias("vocab_k"),
            "n_words",
            "total",
        )
        .agg(F.max("cum").cast("bigint").alias("covered_tokens"))
        .select(
            "vocab_k",
            F.least(F.col("vocab_k"), F.col("n_words"))
            .cast("bigint")
            .alias("n_vocab_words"),
            "covered_tokens",
            F.col("total").alias("total_tokens"),
            F.expr(
                "cast(covered_tokens * 1000000 div total as bigint)"
            ).alias("coverage_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Python UDTF surface witness (lateral chunk expansion)
# ---------------------------------------------------------------------------

_UDTF_CHUNK = 500
_UDTF_STRIDE = 400


@query(
    "fn_udtf_chunker",
    oracle=f"""
WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
c AS (SELECT doc_id, text,
             unnest(range(0, 1 + (greatest(n - {_UDTF_CHUNK}, 0)
                                  + {_UDTF_STRIDE} - 1)
                             // {_UDTF_STRIDE})) AS idx
      FROM d)
SELECT doc_id, CAST(idx AS BIGINT) AS chunk_idx,
       CAST(length(substr(text, CAST(idx * {_UDTF_STRIDE} + 1 AS INT),
                          {_UDTF_CHUNK})) AS BIGINT) AS chunk_chars,
       md5(substr(text, CAST(idx * {_UDTF_STRIDE} + 1 AS INT),
                  {_UDTF_CHUNK})) AS chunk_hash
FROM c
""",
)
def q_udtf_chunker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface WITNESS: the overlapping chunker re-expressed
    as a Spark 4 user-defined table function applied via SQL LATERAL —
    one input row fans out to a variable number of output rows inside the
    UDTF's ``eval`` generator, the API for expansions too irregular for
    ``explode(transform(...))``.  Must stay hash-identical to the
    pure-expression chunker (pipeline_chunk_overlap), which remains the
    scale path: a UDTF crosses the Python boundary per row, so it's the
    capability witness, not the hot path — same fencing rationale as the
    Avro wire codec witness.  Defined inside the query fn (cloudpickle by
    value, the repo's worker-import rule for Python-side code)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx: bigint, chunk_chars: bigint, chunk_hash: string")
    class Chunker:
        def eval(self, text: str):
            import hashlib

            if text is None:
                return
            n = len(text)
            n_chunks = 1 + max(0, (max(n - _UDTF_CHUNK, 0) + _UDTF_STRIDE - 1)
                               // _UDTF_STRIDE)
            for i in range(n_chunks):
                piece = text[i * _UDTF_STRIDE: i * _UDTF_STRIDE + _UDTF_CHUNK]
                yield (
                    i,
                    len(piece),
                    hashlib.md5(piece.encode("utf-8")).hexdigest(),
                )

    spark.udtf.register("chunker_udtf", Chunker)
    docs = _docs(spark, sf_dir)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.chunk_chars, c.chunk_hash "
        "FROM _udtf_docs d, LATERAL chunker_udtf(d.text) c"
    )


# ---------------------------------------------------------------------------
# Market-basket part affinity
# ---------------------------------------------------------------------------

@query(
    "olap_basket_affinity",
    oracle="""
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS part_a, b2.l_partkey AS part_b,
         CAST(COUNT(*) AS BIGINT) AS n_orders_both
  FROM b a JOIN b b2
    ON a.l_orderkey = b2.l_orderkey AND a.l_partkey < b2.l_partkey
  GROUP BY 1, 2)
SELECT part_a, part_b, n_orders_both
FROM pairs
QUALIFY row_number() OVER (ORDER BY n_orders_both DESC, part_a, part_b) <= 20
""",
)
def q_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MARKET-BASKET affinity: the top-20 part pairs most often bought in
    the same order — the association-rule support count behind
    cross-sell/bundling.  Baskets reduce to DISTINCT (order, part) first;
    the within-order self-join fan-out is Σ C(|basket|,2), bounded by the
    small per-order basket (≈4–7 parts on this schema) — linear in
    orders, never |lineitem|².  The top-20 is a bounded
    TakeOrderedAndProject over the pair counts, not a global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select("l_orderkey", "l_partkey").distinct()
    a = b.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b2 = b.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(
            b2,
            (F.col("ok") == F.col("ok2"))
            & (F.col("part_a") < F.col("part_b")),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count("*").cast("bigint").alias("n_orders_both"))
    )
    # TakeOrderedAndProject (distributed top-N), NOT a row_number window:
    # the pair relation is unbounded at scale and a global rank window
    # would funnel it through one partition.
    return pairs.orderBy(
        F.col("n_orders_both").desc(), "part_a", "part_b"
    ).limit(20)


# ---------------------------------------------------------------------------
# Customer churn gap
# ---------------------------------------------------------------------------

_CHURN_DAYS = 365


@query(
    "olap_customer_churn",
    oracle=f"""
WITH last_order AS (
  SELECT o_custkey,
         CAST(MAX(epoch_us(o_orderdate) // 86400000000) AS BIGINT)
           AS last_day
  FROM orders GROUP BY o_custkey),
horizon AS (SELECT CAST(MAX(last_day) AS BIGINT) AS end_day FROM last_order),
gaps AS (
  SELECT n.n_name AS nation, h.end_day - lo.last_day AS gap_days
  FROM last_order lo
  JOIN customer c ON c.c_custkey = lo.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  CROSS JOIN horizon h)
SELECT nation,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(COUNT(*) FILTER (WHERE gap_days > {_CHURN_DAYS}) AS BIGINT)
         AS n_churned,
       CAST(COUNT(*) FILTER (WHERE gap_days > {_CHURN_DAYS}) * 1000000
            // COUNT(*) AS BIGINT) AS churn_ppm,
       CAST(MAX(gap_days) AS BIGINT) AS max_gap_days
FROM gaps GROUP BY nation
""",
)
def q_customer_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer CHURN rollup: per nation, how many active customers have
    not ordered within {_CHURN_DAYS} days of the corpus horizon (the max
    last-order day — a scalar aggregate broadcast, so "today" is derived
    from the data, not the wall clock: deterministic under replay).
    Integer epoch-day arithmetic throughout; one aggregate per customer,
    one per nation."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
        epoch_micros,
    )

    last_order = orders.select(
        "o_custkey",
        int_div(epoch_micros(orders, "o_orderdate"), 86400000000)
        .alias("day"),
    ).groupBy("o_custkey").agg(F.max("day").alias("last_day"))
    horizon = last_order.agg(
        F.max("last_day").cast("bigint").alias("end_day")
    )
    gaps = (
        last_order.join(cust, last_order.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .crossJoin(F.broadcast(horizon))
        .select(
            F.col("n_name").alias("nation"),
            (F.col("end_day") - F.col("last_day")).alias("gap_days"),
        )
    )
    churned = F.sum(
        F.when(F.col("gap_days") > _CHURN_DAYS, 1).otherwise(0)
    )
    return gaps.groupBy("nation").agg(
        F.count("*").cast("bigint").alias("n_customers"),
        churned.cast("bigint").alias("n_churned"),
        F.expr(
            f"cast(sum(case when gap_days > {_CHURN_DAYS} then 1 else 0 end)"
            " * 1000000 div count(*) as bigint)"
        ).alias("churn_ppm"),
        F.max("gap_days").cast("bigint").alias("max_gap_days"),
    )


# ---------------------------------------------------------------------------
# Time-series similarity search (user activity profiles)
# ---------------------------------------------------------------------------

_TS_DAY_US = 86_400_000_000


@query(
    "ts_user_similarity_topk",
    bench=False,  # documented exact baseline; bench runs the _scalable form
    oracle=f"""
WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
t0 AS (SELECT CAST(MIN(us) AS BIGINT) AS start_us,
              CAST((MAX(us) - MIN(us)) // {_TS_DAY_US} + 1 AS BIGINT)
                AS n_buckets
       FROM ev),
counts AS (
  SELECT user_id,
         CAST((us - t0.start_us) // {_TS_DAY_US} AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM ev CROSS JOIN t0 GROUP BY 1, 2),
users AS (SELECT DISTINCT user_id FROM ev),
grid AS (
  SELECT u.user_id, CAST(b AS BIGINT) AS bucket
  FROM users u CROSS JOIN t0, LATERAL unnest(range(0, t0.n_buckets)) AS g(b)),
dense AS (
  SELECT g.user_id, g.bucket, COALESCE(c.c, 0) AS c
  FROM grid g LEFT JOIN counts c
    ON c.user_id = g.user_id AND c.bucket = g.bucket),
pairs AS (
  SELECT a.user_id AS user_a, b.user_id AS user_b,
         CAST(SUM((a.c - b.c) * (a.c - b.c)) AS BIGINT) AS dist2
  FROM dense a JOIN dense b
    ON a.bucket = b.bucket AND a.user_id < b.user_id
  GROUP BY 1, 2)
SELECT user_a, user_b, dist2
FROM pairs
QUALIFY row_number() OVER (ORDER BY dist2, user_a, user_b) <= 20
""",
)
def q_ts_user_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-SERIES SIMILARITY search: each user becomes a daily activity-
    count vector on a data-derived grid (min-timestamp origin — replay-
    deterministic, no wall clock), and the top-20 most similar user pairs
    are ranked by INTEGER squared-L2 distance — fully exact, no floats
    anywhere.  This is the distributed form of the streaming-similarity
    problem (EDBT'19 shape): profile vectors aggregate first (|users| ≪
    |events|), and the pair space here is the documented exact BASELINE
    over the aggregate — an all-pairs self-join on the day bucket, kept
    registered for auditability but NOT benched: the production form is
    ``ts_user_similarity_topk_scalable`` (same rows, same oracle), whose
    cogrouped block-matrix kernel never shuffles the pair space and has
    no skewed join key.  Zero-filled grid via a broadcast (user × bucket)
    frame so absent days count as distance, not as missing rows; top-20
    is a bounded TakeOrdered, never a global sort."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
        epoch_micros,
    )

    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "user_id", epoch_micros(events, "ts").alias("us")
    )
    t0 = ev.agg(
        F.min("us").cast("bigint").alias("start_us"),
        int_div(F.max("us") - F.min("us"), _TS_DAY_US).alias("nb_minus"),
    ).select(
        "start_us", (F.col("nb_minus") + 1).alias("n_buckets")
    )
    counts = (
        ev.crossJoin(F.broadcast(t0))
        .select(
            "user_id",
            int_div(F.col("us") - F.col("start_us"), _TS_DAY_US)
            .alias("bucket"),
        )
        .groupBy("user_id", "bucket")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    users = ev.select("user_id").distinct()
    grid = users.crossJoin(F.broadcast(t0)).select(
        "user_id",
        F.explode(F.expr("sequence(0, n_buckets - 1)")).alias("bucket"),
    )
    dense = (
        grid.join(counts, ["user_id", "bucket"], "left")
        .select(
            "user_id", "bucket", F.coalesce(F.col("c"), F.lit(0)).alias("c")
        )
    )
    a = dense.select(
        F.col("user_id").alias("user_a"),
        F.col("bucket").alias("ba"),
        F.col("c").alias("ca"),
    )
    b = dense.select(
        F.col("user_id").alias("user_b"),
        F.col("bucket").alias("bb"),
        F.col("c").alias("cb"),
    )
    pairs = (
        a.join(
            b,
            (F.col("ba") == F.col("bb"))
            & (F.col("user_a") < F.col("user_b")),
        )
        .groupBy("user_a", "user_b")
        .agg(
            F.sum(
                (F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb"))
            )
            .cast("bigint")
            .alias("dist2")
        )
    )
    # distributed top-N over the unbounded pair relation (see
    # olap_basket_affinity) — never a global rank window
    return pairs.orderBy("dist2", "user_a", "user_b").limit(20)


_TS_SIM_BLOCKS = 8  # minimum hash blocks; scale knob, see docstring
_TS_SIM_BLOCK_TARGET = 16384  # target users per block — bounds a cell's Arrow batch
_TS_SIM_TILE = 1024  # kernel row-tile — bounds per-worker distance-matrix memory


@query(
    "ts_user_similarity_topk_scalable",
    bench=True,
    oracle=f"""
WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
t0 AS (SELECT CAST(MIN(us) AS BIGINT) AS start_us,
              CAST((MAX(us) - MIN(us)) // {_TS_DAY_US} + 1 AS BIGINT)
                AS n_buckets
       FROM ev),
counts AS (
  SELECT user_id,
         CAST((us - t0.start_us) // {_TS_DAY_US} AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM ev CROSS JOIN t0 GROUP BY 1, 2),
users AS (SELECT DISTINCT user_id FROM ev),
grid AS (
  SELECT u.user_id, CAST(b AS BIGINT) AS bucket
  FROM users u CROSS JOIN t0, LATERAL unnest(range(0, t0.n_buckets)) AS g(b)),
dense AS (
  SELECT g.user_id, g.bucket, COALESCE(c.c, 0) AS c
  FROM grid g LEFT JOIN counts c
    ON c.user_id = g.user_id AND c.bucket = g.bucket),
pairs AS (
  SELECT a.user_id AS user_a, b.user_id AS user_b,
         CAST(SUM((a.c - b.c) * (a.c - b.c)) AS BIGINT) AS dist2
  FROM dense a JOIN dense b
    ON a.bucket = b.bucket AND a.user_id < b.user_id
  GROUP BY 1, 2)
SELECT user_a, user_b, dist2
FROM pairs
QUALIFY row_number() OVER (ORDER BY dist2, user_a, user_b) <= 20
""",
)
def q_ts_user_similarity_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALE path for ts_user_similarity_topk — EXACT block-matrix top-k,
    not an approximation.  The exact baseline's pair stage self-joins the
    dense user×day grid on bucket equality: the shuffle key is the day
    bucket (30 distinct values here — parallelism capped at |days| and
    skewed by construction) and it materializes O(U²·days) joined rows.
    A sign-LSH candidate route (pipeline/similarity.py) was measured
    first and rejected: on this corpus (short dense count vectors,
    near-uniform pair-distance distribution — top-20 dist2 ≈ 34 vs
    median ≈ 130 at sf0.1) banding reached only 13–19/20 recall while
    still emitting 34–65% of all pairs; uniform data is LSH's lower-bound
    regime, so the honest scalable design keeps exactness and fixes the
    SHUFFLE instead:

      1. collapse each user to ONE dense bigint vector (groupBy user —
         a well-distributed key — then map_from_entries + sequence fill,
         all JVM-side; dim = day span, bounded by time not data);
      2. hash users into B = {_TS_SIM_BLOCKS} blocks (md5 idiom, engine-
         portable) and cogroup the B(B+1)/2 unordered block pairs: the
         A side of block i fans out to cells (i, j ≥ i), the B side of
         block j to cells (i ≤ j, j), so every user pair lands in exactly
         one cell and every cell holds ~(U/B)² pairs — UNIFORM cost, no
         skew, parallelism B(B+1)/2 (tune B ≈ 4·√cores at cluster scale;
         replication factor is B, so B also bounds the per-cell Arrow
         batch at U/B · dim · 8 bytes per side);
      3. per cell, one Arrow-batched numpy int64 matmul scores the whole
         (U/B)×(U/B) distance matrix (‖a‖² + ‖b‖² − 2·A·Bᵀ — exact
         integer math, hash-identical to the SQL oracle) and emits only
         the cell-local top-20 under the global tiebreak, so the global
         stage sorts B(B+1)/2 · 20 rows, never the pair space.

    The pair space is never shuffled or materialized as rows — it exists
    only as per-cell ROW TILES inside the vectorized kernel (the brief's
    sanctioned applyInPandas shape for dense linear algebra).  Round-9
    sf10 probe (100× sf0.1, 150k users): materializing a whole cell's
    (U/B)² distance matrix at B=8 allocated ~2.8 GB × several temporaries
    × 32 concurrent workers and OOM-killed the box, so the kernel now
    (a) evaluates each cell in {_TS_SIM_TILE}-row tiles with an exact
    running top-20 (per-tile threshold keeps ALL boundary ties, so
    dist2-tie pairs still resolve by the global (user_a, user_b)
    tiebreak — memory is bounded by tile × U/B regardless of cell size)
    and (b) scales the block count with the corpus, B = max(knob,
    ceil(U / {_TS_SIM_BLOCK_TARGET})), via one shuffle-free
    approx_count_distinct sketch job (B needs an estimate, not a count),
    so a cell's Arrow batch stays bounded at any SF while cell count —
    and with it cluster parallelism — grows with U².
    Local-top20-then-global-top20 is exactly correct because cells
    partition the pair space.  Oracle: the SAME dense-grid SQL as the
    exact baseline — this query must reproduce it bit-for-bit, and
    test_ts_similarity_scalable_agreement pins Spark-vs-Spark equality
    of the two forms as well."""
    import numpy as np
    import pandas as pd

    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
        epoch_micros,
    )

    events = load_table(spark, sf_dir, "events")
    ev = events.select("user_id", epoch_micros(events, "ts").alias("us"))
    # B needs only an ESTIMATE of the corpus size (any B is exact — cells
    # always partition the pair space, pinned by the block-count-invariance
    # tests), so size it with a single-pass HLL sketch: map-side partials,
    # one tiny merge, no shuffle of distinct ids.  An exact
    # distinct().count() here would shuffle every distinct user id across
    # the cluster just to pick a partitioning knob.
    n_users = int(
        ev.agg(F.approx_count_distinct("user_id").alias("u")).collect()[0]["u"]
    )
    B = max(_TS_SIM_BLOCKS, -(-n_users // _TS_SIM_BLOCK_TARGET))
    t0 = ev.agg(
        F.min("us").cast("bigint").alias("start_us"),
        int_div(F.max("us") - F.min("us"), _TS_DAY_US).alias("nb_minus"),
    ).select("start_us", (F.col("nb_minus") + 1).alias("n_buckets"))
    counts = (
        ev.crossJoin(F.broadcast(t0))
        .select(
            "user_id",
            int_div(F.col("us") - F.col("start_us"), _TS_DAY_US)
            .alias("bucket"),
        )
        .groupBy("user_id", "bucket")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    vec = (
        counts.groupBy("user_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("bucket", "c"))
            ).alias("m")
        )
        .crossJoin(F.broadcast(t0))
        .select(
            "user_id",
            F.transform(
                F.expr("sequence(cast(0 as bigint), n_buckets - 1)"),
                lambda i: F.coalesce(F.col("m")[i], F.lit(0)).cast("bigint"),
            ).alias("v"),
        )
    )
    blocked = vec.withColumn(
        "beta",
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint")
            % B
        ).cast("int"),
    )
    a_side = blocked.withColumn(
        "j", F.explode(F.expr(f"sequence(beta, {B - 1})"))
    ).select(F.col("beta").alias("i"), F.col("j").cast("int"), "user_id", "v")
    # distinct output names on the B side mint fresh attribute ids, so the
    # cogroup of two projections of the same lineage is not ambiguous
    b_side = blocked.withColumn(
        "i", F.explode(F.expr("sequence(0, beta)"))
    ).select(
        F.col("i").cast("int").alias("ib"),
        F.col("beta").alias("jb"),
        F.col("user_id").alias("user_id_b"),
        F.col("v").alias("vb"),
    )

    out_schema = "user_a bigint, user_b bigint, dist2 bigint"

    def cell_topk(key, left: pd.DataFrame, right: pd.DataFrame):
        i, j = int(key[0]), int(key[1])
        empty = pd.DataFrame(
            {
                "user_a": pd.Series([], dtype="int64"),
                "user_b": pd.Series([], dtype="int64"),
                "dist2": pd.Series([], dtype="int64"),
            }
        )
        if left.empty or right.empty:
            return empty
        A = np.array(left["v"].tolist(), dtype=np.int64)
        Bm = np.array(right["vb"].tolist(), dtype=np.int64)
        ua = left["user_id"].to_numpy(dtype=np.int64)
        ub = right["user_id_b"].to_numpy(dtype=np.int64)
        nb = (Bm * Bm).sum(axis=1)
        sentinel = np.iinfo(np.int64).max
        # row-tiled evaluation: never materialize the whole (U/B)² cell
        # matrix (the round-9 sf10 OOM) — peak memory is tile × |right|.
        # Exactness under dist2 ties: a tile keeps EVERY pair at or below
        # its 20th-smallest dist2 (not an arbitrary 20), so the final
        # lexsort still applies the global (dist2, user_a, user_b)
        # tiebreak over a candidate superset of the true top-20.
        cand: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        for s in range(0, A.shape[0], _TS_SIM_TILE):
            At = A[s : s + _TS_SIM_TILE]
            uat = ua[s : s + _TS_SIM_TILE]
            na = (At * At).sum(axis=1)
            d2 = na[:, None] + nb[None, :] - 2 * (At @ Bm.T)
            if i == j:
                # both sides carry block i: strict upper triangle by user
                # id covers each unordered pair exactly once, excludes self
                d2 = np.where(uat[:, None] < ub[None, :], d2, sentinel)
            flat = d2.ravel()
            k = min(20, flat.size)
            thr = np.partition(flat, k - 1)[k - 1]
            if thr == sentinel:  # fewer than 20 valid pairs in this tile
                sel = np.flatnonzero(flat < sentinel)
            else:
                sel = np.flatnonzero(flat <= thr)
            if sel.size == 0:
                continue
            r_i, c_i = np.unravel_index(sel, d2.shape)
            va, vb = uat[r_i], ub[c_i]
            cand.append(
                (flat[sel], np.minimum(va, vb), np.maximum(va, vb))
            )
        if not cand:
            return empty
        pd2 = np.concatenate([c[0] for c in cand])
        pa = np.concatenate([c[1] for c in cand])
        pb = np.concatenate([c[2] for c in cand])
        order = np.lexsort((pb, pa, pd2))[:20]
        return pd.DataFrame(
            {"user_a": pa[order], "user_b": pb[order], "dist2": pd2[order]}
        )

    cells = (
        a_side.groupBy("i", "j")
        .cogroup(b_side.groupBy("ib", "jb"))
        .applyInPandas(cell_topk, out_schema)
    )
    # global winner selection over B(B+1)/2 · 20 rows — bounded, never the
    # pair space
    return cells.orderBy("dist2", "user_a", "user_b").limit(20)


# ---------------------------------------------------------------------------
# Path mining: top event-type trigrams
# ---------------------------------------------------------------------------

@query(
    "events_top_paths",
    oracle="""
WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
            FROM events),
seq AS (
  SELECT user_id, event_type AS t3,
         lag(event_type, 1) OVER w AS t2,
         lag(event_type, 2) OVER w AS t1
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
paths AS (
  SELECT t1 || '>' || t2 || '>' || t3 AS path, COUNT(*) AS n
  FROM seq WHERE t1 IS NOT NULL GROUP BY 1)
SELECT path, CAST(n AS BIGINT) AS n
FROM paths
QUALIFY row_number() OVER (ORDER BY n DESC, path) <= 15
""",
)
def q_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PATH MINING: the 15 most common 3-step event-type sequences across
    all user histories — the "what do users actually do" report that
    seeds funnel definitions (events_funnel_conversion then measures the
    chosen one).  Two lag() taps over one per-user window (partitioned,
    ordered by (ts, event_id) — no global sort), a hash count on the
    |types|³-bounded path space, and a bounded top-15."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
        epoch_micros,
    )

    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "user_id",
        "event_type",
        epoch_micros(events, "ts").alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    seq = ev.select(
        F.col("event_type").alias("t3"),
        F.lag("event_type", 1).over(w).alias("t2"),
        F.lag("event_type", 2).over(w).alias("t1"),
    ).filter(F.col("t1").isNotNull())
    paths = seq.select(
        F.concat_ws(">", "t1", "t2", "t3").alias("path")
    ).groupBy("path").agg(F.count("*").cast("bigint").alias("n"))
    # top-15 via orderBy+limit (TakeOrderedAndProject — no rank window;
    # the path space is |types|³-bounded anyway, but this shape is free)
    return paths.orderBy(F.col("n").desc(), "path").limit(15).select("path", "n")


# ---------------------------------------------------------------------------
# Exact KS drift statistic between splits
# ---------------------------------------------------------------------------

@query(
    "pipeline_ks_length_drift",
    oracle="""
WITH d AS (
  SELECT source, n_chars,
         CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                   AS BIGINT) % 100 < 95
              THEN 1 ELSE 0 END AS is_train
  FROM documents),
tot AS (
  SELECT source,
         CAST(SUM(is_train) AS BIGINT) AS n_train,
         CAST(SUM(1 - is_train) AS BIGINT) AS n_eval
  FROM d GROUP BY source
  HAVING SUM(is_train) > 0 AND SUM(1 - is_train) > 0),
vals AS (
  SELECT source, n_chars,
         CAST(SUM(is_train) AS BIGINT) AS ct,
         CAST(SUM(1 - is_train) AS BIGINT) AS ce
  FROM d GROUP BY source, n_chars),
cum AS (
  SELECT source,
         SUM(ct) OVER (PARTITION BY source ORDER BY n_chars
                       ROWS UNBOUNDED PRECEDING) AS cum_t,
         SUM(ce) OVER (PARTITION BY source ORDER BY n_chars
                       ROWS UNBOUNDED PRECEDING) AS cum_e
  FROM vals),
ks AS (
  SELECT c.source,
         CAST(MAX(abs(c.cum_t * t.n_eval - c.cum_e * t.n_train)) AS BIGINT)
           AS max_cross
  FROM cum c JOIN tot t USING (source)
  GROUP BY c.source)
SELECT t.source, t.n_train, t.n_eval,
       CAST(k.max_cross * 1000000 // (t.n_train * t.n_eval) AS BIGINT)
         AS ks_ppm
FROM tot t JOIN ks k USING (source)
""",
)
def q_ks_length_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT two-sample Kolmogorov–Smirnov drift statistic between the
    train and eval splits, per source, on the document-length
    distribution — the text-side complement of pipeline_embedding_drift
    (same md5 split hash, so it audits the REAL split).  The KS supremum
    is computed INTEGER-EXACTLY: D = max |cumT·nE − cumE·nT| / (nT·nE)
    over observed values, in ppm — no float CDFs, so the hash gate
    applies.  Lengths first collapse to per-(source, value) counts, so
    the ordered window runs over distinct lengths per source (bounded
    domain), not over documents."""
    docs = _docs(spark, sf_dir)
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint") % 100
    d = docs.select(
        "source",
        "n_chars",
        F.when(bucket < 95, 1).otherwise(0).alias("is_train"),
    )
    tot = (
        d.groupBy("source")
        .agg(
            F.sum("is_train").cast("bigint").alias("n_train"),
            F.sum(1 - F.col("is_train")).cast("bigint").alias("n_eval"),
        )
        .filter((F.col("n_train") > 0) & (F.col("n_eval") > 0))
    )
    vals = d.groupBy("source", "n_chars").agg(
        F.sum("is_train").cast("bigint").alias("ct"),
        F.sum(1 - F.col("is_train")).cast("bigint").alias("ce"),
    )
    wcum = (
        Window.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = vals.select(
        "source",
        F.sum("ct").over(wcum).alias("cum_t"),
        F.sum("ce").over(wcum).alias("cum_e"),
    )
    ks = (
        cum.join(tot, "source")
        .groupBy("source")
        .agg(
            F.max(
                F.abs(
                    F.col("cum_t") * F.col("n_eval")
                    - F.col("cum_e") * F.col("n_train")
                )
            )
            .cast("bigint")
            .alias("max_cross")
        )
    )
    return tot.join(ks, "source").select(
        "source",
        "n_train",
        "n_eval",
        F.expr(
            "cast(max_cross * 1000000 div (n_train * n_eval) as bigint)"
        ).alias("ks_ppm"),
    )


# ---------------------------------------------------------------------------
# Distinctive vocabulary per source (keyness)
# ---------------------------------------------------------------------------

_KEY_MIN_COUNT = 20


@query(
    "text_source_keyness",
    oracle=f"""
WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS w
              FROM documents),
cws AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS n
        FROM toks GROUP BY 1, 2),
cs AS (SELECT source, CAST(SUM(n) AS BIGINT) AS src_total
       FROM cws GROUP BY source),
cw AS (SELECT w, CAST(SUM(n) AS BIGINT) AS word_total FROM cws GROUP BY w),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS corpus_total FROM cws),
scored AS (
  SELECT c.source, c.w AS word, c.n,
         CAST(c.n * t.corpus_total * 1000000
              // (s.src_total * w.word_total) AS BIGINT) AS keyness_ppm
  FROM cws c
  JOIN cs s ON s.source = c.source
  JOIN cw w ON w.w = c.w
  CROSS JOIN tot t
  WHERE c.n >= {_KEY_MIN_COUNT})
SELECT source, word, n, keyness_ppm FROM scored
QUALIFY row_number() OVER (PARTITION BY source
                           ORDER BY keyness_ppm DESC, word) <= 3
""",
)
def q_source_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYNESS analysis — each source's most DISTINCTIVE vocabulary: the
    lift p(word|source)/p(word|corpus) in integer ppm (observed·total /
    (row-total·column-total) — the numerator of the chi-squared/log-odds
    family, kept divisionless-exact), top-3 per source above a minimum
    support.  This is the corpus-forensics report that names what a
    source is actually about before mixing decisions.  One token explode
    feeds all three aggregates; the scalar corpus total broadcasts; the
    top-3 is a per-source window over the already-filtered scored
    relation.  Headroom note: n·corpus_total·1e6 must stay under 2^63 —
    true through ~1e5-doc-per-word corpora at 1e12 total tokens; past
    that, promote the numerator to decimal(38,0) (one cast, both
    engines), as pipeline_label_margin does."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "source", F.explode(F.split("text", " ")).alias("w")
    )
    cws = toks.groupBy("source", "w").agg(
        F.count("*").cast("bigint").alias("n")
    )
    cs = cws.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("src_total")
    )
    cw = cws.groupBy("w").agg(
        F.sum("n").cast("bigint").alias("word_total")
    )
    tot = cws.agg(F.sum("n").cast("bigint").alias("corpus_total"))
    scored = (
        cws.filter(F.col("n") >= _KEY_MIN_COUNT)
        .join(cs, "source")
        .join(cw, "w")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("w").alias("word"),
            "n",
            F.expr(
                "cast(n * corpus_total * 1000000"
                " div (src_total * word_total) as bigint)"
            ).alias("keyness_ppm"),
        )
    )
    wtop = Window.partitionBy("source").orderBy(
        F.col("keyness_ppm").desc(), "word"
    )
    return (
        scored.withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") <= 3)
        .select("source", "word", "n", "keyness_ppm")
    )


# ---------------------------------------------------------------------------
# Tolerance-bounded as-of join (incident attribution)
# ---------------------------------------------------------------------------

_ASOF_TOL_US = 3_600_000_000  # 1 hour


@query(
    "join_asof_tolerance",
    oracle=f"""
WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
            FROM events),
p AS (SELECT user_id, us, event_id FROM ev WHERE event_type = 'purchase'),
e AS (SELECT user_id, us AS err_us FROM ev WHERE event_type = 'error'),
m AS (
  SELECT p.user_id, p.event_id, p.us,
         MAX(e.err_us) AS last_err_us
  FROM p LEFT JOIN e
    ON e.user_id = p.user_id AND e.err_us <= p.us
  GROUP BY 1, 2, 3)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(COUNT(*) FILTER (
         WHERE last_err_us IS NOT NULL
           AND us - last_err_us <= {_ASOF_TOL_US}) AS BIGINT)
         AS n_after_recent_error,
       CAST(COUNT(*) FILTER (
         WHERE last_err_us IS NOT NULL
           AND us - last_err_us <= {_ASOF_TOL_US}) * 1000000
         // COUNT(*) AS BIGINT) AS flagged_ppm
FROM m GROUP BY user_id
""",
)
def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOLERANCE-BOUNDED as-of join — incident attribution: each purchase
    looks up the user's latest PRIOR error, but only counts it if within
    a 1-hour tolerance (the sensor-fusion/alert-correlation refinement of
    a plain as-of: stale matches are noise, not signal).  Reuses the
    union-and-carry as-of operator (one co-partitioned window, no range
    join explosion); the tolerance is a post-carry filter, so the join
    cost is identical to the unbounded as-of.  Per-user rollup in
    integer ppm."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
        epoch_micros,
    )
    from sqlserver_cdc_to_kafka_spark.operators.asof import asof_join

    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "user_id",
        "event_type",
        epoch_micros(events, "ts").alias("us"),
        "event_id",
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "us", "event_id"
    )
    e = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("us").alias("err_us")
    ).groupBy("user_id", "err_us").agg(F.count("*").alias("_n"))
    matched = asof_join(
        p,
        e.select("user_id", "err_us"),
        on=["user_id"],
        left_time="us",
        right_time="err_us",
        right_payload=["err_us"],
        how="left",
    )
    flagged = F.sum(
        F.when(
            F.col("err_us").isNotNull()
            & (F.col("us") - F.col("err_us") <= _ASOF_TOL_US),
            1,
        ).otherwise(0)
    )
    return matched.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_purchases"),
        flagged.cast("bigint").alias("n_after_recent_error"),
        F.expr(
            f"cast(sum(case when err_us is not null and us - err_us <= "
            f"{_ASOF_TOL_US} then 1 else 0 end) * 1000000 div count(*)"
            " as bigint)"
        ).alias("flagged_ppm"),
    )


# ---------------------------------------------------------------------------
# Greedy mixture-budget allocation
# ---------------------------------------------------------------------------

@query(
    "pipeline_mixture_budget",
    oracle="""
WITH src AS (
  SELECT source,
         CAST(SUM(len(list_filter(string_split(text, ' '),
                                  w -> length(w) > 0))) AS BIGINT) AS tokens,
         CAST(SUM(len(list_distinct(list_filter(string_split(text, ' '),
                                    w -> length(w) > 0))) * 100
                  // greatest(len(list_filter(string_split(text, ' '),
                                 w -> length(w) > 0)), 1)) * 100
              // COUNT(*) AS BIGINT) AS avg_quality_x100
  FROM documents GROUP BY source),
tot AS (SELECT CAST(SUM(tokens) // 2 AS BIGINT) AS budget FROM src),
ranked AS (
  SELECT source, tokens, avg_quality_x100,
         COALESCE(SUM(tokens) OVER (
           ORDER BY avg_quality_x100 DESC, source
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_prev
  FROM src)
SELECT r.source, r.tokens, r.avg_quality_x100,
       CAST(GREATEST(0, LEAST(r.tokens, t.budget - r.cum_prev)) AS BIGINT)
         AS allocated_tokens,
       CAST(GREATEST(0, LEAST(r.tokens, t.budget - r.cum_prev)) * 1000000
            // t.budget AS BIGINT) AS weight_ppm
FROM ranked r CROSS JOIN tot t
""",
)
def q_mixture_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GREEDY MIXTURE-BUDGET allocation: spend a 50%-of-corpus token
    budget on sources in descending quality order (type-token ratio,
    deterministic source tie-break), each source taking min(its tokens,
    what's left) — the data-budget planning step (Chinchilla-style) that
    turns quality audits into actual mixture weights.  Entirely integer:
    quality in basis points, the prefix-sum window runs over |sources|
    rows, the budget is a broadcast scalar.  Output weights in ppm of
    budget."""
    words = "filter(split(text, ' '), w -> length(w) > 0)"
    docs = _docs(spark, sf_dir)
    src = docs.groupBy("source").agg(
        F.expr(f"cast(sum(size({words})) as bigint)").alias("tokens"),
        F.expr(
            f"cast(sum(size(array_distinct({words})) * 100 div "
            f"greatest(size({words}), 1)) * 100 div count(*) as bigint)"
        ).alias("avg_quality_x100"),
    )
    tot = src.agg(
        F.expr("cast(sum(tokens) div 2 as bigint)").alias("budget")
    )
    # no-partition window, bounded by contract: one row per corpus SOURCE
    # (grows with catalog curation, not data volume) — the runtime
    # "WindowExec: No Partition Defined" warning is benign here
    wprev = (
        Window.orderBy(F.col("avg_quality_x100").desc(), "source")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = src.withColumn(
        "cum_prev", F.coalesce(F.sum("tokens").over(wprev), F.lit(0))
    )
    alloc = F.greatest(
        F.lit(0), F.least(F.col("tokens"), F.col("budget") - F.col("cum_prev"))
    )
    return ranked.crossJoin(F.broadcast(tot)).select(
        "source",
        "tokens",
        "avg_quality_x100",
        alloc.cast("bigint").alias("allocated_tokens"),
        F.expr(
            "cast(greatest(0, least(tokens, budget - cum_prev)) * 1000000"
            " div budget as bigint)"
        ).alias("weight_ppm"),
    )


# ---------------------------------------------------------------------------
# Rolling weekly active users (sliding distinct)
# ---------------------------------------------------------------------------

@query(
    "events_weekly_active_users",
    oracle=f"""
WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
t0 AS (SELECT CAST(MIN(us) AS BIGINT) AS start_us FROM ev),
ud AS (
  SELECT DISTINCT user_id,
         CAST((us - t0.start_us) // {_TS_DAY_US} AS BIGINT) AS day
  FROM ev CROSS JOIN t0),
days AS (SELECT DISTINCT day FROM ud),
wau AS (
  SELECT d.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
  FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
  GROUP BY d.day),
dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day)
SELECT w.day, d.dau, w.wau,
       CAST(d.dau * 1000000 // w.wau AS BIGINT) AS stickiness_ppm
FROM wau w JOIN dau d ON d.day = w.day
""",
)
def q_weekly_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling WEEKLY ACTIVE USERS with DAU/WAU stickiness: the sliding
    COUNT DISTINCT that plain window frames cannot express (distinct
    doesn't decompose over a sliding frame).  Events first collapse to
    the DISTINCT (user, day) relation — the only thing that grows — and
    the 7-day window becomes a bounded range join from the day grid onto
    that relation (≤7 match days per grid day, |days| bounded by the
    calendar).  All engines count the same exact distinct; stickiness
    rides as integer ppm."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
        epoch_micros,
    )

    events = load_table(spark, sf_dir, "events")
    ev = events.select("user_id", epoch_micros(events, "ts").alias("us"))
    t0 = ev.agg(F.min("us").cast("bigint").alias("start_us"))
    ud = (
        ev.crossJoin(F.broadcast(t0))
        .select(
            "user_id",
            int_div(F.col("us") - F.col("start_us"), _TS_DAY_US)
            .alias("day"),
        )
        .distinct()
    )
    days = ud.select("day").distinct()
    wau = (
        days.alias("d")
        .join(
            ud.alias("u"),
            F.col("u.day").between(F.col("d.day") - 6, F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("u.user_id").cast("bigint").alias("wau"))
    )
    dau = ud.groupBy("day").agg(F.count("*").cast("bigint").alias("dau"))
    return wau.join(dau, "day").select(
        "day",
        "dau",
        "wau",
        F.expr("cast(dau * 1000000 div wau as bigint)").alias(
            "stickiness_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# Hard-negative mining for contrastive training
# ---------------------------------------------------------------------------

@query(
    "pipeline_hard_negatives",
    oracle=f"""
WITH ev AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
q AS (SELECT * FROM ev WHERE vec_id % 10 = 0 AND vec_id < 10000),
scored AS (
  SELECT q.vec_id, q.label AS q_label, c.vec_id AS c_id, c.label AS c_label,
         ROUND(list_cosine_similarity(q.v, c.v), 6) AS cos
  FROM q JOIN ev c ON c.vec_id <> q.vec_id),
hard_neg AS (
  SELECT vec_id, c_id AS hard_negative_id, cos AS hard_negative_cos
  FROM (SELECT vec_id, c_id, cos,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, c_id) AS rnk
        FROM scored WHERE c_label <> q_label)
  WHERE rnk = 1),
pos AS (
  SELECT vec_id, cos AS nearest_positive_cos
  FROM (SELECT vec_id, cos,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, c_id) AS rnk
        FROM scored WHERE c_label = q_label)
  WHERE rnk = 1)
SELECT q.vec_id, CAST(q.label AS BIGINT) AS label,
       h.hard_negative_id, h.hard_negative_cos, p.nearest_positive_cos,
       ROUND(p.nearest_positive_cos - h.hard_negative_cos, 6) AS margin
FROM q
JOIN hard_neg h ON h.vec_id = q.vec_id
JOIN pos p ON p.vec_id = q.vec_id
""",
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD-NEGATIVE MINING for contrastive training: for each sampled
    anchor, the most similar vector with a DIFFERENT label (the hard
    negative a triplet/contrastive loss needs) and the most similar
    same-label vector, with their margin — negative margin means the
    hardest negative outranks every positive, the pairs that matter most
    in batch construction.  Same bounded-sample broadcast scan as
    ann_recall_audit; both rankings come from ONE scored relation (one
    corpus pass), ranks tie-break on (rounded cosine, id)."""
    from sqlserver_cdc_to_kafka_spark.pipeline.similarity import (
        as_double_array,
        dot,
        l2_norm,
    )

    emb = ensure_parallel(load_table(spark, sf_dir, "embeddings"))
    ev = emb.select(
        "vec_id", "label", as_double_array("embedding").alias("v")
    ).withColumn("nrm", l2_norm(F.col("v")))
    q = ev.filter(
        (F.col("vec_id") % 10 == 0) & (F.col("vec_id") < 10000)
    ).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    cos = F.round(
        dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6
    )
    scored = (
        ev.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "q_label",
            F.col("vec_id").alias("c_id"),
            F.col("label").alias("c_label"),
            cos.alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id"))
    hard_neg = (
        scored.filter(F.col("c_label") != F.col("q_label"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            F.col("q_id").alias("hn_qid"),
            F.col("c_id").alias("hard_negative_id"),
            F.col("cos").alias("hard_negative_cos"),
        )
    )
    pos = (
        scored.filter(F.col("c_label") == F.col("q_label"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            F.col("q_id").alias("p_qid"),
            F.col("cos").alias("nearest_positive_cos"),
        )
    )
    return (
        q.join(hard_neg, q.q_id == hard_neg.hn_qid)
        .join(pos, q.q_id == pos.p_qid)
        .select(
            F.col("q_id").alias("vec_id"),
            F.col("q_label").cast("bigint").alias("label"),
            "hard_negative_id",
            "hard_negative_cos",
            "nearest_positive_cos",
            F.round(
                F.col("nearest_positive_cos") - F.col("hard_negative_cos"), 6
            ).alias("margin"),
        )
    )


# ---------------------------------------------------------------------------
# Window-function breadth witness
# ---------------------------------------------------------------------------

@query(
    "olap_window_suite",
    oracle="""
WITH o AS (
  SELECT o_orderpriority AS pri,
         CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
         o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
win AS (
  SELECT pri, o_orderkey, day, cents,
         row_number() OVER w AS rn,
         CAST(rank() OVER (PARTITION BY pri ORDER BY cents DESC) AS BIGINT)
           AS price_rank,
         CAST(dense_rank() OVER (PARTITION BY pri ORDER BY cents DESC)
              AS BIGINT) AS price_dense_rank,
         ROUND(percent_rank() OVER (PARTITION BY pri ORDER BY cents), 6)
           AS price_pct_rank,
         ROUND(cume_dist() OVER (PARTITION BY pri ORDER BY cents), 6)
           AS price_cume_dist,
         CAST(first_value(o_orderkey) OVER w AS BIGINT) AS first_key,
         CAST(last_value(o_orderkey) OVER
                (PARTITION BY pri ORDER BY day, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
              AS BIGINT) AS last_key,
         CAST(nth_value(o_orderkey, 3) OVER
                (PARTITION BY pri ORDER BY day, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
              AS BIGINT) AS third_key
  FROM o
  WINDOW w AS (PARTITION BY pri ORDER BY day, o_orderkey))
SELECT pri, o_orderkey, price_rank, price_dense_rank, price_pct_rank,
       price_cume_dist, first_key, last_key, third_key
FROM win WHERE rn <= 3
""",
)
def q_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINDOW-FUNCTION breadth witness: rank, dense_rank, percent_rank,
    cume_dist, first/last/nth_value with explicit full frames, all in one
    partitioned pass over orders — the API-surface proof that every SQL
    window shape a reference user relies on translates (the full-frame
    last_value/nth_value is the classic correctness trap: the DEFAULT
    frame stops at CURRENT ROW).  Partitioned by priority (no global
    sort); output trimmed to 3 rows per partition by a row_number from
    the same window definition.

    ROUND(percent_rank/cume_dist, 6) half-boundary note: (rank-1)/(n-1)
    can in principle land on an exact x.xxxxxx5 where Spark's HALF_UP and
    DuckDB's float rounding split (the olap_cheapest_supplier_per_part
    bug class).  Measured margin to the nearest boundary is ≥5e-9 at
    sf0.001/0.01/0.1 (vs ~1e-16 double error) — safe here; at n ≳ 2e6
    rows per partition the rank granularity crosses the 5e-7 boundary
    spacing and this exposure should move to floor(x*1e6 + 0.5) micros
    like the rest of the repo."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
        epoch_micros,
    )

    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        F.col("o_orderpriority").alias("pri"),
        int_div(epoch_micros(orders, "o_orderdate"), 86400000000)
        .alias("day"),
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("pri").orderBy("day", "o_orderkey")
    wfull = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wprice = Window.partitionBy("pri").orderBy(F.col("cents").desc())
    wprice_asc = Window.partitionBy("pri").orderBy("cents")
    win = o.select(
        "pri",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(wprice).cast("bigint").alias("price_rank"),
        F.dense_rank().over(wprice).cast("bigint").alias("price_dense_rank"),
        F.round(F.percent_rank().over(wprice_asc), 6).alias("price_pct_rank"),
        F.round(F.cume_dist().over(wprice_asc), 6).alias("price_cume_dist"),
        F.first("o_orderkey").over(w).cast("bigint").alias("first_key"),
        F.last("o_orderkey").over(wfull).cast("bigint").alias("last_key"),
        F.nth_value("o_orderkey", 3).over(wfull).cast("bigint").alias(
            "third_key"
        ),
    )
    return win.filter(F.col("rn") <= 3).select(
        "pri",
        "o_orderkey",
        "price_rank",
        "price_dense_rank",
        "price_pct_rank",
        "price_cume_dist",
        "first_key",
        "last_key",
        "third_key",
    )


# ---------------------------------------------------------------------------
# Funnel time-to-convert percentiles
# ---------------------------------------------------------------------------

@query(
    "events_funnel_timing",
    oracle="""
WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
v AS (SELECT user_id, MIN(us) AS t1 FROM ev
      WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT ev.user_id, MIN(us) AS t2 FROM ev JOIN v USING (user_id)
      WHERE event_type = 'click' AND us >= t1 GROUP BY ev.user_id),
p AS (SELECT ev.user_id, MIN(us) AS t3 FROM ev JOIN c USING (user_id)
      WHERE event_type = 'purchase' AND us >= t2 GROUP BY ev.user_id),
gaps AS (
  SELECT 'view_to_click' AS step, c.t2 - v.t1 AS gap_us
  FROM c JOIN v USING (user_id)
  UNION ALL
  SELECT 'click_to_purchase', p.t3 - c.t2
  FROM p JOIN c USING (user_id)),
ranked AS (
  SELECT step, gap_us,
         row_number() OVER (PARTITION BY step ORDER BY gap_us) AS rn,
         COUNT(*) OVER (PARTITION BY step) AS n
  FROM gaps)
SELECT step,
       CAST(MAX(n) AS BIGINT) AS n_converted,
       CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN gap_us END) AS BIGINT)
         AS p50_gap_us,
       CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN gap_us END) AS BIGINT)
         AS p90_gap_us
FROM ranked GROUP BY step
""",
)
def q_funnel_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel TIME-TO-CONVERT: exact p50/p90 of the gap between funnel
    steps (first view → first subsequent click → first subsequent
    purchase), the latency companion to events_funnel_conversion's
    counts — slow conversion steps are where product work goes.  Same
    shrinking min-aggregate chain as the funnel (each step joins only
    prior completers), then exact order-statistic percentiles over the
    per-user gaps (rank windows partitioned by step — converter counts,
    not event counts)."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
        epoch_micros,
    )

    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "user_id", "event_type", epoch_micros(events, "ts").alias("us")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    c = (
        ev.join(v, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("us") >= F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    p = (
        ev.join(c, "user_id")
        .filter(
            (F.col("event_type") == "purchase") & (F.col("us") >= F.col("t2"))
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )
    g1 = (
        c.join(v, "user_id")
        .select(
            F.lit("view_to_click").alias("step"),
            (F.col("t2") - F.col("t1")).alias("gap_us"),
        )
    )
    g2 = (
        p.join(c, "user_id")
        .select(
            F.lit("click_to_purchase").alias("step"),
            (F.col("t3") - F.col("t2")).alias("gap_us"),
        )
    )
    gaps = g1.unionByName(g2)
    ranked = gaps.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("step").orderBy("gap_us")),
    ).withColumn("n", F.count("*").over(Window.partitionBy("step")))
    return ranked.groupBy("step").agg(
        F.max("n").cast("bigint").alias("n_converted"),
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("gap_us"))
        )
        .cast("bigint")
        .alias("p50_gap_us"),
        F.max(
            F.when(
                F.col("rn") == F.expr("(9 * n + 9) div 10"), F.col("gap_us")
            )
        )
        .cast("bigint")
        .alias("p90_gap_us"),
    )


# ---------------------------------------------------------------------------
# Farthest-point-sampling coreset selection
# ---------------------------------------------------------------------------

_CORESET_K = 8


def _coreset_oracle_sql(k: int) -> str:
    """Generate the unrolled k-center greedy as chained CTEs: step i picks
    the point with the largest running min-distance to the chosen set
    (ties -> smallest id), exactly what the Spark driver loop does."""
    dist = (
        "list_sum(list_transform(range(1, 1 + len(e.vm)), "
        "i -> (e.vm[CAST(i AS INT)] - c.vm[CAST(i AS INT)])"
        " * (e.vm[CAST(i AS INT)] - c.vm[CAST(i AS INT)])))"
    )
    parts = [
        """ev AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                                  AS BIGINT)) AS vm
  FROM embeddings)""",
        "s0 AS (SELECT MIN(vec_id) AS c_id FROM ev)",
        f"""d0 AS (
  SELECT e.vec_id, CAST({dist} AS BIGINT) AS d
  FROM ev e JOIN ev c ON c.vec_id = (SELECT c_id FROM s0))""",
    ]
    sel = ["SELECT 0 AS center_rank, (SELECT c_id FROM s0) AS vec_id, "
           "CAST(0 AS BIGINT) AS sel_dist2"]
    for i in range(1, k):
        prev = f"d{i - 1}"
        parts.append(
            f"""s{i} AS (
  SELECT vec_id, d FROM {prev} ORDER BY d DESC, vec_id LIMIT 1)"""
        )
        if i < k - 1:
            parts.append(
                f"""d{i} AS (
  SELECT e.vec_id, LEAST(p.d, CAST({dist} AS BIGINT)) AS d
  FROM ev e
  JOIN {prev} p ON p.vec_id = e.vec_id
  JOIN ev c ON c.vec_id = (SELECT vec_id FROM s{i}))"""
            )
        sel.append(
            f"SELECT {i}, (SELECT vec_id FROM s{i}),"
            f" CAST((SELECT d FROM s{i}) AS BIGINT)"
        )
    union = "\nUNION ALL\n".join(sel)
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT CAST(center_rank AS BIGINT) AS center_rank, vec_id,"
        f" sel_dist2 FROM ({union})"
    )


@query("pipeline_coreset_fps", oracle=_coreset_oracle_sql(_CORESET_K))
def q_coreset_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORESET selection by farthest-point sampling (k-center greedy):
    start from the smallest id, then repeatedly add the point FARTHEST
    from the chosen set (largest running min-distance, smallest-id ties)
    — the data-pruning/diversity-selection primitive (herding, active
    learning seeds, k-center coresets).  Exact integer micro-unit
    squared-L2 throughout, so the greedy trajectory is deterministic and
    the oracle (the same greedy unrolled as chained SQL CTEs) must agree
    step for step.

    Scale shape: the corpus relation is cached once; each of the k
    rounds is one distributed min-update pass plus a 1-row argmax
    collect — driver state is k ids, same bounded-scalar pattern as the
    k-means loop (clustering.py); k is a constant, never data-sized."""
    emb = ensure_parallel(load_table(spark, sf_dir, "embeddings"))
    ev = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding,"
            " x -> cast(floor(cast(x as double) * 1000000 + 0.5) as bigint))"
        ).alias("vm"),
    ).persist()
    try:
        first = ev.agg(F.min("vec_id")).collect()[0][0]

        def dist_to(center_vm):
            c = F.array(*[F.lit(int(v)) for v in center_vm])
            return F.aggregate(
                F.zip_with(F.col("vm"), c, lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            )

        first_vm = ev.filter(F.col("vec_id") == first).collect()[0]["vm"]
        chosen = [(0, first, 0)]
        dists = ev.select(
            "vec_id", dist_to(first_vm).cast("bigint").alias("d")
        )
        for rank in range(1, _CORESET_K):
            nxt = (
                dists.orderBy(F.col("d").desc(), "vec_id").limit(1).collect()
            )[0]
            chosen.append((rank, nxt["vec_id"], int(nxt["d"])))
            if rank < _CORESET_K - 1:
                nxt_vm = ev.filter(F.col("vec_id") == nxt["vec_id"]).collect()[
                    0
                ]["vm"]
                dists = (
                    dists.join(ev, "vec_id")
                    .select(
                        "vec_id",
                        F.least(
                            F.col("d"), dist_to(nxt_vm).cast("bigint")
                        ).alias("d"),
                    )
                )
        return emb.sparkSession.createDataFrame(
            chosen, "center_rank long, vec_id long, sel_dist2 long"
        )
    finally:
        ev.unpersist()


# ---------------------------------------------------------------------------
# Bottom-k (KMV) distinct sketch
# ---------------------------------------------------------------------------

_KMV_K = 32
_KMV_SPACE = 1 << 32


@query(
    "sketch_bottomk_distinct",
    oracle=f"""
WITH h AS (
  SELECT DISTINCT source,
         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
           AS hv
  FROM (SELECT source, user_id FROM documents d
        JOIN events e ON e.user_id = d.doc_id % 150) t),
ranked AS (
  SELECT source, hv,
         row_number() OVER (PARTITION BY source ORDER BY hv) AS rnk,
         COUNT(*) OVER (PARTITION BY source) AS n_hashes
  FROM h)
SELECT source,
       CAST(MAX(n_hashes) AS BIGINT) AS exact_distinct,
       CAST(MAX(CASE WHEN rnk = LEAST({_KMV_K}, n_hashes) THEN hv END)
            AS BIGINT) AS kth_hash,
       CAST(CASE WHEN MAX(n_hashes) < {_KMV_K} THEN MAX(n_hashes)
            ELSE ({_KMV_K} - 1) * {_KMV_SPACE}
                 // MAX(CASE WHEN rnk = {_KMV_K} THEN hv END) END
            AS BIGINT) AS kmv_estimate
FROM ranked GROUP BY source
""",
)
def q_bottomk_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOTTOM-K (KMV) distinct sketch: keep each group's {_KMV_K} smallest
    member hashes; the k-th smallest estimates the distinct count as
    (k−1)·H/h_k (H = hash space) — the mergeable alternative to HLL whose
    union is just "merge and re-truncate", completing the sketch family
    (HLL registers, count-min, Bloom, minhash, quantile).  The estimate
    is INTEGER arithmetic on deterministic md5 slices, so unlike
    float-registered sketches it is hash-exact across engines; groups
    smaller than k report their exact count.  One distinct + one
    partitioned rank window over ≤|distinct| rows."""
    docs = _docs(spark, sf_dir).select("doc_id", "source")
    events = load_table(spark, sf_dir, "events")
    joined = events.select("user_id").join(
        docs, events.user_id == docs.doc_id % 150
    )
    h = joined.select(
        "source",
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        )
        .cast("bigint")
        .alias("hv"),
    ).distinct()
    wr = Window.partitionBy("source").orderBy("hv")
    wn = Window.partitionBy("source")
    ranked = h.select(
        "source",
        "hv",
        F.row_number().over(wr).alias("rnk"),
        F.count("*").over(wn).alias("n_hashes"),
    )
    kth = F.max(
        F.when(
            F.col("rnk") == F.least(F.lit(_KMV_K), F.col("n_hashes")),
            F.col("hv"),
        )
    )
    kth_full = F.max(F.when(F.col("rnk") == _KMV_K, F.col("hv")))
    agg = ranked.groupBy("source").agg(
        F.max("n_hashes").cast("bigint").alias("exact_distinct"),
        kth.cast("bigint").alias("kth_hash"),
        kth_full.cast("bigint").alias("kth_full"),
    )
    return agg.select(
        "source",
        "exact_distinct",
        "kth_hash",
        F.expr(
            f"cast(case when exact_distinct < {_KMV_K} then exact_distinct"
            f" else {(_KMV_K - 1) * _KMV_SPACE} div kth_full end as bigint)"
        ).alias("kmv_estimate"),
    )


# ---------------------------------------------------------------------------
# Session bounce rate
# ---------------------------------------------------------------------------

_BOUNCE_GAP_US = 600_000_000  # 10 min, matches the session operators


@query(
    "events_bounce_rate",
    oracle=f"""
WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
marked AS (
  SELECT user_id, us,
         CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                   >= {_BOUNCE_GAP_US}
              OR lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM ev),
grouped AS (
  SELECT user_id,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us
                             ROWS UNBOUNDED PRECEDING) AS sess
  FROM marked),
sizes AS (SELECT user_id, sess, COUNT(*) AS n_events
          FROM grouped GROUP BY 1, 2)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(COUNT(*) FILTER (WHERE n_events = 1) AS BIGINT)
         AS n_bounces,
       CAST(COUNT(*) FILTER (WHERE n_events = 1) * 1000000 // COUNT(*)
            AS BIGINT) AS bounce_ppm,
       CAST(MAX(n_events) AS BIGINT) AS max_session_events
FROM sizes
""",
)
def q_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session BOUNCE RATE: the fraction of sessions containing exactly
    one event (10-minute inactivity gap, same constant as the session
    operators so the metrics agree) — the canonical engagement KPI over
    the sessionized stream.  Gaps-and-islands partitioned per user, then
    one scalar rollup; integer ppm."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
        epoch_micros,
    )

    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "user_id", epoch_micros(events, "ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us")
    marked = ev.withColumn(
        "new_sess",
        (
            (F.col("us") - F.lag("us").over(w) >= _BOUNCE_GAP_US)
            | F.lag("us").over(w).isNull()
        ).cast("int"),
    )
    grouped = marked.withColumn(
        "sess",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sizes = grouped.groupBy("user_id", "sess").agg(
        F.count("*").alias("n_events")
    )
    return sizes.agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_bounces"),
        F.expr(
            "cast(sum(case when n_events = 1 then 1 else 0 end) * 1000000"
            " div count(*) as bigint)"
        ).alias("bounce_ppm"),
        F.max("n_events").cast("bigint").alias("max_session_events"),
    )


# ---------------------------------------------------------------------------
# Distributed-selection dwell percentiles (same answer, scalable plan)
# ---------------------------------------------------------------------------

@query(
    "events_dwell_percentiles_scalable",
    oracle="""
WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
            FROM events),
gaps AS (
  SELECT event_type,
         us - lag(us) OVER (PARTITION BY user_id
                            ORDER BY us, event_id) AS gap_us
  FROM ev),
g AS (SELECT event_type, gap_us FROM gaps WHERE gap_us IS NOT NULL),
ranked AS (
  SELECT event_type, gap_us,
         row_number() OVER (PARTITION BY event_type ORDER BY gap_us) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM g)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_gaps,
       CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN gap_us END) AS BIGINT)
         AS p50_gap_us,
       CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN gap_us END) AS BIGINT)
         AS p90_gap_us
FROM ranked GROUP BY event_type
""",
)
def q_dwell_percentiles_scalable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The SAME exact dwell percentiles as events_dwell_percentiles,
    computed by DISTRIBUTED SELECTION (operators/selection.py) instead of
    a per-group rank window: a bucket-histogram pass bounded by
    |groups|·1024 plus one tiny TakeOrdered inside the candidate bucket
    per statistic — no group's full row set ever sorts through one task.
    Same oracle as the window form, so the two physical strategies are
    pinned value-identical; this pair is the engine's documented answer
    to "exact percentiles over five groups holding billions of rows"."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
        epoch_micros,
    )
    from sqlserver_cdc_to_kafka_spark.operators.selection import (
        exact_group_percentiles_df,
    )

    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "user_id",
        "event_type",
        epoch_micros(events, "ts").alias("us"),
        "event_id",
    )
    gaps = base.withColumn(
        "gap_us",
        F.col("us")
        - F.lag("us").over(
            Window.partitionBy("user_id").orderBy("us", "event_id")
        ),
    ).filter(F.col("gap_us").isNotNull())
    return exact_group_percentiles_df(
        gaps,
        "event_type",
        "gap_us",
        [
            ("p50_gap_us", lambda n: (n + 1) // 2),
            ("p90_gap_us", lambda n: (9 * n + 9) // 10),
        ],
        "event_type string, n_gaps long, p50_gap_us long, p90_gap_us long",
    )


# ---------------------------------------------------------------------------
# Customer LTV by acquisition cohort
# ---------------------------------------------------------------------------

@query(
    "olap_cohort_ltv",
    oracle="""
WITH o AS (
  SELECT o_custkey,
         CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
firsts AS (
  SELECT o_custkey, CAST(MIN(day) // 365 AS BIGINT) AS cohort_year_idx
  FROM o GROUP BY o_custkey),
per_cust AS (
  SELECT f.cohort_year_idx, o.o_custkey,
         CAST(SUM(o.cents) AS BIGINT) AS spend_cents,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM o JOIN firsts f ON f.o_custkey = o.o_custkey
  GROUP BY 1, 2)
SELECT cohort_year_idx,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(spend_cents) AS BIGINT) AS cohort_spend_cents,
       CAST(SUM(spend_cents) // COUNT(*) AS BIGINT) AS avg_ltv_cents,
       CAST(SUM(n_orders) AS BIGINT) AS n_orders
FROM per_cust GROUP BY cohort_year_idx
""",
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer LIFETIME VALUE by acquisition cohort: customers grouped
    by the (epoch-day/365) index of their first order, with cohort size,
    total and average spend in integer cents — the cohort-LTV table
    revenue planning reads.  Two hash aggregates (per-customer, then
    per-cohort) joined on the customer key; day arithmetic is integer
    epoch-days (replay-deterministic, timezone-free)."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
        epoch_micros,
    )

    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_custkey",
        int_div(epoch_micros(orders, "o_orderdate"), 86400000000)
        .alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    firsts = o.groupBy("o_custkey").agg(
        F.expr("cast(min(day) div 365 as bigint)").alias("cohort_year_idx")
    )
    per_cust = (
        o.join(firsts, "o_custkey")
        .groupBy("cohort_year_idx", "o_custkey")
        .agg(
            F.sum("cents").cast("bigint").alias("spend_cents"),
            F.count("*").cast("bigint").alias("n_orders"),
        )
    )
    return per_cust.groupBy("cohort_year_idx").agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.sum("spend_cents").cast("bigint").alias("cohort_spend_cents"),
        F.expr(
            "cast(sum(spend_cents) div count(*) as bigint)"
        ).alias("avg_ltv_cents"),
        F.sum("n_orders").cast("bigint").alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Inter-arrival burstiness coefficient
# ---------------------------------------------------------------------------

@query(
    "events_burstiness",
    oracle="""
WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
            FROM events),
gaps AS (
  SELECT event_type,
         (us - lag(us) OVER (PARTITION BY user_id
                             ORDER BY us, event_id)) // 1000000 AS g
  FROM ev),
m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(g) AS BIGINT) AS s1,
         SUM(CAST(g AS DECIMAL(19,0)) * CAST(g AS DECIMAL(19,0))) AS s2
  FROM gaps WHERE g IS NOT NULL GROUP BY event_type)
SELECT event_type, n,
       ROUND((sqrt(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
              - CAST(s1 AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                + CAST(s1 AS DOUBLE)), 6) AS burstiness
FROM m
""",
)
def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BURSTINESS coefficient B = (σ−μ)/(σ+μ) of per-user inter-event
    gaps, per event type — the signal-processing summary separating
    Poisson-like traffic (B≈0) from bursty traffic (B→1) and regular
    heartbeats (B→−1); it drives batch-sizing and anomaly thresholds.
    Numerics follow events_trend_regression: gaps ride as WHOLE SECONDS
    (micro-gap squares overflow int64; second granularity keeps Σg² exact
    headroom-free) and reduce to exact integer moment sums (n, Σg in
    bigint, Σg² in an overflow-proof decimal(38,0) accumulator) in one
    hash aggregate, and the final
    expression uses only correctly-rounded IEEE ops (·, −, +, /, sqrt) on
    those identical integers, so round(…, 6) is engine-exact.  (Both
    engines expand σ via the n·Σg² − (Σg)² form scaled by n, which
    cancels in the ratio.)"""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
        epoch_micros,
    )

    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "user_id",
        "event_type",
        epoch_micros(events, "ts").alias("us"),
        "event_id",
    )
    gaps = ev.withColumn(
        "g",
        F.expr(
            "(us - lag(us) over (partition by user_id"
            " order by us, event_id)) div 1000000"
        ),
    ).filter(F.col("g").isNotNull())
    dec = "decimal(19,0)"
    m = gaps.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("g").cast("bigint").alias("s1"),
        F.sum(F.col("g").cast(dec) * F.col("g").cast(dec)).alias("s2"),
    )
    disc = F.sqrt(
        F.col("n").cast("double") * F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double")
    )
    return m.select(
        "event_type",
        "n",
        F.round(
            (disc - F.col("s1").cast("double"))
            / (disc + F.col("s1").cast("double")),
            6,
        ).alias("burstiness"),
    )


# ---------------------------------------------------------------------------
# Returns rate by brand
# ---------------------------------------------------------------------------

@query(
    "olap_returns_by_brand",
    oracle="""
SELECT p.p_brand AS brand,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(COUNT(*) FILTER (WHERE l.l_returnflag = 'R') AS BIGINT)
         AS n_returned,
       CAST(COUNT(*) FILTER (WHERE l.l_returnflag = 'R') * 1000000
            // COUNT(*) AS BIGINT) AS return_ppm,
       CAST(COALESCE(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
              FILTER (WHERE l.l_returnflag = 'R'), 0) AS BIGINT)
         AS returned_cents
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY p.p_brand
""",
)
def q_returns_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETURNS-RATE by brand: per-brand line counts, returned share in
    ppm, and returned revenue in integer cents — the quality-control
    rollup a merchandising consumer of the CDC feed runs.  The join is a
    plain equi-join left to AQE (part scales with the corpus — no hard
    broadcast hint); the grouped output is bounded by the brand
    dimension."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    ret = F.col("l_returnflag") == "R"
    return j.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.sum(F.when(ret, 1).otherwise(0)).cast("bigint").alias("n_returned"),
        F.expr(
            "cast(sum(case when l_returnflag = 'R' then 1 else 0 end)"
            " * 1000000 div count(*) as bigint)"
        ).alias("return_ppm"),
        F.coalesce(
            F.sum(
                F.when(
                    ret,
                    F.round(F.col("l_extendedprice") * 100).cast("bigint"),
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("returned_cents"),
    )


# ---------------------------------------------------------------------------
# Traffic seasonality profile
# ---------------------------------------------------------------------------

@query(
    "events_seasonality_profile",
    oracle="""
WITH ev AS (SELECT epoch_us(ts) AS us, event_type FROM events),
b AS (
  SELECT ((us // 86400000000) + 4) % 7 AS dow,
         (us % 86400000000) // 3600000000 AS hour,
         event_type
  FROM ev),
g AS (SELECT dow, hour, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY 1, 2),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM g)
SELECT CAST(g.dow AS BIGINT) AS dow, CAST(g.hour AS BIGINT) AS hour, g.n,
       CAST(g.n * 1000000 // t.total AS BIGINT) AS share_ppm
FROM g CROSS JOIN tot t
""",
)
def q_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic SEASONALITY profile: the day-of-week × hour-of-day event
    grid with each cell's traffic share in ppm — the heatmap capacity
    planning and anomaly baselines read.  Day-of-week is integer epoch
    arithmetic ((epoch_day + 4) % 7, anchored to 1970-01-01 = Thursday)
    in UTC, never a locale/timezone-dependent date function, so the
    profile is engine- and session-exact.  One map-side-combined
    aggregate onto a ≤168-cell grid plus a scalar total."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
        epoch_micros,
    )

    events = load_table(spark, sf_dir, "events")
    ev = events.select(epoch_micros(events, "ts").alias("us"))
    b = ev.select(
        F.expr("((us div 86400000000) + 4) % 7").cast("bigint").alias("dow"),
        F.expr("(us % 86400000000) div 3600000000")
        .cast("bigint")
        .alias("hour"),
    )
    g = b.groupBy("dow", "hour").agg(F.count("*").cast("bigint").alias("n"))
    tot = g.agg(F.sum("n").cast("bigint").alias("total"))
    return g.crossJoin(F.broadcast(tot)).select(
        "dow",
        "hour",
        "n",
        F.expr("cast(n * 1000000 div total as bigint)").alias("share_ppm"),
    )


# ---------------------------------------------------------------------------
# Annotator agreement (Cohen's kappa)
# ---------------------------------------------------------------------------

@query(
    "pipeline_annotator_kappa",
    oracle="""
WITH lab AS (
  SELECT CASE WHEN len(list_distinct(list_filter(string_split(text, ' '),
                                     w -> length(w) > 0))) * 100
              >= 50 * greatest(len(list_filter(string_split(text, ' '),
                                    w -> length(w) > 0)), 1)
         THEN 1 ELSE 0 END AS a,
         CASE WHEN len(list_filter(string_split(text, ' '),
                                   x -> x IN ('the', 'a'))) * 100
              >= 5 * greatest(len(string_split(text, ' ')), 1)
         THEN 1 ELSE 0 END AS b
  FROM documents),
c AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(a * b) AS BIGINT) AS n11,
         CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
         CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
         CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00
  FROM lab)
SELECT n, n11, n10, n01, n00,
       CAST((n11 + n00) * 1000000 // n AS BIGINT) AS observed_ppm,
       ROUND((CAST(n AS DOUBLE) * (n11 + n00)
              - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                 + CAST(n01 + n00 AS DOUBLE) * (n10 + n00)))
             / (CAST(n AS DOUBLE) * n
                - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                   + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))), 6)
         AS kappa
FROM c
""",
)
def q_annotator_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTER-ANNOTATOR AGREEMENT (Cohen's kappa) between two deterministic
    document labelers — the lexical-diversity quality flag and the
    marker-word language flag — the chance-corrected agreement audit run
    before trusting any pair of heuristic/model annotators.  The 2×2
    confusion matrix reduces to exact integer counts in one aggregate;
    kappa = (n·po_cnt − pe_cnt)/(n² − pe_cnt) evaluates as a single
    correctly-rounded IEEE expression over those identical integers
    (pattern of events_correlation), so round(…, 6) is engine-exact."""
    words = "filter(split(text, ' '), w -> length(w) > 0)"
    docs = _docs(spark, sf_dir)
    lab = docs.select(
        F.expr(
            f"case when size(array_distinct({words})) * 100"
            f" >= 50 * greatest(size({words}), 1) then 1 else 0 end"
        ).alias("a"),
        F.expr(
            "case when size(filter(split(text, ' '),"
            " x -> x in ('the', 'a'))) * 100"
            " >= 5 * greatest(size(split(text, ' ')), 1) then 1 else 0 end"
        ).alias("b"),
    )
    c = lab.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("bigint").alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("bigint").alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b")))
        .cast("bigint")
        .alias("n00"),
    )
    nd = F.col("n").cast("double")
    po_cnt = (F.col("n11") + F.col("n00")).cast("double")
    pe_cnt = (
        (F.col("n11") + F.col("n10")).cast("double")
        * (F.col("n11") + F.col("n01"))
        + (F.col("n01") + F.col("n00")).cast("double")
        * (F.col("n10") + F.col("n00"))
    )
    return c.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.expr("cast((n11 + n00) * 1000000 div n as bigint)").alias(
            "observed_ppm"
        ),
        F.round((nd * po_cnt - pe_cnt) / (nd * nd - pe_cnt), 6).alias(
            "kappa"
        ),
    )


# ---------------------------------------------------------------------------
# Alert-threshold backtest sweep
# ---------------------------------------------------------------------------

@query(
    "events_alert_backtest",
    oracle="""
WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                   CAST(CAST(value AS DECIMAL(18,3)) * 1000 AS BIGINT) AS v
            FROM events),
st AS (
  SELECT user_id, v,
         COUNT(*) OVER w AS n_prior,
         SUM(v) OVER w AS s,
         SUM(v * v) OVER w AS q
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN 9 PRECEDING AND 1 PRECEDING)),
eligible AS (
  SELECT (n_prior * v - s) * (n_prior * v - s) AS dev2,
         n_prior * q - s * s AS var_n2
  FROM st WHERE n_prior >= 4),
ks AS (SELECT unnest([2, 3, 4]) AS k)
SELECT CAST(k.k AS BIGINT) AS sigma_k,
       CAST(COUNT(*) AS BIGINT) AS n_eligible,
       CAST(COUNT(*) FILTER (WHERE e.dev2 > k.k * k.k * e.var_n2)
            AS BIGINT) AS n_alerts,
       CAST(COUNT(*) FILTER (WHERE e.dev2 > k.k * k.k * e.var_n2) * 1000000
            // COUNT(*) AS BIGINT) AS alert_ppm
FROM eligible e CROSS JOIN ks k
GROUP BY k.k
""",
)
def q_alert_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALERT-THRESHOLD BACKTEST: alert volume at 2σ/3σ/4σ from ONE pass
    over the trailing-window statistics — the tuning table an on-call
    rotation reads before picking the anomaly threshold
    (events_anomaly_zscore then enforces the chosen one).  The k·σ test
    stays integer-exact at every k via the same n²-multiplied
    rearrangement (dev² > k²·(n·q−s²)); thresholds ride as a 3-row
    broadcast against the eligible-event statistics, so the sweep costs
    one window pass regardless of how many thresholds are probed."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
        epoch_micros,
    )

    events = load_table(spark, sf_dir, "events")
    us = epoch_micros(events, "us" if "us" in events.columns else "ts")
    base = events.select(
        "user_id",
        "event_id",
        us.alias("us"),
        (F.col("value").cast("decimal(18,3)") * 1000)
        .cast("bigint")
        .alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-9, -1)
    )
    st = base.select(
        "v",
        F.count("*").over(w).alias("n_prior"),
        F.sum("v").over(w).alias("s"),
        F.sum(F.col("v") * F.col("v")).over(w).alias("q"),
    ).filter(F.col("n_prior") >= 4)
    eligible = st.select(
        (
            (F.col("n_prior") * F.col("v") - F.col("s"))
            * (F.col("n_prior") * F.col("v") - F.col("s"))
        ).alias("dev2"),
        (F.col("n_prior") * F.col("q") - F.col("s") * F.col("s")).alias(
            "var_n2"
        ),
    )
    ks = events.sparkSession.createDataFrame(
        [(2,), (3,), (4,)], "k int"
    )
    return (
        eligible.crossJoin(F.broadcast(ks))
        .groupBy(F.col("k").cast("bigint").alias("sigma_k"))
        .agg(
            F.count("*").cast("bigint").alias("n_eligible"),
            F.sum(
                F.when(
                    F.col("dev2") > F.col("k") * F.col("k") * F.col("var_n2"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_alerts"),
            F.expr(
                "cast(sum(case when dev2 > k * k * var_n2"
                " then 1 else 0 end) * 1000000 div count(*) as bigint)"
            ).alias("alert_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Shipping-delay percentiles (selection operator, second domain)
# ---------------------------------------------------------------------------

@query(
    "olap_shipping_delay_percentiles",
    oracle="""
WITH d AS (
  SELECT o.o_orderpriority AS pri,
         CAST(epoch_us(l.l_shipdate) // 86400000000
              - epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) AS delay
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
ranked AS (
  SELECT pri, delay,
         row_number() OVER (PARTITION BY pri ORDER BY delay) AS rn,
         COUNT(*) OVER (PARTITION BY pri) AS n
  FROM d)
SELECT pri,
       CAST(MAX(n) AS BIGINT) AS n_lines,
       CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN delay END) AS BIGINT)
         AS p50_delay_days,
       CAST(MAX(CASE WHEN rn = (19 * n + 19) // 20 THEN delay END)
            AS BIGINT) AS p95_delay_days
FROM ranked GROUP BY pri
""",
)
def q_shipping_delay_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shipping-delay SLA percentiles per order priority (order date →
    line ship date, integer epoch days): exact p50/p95 computed by the
    DISTRIBUTED SELECTION operator — its second domain after the dwell
    percentiles, demonstrating the operator is generic over (group,
    integer value) inputs.  Five priority groups hold the full lineitem
    volume, exactly the low-cardinality/huge-group shape the bucket-
    histogram search exists for; the oracle is the rank-window form, so
    the selection plan is again pinned value-identical."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
        epoch_micros,
    )
    from sqlserver_cdc_to_kafka_spark.operators.selection import (
        exact_group_percentiles_df,
    )

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    d = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_orderpriority").alias("pri"),
            (
                int_div(epoch_micros(li, "l_shipdate"), 86400000000)
                - int_div(epoch_micros(orders, "o_orderdate"), 86400000000)
            ).alias("delay"),
        )
    )
    return exact_group_percentiles_df(
        d,
        "pri",
        "delay",
        [
            ("p50_delay_days", lambda n: (n + 1) // 2),
            ("p95_delay_days", lambda n: (19 * n + 19) // 20),
        ],
        "pri string, n_lines long, p50_delay_days long, p95_delay_days long",
    )


# ---------------------------------------------------------------------------
# Peak concurrent sessions
# ---------------------------------------------------------------------------

@query(
    "events_peak_concurrency",
    oracle=f"""
WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
marked AS (
  SELECT user_id, us,
         CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                   >= {_BOUNCE_GAP_US}
              OR lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM ev),
grouped AS (
  SELECT user_id, us,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us
                             ROWS UNBOUNDED PRECEDING) AS sess
  FROM marked),
sessions AS (
  SELECT MIN(us) AS s_lo, MAX(us) + {_BOUNCE_GAP_US} AS s_hi
  FROM grouped GROUP BY user_id, sess),
deltas AS (
  SELECT t, SUM(d) AS net FROM (
    SELECT s_lo AS t, 1 AS d FROM sessions
    UNION ALL
    SELECT s_hi AS t, -1 FROM sessions) u
  GROUP BY t),
running AS (
  SELECT t, SUM(net) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS conc
  FROM deltas)
SELECT CAST(MAX(conc) AS BIGINT) AS peak_concurrency,
       CAST(MIN(CASE WHEN conc = (SELECT MAX(conc) FROM running) THEN t END)
            AS BIGINT) AS first_peak_us,
       CAST(COUNT(*) AS BIGINT) AS n_boundary_points
FROM running
""",
)
def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PEAK CONCURRENT SESSIONS — the capacity-planning number: sessionize
    (same 10-min gap), turn sessions into +1/−1 boundary deltas, and take
    the max of the running sum, with the earliest instant it occurs.
    Interval counting again (olap_order_backlog's O(n) shape) but with a
    RUNNING MAX consumer; boundary points collapse per timestamp before
    the ordered window, which at 100 TB runs over distinct boundary
    instants — if even that is too hot, the standard fix is chunked
    prefix sums (per-partition totals broadcast as offsets), the
    operators/merge.py rank technique."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
        epoch_micros,
    )

    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "user_id", epoch_micros(events, "ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us")
    grouped = (
        ev.withColumn(
            "new_sess",
            (
                (F.col("us") - F.lag("us").over(w) >= _BOUNCE_GAP_US)
                | F.lag("us").over(w).isNull()
            ).cast("int"),
        )
        .withColumn(
            "sess",
            F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    sessions = grouped.groupBy("user_id", "sess").agg(
        F.min("us").alias("s_lo"),
        (F.max("us") + _BOUNCE_GAP_US).alias("s_hi"),
    )
    deltas = (
        sessions.select(F.col("s_lo").alias("t"), F.lit(1).alias("d"))
        .unionAll(
            sessions.select(F.col("s_hi").alias("t"), F.lit(-1).alias("d"))
        )
        .groupBy("t")
        .agg(F.sum("d").alias("net"))
    )
    # the running balance is a GLOBAL prefix sum over boundary points —
    # session-scale, so the plain total-order window would funnel every
    # boundary through one task; global_prefix_sum range-buckets it
    # (t is unique after the groupBy, so the order is total)
    from sqlserver_cdc_to_kafka_spark.operators.merge import global_prefix_sum

    running = global_prefix_sum(
        deltas, [F.col("t")], F.col("t").cast("double"), "net", "conc"
    ).select("t", "conc")
    peak = running.agg(F.max("conc").alias("peak"))
    return (
        running.crossJoin(F.broadcast(peak))
        .agg(
            F.max("peak").cast("bigint").alias("peak_concurrency"),
            F.min(
                F.when(F.col("conc") == F.col("peak"), F.col("t"))
            )
            .cast("bigint")
            .alias("first_peak_us"),
            F.count("*").cast("bigint").alias("n_boundary_points"),
        )
    )


# ---------------------------------------------------------------------------
# Anomaly run-length distribution (alert fatigue)
# ---------------------------------------------------------------------------

@query(
    "events_anomaly_runs",
    oracle="""
WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                   CAST(CAST(value AS DECIMAL(18,3)) * 1000 AS BIGINT) AS v
            FROM events),
st AS (
  SELECT user_id, event_id, us, v,
         COUNT(*) OVER w AS n_prior,
         SUM(v) OVER w AS s,
         SUM(v * v) OVER w AS q
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN 9 PRECEDING AND 1 PRECEDING)),
flagged AS (
  SELECT user_id, us, event_id,
         CASE WHEN n_prior >= 4
                   AND (n_prior * v - s) * (n_prior * v - s)
                       > 9 * (n_prior * q - s * s)
              THEN 1 ELSE 0 END AS anom
  FROM st),
runs AS (
  SELECT user_id, anom,
         SUM(CASE WHEN anom <> COALESCE(prev, -1) THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS UNBOUNDED PRECEDING) AS run_id
  FROM (SELECT user_id, us, event_id, anom,
               lag(anom) OVER (PARTITION BY user_id
                               ORDER BY us, event_id) AS prev
        FROM flagged)),
lens AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS run_len
  FROM runs WHERE anom = 1 GROUP BY user_id, run_id)
SELECT run_len, CAST(COUNT(*) AS BIGINT) AS n_runs
FROM lens GROUP BY run_len
""",
)
def q_anomaly_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANOMALY RUN-LENGTH distribution — the alert-fatigue profile: how
    often do 3-sigma anomalies (same integer-exact test as
    events_anomaly_zscore) arrive as singletons vs consecutive streaks
    per user.  Streaks come from gaps-and-islands over the anomaly flag
    (lag + change-point prefix sum in the per-user window); the output
    histogram is bounded by the longest streak.  Long runs mean the
    threshold is below the regime shift — re-tune via
    events_alert_backtest."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
        epoch_micros,
    )

    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "user_id",
        "event_id",
        epoch_micros(events, "ts").alias("us"),
        (F.col("value").cast("decimal(18,3)") * 1000)
        .cast("bigint")
        .alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-9, -1)
    )
    st = base.select(
        "user_id",
        "event_id",
        "us",
        "v",
        F.count("*").over(w).alias("n_prior"),
        F.sum("v").over(w).alias("s"),
        F.sum(F.col("v") * F.col("v")).over(w).alias("q"),
    )
    dev = F.col("n_prior") * F.col("v") - F.col("s")
    var_n2 = F.col("n_prior") * F.col("q") - F.col("s") * F.col("s")
    flagged = st.select(
        "user_id",
        "us",
        "event_id",
        F.when(
            (F.col("n_prior") >= 4) & (dev * dev > 9 * var_n2), 1
        )
        .otherwise(0)
        .alias("anom"),
    )
    wseq = Window.partitionBy("user_id").orderBy("us", "event_id")
    runs = flagged.withColumn(
        "prev", F.lag("anom").over(wseq)
    ).withColumn(
        "run_id",
        F.sum(
            F.when(
                F.col("anom") != F.coalesce(F.col("prev"), F.lit(-1)), 1
            ).otherwise(0)
        ).over(wseq.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    lens = (
        runs.filter(F.col("anom") == 1)
        .groupBy("user_id", "run_id")
        .agg(F.count("*").cast("bigint").alias("run_len"))
    )
    return lens.groupBy("run_len").agg(
        F.count("*").cast("bigint").alias("n_runs")
    )


# ---------------------------------------------------------------------------
# Basket-size histogram
# ---------------------------------------------------------------------------

@query(
    "olap_basket_size_histogram",
    oracle="""
WITH sizes AS (
  SELECT l_orderkey, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
         CAST(COUNT(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY l_orderkey),
h AS (
  SELECT n_parts, CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(n_lines) AS BIGINT) AS total_lines
  FROM sizes GROUP BY n_parts),
tot AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS all_orders FROM h)
SELECT h.n_parts, h.n_orders, h.total_lines,
       CAST(h.n_orders * 1000000 // t.all_orders AS BIGINT) AS share_ppm
FROM h CROSS JOIN tot t
""",
)
def q_basket_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BASKET-SIZE distribution: orders histogrammed by distinct-part
    count with traffic shares — the group-size profile that justifies the
    basket-affinity join's cost bound (Σ C(size,2) stays linear when this
    histogram's tail is short) and sizes recommendation candidate sets.
    Two hash aggregates and a scalar total."""
    li = load_table(spark, sf_dir, "lineitem")
    sizes = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_partkey").cast("bigint").alias("n_parts"),
        F.count("*").cast("bigint").alias("n_lines"),
    )
    h = sizes.groupBy("n_parts").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum("n_lines").cast("bigint").alias("total_lines"),
    )
    tot = h.agg(F.sum("n_orders").cast("bigint").alias("all_orders"))
    return h.crossJoin(F.broadcast(tot)).select(
        "n_parts",
        "n_orders",
        "total_lines",
        F.expr("cast(n_orders * 1000000 div all_orders as bigint)").alias(
            "share_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# Skyline (Pareto-optimal) sources
# ---------------------------------------------------------------------------

@query(
    "olap_skyline_sources",
    oracle="""
WITH src AS (
  SELECT source,
         CAST(SUM(len(list_filter(string_split(text, ' '),
                                  w -> length(w) > 0))) AS BIGINT) AS tokens,
         CAST(SUM(len(list_distinct(list_filter(string_split(text, ' '),
                                    w -> length(w) > 0))) * 100
                  // greatest(len(list_filter(string_split(text, ' '),
                                 w -> length(w) > 0)), 1)) * 100
              // COUNT(*) AS BIGINT) AS quality_x100
  FROM documents GROUP BY source)
SELECT a.source, a.tokens, a.quality_x100,
       CAST(CASE WHEN EXISTS (
         SELECT 1 FROM src b
         WHERE b.tokens >= a.tokens AND b.quality_x100 >= a.quality_x100
           AND (b.tokens > a.tokens OR b.quality_x100 > a.quality_x100)
       ) THEN 0 ELSE 1 END AS BIGINT) AS on_skyline
FROM src a
""",
)
def q_skyline_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE (Pareto-optimal) query over sources in the (tokens,
    quality) plane: a source is on the skyline iff no other source
    dominates it on both axes — the multi-objective shortlist mixture
    planning starts from (pipeline_mixture_budget then spends inside it).
    The dominance test is a self-join over the per-source AGGREGATE (20
    rows here; |sources| at any scale), so the quadratic is on the
    dimension table, never the corpus; all quantities integer."""
    words = "filter(split(text, ' '), w -> length(w) > 0)"
    docs = _docs(spark, sf_dir)
    src = docs.groupBy("source").agg(
        F.expr(f"cast(sum(size({words})) as bigint)").alias("tokens"),
        F.expr(
            f"cast(sum(size(array_distinct({words})) * 100 div "
            f"greatest(size({words}), 1)) * 100 div count(*) as bigint)"
        ).alias("quality_x100"),
    )
    b = src.select(
        F.col("tokens").alias("b_tokens"),
        F.col("quality_x100").alias("b_quality"),
    )
    dominated = (
        src.join(
            b,
            (F.col("b_tokens") >= F.col("tokens"))
            & (F.col("b_quality") >= F.col("quality_x100"))
            & (
                (F.col("b_tokens") > F.col("tokens"))
                | (F.col("b_quality") > F.col("quality_x100"))
            ),
            "left_semi",
        )
        .select("source")
        .withColumn("dom", F.lit(1))
    )
    return (
        src.join(dominated, "source", "left")
        .select(
            "source",
            "tokens",
            "quality_x100",
            F.when(F.col("dom").isNotNull(), 0)
            .otherwise(1)
            .cast("bigint")
            .alias("on_skyline"),
        )
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint detection
# ---------------------------------------------------------------------------

@query(
    "events_changepoint_cusum",
    oracle=f"""
WITH ev AS (SELECT event_type, epoch_us(ts) AS us,
                   CAST(CAST(value AS DECIMAL(18,3)) * 1000 AS BIGINT) AS v
            FROM events),
t0 AS (SELECT CAST(MIN(us) AS BIGINT) AS start_us FROM ev),
daily AS (
  SELECT event_type,
         CAST((us - t0.start_us) // {_TS_DAY_US} AS BIGINT) AS day,
         CAST(SUM(v) AS BIGINT) AS dv
  FROM ev CROSS JOIN t0 GROUP BY 1, 2),
tot AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(dv) AS BIGINT) AS total
  FROM daily GROUP BY event_type),
pre AS (
  SELECT d.event_type, d.day,
         SUM(d.dv) OVER (PARTITION BY d.event_type ORDER BY d.day
                         ROWS UNBOUNDED PRECEDING) AS prefix,
         row_number() OVER (PARTITION BY d.event_type ORDER BY d.day) AS k
  FROM daily d),
stat AS (
  SELECT p.event_type, p.day,
         abs(t.n_days * p.prefix - p.k * t.total) AS s
  FROM pre p JOIN tot t USING (event_type)
  WHERE p.k < t.n_days)
SELECT event_type,
       CAST(MIN(CASE WHEN s = m THEN day END) AS BIGINT) AS change_day,
       CAST(MAX(m) AS BIGINT) AS max_stat
FROM (SELECT event_type, day, s,
             MAX(s) OVER (PARTITION BY event_type) AS m
      FROM stat)
GROUP BY event_type
""",
)
def q_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM CHANGEPOINT detection per event type: the day where the
    cumulative deviation from the mean daily value peaks — the classic
    single-changepoint locator for regime shifts in a metric stream.
    Kept DIVISIONLESS-exact: the statistic |D·prefix_k − k·T| is the
    mean-deviation CUSUM multiplied through by the day count, so no
    float mean ever exists and the argmax (earliest-day tie-break) is
    engine-exact.  Events reduce to per-(type, day) totals before any
    window; the ordered prefix runs over the bounded calendar grid."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
        epoch_micros,
    )

    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "event_type",
        epoch_micros(events, "ts").alias("us"),
        (F.col("value").cast("decimal(18,3)") * 1000)
        .cast("bigint")
        .alias("v"),
    )
    t0 = ev.agg(F.min("us").cast("bigint").alias("start_us"))
    daily = (
        ev.crossJoin(F.broadcast(t0))
        .select(
            "event_type",
            int_div(F.col("us") - F.col("start_us"), _TS_DAY_US)
            .alias("day"),
            "v",
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v").cast("bigint").alias("dv"))
    )
    tot = daily.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum("dv").cast("bigint").alias("total"),
    )
    wday = Window.partitionBy("event_type").orderBy("day")
    pre = daily.select(
        "event_type",
        "day",
        F.sum("dv")
        .over(wday.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("prefix"),
        F.row_number().over(wday).alias("k"),
    )
    stat = (
        pre.join(tot, "event_type")
        .filter(F.col("k") < F.col("n_days"))
        .select(
            "event_type",
            "day",
            F.abs(
                F.col("n_days") * F.col("prefix")
                - F.col("k") * F.col("total")
            ).alias("s"),
        )
    )
    withmax = stat.withColumn(
        "m", F.max("s").over(Window.partitionBy("event_type"))
    )
    return withmax.groupBy("event_type").agg(
        F.min(F.when(F.col("s") == F.col("m"), F.col("day")))
        .cast("bigint")
        .alias("change_day"),
        F.max("m").cast("bigint").alias("max_stat"),
    )


# ---------------------------------------------------------------------------
# A/B test analysis (two-proportion z)
# ---------------------------------------------------------------------------

@query(
    "events_ab_test_analysis",
    oracle="""
WITH u AS (
  SELECT user_id,
         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 25, 8)
              AS BIGINT) % 2 AS arm,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(ROUND(value * 100) AS BIGINT)
                       ELSE 0 END) >= 60000
              THEN 1 ELSE 0 END AS converted
  FROM events GROUP BY user_id),
c AS (
  SELECT CAST(COUNT(*) FILTER (WHERE arm = 0) AS BIGINT) AS n_a,
         CAST(SUM(converted) FILTER (WHERE arm = 0) AS BIGINT) AS conv_a,
         CAST(COUNT(*) FILTER (WHERE arm = 1) AS BIGINT) AS n_b,
         CAST(SUM(converted) FILTER (WHERE arm = 1) AS BIGINT) AS conv_b
  FROM u)
SELECT n_a, conv_a, n_b, conv_b,
       CAST(conv_a * 1000000 // n_a AS BIGINT) AS rate_a_ppm,
       CAST(conv_b * 1000000 // n_b AS BIGINT) AS rate_b_ppm,
       ROUND((CAST(conv_b AS DOUBLE) / n_b - CAST(conv_a AS DOUBLE) / n_a)
             / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b)), 6) AS z_score
FROM c
""",
)
def q_ab_test_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B TEST readout: users split into two arms by a dedicated md5
    slice (chars 25-32 — disjoint from the split/shard/sampling slices,
    so experiment assignment is independent of every other hash
    decision), purchase conversion per arm, and the pooled two-proportion
    z-statistic.  Counts are exact integers; the z expression is one
    correctly-rounded IEEE formula over those identical integers
    (events_correlation pattern), so round(…, 6) is engine-exact.  One
    per-user aggregate + one scalar rollup."""
    events = load_table(spark, sf_dir, "events")
    u = events.groupBy("user_id").agg(
        F.when(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("bigint"),
                ).otherwise(0)
            )
            >= 60000,
            1,
        )
        .otherwise(0)
        .alias("converted")
    ).withColumn(
        "arm",
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 25, 8),
            16,
            10,
        ).cast("bigint")
        % 2,
    )
    c = u.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_b"),
    )
    pa = F.col("conv_a").cast("double") / F.col("n_a")
    pb = F.col("conv_b").cast("double") / F.col("n_b")
    pp = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    return c.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.expr("cast(conv_a * 1000000 div n_a as bigint)").alias(
            "rate_a_ppm"
        ),
        F.expr("cast(conv_b * 1000000 div n_b as bigint)").alias(
            "rate_b_ppm"
        ),
        F.round(
            (pb - pa)
            / F.sqrt(
                pp
                * (1 - pp)
                * (
                    F.lit(1.0) / F.col("n_a")
                    + F.lit(1.0) / F.col("n_b")
                )
            ),
            6,
        ).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Simpson diversity index
# ---------------------------------------------------------------------------

@query(
    "text_source_simpson_diversity",
    oracle="""
WITH s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
           FROM documents GROUP BY source),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM s)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
       t.total AS n_docs,
       CAST(SUM(s.n * (s.n - 1)) * 1000000
            // (t.total * (t.total - 1)) AS BIGINT)
         AS simpson_concentration_ppm,
       CAST(1000000 - SUM(s.n * (s.n - 1)) * 1000000
            // (t.total * (t.total - 1)) AS BIGINT)
         AS simpson_diversity_ppm
FROM s CROSS JOIN tot t GROUP BY t.total
""",
)
def q_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIMPSON DIVERSITY of the corpus source mix: the probability two
    random documents come from different sources, in exact integer ppm
    (Σn(n−1) / N(N−1) — a rational of counts, no entropy logs, so the
    hash gate applies where a Shannon-based metric could not).  Low
    diversity = one crawl dominates the mix; this is the one-number
    balance check next to the full pipeline_domain_mixture table.  One
    grouped count and a scalar rollup."""
    docs = _docs(spark, sf_dir)
    s = docs.groupBy("source").agg(F.count("*").cast("bigint").alias("n"))
    tot = s.agg(F.sum("n").cast("bigint").alias("total"))
    return (
        s.crossJoin(F.broadcast(tot))
        .groupBy("total")
        .agg(
            F.count("*").cast("bigint").alias("n_sources"),
            F.expr(
                "cast(sum(n * (n - 1)) * 1000000"
                " div (total * (total - 1)) as bigint)"
            ).alias("simpson_concentration_ppm"),
        )
        .select(
            "n_sources",
            F.col("total").alias("n_docs"),
            "simpson_concentration_ppm",
            (F.lit(1000000) - F.col("simpson_concentration_ppm"))
            .cast("bigint")
            .alias("simpson_diversity_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Lag-1 autocorrelation of daily series
# ---------------------------------------------------------------------------

@query(
    "events_autocorrelation_lag1",
    oracle=f"""
WITH ev AS (SELECT event_type, epoch_us(ts) AS us,
                   CAST(CAST(value AS DECIMAL(18,3)) * 1000 AS BIGINT) AS v
            FROM events),
t0 AS (SELECT CAST(MIN(us) AS BIGINT) AS start_us FROM ev),
daily AS (
  SELECT event_type,
         CAST((us - t0.start_us) // {_TS_DAY_US} AS BIGINT) AS day,
         CAST(SUM(v) AS BIGINT) AS dv
  FROM ev CROSS JOIN t0 GROUP BY 1, 2),
pairs AS (
  SELECT d.event_type, d.dv AS x, n.dv AS y
  FROM daily d JOIN daily n
    ON n.event_type = d.event_type AND n.day = d.day + 1),
m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS sxy,
         SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS sxx,
         SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS syy
  FROM pairs GROUP BY event_type)
SELECT event_type, n,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS acf1
FROM m
""",
)
def q_autocorrelation_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG-1 AUTOCORRELATION of each type's daily-value series — the
    persistence check run before choosing forecasting/alerting models
    (near-zero ACF ⇒ yesterday predicts nothing; the anomaly window can
    be short).  Consecutive-day pairs come from a self-join on day+1 over
    the per-(type, day) aggregate (bounded calendar grid, never raw
    events); Pearson r over the pairs follows the exact-moment pattern
    (integer/decimal(38,0) sums, one correctly-rounded IEEE final
    expression)."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
        epoch_micros,
    )

    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "event_type",
        epoch_micros(events, "ts").alias("us"),
        (F.col("value").cast("decimal(18,3)") * 1000)
        .cast("bigint")
        .alias("v"),
    )
    t0 = ev.agg(F.min("us").cast("bigint").alias("start_us"))
    daily = (
        ev.crossJoin(F.broadcast(t0))
        .select(
            "event_type",
            int_div(F.col("us") - F.col("start_us"), _TS_DAY_US)
            .alias("day"),
            "v",
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v").cast("bigint").alias("dv"))
    )
    nxt = daily.select(
        F.col("event_type").alias("n_type"),
        F.col("day").alias("n_day"),
        F.col("dv").alias("y"),
    )
    pairs = daily.join(
        nxt,
        (daily.event_type == nxt.n_type) & (nxt.n_day == daily.day + 1),
    ).select("event_type", F.col("dv").alias("x"), "y")
    dec = "decimal(19,0)"
    m = pairs.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("y").cast(dec)).alias("sxy"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y").cast(dec)).alias("syy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double")
    denx = F.sqrt(
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    deny = F.sqrt(
        nd * F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    )
    return m.select(
        "event_type", "n", F.round(num / (denx * deny), 6).alias("acf1")
    )


# ---------------------------------------------------------------------------
# RFM segmentation
# ---------------------------------------------------------------------------

@query(
    "events_rfm_segmentation",
    oracle="""
WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events),
horizon AS (SELECT CAST(MAX(us) AS BIGINT) AS end_us FROM ev),
rfm AS (
  SELECT user_id,
         CAST((h.end_us - MAX(CASE WHEN event_type = 'purchase' THEN us END))
              // 86400000000 AS BIGINT) AS recency_days,
         CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
           AS frequency,
         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN cents END),
                       0) AS BIGINT) AS monetary_cents
  FROM ev CROSS JOIN horizon h
  GROUP BY user_id, h.end_us
  HAVING COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) > 0),
scored AS (
  SELECT user_id,
         ntile(3) OVER (ORDER BY recency_days DESC, user_id) AS r_score,
         ntile(3) OVER (ORDER BY frequency, user_id) AS f_score,
         ntile(3) OVER (ORDER BY monetary_cents, user_id) AS m_score
  FROM rfm)
SELECT CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM scored GROUP BY 1
""",
)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM SEGMENTATION — the classic CRM cut: per purchasing user,
    Recency (days since last purchase vs the data-derived horizon),
    Frequency (purchase count) and Monetary (integer cents), each scored
    into terciles (ntile with (value, user_id) deterministic ties; best
    recency = LOWEST days, so recency orders DESC) and combined into the
    RFM segment code, reported as segment sizes.  The ntiles run over one
    row per user — unbounded at scale, so each is computed with
    global_ntile (range-bucketed rank + exact tile formula), not a
    single-partition ntile window."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
        epoch_micros,
    )

    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "user_id",
        "event_type",
        epoch_micros(events, "ts").alias("us"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    horizon = ev.agg(F.max("us").cast("bigint").alias("end_us"))
    is_p = F.col("event_type") == "purchase"
    rfm = (
        ev.crossJoin(F.broadcast(horizon))
        .groupBy("user_id", "end_us")
        .agg(
            F.max(F.when(is_p, F.col("us"))).alias("last_p"),
            F.count(F.when(is_p, 1)).cast("bigint").alias("frequency"),
            F.coalesce(F.sum(F.when(is_p, F.col("cents"))), F.lit(0))
            .cast("bigint")
            .alias("monetary_cents"),
        )
        .filter(F.col("frequency") > 0)
        .select(
            "user_id",
            F.expr("cast((end_us - last_p) div 86400000000 as bigint)").alias(
                "recency_days"
            ),
            "frequency",
            "monetary_cents",
        )
    )
    # three EXACT global ntiles, each scalable (range-bucketed rank + tile
    # formula) — the plain ntile windows ran one-task total orders over
    # one row per user (~1e9 at 100 TB); DESC components negate into the
    # ascending struct order
    from sqlserver_cdc_to_kafka_spark.operators.merge import global_ntile

    scored = rfm
    for out, exprs, bucket in (
        (
            "r_score",
            [(-F.col("recency_days")).alias("o1"), F.col("user_id")],
            (-F.col("recency_days")).cast("double"),
        ),
        (
            "f_score",
            [F.col("frequency"), F.col("user_id")],
            F.col("frequency").cast("double"),
        ),
        (
            "m_score",
            [F.col("monetary_cents"), F.col("user_id")],
            F.col("monetary_cents").cast("double"),
        ),
    ):
        scored = global_ntile(scored, exprs, bucket, 3, out)
    return (
        scored.select(
            (
                F.col("r_score") * 100
                + F.col("f_score") * 10
                + F.col("m_score")
            )
            .cast("bigint")
            .alias("segment")
        )
        .groupBy("segment")
        .agg(F.count("*").cast("bigint").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# Heaps-law vocabulary growth
# ---------------------------------------------------------------------------

@query(
    "pipeline_heaps_growth",
    oracle="""
WITH ks AS (SELECT unnest([100, 200, 300, 400, 500]) AS k),
toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
         FROM documents),
g AS (
  SELECT k.k,
         CAST(COUNT(DISTINCT t.w) AS BIGINT) AS vocab,
         CAST(COUNT(*) AS BIGINT) AS tokens
  FROM ks k JOIN toks t ON t.doc_id < k.k
  GROUP BY k.k)
SELECT CAST(k AS BIGINT) AS n_docs, vocab, tokens,
       CAST(vocab * 1000000 // tokens AS BIGINT) AS vocab_per_token_ppm
FROM g
""",
)
def q_heaps_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HEAPS-LAW vocabulary growth: distinct-word and token counts over
    growing doc-id prefixes — the measured curve behind every "the
    vocabulary is sublinear in the corpus" scale claim this engine's BPE
    and vocab operators make (flattening vocab_per_token_ppm = the law
    holding).  Prefix membership is a doc_id range predicate (pushed to
    the scan per sweep point); the sweep rides a 5-row broadcast; distinct
    counting per point is the usual two-level hash aggregate."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    ks = docs.sparkSession.createDataFrame(
        [(k,) for k in (100, 200, 300, 400, 500)], "k int"
    )
    g = (
        toks.join(F.broadcast(ks), toks.doc_id < F.col("k"))
        .groupBy("k")
        .agg(
            F.countDistinct("w").cast("bigint").alias("vocab"),
            F.count("*").cast("bigint").alias("tokens"),
        )
    )
    return g.select(
        F.col("k").cast("bigint").alias("n_docs"),
        "vocab",
        "tokens",
        F.expr("cast(vocab * 1000000 div tokens as bigint)").alias(
            "vocab_per_token_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# Gini coefficient of customer revenue
# ---------------------------------------------------------------------------

@query(
    "olap_gini_revenue",
    oracle="""
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey),
ranked AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents, o_custkey) AS i,
         COUNT(*) OVER () AS n,
         SUM(cents) OVER () AS total
  FROM spend),
m AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n, CAST(MAX(total) AS BIGINT) AS total,
         SUM(CAST(i AS DECIMAL(19,0)) * CAST(cents AS DECIMAL(19,0))) AS s_ix
  FROM ranked)
SELECT n, total,
       ROUND((2 * CAST(s_ix AS DOUBLE) - (CAST(n AS DOUBLE) + 1)
              * CAST(total AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(total AS DOUBLE)), 6) AS gini
FROM m
""",
)
def q_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GINI COEFFICIENT of customer revenue — the single-number
    inequality measure beside olap_revenue_pareto's per-nation 80% cut:
    G = (2·Σi·x_i − (n+1)·Σx)/(n·Σx) over ascending-sorted customer
    spend (rank ties broken on custkey).  Moments accumulate exactly
    (rank·cents products in decimal(38,0)); the final expression is one
    correctly-rounded IEEE formula over identical integers.  The global
    rank runs over one row per customer — unbounded at scale, so it is
    global_order_rank (range-bucketed), not a single-partition window."""
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    # global rank without the one-task total order (one row per customer —
    # unbounded): the house range-bucketed rank, ordered by the same
    # (cents, custkey) tie-broken total order
    from sqlserver_cdc_to_kafka_spark.operators.merge import global_order_rank

    ranked = global_order_rank(
        spend.withColumn("__ord", F.struct(F.col("cents"), F.col("o_custkey"))),
        "__ord",
        numeric_col="cents",
    ).select("cents", F.col("global_rank").alias("i"))
    dec = "decimal(19,0)"
    m = ranked.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("total"),
        F.sum(F.col("i").cast(dec) * F.col("cents").cast(dec)).alias("s_ix"),
    )
    nd = F.col("n").cast("double")
    return m.select(
        "n",
        "total",
        F.round(
            (
                2 * F.col("s_ix").cast("double")
                - (nd + 1) * F.col("total").cast("double")
            )
            / (nd * F.col("total").cast("double")),
            6,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# First-touch distribution
# ---------------------------------------------------------------------------

@query(
    "events_first_touch_distribution",
    oracle="""
WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
            FROM events),
firsts AS (
  SELECT user_id, event_type FROM (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY us, event_id) AS rn
    FROM ev) WHERE rn = 1),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM firsts)
SELECT f.event_type AS first_touch,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(COUNT(*) * 1000000 // t.n_users AS BIGINT) AS share_ppm
FROM firsts f CROSS JOIN tot t GROUP BY f.event_type, t.n_users
""",
)
def q_first_touch_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST-TOUCH distribution: which event type opens each user's
    history — the acquisition-channel report, and the sanity check behind
    funnel design (users whose first touch is 'purchase' convert with no
    attributable path).  One per-user rank window (partitioned) keeping
    rank 1, then a grouped count with shares."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
        epoch_micros,
    )

    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "user_id",
        "event_type",
        epoch_micros(events, "ts").alias("us"),
        "event_id",
    )
    firsts = (
        ev.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy("us", "event_id")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type")
    )
    tot = firsts.agg(F.count("*").cast("bigint").alias("n_users"))
    return (
        firsts.crossJoin(F.broadcast(tot))
        .groupBy(F.col("event_type").alias("first_touch"), "n_users")
        .agg(F.count("*").cast("bigint").alias("n_users_t"))
        .select(
            "first_touch",
            F.col("n_users_t").alias("n_users"),
            F.expr(
                "cast(n_users_t * 1000000 div n_users as bigint)"
            ).alias("share_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------

_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910,
    5: 79181, 6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


@query(
    "audit_benford_first_digit",
    oracle=f"""
WITH v AS (
  SELECT CAST(substr(CAST(CAST(ROUND(value * 100) AS BIGINT) AS VARCHAR),
              1, 1) AS BIGINT) AS digit
  FROM events WHERE value > 0),
c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY digit),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
bf AS (SELECT unnest([{", ".join(str(d) for d in range(1, 10))}]) AS digit,
              unnest([{", ".join(str(_BENFORD_PPM[d]) for d in range(1, 10))}])
                AS benford_ppm)
SELECT CAST(b.digit AS BIGINT) AS digit,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
       CAST(COALESCE(c.n, 0) * 1000000 // t.total AS BIGINT)
         AS observed_ppm,
       CAST(b.benford_ppm AS BIGINT) AS benford_ppm,
       CAST(abs(COALESCE(c.n, 0) * 1000000 // t.total - b.benford_ppm)
            AS BIGINT) AS abs_dev_ppm
FROM bf b LEFT JOIN c ON c.digit = b.digit CROSS JOIN tot t
""",
)
def q_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENFORD first-digit audit of transaction values — the classic
    forensic-accounting screen: observed leading-digit shares against
    Benford's expected distribution (fixed ppm literals, so no logs are
    evaluated at query time and the hash gate applies), with per-digit
    absolute deviation.  Values ride as integer cents; digit extraction
    is string-head of an integer (identical in both engines, no float
    formatting).  One grouped count, a scalar total, and a 9-row literal
    frame."""
    events = load_table(spark, sf_dir, "events")
    v = events.filter(F.col("value") > 0).select(
        F.substring(
            F.round(F.col("value") * 100).cast("bigint").cast("string"), 1, 1
        )
        .cast("bigint")
        .alias("digit")
    )
    c = v.groupBy("digit").agg(F.count("*").cast("bigint").alias("n"))
    tot = c.agg(F.sum("n").cast("bigint").alias("total"))
    bf = events.sparkSession.createDataFrame(
        [(d, _BENFORD_PPM[d]) for d in range(1, 10)],
        "digit long, benford_ppm long",
    )
    return (
        F.broadcast(bf)
        .join(c, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
            F.expr(
                "cast(coalesce(n, 0) * 1000000 div total as bigint)"
            ).alias("observed_ppm"),
            F.col("benford_ppm").cast("bigint").alias("benford_ppm"),
            F.expr(
                "cast(abs(coalesce(n, 0) * 1000000 div total - benford_ppm)"
                " as bigint)"
            ).alias("abs_dev_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Padding-waste bucket sweep
# ---------------------------------------------------------------------------

@query(
    "pipeline_padding_waste_sweep",
    oracle="""
WITH d AS (
  SELECT CAST(len(list_filter(string_split(text, ' '),
                              w -> length(w) > 0)) AS BIGINT) AS n_tokens
  FROM documents
  WHERE len(list_filter(string_split(text, ' '), w -> length(w) > 0)) > 0),
ks AS (SELECT unnest([64, 128, 256, 512]) AS bucket_len),
w AS (
  SELECT k.bucket_len,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(LEAST(d.n_tokens, k.bucket_len)) AS BIGINT)
           AS kept_tokens,
         CAST(SUM(k.bucket_len - LEAST(d.n_tokens, k.bucket_len)) AS BIGINT)
           AS pad_tokens,
         CAST(SUM(GREATEST(d.n_tokens - k.bucket_len, 0)) AS BIGINT)
           AS truncated_tokens
  FROM d CROSS JOIN ks k GROUP BY k.bucket_len)
SELECT CAST(bucket_len AS BIGINT) AS bucket_len, n_docs, kept_tokens,
       pad_tokens, truncated_tokens,
       CAST(pad_tokens * 1000000 // (n_docs * bucket_len) AS BIGINT)
         AS pad_waste_ppm,
       CAST(truncated_tokens * 1000000
            // (kept_tokens + truncated_tokens) AS BIGINT)
         AS truncation_ppm
FROM w
""",
)
def q_padding_waste_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PADDING/TRUNCATION trade-off sweep: if every document is padded or
    truncated to a fixed sequence length ∈ {{64, 128, 256, 512}}, how many
    slot-tokens are wasted on padding and how many real tokens are cut —
    the one-pass table that picks the training context length before
    pipeline_pack_sequences eliminates the padding entirely.  Doc lengths
    cross a 4-row literal broadcast; everything integer."""
    words = "filter(split(text, ' '), w -> length(w) > 0)"
    docs = _docs(spark, sf_dir)
    d = docs.select(
        F.expr(f"cast(size({words}) as bigint)").alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    ks = docs.sparkSession.createDataFrame(
        [(64,), (128,), (256,), (512,)], "bucket_len int"
    )
    w = (
        d.crossJoin(F.broadcast(ks))
        .groupBy("bucket_len")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.least(F.col("n_tokens"), F.col("bucket_len")))
            .cast("bigint")
            .alias("kept_tokens"),
            F.sum(
                F.col("bucket_len")
                - F.least(F.col("n_tokens"), F.col("bucket_len"))
            )
            .cast("bigint")
            .alias("pad_tokens"),
            F.sum(
                F.greatest(F.col("n_tokens") - F.col("bucket_len"), F.lit(0))
            )
            .cast("bigint")
            .alias("truncated_tokens"),
        )
    )
    return w.select(
        F.col("bucket_len").cast("bigint").alias("bucket_len"),
        "n_docs",
        "kept_tokens",
        "pad_tokens",
        "truncated_tokens",
        F.expr(
            "cast(pad_tokens * 1000000 div (n_docs * bucket_len) as bigint)"
        ).alias("pad_waste_ppm"),
        F.expr(
            "cast(truncated_tokens * 1000000"
            " div (kept_tokens + truncated_tokens) as bigint)"
        ).alias("truncation_ppm"),
    )


# ---------------------------------------------------------------------------
# Multi-window velocity features
# ---------------------------------------------------------------------------

@query(
    "events_velocity_features",
    oracle=f"""
WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
h AS (SELECT CAST(MAX(us) AS BIGINT) AS end_us FROM ev),
f AS (
  SELECT user_id,
         CAST(COUNT(*) FILTER (
           WHERE us > h.end_us - 1 * {_TS_DAY_US}) AS BIGINT) AS n_1d,
         CAST(COUNT(*) FILTER (
           WHERE us > h.end_us - 7 * {_TS_DAY_US}) AS BIGINT) AS n_7d,
         CAST(COUNT(*) FILTER (
           WHERE us > h.end_us - 30 * {_TS_DAY_US}) AS BIGINT) AS n_30d
  FROM ev CROSS JOIN h GROUP BY user_id)
SELECT user_id, n_1d, n_7d, n_30d,
       CAST(CASE WHEN n_7d > 0 THEN n_1d * 7000 // n_7d ELSE 0 END
            AS BIGINT) AS accel_1v7_x1000,
       CAST(CASE WHEN n_30d > 0 THEN n_7d * 30000 // (7 * n_30d) ELSE 0 END
            AS BIGINT) AS accel_7v30_x1000
FROM f
""",
)
def q_velocity_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window VELOCITY features per user: activity counts over the
    trailing 1/7/30 days (against the data-derived horizon — replayable)
    plus rate-acceleration ratios (recent rate ÷ longer-window rate,
    ×1000 integer) — the standard churn/engagement feature block a model
    snapshot job emits.  ONE conditional aggregate computes all windows
    (no per-window scans, no self-joins); ratios guard their zero
    denominators explicitly."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
        epoch_micros,
    )

    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "user_id", epoch_micros(events, "ts").alias("us")
    )
    h = ev.agg(F.max("us").cast("bigint").alias("end_us"))
    day = _TS_DAY_US

    def win(days: int, name: str):
        return (
            F.sum(
                F.when(
                    F.col("us") > F.col("end_us") - days * day, 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias(name)
        )

    f = (
        ev.crossJoin(F.broadcast(h))
        .groupBy("user_id")
        .agg(win(1, "n_1d"), win(7, "n_7d"), win(30, "n_30d"))
    )
    return f.select(
        "user_id",
        "n_1d",
        "n_7d",
        "n_30d",
        F.expr(
            "cast(case when n_7d > 0 then n_1d * 7000 div n_7d"
            " else 0 end as bigint)"
        ).alias("accel_1v7_x1000"),
        F.expr(
            "cast(case when n_30d > 0 then n_7d * 30000 div (7 * n_30d)"
            " else 0 end as bigint)"
        ).alias("accel_7v30_x1000"),
    )


# ---------------------------------------------------------------------------
# Mann-Kendall trend test
# ---------------------------------------------------------------------------

@query(
    "events_trend_mann_kendall",
    oracle=f"""
WITH ev AS (SELECT event_type, epoch_us(ts) AS us FROM events),
t0 AS (SELECT CAST(MIN(us) AS BIGINT) AS start_us FROM ev),
daily AS (
  SELECT event_type,
         CAST((us - t0.start_us) // {_TS_DAY_US} AS BIGINT) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM ev CROSS JOIN t0 GROUP BY 1, 2),
pairs AS (
  SELECT a.event_type,
         CASE WHEN b.n > a.n THEN 1 WHEN b.n < a.n THEN -1 ELSE 0 END AS sgn
  FROM daily a JOIN daily b
    ON b.event_type = a.event_type AND b.day > a.day)
SELECT event_type,
       CAST(SUM(sgn) AS BIGINT) AS s_statistic,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_concordant,
       CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_discordant
FROM pairs GROUP BY event_type
""",
)
def q_trend_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-KENDALL trend test on daily event counts per type: the
    nonparametric S statistic Σ sign(x_j − x_i) over all day pairs i<j —
    the monotone-trend detector that, unlike the OLS slope
    (events_trend_regression), is immune to outliers and needs no
    residual assumptions.  Entirely integer (sign comparisons and
    counts), so hash-exact by construction; the pair join runs over the
    BOUNDED per-(type, day) aggregate (30 days here, calendar-bounded at
    any scale), never raw events."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
        epoch_micros,
    )

    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "event_type", epoch_micros(events, "ts").alias("us")
    )
    t0 = ev.agg(F.min("us").cast("bigint").alias("start_us"))
    daily = (
        ev.crossJoin(F.broadcast(t0))
        .select(
            "event_type",
            int_div(F.col("us") - F.col("start_us"), _TS_DAY_US)
            .alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    b = daily.select(
        F.col("event_type").alias("b_type"),
        F.col("day").alias("b_day"),
        F.col("n").alias("b_n"),
    )
    pairs = daily.join(
        b,
        (daily.event_type == b.b_type) & (b.b_day > daily.day),
    ).select(
        "event_type",
        F.when(F.col("b_n") > F.col("n"), 1)
        .when(F.col("b_n") < F.col("n"), -1)
        .otherwise(0)
        .alias("sgn"),
    )
    return pairs.groupBy("event_type").agg(
        F.sum("sgn").cast("bigint").alias("s_statistic"),
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_concordant"),
        F.sum(F.when(F.col("sgn") == -1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_discordant"),
    )


# ---------------------------------------------------------------------------
# Kendall tau between quality signals
# ---------------------------------------------------------------------------

@query(
    "pipeline_kendall_tau_signals",
    oracle="""
WITH d AS (
  SELECT doc_id,
         CAST(len(list_distinct(list_transform(
                range(1, CAST(length(text) AS BIGINT) - 2),
                i -> substr(text, CAST(i AS INT), 4)))) * 1000000
              // (length(text) - 3) AS BIGINT) AS sig_compress,
         CAST(len(list_distinct(list_filter(string_split(text, ' '),
                                w -> length(w) > 0))) * 1000000
              // greatest(len(list_filter(string_split(text, ' '),
                              w -> length(w) > 0)), 1) AS BIGINT) AS sig_ttr
  FROM documents
  WHERE length(text) >= 4 AND doc_id % 10 = 0 AND doc_id < 10000),
pairs AS (
  SELECT CASE WHEN (a.sig_compress - b.sig_compress)
                   * (a.sig_ttr - b.sig_ttr) > 0 THEN 1
              WHEN (a.sig_compress - b.sig_compress)
                   * (a.sig_ttr - b.sig_ttr) < 0 THEN -1
              ELSE 0 END AS sgn
  FROM d a JOIN d b ON a.doc_id < b.doc_id)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_concordant,
       CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_discordant,
       CAST(SUM(sgn) * 1000000 // COUNT(*) AS BIGINT) AS tau_ppm
FROM pairs
""",
)
def q_kendall_tau_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KENDALL RANK CORRELATION between two quality signals — the
    distinct-4-gram compression ratio and the type-token ratio — on the
    contract-bounded doc sample: do the two filters rank documents the
    same way (redundant) or differently (complementary)?  Concordant/
    discordant sign pairs keep everything integer (τ in ppm with the
    standard τ_a denominator); the quadratic pair join runs over the
    ≤1000-row sample by contract, the same bound as the ANN audits —
    rank-correlating FULL corpora uses the per-signal rank windows
    instead."""
    docs = _docs(spark, sf_dir).filter(
        (F.length("text") >= 4)
        & (F.col("doc_id") % 10 == 0)
        & (F.col("doc_id") < 10000)
    )
    words = "filter(split(text, ' '), w -> length(w) > 0)"
    d = docs.select(
        "doc_id",
        F.expr(
            "cast(size(array_distinct(transform("
            "sequence(1, length(text) - 3), i -> substring(text, i, 4))))"
            " * 1000000 div (length(text) - 3) as bigint)"
        ).alias("sig_compress"),
        F.expr(
            f"cast(size(array_distinct({words})) * 1000000"
            f" div greatest(size({words}), 1) as bigint)"
        ).alias("sig_ttr"),
    )
    b = d.select(
        F.col("doc_id").alias("b_id"),
        F.col("sig_compress").alias("b_c"),
        F.col("sig_ttr").alias("b_t"),
    )
    prod = (F.col("sig_compress") - F.col("b_c")) * (
        F.col("sig_ttr") - F.col("b_t")
    )
    pairs = d.join(b, d.doc_id < b.b_id).select(
        F.when(prod > 0, 1).when(prod < 0, -1).otherwise(0).alias("sgn")
    )
    return pairs.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_concordant"),
        F.sum(F.when(F.col("sgn") == -1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_discordant"),
        F.expr(
            "cast(sum(sgn) * 1000000 div count(*) as bigint)"
        ).alias("tau_ppm"),
    )


# ---------------------------------------------------------------------------
# Customer repeat rate by cohort year
# ---------------------------------------------------------------------------

@query(
    "olap_customer_repeat_rate",
    oracle="""
WITH o AS (
  SELECT o_custkey,
         CAST(epoch_us(o_orderdate) // 86400000000 // 365 AS BIGINT)
           AS year_idx
  FROM orders),
firsts AS (SELECT o_custkey, CAST(MIN(year_idx) AS BIGINT) AS cohort
           FROM o GROUP BY o_custkey),
rep AS (
  SELECT f.cohort, f.o_custkey,
         MAX(CASE WHEN o.year_idx = f.cohort + 1 THEN 1 ELSE 0 END)
           AS returned
  FROM firsts f JOIN o ON o.o_custkey = f.o_custkey
  GROUP BY f.cohort, f.o_custkey)
SELECT cohort,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(returned) AS BIGINT) AS n_returned,
       CAST(SUM(returned) * 1000000 // COUNT(*) AS BIGINT) AS repeat_ppm
FROM rep GROUP BY cohort
""",
)
def q_customer_repeat_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer REPEAT RATE by acquisition year: of each cohort's
    customers, the fraction who order again in the following year-index —
    the single-number retention signal next to the cohort-LTV table
    (olap_cohort_ltv shares the same cohort key, so the two report rows
    line up).  Integer epoch-day years; two hash aggregates and one
    co-keyed join."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
        epoch_micros,
    )

    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_custkey",
        int_div(epoch_micros(orders, "o_orderdate"), 86400000000)
        .alias("day"),
    ).select(
        "o_custkey",
        F.expr("cast(day div 365 as bigint)").alias("year_idx"),
    )
    firsts = o.groupBy("o_custkey").agg(
        F.min("year_idx").cast("bigint").alias("cohort")
    )
    rep = (
        firsts.join(o, "o_custkey")
        .groupBy("cohort", "o_custkey")
        .agg(
            F.max(
                F.when(F.col("year_idx") == F.col("cohort") + 1, 1).otherwise(
                    0
                )
            ).alias("returned")
        )
    )
    return rep.groupBy("cohort").agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.sum("returned").cast("bigint").alias("n_returned"),
        F.expr(
            "cast(sum(returned) * 1000000 div count(*) as bigint)"
        ).alias("repeat_ppm"),
    )


# ---------------------------------------------------------------------------
# Character-class composition profile
# ---------------------------------------------------------------------------

@query(
    "text_charclass_profile",
    oracle="""
WITH p AS (
  SELECT source,
         CAST(SUM(length(text)) AS BIGINT) AS n_chars,
         CAST(SUM(length(regexp_replace(text, '[^a-z]', '', 'g')))
              AS BIGINT) AS n_alpha,
         CAST(SUM(length(regexp_replace(text, '[^0-9]', '', 'g')))
              AS BIGINT) AS n_digit,
         CAST(SUM(length(regexp_replace(text, '[^ ]', '', 'g')))
              AS BIGINT) AS n_space
  FROM documents GROUP BY source)
SELECT source, n_chars,
       CAST(n_alpha * 1000000 // n_chars AS BIGINT) AS alpha_ppm,
       CAST(n_digit * 1000000 // n_chars AS BIGINT) AS digit_ppm,
       CAST(n_space * 1000000 // n_chars AS BIGINT) AS space_ppm,
       CAST((n_chars - n_alpha - n_digit - n_space) * 1000000 // n_chars
            AS BIGINT) AS other_ppm
FROM p
""",
)
def q_charclass_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHARACTER-CLASS composition per source (alpha / digit / space /
    other in ppm) — the cheap encoding-drift and corruption detector: a
    source whose 'other' share jumps between crawls has mojibake,
    markup bleed-through, or a charset regression.  Counting by deleting
    the complement class (regexp_replace to empty) keeps both engines on
    identical regex semantics; one grouped aggregate."""
    docs = _docs(spark, sf_dir)

    def cnt(pattern: str, name: str):
        return (
            F.sum(F.length(F.regexp_replace(F.col("text"), pattern, "")))
            .cast("bigint")
            .alias(name)
        )

    p = docs.groupBy("source").agg(
        F.sum(F.length("text")).cast("bigint").alias("n_chars"),
        cnt("[^a-z]", "n_alpha"),
        cnt("[^0-9]", "n_digit"),
        cnt("[^ ]", "n_space"),
    )
    return p.select(
        "source",
        "n_chars",
        F.expr("cast(n_alpha * 1000000 div n_chars as bigint)").alias(
            "alpha_ppm"
        ),
        F.expr("cast(n_digit * 1000000 div n_chars as bigint)").alias(
            "digit_ppm"
        ),
        F.expr("cast(n_space * 1000000 div n_chars as bigint)").alias(
            "space_ppm"
        ),
        F.expr(
            "cast((n_chars - n_alpha - n_digit - n_space) * 1000000"
            " div n_chars as bigint)"
        ).alias("other_ppm"),
    )


# ---------------------------------------------------------------------------
# A/A stability audit
# ---------------------------------------------------------------------------

@query(
    "pipeline_aa_stability",
    oracle="""
WITH lab AS (
  SELECT source,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 25, 8) AS BIGINT)
           % 2 AS half,
         CAST(len(list_distinct(list_filter(string_split(text, ' '),
                                w -> length(w) > 0))) * 1000000
              // greatest(len(list_filter(string_split(text, ' '),
                              w -> length(w) > 0)), 1) AS BIGINT) AS q
  FROM documents),
m AS (
  SELECT source,
         CAST(COUNT(*) FILTER (WHERE half = 0) AS BIGINT) AS n_a,
         CAST(COUNT(*) FILTER (WHERE half = 1) AS BIGINT) AS n_b,
         CAST(SUM(q) FILTER (WHERE half = 0) AS BIGINT) AS sq_a,
         CAST(SUM(q) FILTER (WHERE half = 1) AS BIGINT) AS sq_b
  FROM lab GROUP BY source
  HAVING COUNT(*) FILTER (WHERE half = 0) > 0
     AND COUNT(*) FILTER (WHERE half = 1) > 0)
SELECT source, n_a, n_b,
       CAST(sq_a // n_a AS BIGINT) AS mean_q_a_ppm,
       CAST(sq_b // n_b AS BIGINT) AS mean_q_b_ppm,
       CAST(abs(sq_a // n_a - sq_b // n_b) AS BIGINT) AS abs_gap_ppm
FROM m
""",
)
def q_aa_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/A STABILITY audit: split each source's documents into two halves
    by the experiment hash slice (chars 25-32, same slice the A/B arms
    use) and compare the mean quality metric between halves — identical
    treatment, so any systematic gap means the randomization or metric is
    broken BEFORE a real experiment spends traffic on it.  Integer mean
    ppm per half with the absolute gap; empty halves excluded.  One
    grouped conditional aggregate."""
    words = "filter(split(text, ' '), w -> length(w) > 0)"
    docs = _docs(spark, sf_dir)
    lab = docs.select(
        "source",
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 25, 8),
                16,
                10,
            ).cast("bigint")
            % 2
        ).alias("half"),
        F.expr(
            f"cast(size(array_distinct({words})) * 1000000"
            f" div greatest(size({words}), 1) as bigint)"
        ).alias("q"),
    )
    m = (
        lab.groupBy("source")
        .agg(
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_a"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_b"),
            F.sum(F.when(F.col("half") == 0, F.col("q")).otherwise(0))
            .cast("bigint")
            .alias("sq_a"),
            F.sum(F.when(F.col("half") == 1, F.col("q")).otherwise(0))
            .cast("bigint")
            .alias("sq_b"),
        )
        .filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
    )
    return m.select(
        "source",
        "n_a",
        "n_b",
        F.expr("cast(sq_a div n_a as bigint)").alias("mean_q_a_ppm"),
        F.expr("cast(sq_b div n_b as bigint)").alias("mean_q_b_ppm"),
        F.expr("cast(abs(sq_a div n_a - sq_b div n_b) as bigint)").alias(
            "abs_gap_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# Session depth histogram
# ---------------------------------------------------------------------------

@query(
    "events_session_depth_histogram",
    oracle=f"""
WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
marked AS (
  SELECT user_id, us,
         CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                   >= {_BOUNCE_GAP_US}
              OR lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM ev),
grouped AS (
  SELECT user_id,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us
                             ROWS UNBOUNDED PRECEDING) AS sess
  FROM marked),
sizes AS (SELECT CAST(COUNT(*) AS BIGINT) AS depth
          FROM grouped GROUP BY user_id, sess),
h AS (SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_sessions
      FROM sizes GROUP BY depth),
tot AS (SELECT CAST(SUM(n_sessions) AS BIGINT) AS total FROM h)
SELECT h.depth, h.n_sessions,
       CAST(h.n_sessions * 1000000 // t.total AS BIGINT) AS share_ppm,
       CAST(SUM(h.n_sessions) OVER (ORDER BY h.depth
                                    ROWS UNBOUNDED PRECEDING) * 1000000
            // t.total AS BIGINT) AS cum_share_ppm
FROM h CROSS JOIN tot t
""",
)
def q_session_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION DEPTH distribution: events-per-session histogram with
    cumulative shares — the engagement spectrum between the bounce rate
    (depth = 1, its first row) and the longest marathon session; the
    cumulative column reads off "X% of sessions have ≤ d events" for any
    d.  Same 10-minute sessionization constants as the other session
    metrics; the histogram and its cumulative window are bounded by the
    maximum observed depth."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
        epoch_micros,
    )

    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "user_id", epoch_micros(events, "ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us")
    grouped = (
        ev.withColumn(
            "new_sess",
            (
                (F.col("us") - F.lag("us").over(w) >= _BOUNCE_GAP_US)
                | F.lag("us").over(w).isNull()
            ).cast("int"),
        )
        .withColumn(
            "sess",
            F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    sizes = grouped.groupBy("user_id", "sess").agg(
        F.count("*").cast("bigint").alias("depth")
    )
    h = sizes.groupBy("depth").agg(
        F.count("*").cast("bigint").alias("n_sessions")
    )
    tot = h.agg(F.sum("n_sessions").cast("bigint").alias("total"))
    # no-partition window (this spec and the SQL-string twin below), bounded
    # by contract: one row per distinct session DEPTH (~1e3 for the
    # 10-minute gap rule), aggregated before the window — the runtime
    # "WindowExec: No Partition Defined" warning is benign here
    wcum = Window.orderBy("depth").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return h.crossJoin(F.broadcast(tot)).select(
        "depth",
        "n_sessions",
        F.expr("cast(n_sessions * 1000000 div total as bigint)").alias(
            "share_ppm"
        ),
        F.expr(
            "cast(sum(n_sessions) over (order by depth"
            " rows unbounded preceding) * 1000000 div total as bigint)"
        ).alias("cum_share_ppm"),
    )


# ---------------------------------------------------------------------------
# Hash-collision audit
# ---------------------------------------------------------------------------

@query(
    "audit_hash_collisions",
    oracle="""
WITH h AS (
  SELECT CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) AS content_h,
         md5(text) AS full_h
  FROM documents),
short_g AS (SELECT content_h, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT full_h) AS BIGINT) AS n_full
            FROM h GROUP BY content_h)
SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct_short,
       CAST(SUM(n) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_full > 1 THEN n ELSE 0 END) AS BIGINT)
         AS n_docs_in_true_collisions,
       CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)
         AS n_docs_sharing_short
FROM short_g
""",
)
def q_hash_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HASH-COLLISION audit of the engine's own 32-bit content-hash space
    (the md5 slice the shard manifest and dedup prefilters ride): how
    many documents share a short hash at all, and how many of those are
    TRUE collisions (different full md5 under the same 32-bit slice —
    the birthday-bound failure mode that silently merges distinct
    content).  Non-zero true collisions at a given corpus size is the
    signal to widen the slice (the one-line change every short-hash
    consumer documents).  Two hash aggregates, all integer."""
    docs = _docs(spark, sf_dir)
    h = docs.select(
        F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("content_h"),
        F.md5(F.col("text")).alias("full_h"),
    )
    g = h.groupBy("content_h").agg(
        F.count("*").cast("bigint").alias("n"),
        F.countDistinct("full_h").cast("bigint").alias("n_full"),
    )
    return g.agg(
        F.count("*").cast("bigint").alias("n_distinct_short"),
        F.sum("n").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("n_full") > 1, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n_docs_in_true_collisions"),
        F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n_docs_sharing_short"),
    )


# ---------------------------------------------------------------------------
# Cross-modality key reconciliation
# ---------------------------------------------------------------------------

@query(
    "audit_modality_key_alignment",
    oracle="""
WITH d AS (SELECT doc_id FROM documents),
v AS (SELECT vec_id FROM embeddings),
j AS (SELECT d.doc_id, v.vec_id
      FROM d FULL OUTER JOIN v ON v.vec_id = d.doc_id)
SELECT CAST(COUNT(*) FILTER (WHERE doc_id IS NOT NULL
                               AND vec_id IS NOT NULL) AS BIGINT)
         AS n_aligned,
       CAST(COUNT(*) FILTER (WHERE vec_id IS NULL) AS BIGINT)
         AS n_doc_only,
       CAST(COUNT(*) FILTER (WHERE doc_id IS NULL) AS BIGINT)
         AS n_vec_only
FROM j
""",
)
def q_modality_key_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-MODALITY key reconciliation: the documents↔embeddings id
    spaces full-outer compared — texts with no vector (embedding job
    behind) and vectors with no text (stale index entries).  Every query
    that joins the two tables (drift, SemDeDup, hybrid consensus) assumes
    n_doc_only = n_vec_only = 0; this is the audit that PROVES it, the
    same set-reconciliation discipline the CDC layer applies to topics
    (val_set_reconciliation), pointed at the modality contract.  One
    co-keyed full-outer join on pruned single-column scans."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id")
    j = docs.join(emb, docs.doc_id == emb.vec_id, "full_outer")
    return j.agg(
        F.sum(
            F.when(
                F.col("doc_id").isNotNull() & F.col("vec_id").isNotNull(), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_aligned"),
        F.sum(F.when(F.col("vec_id").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_doc_only"),
        F.sum(F.when(F.col("doc_id").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_vec_only"),
    )


# ---------------------------------------------------------------------------
# ABC part classification
# ---------------------------------------------------------------------------

@query(
    "olap_abc_parts",
    oracle="""
WITH rev AS (
  SELECT l_partkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem GROUP BY l_partkey),
ranked AS (
  SELECT cents,
         SUM(cents) OVER (ORDER BY cents DESC, l_partkey
                          ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cents) OVER () AS total
  FROM rev),
classed AS (
  SELECT cents,
         CASE WHEN cum * 100 <= total * 80 THEN 'A'
              WHEN cum * 100 <= total * 95 THEN 'B'
              ELSE 'C' END AS abc_class
  FROM ranked)
SELECT abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(cents) AS BIGINT) AS class_cents
FROM classed GROUP BY abc_class
""",
)
def q_abc_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC CLASSIFICATION of parts by revenue: A-parts carry the first
    80% of cumulative revenue, B the next 15, C the tail — the inventory-
    prioritization classic (count how few parts deserve most of the
    attention).  Class boundaries are integer cross-products (cum·100 vs
    total·80/95, no float shares); revenue first collapses to one row per
    part — still unbounded at scale, so the cumulative is
    global_prefix_sum (range-bucketed) and the grand total a broadcast
    scalar, not single-partition windows."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("cents")
    )
    # one row per part is still ~1e9 rows at 100 TB: the cumulative runs
    # through global_prefix_sum (range-bucketed, DESC via negation) and
    # the grand total through a broadcast scalar — the previous
    # Window.orderBy cumsum AND the empty-partition total window were
    # both single-partition exchanges
    from sqlserver_cdc_to_kafka_spark.operators.merge import global_prefix_sum

    tot = rev.agg(F.sum("cents").cast("bigint").alias("total"))
    ranked = global_prefix_sum(
        rev,
        [(-F.col("cents")).alias("o1"), F.col("l_partkey")],
        (-F.col("cents")).cast("double"),
        "cents",
        "cum",
    ).crossJoin(F.broadcast(tot))
    classed = ranked.select(
        "cents",
        F.when(F.col("cum") * 100 <= F.col("total") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("total") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return classed.groupBy("abc_class").agg(
        F.count("*").cast("bigint").alias("n_parts"),
        F.sum("cents").cast("bigint").alias("class_cents"),
    )


# ---------------------------------------------------------------------------
# Daily-activity streaks
# ---------------------------------------------------------------------------

@query(
    "events_activity_streaks",
    oracle=f"""
WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
t0 AS (SELECT CAST(MIN(us) AS BIGINT) AS start_us FROM ev),
ud AS (
  SELECT DISTINCT user_id,
         CAST((us - t0.start_us) // {_TS_DAY_US} AS BIGINT) AS day
  FROM ev CROSS JOIN t0),
isl AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day)
           AS grp
  FROM ud),
streaks AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS streak_len
  FROM isl GROUP BY user_id, grp),
best AS (
  SELECT user_id, CAST(MAX(streak_len) AS BIGINT) AS max_streak
  FROM streaks GROUP BY user_id)
SELECT max_streak, CAST(COUNT(*) AS BIGINT) AS n_users
FROM best GROUP BY max_streak
""",
)
def q_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAILY-ACTIVITY STREAKS: each user's longest run of consecutive
    active days, histogrammed — the gamification/engagement metric behind
    streak badges and retention cohorting.  Uses the classic day −
    row_number() islands trick on the DISTINCT (user, day) relation (the
    only thing that grows; per-user windows, bounded calendar), then two
    tiny aggregates."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
        epoch_micros,
    )

    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "user_id", epoch_micros(events, "ts").alias("us")
    )
    t0 = ev.agg(F.min("us").cast("bigint").alias("start_us"))
    ud = (
        ev.crossJoin(F.broadcast(t0))
        .select(
            "user_id",
            int_div(F.col("us") - F.col("start_us"), _TS_DAY_US)
            .alias("day"),
        )
        .distinct()
    )
    isl = ud.withColumn(
        "grp",
        F.col("day")
        - F.row_number().over(Window.partitionBy("user_id").orderBy("day")),
    )
    streaks = isl.groupBy("user_id", "grp").agg(
        F.count("*").cast("bigint").alias("streak_len")
    )
    best = streaks.groupBy("user_id").agg(
        F.max("streak_len").cast("bigint").alias("max_streak")
    )
    return best.groupBy("max_streak").agg(
        F.count("*").cast("bigint").alias("n_users")
    )


# ---------------------------------------------------------------------------
# Spend-decile migration matrix
# ---------------------------------------------------------------------------

@query(
    "olap_decile_migration",
    oracle="""
WITH o AS (
  SELECT o_custkey,
         CAST(epoch_us(o_orderdate) // 86400000000 // 365 AS BIGINT)
           AS year_idx,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
spend AS (
  SELECT o_custkey, year_idx, CAST(SUM(cents) AS BIGINT) AS cents
  FROM o GROUP BY 1, 2),
dec AS (
  SELECT o_custkey, year_idx,
         CAST(ntile(5) OVER (PARTITION BY year_idx
                             ORDER BY cents DESC, o_custkey) AS BIGINT)
           AS quintile
  FROM spend),
m AS (
  SELECT a.quintile AS from_q, b.quintile AS to_q,
         CAST(COUNT(*) AS BIGINT) AS n_customers
  FROM dec a JOIN dec b
    ON b.o_custkey = a.o_custkey AND b.year_idx = a.year_idx + 1
  GROUP BY 1, 2)
SELECT from_q, to_q, n_customers FROM m
""",
)
def q_decile_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spend-QUINTILE MIGRATION matrix: customers' value tier in year Y
    vs Y+1 — the movement analysis behind churn-risk and upsell lists
    (heavy Q1→Q5 flow = value collapse the aggregate LTV table hides).
    Per-year ntile(5) with (spend DESC, custkey) deterministic ties
    (per-year partitions, each carrying the documented total-order
    caveat), then a self-join on (customer, year+1).  Only customers
    active in both years appear — entries/exits are the complement
    against olap_customer_repeat_rate."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
        epoch_micros,
    )

    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_custkey",
        int_div(epoch_micros(orders, "o_orderdate"), 86400000000)
        .alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    ).select(
        "o_custkey",
        F.expr("cast(day div 365 as bigint)").alias("year_idx"),
        "cents",
    )
    spend = o.groupBy("o_custkey", "year_idx").agg(
        F.sum("cents").cast("bigint").alias("cents")
    )
    dec = spend.select(
        "o_custkey",
        "year_idx",
        F.ntile(5)
        .over(
            Window.partitionBy("year_idx").orderBy(
                F.col("cents").desc(), "o_custkey"
            )
        )
        .cast("bigint")
        .alias("quintile"),
    )
    b = dec.select(
        F.col("o_custkey").alias("b_cust"),
        F.col("year_idx").alias("b_year"),
        F.col("quintile").alias("to_q"),
    )
    return (
        dec.join(
            b,
            (dec.o_custkey == b.b_cust)
            & (b.b_year == dec.year_idx + 1),
        )
        .groupBy(F.col("quintile").alias("from_q"), "to_q")
        .agg(F.count("*").cast("bigint").alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# Sampling-bias audit
# ---------------------------------------------------------------------------

@query(
    "pipeline_sampling_bias_audit",
    oracle="""
WITH scored AS (
  SELECT source,
         CAST(len(list_distinct(list_filter(string_split(text, ' '),
                                w -> length(w) > 0))) * 100
              // len(list_filter(string_split(text, ' '),
                                 w -> length(w) > 0)) AS BIGINT)
           AS quality_pct,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 17, 8) AS BIGINT)
           % 100 AS coin
  FROM documents
  WHERE len(list_filter(string_split(text, ' '), w -> length(w) > 0)) > 0),
m AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_all,
         CAST(SUM(quality_pct) AS BIGINT) AS q_all,
         CAST(COUNT(*) FILTER (WHERE coin < quality_pct) AS BIGINT)
           AS n_kept,
         CAST(COALESCE(SUM(quality_pct) FILTER (WHERE coin < quality_pct),
                       0) AS BIGINT) AS q_kept
  FROM scored GROUP BY source
  HAVING COUNT(*) FILTER (WHERE coin < quality_pct) > 0)
SELECT source, n_all, n_kept,
       CAST(q_all * 100 // n_all AS BIGINT) AS mean_q_all_x100,
       CAST(q_kept * 100 // n_kept AS BIGINT) AS mean_q_kept_x100,
       CAST(q_kept * 100 // n_kept - q_all * 100 // n_all AS BIGINT)
         AS uplift_x100
FROM m
""",
)
def q_sampling_bias_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLING-BIAS quantification: how much does the quality-
    proportional rejection sampler (pipeline_rejection_sample, same md5
    coin and score) actually SHIFT mean quality per source — the measured
    uplift that justifies the sampling pass, and the audit that catches a
    mis-wired coin (zero uplift = the sampler is random).  Integer
    basis-point means; sources with no survivors excluded.  One grouped
    conditional aggregate."""
    words = "filter(split(text, ' '), w -> length(w) > 0)"
    docs = _docs(spark, sf_dir).filter(F.expr(f"size({words}) > 0"))
    scored = docs.select(
        "source",
        F.expr(
            f"cast(size(array_distinct({words})) * 100 div size({words})"
            " as bigint)"
        ).alias("quality_pct"),
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 17, 8),
                16,
                10,
            ).cast("bigint")
            % 100
        ).alias("coin"),
    )
    kept = F.col("coin") < F.col("quality_pct")
    m = (
        scored.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_all"),
            F.sum("quality_pct").cast("bigint").alias("q_all"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias(
                "n_kept"
            ),
            F.coalesce(F.sum(F.when(kept, F.col("quality_pct"))), F.lit(0))
            .cast("bigint")
            .alias("q_kept"),
        )
        .filter(F.col("n_kept") > 0)
    )
    return m.select(
        "source",
        "n_all",
        "n_kept",
        F.expr("cast(q_all * 100 div n_all as bigint)").alias(
            "mean_q_all_x100"
        ),
        F.expr("cast(q_kept * 100 div n_kept as bigint)").alias(
            "mean_q_kept_x100"
        ),
        F.expr(
            "cast(q_kept * 100 div n_kept - q_all * 100 div n_all"
            " as bigint)"
        ).alias("uplift_x100"),
    )


# ---------------------------------------------------------------------------
# Supplier balance-risk profile
# ---------------------------------------------------------------------------

@query(
    "olap_supplier_balance_risk",
    oracle="""
WITH s AS (
  SELECT n.n_name AS nation,
         CAST(ROUND(sup.s_acctbal * 100) AS BIGINT) AS bal_cents
  FROM supplier sup JOIN nation n ON n.n_nationkey = sup.s_nationkey)
SELECT nation,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(COUNT(*) FILTER (WHERE bal_cents < 0) AS BIGINT)
         AS n_negative,
       CAST(COUNT(*) FILTER (WHERE bal_cents < 0) * 1000000 // COUNT(*)
            AS BIGINT) AS negative_ppm,
       CAST(SUM(CASE WHEN bal_cents < 0 THEN bal_cents ELSE 0 END)
            AS BIGINT) AS exposure_cents,
       CAST(MIN(bal_cents) AS BIGINT) AS worst_cents
FROM s GROUP BY nation
""",
)
def q_supplier_balance_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier BALANCE-RISK profile per nation: how many suppliers carry
    negative account balances, the total negative exposure in integer
    cents, and the worst single balance — the credit-risk rollup a
    procurement consumer of the replicated supplier table runs.  One
    broadcast-dimension join and one grouped conditional aggregate."""
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    s = sup.join(
        F.broadcast(nation), sup.s_nationkey == nation.n_nationkey
    ).select(
        F.col("n_name").alias("nation"),
        F.round(F.col("s_acctbal") * 100).cast("bigint").alias("bal_cents"),
    )
    neg = F.col("bal_cents") < 0
    return s.groupBy("nation").agg(
        F.count("*").cast("bigint").alias("n_suppliers"),
        F.sum(F.when(neg, 1).otherwise(0)).cast("bigint").alias("n_negative"),
        F.expr(
            "cast(sum(case when bal_cents < 0 then 1 else 0 end) * 1000000"
            " div count(*) as bigint)"
        ).alias("negative_ppm"),
        F.sum(F.when(neg, F.col("bal_cents")).otherwise(0))
        .cast("bigint")
        .alias("exposure_cents"),
        F.min("bal_cents").cast("bigint").alias("worst_cents"),
    )


# ---------------------------------------------------------------------------
# Weekly type-mix drift
# ---------------------------------------------------------------------------

@query(
    "events_type_mix_drift",
    oracle=f"""
WITH ev AS (SELECT event_type, epoch_us(ts) AS us FROM events),
t0 AS (SELECT CAST(MIN(us) AS BIGINT) AS start_us FROM ev),
w AS (
  SELECT event_type,
         CAST((us - t0.start_us) // (7 * {_TS_DAY_US}) AS BIGINT) AS week
  FROM ev CROSS JOIN t0),
c AS (SELECT week, event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM w GROUP BY 1, 2),
tot AS (SELECT week, CAST(SUM(n) AS BIGINT) AS wn FROM c GROUP BY week),
share AS (
  SELECT c.week, c.event_type,
         CAST(c.n * 1000000 // t.wn AS BIGINT) AS share_ppm
  FROM c JOIN tot t USING (week)),
drift AS (
  SELECT week, event_type, share_ppm,
         abs(share_ppm - lag(share_ppm)
               OVER (PARTITION BY event_type ORDER BY week)) AS shift_ppm
  FROM share)
SELECT event_type,
       CAST(MAX(shift_ppm) AS BIGINT) AS max_wow_shift_ppm,
       CAST(MIN(share_ppm) AS BIGINT) AS min_share_ppm,
       CAST(MAX(share_ppm) AS BIGINT) AS max_share_ppm
FROM drift GROUP BY event_type
""",
)
def q_type_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly TYPE-MIX drift monitor: each event type's traffic share per
    week and its largest week-over-week shift — the mix-stability check
    that catches instrumentation changes (a type suddenly doubling its
    share) before they poison downstream models.  Integer shares on the
    bounded week grid; the lag window runs over ≤|weeks| rows per type."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
        epoch_micros,
    )

    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "event_type", epoch_micros(events, "ts").alias("us")
    )
    t0 = ev.agg(F.min("us").cast("bigint").alias("start_us"))
    w = ev.crossJoin(F.broadcast(t0)).select(
        "event_type",
        ((F.col("us") - F.col("start_us")) / F.lit(7 * _TS_DAY_US))
        .cast("bigint")
        .alias("week"),
    )
    c = w.groupBy("week", "event_type").agg(
        F.count("*").cast("bigint").alias("n")
    )
    tot = c.groupBy("week").agg(F.sum("n").cast("bigint").alias("wn"))
    share = c.join(tot, "week").select(
        "week",
        "event_type",
        F.expr("cast(n * 1000000 div wn as bigint)").alias("share_ppm"),
    )
    drift = share.withColumn(
        "shift_ppm",
        F.abs(
            F.col("share_ppm")
            - F.lag("share_ppm").over(
                Window.partitionBy("event_type").orderBy("week")
            )
        ),
    )
    return drift.groupBy("event_type").agg(
        F.max("shift_ppm").cast("bigint").alias("max_wow_shift_ppm"),
        F.min("share_ppm").cast("bigint").alias("min_share_ppm"),
        F.max("share_ppm").cast("bigint").alias("max_share_ppm"),
    )


# ---------------------------------------------------------------------------
# Cross-validation fold stability
# ---------------------------------------------------------------------------

_CVS_FOLDS = 5


@query(
    "pipeline_cv_fold_stability",
    oracle=f"""
WITH lab AS (
  SELECT CAST('0x' || substr(md5('fold:' || CAST(doc_id AS VARCHAR)), 1, 8)
              AS BIGINT) % {_CVS_FOLDS} AS fold,
         CAST(len(list_distinct(list_filter(string_split(text, ' '),
                                w -> length(w) > 0))) * 1000000
              // greatest(len(list_filter(string_split(text, ' '),
                              w -> length(w) > 0)), 1) AS BIGINT) AS q
  FROM documents),
m AS (
  SELECT fold, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(q) // COUNT(*) AS BIGINT) AS mean_q_ppm
  FROM lab GROUP BY fold),
sp AS (SELECT CAST(MAX(mean_q_ppm) - MIN(mean_q_ppm) AS BIGINT) AS spread
       FROM m)
SELECT m.fold, m.n, m.mean_q_ppm, sp.spread AS fold_spread_ppm
FROM m CROSS JOIN sp
""",
)
def q_cv_fold_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-VALIDATION fold STABILITY: the mean quality metric per
    salted-hash fold (same 'fold:' salt as pipeline_cv_folds) and the
    max−min spread across folds — a wide spread means fold assignment
    correlates with the metric and CV estimates will be noisy; near-zero
    validates the salt.  The A/A audit generalized from 2 halves to K
    folds.  One grouped aggregate plus a scalar spread."""
    words = "filter(split(text, ' '), w -> length(w) > 0)"
    docs = _docs(spark, sf_dir)
    lab = docs.select(
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("fold:"), F.col("doc_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % _CVS_FOLDS
        ).alias("fold"),
        F.expr(
            f"cast(size(array_distinct({words})) * 1000000"
            f" div greatest(size({words}), 1) as bigint)"
        ).alias("q"),
    )
    m = lab.groupBy("fold").agg(
        F.count("*").cast("bigint").alias("n"),
        F.expr("cast(sum(q) div count(*) as bigint)").alias("mean_q_ppm"),
    )
    sp = m.agg(
        (F.max("mean_q_ppm") - F.min("mean_q_ppm"))
        .cast("bigint")
        .alias("fold_spread_ppm")
    )
    return m.crossJoin(F.broadcast(sp)).select(
        "fold", "n", "mean_q_ppm", "fold_spread_ppm"
    )


# ---------------------------------------------------------------------------
# New vs returning growth accounting
# ---------------------------------------------------------------------------

@query(
    "events_new_vs_returning",
    oracle=f"""
WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
t0 AS (SELECT CAST(MIN(us) AS BIGINT) AS start_us FROM ev),
ud AS (
  SELECT DISTINCT user_id,
         CAST((us - t0.start_us) // {_TS_DAY_US} AS BIGINT) AS day
  FROM ev CROSS JOIN t0),
firsts AS (SELECT user_id, CAST(MIN(day) AS BIGINT) AS first_day
           FROM ud GROUP BY user_id)
SELECT u.day,
       CAST(COUNT(*) FILTER (WHERE u.day = f.first_day) AS BIGINT)
         AS n_new,
       CAST(COUNT(*) FILTER (WHERE u.day > f.first_day) AS BIGINT)
         AS n_returning,
       CAST(COUNT(*) FILTER (WHERE u.day = f.first_day) * 1000000
            // COUNT(*) AS BIGINT) AS new_share_ppm
FROM ud u JOIN firsts f ON f.user_id = u.user_id
GROUP BY u.day
""",
)
def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROWTH ACCOUNTING: daily active users split into NEW (first-ever
    active day) vs RETURNING — the decomposition every growth team reads
    before celebrating a DAU spike (all-new = acquisition burst that may
    churn; all-returning = real retention).  The distinct (user, day)
    relation joins its own per-user first-day aggregate — two shuffles on
    user_id, integer shares, bounded day grid output."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import (
        epoch_micros,
    )

    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "user_id", epoch_micros(events, "ts").alias("us")
    )
    t0 = ev.agg(F.min("us").cast("bigint").alias("start_us"))
    ud = (
        ev.crossJoin(F.broadcast(t0))
        .select(
            "user_id",
            int_div(F.col("us") - F.col("start_us"), _TS_DAY_US)
            .alias("day"),
        )
        .distinct()
    )
    firsts = ud.groupBy("user_id").agg(
        F.min("day").cast("bigint").alias("first_day")
    )
    new_f = F.col("day") == F.col("first_day")
    ret_f = F.col("day") > F.col("first_day")
    return (
        ud.join(firsts, "user_id")
        .groupBy("day")
        .agg(
            F.sum(F.when(new_f, 1).otherwise(0)).cast("bigint").alias(
                "n_new"
            ),
            F.sum(F.when(ret_f, 1).otherwise(0)).cast("bigint").alias(
                "n_returning"
            ),
            F.expr(
                "cast(sum(case when day = first_day then 1 else 0 end)"
                " * 1000000 div count(*) as bigint)"
            ).alias("new_share_ppm"),
        )
    )
