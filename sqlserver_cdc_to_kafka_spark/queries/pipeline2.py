"""Training-data pipeline operators, part 2: deterministic dataset splits,
sequence packing, embedding hygiene — the remaining everyday ops of a
100 TB corpus build, each hash-checked against DuckDB."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.queries.pipeline import _docs, _emb
from sqlserver_cdc_to_kafka_spark.registry import query

_CTX_WINDOW = 512  # tokens per packed sequence (fixture-scaled)


@query(
    "pipeline_split_train_eval",
    oracle="""
SELECT source,
       CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                 % 100 < 95
            THEN 'train' ELSE 'eval' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
FROM documents GROUP BY 1, 2
""",
)
def q_split_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 95/5 train/eval split by content-independent id hash —
    NEVER rand(): the same doc lands in the same split on every run, any
    engine, any partitioning (md5 of the id, mod 100). Grouped counts per
    (source, split) audit the split balance."""
    docs = _docs(spark, sf_dir)
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint") % 100
    return (
        docs.withColumn("split", F.when(bucket < 95, "train").otherwise("eval"))
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
        )
    )


@query(
    "pipeline_pack_sequences",
    oracle=f"""
WITH toks AS (
  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens
  FROM documents),
packed AS (
  SELECT source, doc_id, n_tokens,
         CAST((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n_tokens)
              // {_CTX_WINDOW} AS BIGINT) AS pack_id
  FROM toks)
SELECT source, pack_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM packed GROUP BY 1, 2
""",
    bench=True,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concatenate documents (per source, in id order)
    into fixed context windows — pack id = exclusive-prefix token count div
    window size. The running token sum uses the bucketed two-pass prefix sum
    (``grouped_prefix_sum``): with only a handful of source values, a plain
    ``PARTITION BY source`` window would funnel each source's entire corpus
    through one task at 100 TB; range-bucketing on doc_id keeps every slice
    parallel while producing the identical deterministic order (no rand)."""
    from sqlserver_cdc_to_kafka_spark.operators.merge import grouped_prefix_sum

    docs = _docs(spark, sf_dir).select(
        "source", "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    summed = grouped_prefix_sum(
        docs, "source", "doc_id", "n_tokens", out_col="__run_tokens"
    )
    packed = summed.withColumn(
        "pack_id",
        ((F.col("__run_tokens") - F.col("n_tokens")) / _CTX_WINDOW).cast("bigint"),
    ).drop("__run_tokens")
    return packed.groupBy("source", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@query(
    "pipeline_embedding_stats",
    oracle="""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
SELECT label,
       COUNT(*) AS n_vecs,
       CAST(len(v) AS INT) AS dim,
       ROUND(AVG(sqrt(list_dot_product(v, v))), 6) AS avg_norm,
       ROUND(MIN(sqrt(list_dot_product(v, v))), 6) AS min_norm,
       ROUND(MAX(sqrt(list_dot_product(v, v))), 6) AS max_norm,
       COUNT(*) FILTER (WHERE sqrt(list_dot_product(v, v)) < 1e-9)
         AS n_zero_vectors
FROM e GROUP BY label, len(v)
""",
)
def q_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding hygiene: per-label norm distribution, dimension check,
    zero-vector detection — the sanity pass before any ANN index build.
    All JVM-side array math (aggregate/sqrt), one scan."""
    from sqlserver_cdc_to_kafka_spark.pipeline.similarity import as_double_array, l2_norm

    emb = _emb(spark, sf_dir)
    norm = l2_norm(as_double_array("embedding"))
    return (
        emb.select("label", F.size("embedding").alias("dim"), norm.alias("norm"))
        .groupBy("label", "dim")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg("norm"), 6).alias("avg_norm"),
            F.round(F.min("norm"), 6).alias("min_norm"),
            F.round(F.max("norm"), 6).alias("max_norm"),
            F.count_if(F.col("norm") < 1e-9).alias("n_zero_vectors"),
        )
        .select(
            "label", "n_vecs", "dim", "avg_norm", "min_norm", "max_norm",
            "n_zero_vectors",
        )
    )


def _clusters_oracle() -> str:
    from sqlserver_cdc_to_kafka_spark.queries.pipeline import _minhash_oracle

    pairs = _minhash_oracle().strip()
    return f"""
WITH pairs AS ({pairs}),
und AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
verts AS (SELECT DISTINCT src AS doc_id FROM und),
reach(root, node) AS (
  SELECT doc_id, doc_id FROM verts
  UNION
  SELECT r.root, u.dst FROM reach r JOIN und u ON r.node = u.src)
SELECT root AS doc_id, MIN(node) AS component
FROM reach GROUP BY root
"""


@query("dedup_clusters", oracle="WITH RECURSIVE " + _clusters_oracle().split("WITH ", 1)[1])
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: connected components over the MinHash-LSH
    candidate graph (iterative min-label propagation; the oracle is a
    recursive-CTE reachability closure). component = min doc_id in the
    cluster = the canonical survivor of the dedup."""
    from sqlserver_cdc_to_kafka_spark.pipeline.components import connected_components
    from sqlserver_cdc_to_kafka_spark.pipeline.dedup import (
        minhash_lsh_candidate_pairs,
    )

    docs = _docs(spark, sf_dir)
    pairs = minhash_lsh_candidate_pairs(docs, "doc_id")
    return connected_components(pairs)


@query(
    "dedup_clusters_star",
    oracle="WITH RECURSIVE " + _clusters_oracle().split("WITH ", 1)[1],
)
def q_dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second physical strategy for near-dup clustering: alternating
    large-star/small-star (O(log n) rounds, diameter-independent — the
    100 TB path for long transitive dup chains) over the same MinHash-LSH
    candidate graph, against the same recursive-CTE oracle as
    `dedup_clusters`. One semantic contract, two executions — like the
    `ann_cosine_topk` / `_vectorized` pair."""
    from sqlserver_cdc_to_kafka_spark.pipeline.components import (
        connected_components_star,
    )
    from sqlserver_cdc_to_kafka_spark.pipeline.dedup import (
        minhash_lsh_candidate_pairs,
    )

    docs = _docs(spark, sf_dir)
    pairs = minhash_lsh_candidate_pairs(docs, "doc_id")
    return connected_components_star(pairs)


_ANN_TOPK_ORACLE = """
WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS c_id, embedding::DOUBLE[] AS cv FROM embeddings),
s AS (SELECT q_id, c_id,
             ROUND(list_cosine_similarity(qv, cv), 6) AS cos
      FROM q, c)
SELECT q_id, c_id, cos,
       CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS BIGINT) AS rank
FROM s QUALIFY rank <= 10
"""


@query("ann_cosine_topk_vectorized", oracle=_ANN_TOPK_ORACLE, bench=True)
def q_ann_cosine_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow/numpy physical variant of `ann_cosine_topk`: one matmul per
    candidate batch inside mapInPandas, batch-local top-k, global re-rank.
    Same oracle as the expression-fold version — two physical strategies,
    one semantic contract."""
    from sqlserver_cdc_to_kafka_spark.pipeline.similarity import (
        cosine_topk_vectorized,
    )

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    return cosine_topk_vectorized(queries, emb, "vec_id", "embedding", k=10)


_STRATA_RATES = {"wiki": 90, "web": 40, "code": 75}  # per-source keep %


def _strata_case(expr: str) -> str:
    whens = " ".join(
        f"WHEN source = '{s}' THEN {r}" for s, r in _STRATA_RATES.items()
    )
    return f"CASE {whens} ELSE 60 END"


@query(
    "pipeline_stratified_sample",
    oracle=f"""
WITH s AS (
  SELECT source,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8) AS BIGINT)
           % 100 AS bucket
  FROM documents)
SELECT source,
       COUNT(*) AS n_total,
       COUNT(*) FILTER (WHERE bucket < {_strata_case('source')}) AS n_sampled
FROM s GROUP BY source
""",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with per-source rates (domain reweighting — the
    standard corpus-mixing step). Hash-bucketed (md5 of id, chars 9-16 so
    the split and sample buckets are independent), never rand(): the sample
    is stable across runs, engines and partitionings."""
    docs = _docs(spark, sf_dir)
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 9, 8), 16, 10
    ).cast("bigint") % 100
    rate = F.lit(60)
    for s, r in _STRATA_RATES.items():
        rate = F.when(F.col("source") == s, r).otherwise(rate)
    return (
        docs.select("source", bucket.alias("bucket"), rate.alias("rate"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            F.count_if(F.col("bucket") < F.col("rate")).alias("n_sampled"),
        )
    )


_MIX_ALPHA = 0.7  # temperature: < 1 upweights small sources
_MIX_BUDGET = 0.5  # sampled corpus size as a fraction of the full corpus
_MIX_GRAIN = 1_000_000  # hash-bucket granularity for the realized sample


@query(
    "pipeline_domain_mixture",
    oracle=f"""
WITH counts AS (SELECT source, COUNT(*) AS n_total FROM documents GROUP BY source),
tot AS (SELECT SUM(n_total) AS corpus_n, SUM(pow(n_total, {_MIX_ALPHA})) AS z
        FROM counts),
w AS (SELECT source, n_total,
             pow(n_total, {_MIX_ALPHA}) / z AS weight,
             LEAST(n_total,
                   CAST(FLOOR(ROUND(corpus_n * {_MIX_BUDGET} * pow(n_total, {_MIX_ALPHA}) / z, 6))
                        AS BIGINT)) AS n_target
      FROM counts, tot),
t AS (SELECT source, n_total, weight, n_target,
             CAST(FLOOR({_MIX_GRAIN}.0 * n_target / n_total) AS BIGINT) AS thresh
      FROM w),
b AS (SELECT source,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 17, 8) AS BIGINT)
               % {_MIX_GRAIN} AS bucket
      FROM documents)
SELECT t.source, t.n_total, ROUND(t.weight, 6) AS weight, t.n_target,
       COUNT(*) FILTER (WHERE b.bucket < t.thresh) AS n_sampled
FROM b JOIN t ON b.source = t.source
GROUP BY t.source, t.n_total, t.weight, t.n_target
""",
)
def q_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixture (the multinomial-sampling step of
    multilingual/multi-domain corpus prep): source weight ∝ n^α (α = 0.7
    upweights small domains), a total token budget of half the corpus, and
    the realized sample drawn by deterministic id-hash buckets (md5 chars
    17-24 — independent of the split and strata buckets; never rand()).
    Downsampling only — n_target caps at n_total. Two passes over
    `documents`: a tiny per-source count agg, then one broadcast join of the
    per-source thresholds onto the corpus scan — no shuffle of the big side
    beyond the final per-source agg."""
    docs = _docs(spark, sf_dir)
    counts = docs.groupBy("source").agg(F.count("*").alias("n_total"))
    tot = counts.agg(
        F.sum("n_total").alias("corpus_n"),
        F.sum(F.pow(F.col("n_total").cast("double"), _MIX_ALPHA)).alias("z"),
    )
    w = (
        counts.crossJoin(F.broadcast(tot))
        .withColumn(
            "weight",
            F.pow(F.col("n_total").cast("double"), _MIX_ALPHA) / F.col("z"),
        )
        .withColumn(
            # ROUND-before-FLOOR epsilon snap: z = SUM(pow(n, alpha)) is a
            # FLOAT sum, so its last bits depend on partial-agg combine
            # order (Spark task scheduling; DuckDB's own order).  With
            # near-equal source counts, corpus_n * budget * weight lands
            # ANALYTICALLY on an integer, and those order-dependent bits
            # decide the floor — n_sampled flapped by 1-2 between
            # otherwise-identical sf0.1 sweeps (caught by the r12
            # end-of-round witness).  Snapping to 6 decimals first makes
            # the floor order-independent: summation noise is ~1e-10
            # absolute here, 5000x inside the 5e-7 snap window.  Mirrored
            # in the DuckDB oracle above.
            "n_target",
            F.least(
                F.col("n_total"),
                F.floor(
                    F.round(
                        F.col("corpus_n") * _MIX_BUDGET * F.col("weight"), 6
                    )
                ).cast("bigint"),
            ),
        )
        .withColumn(
            "thresh",
            F.floor(
                F.lit(_MIX_GRAIN) * F.col("n_target") / F.col("n_total")
            ).cast("bigint"),
        )
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 17, 8), 16, 10
        ).cast("bigint")
        % _MIX_GRAIN
    )
    return (
        docs.select("source", bucket.alias("bucket"))
        .join(
            F.broadcast(
                w.select("source", "n_total", "weight", "n_target", "thresh")
            ),
            "source",
        )
        .groupBy("source")
        .agg(
            F.first("n_total").alias("n_total"),
            F.round(F.first("weight"), 6).alias("weight"),
            F.first("n_target").alias("n_target"),
            F.count_if(F.col("bucket") < F.col("thresh")).alias("n_sampled"),
        )
    )


def _two_stage_oracle() -> str:
    from sqlserver_cdc_to_kafka_spark.queries.pipeline import (
        _DUCK_SHINGLES,
        _minhash_oracle,
    )

    pairs = _minhash_oracle().strip()
    return f"""
WITH cand AS ({pairs}),
{_DUCK_SHINGLES},
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingled GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
  FROM cand c
  JOIN shingled sa ON sa.doc_id = c.doc_a
  JOIN shingled sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b)
SELECT i.doc_a, i.doc_b,
       ROUND(i.inter / CAST(za.sz + zb.sz - i.inter AS DOUBLE), 6) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
WHERE ROUND(i.inter / CAST(za.sz + zb.sz - i.inter AS DOUBLE), 6) >= 0.3
"""


@query("dedup_two_stage", oracle=_two_stage_oracle(), bench=True)
def q_dedup_two_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production dedup composition: sub-quadratic LSH candidate
    generation, then EXACT Jaccard verification only on candidates — the
    two stages the sf-scale queries exercise separately, composed. At
    100 TB the verify stage touches |candidates| pairs, never |docs|².

    r16 (guide §2.4 — this was a frozen bench sentinel, re-pinned this
    round): the LSH candidate pass now derives its signature subtree ONCE
    (the SHUFFLE_MERGE ReusedExchange inside minhash_lsh_candidate_pairs)
    instead of once per self-join side — sf1 same-boot A/B 6.4 -> 6.0 s.
    The verify tail deliberately KEEPS the r15 shape (intersection count
    per (doc_a, doc_b), then two broadcast size joins on the tiny candidate
    table): two measured r16 alternatives REGRESSED at sf1 and were
    reverted — (a) persisting one shared exploded index (~20M rows at sf1;
    the deserialized cache write cost more than the streamed re-derivations
    it saved: 7.5-7.8 s vs 6.4), and (b) carrying per-doc sizes through the
    verify index into the aggregate grouping key (the ngram_jaccard r15
    pattern — but HERE the index rides a 20M-row BROADCAST, which the extra
    column widens, and the grouping key doubles: 8.1-8.5 s vs 6.4). The
    size expression and output are identical in every variant
    (oracle-checked at 3 SFs each time)."""
    from sqlserver_cdc_to_kafka_spark.pipeline.dedup import (
        minhash_lsh_candidate_pairs,
    )
    from sqlserver_cdc_to_kafka_spark.pipeline.text import word_shingles

    from sqlserver_cdc_to_kafka_spark.pipeline.dedup import shingle_index

    docs = _docs(spark, sf_dir)
    cand = minhash_lsh_candidate_pairs(docs, "doc_id")
    idx = shingle_index(docs, "doc_id")
    sizes = docs.select(
        "doc_id", F.size(word_shingles("text")).alias("sz")
    )
    ia = idx.select(F.col("doc_id").alias("doc_a"), "shingle")
    ib = idx.select(
        F.col("doc_id").alias("doc_b2"), F.col("shingle").alias("shingle_b")
    )
    inter = (
        cand.join(ia, "doc_a")
        .join(
            ib,
            (F.col("doc_b") == F.col("doc_b2"))
            & (F.col("shingle") == F.col("shingle_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.3)
    )


@query(
    "text_bigram_stats",
    oracle="""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
bigrams AS (
  SELECT unnest(list_transform(range(1, len(ws)),
                i -> ws[i] || ' ' || ws[i+1])) AS bigram
  FROM words WHERE len(ws) >= 2)
SELECT bigram, COUNT(*) AS n
FROM bigrams GROUP BY bigram
HAVING COUNT(*) >= (SELECT COUNT(*) FROM documents) / 50.0
""",
)
def q_text_bigram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus n-gram statistics (the language-model / contamination-check
    primitive): bigram frequencies above a support threshold. The threshold
    scales with corpus size (|docs| / 50) so the query is non-degenerate at
    every SF; the scalar is folded in via a broadcast 1-row cross join, not a
    driver collect. Same let-binding shingle trick as word_shingles (split
    evaluated once per row); one explode + one hash aggregation — linear in
    corpus size."""
    docs = _docs(spark, sf_dir)
    bigrams = F.expr(
        "transform(array(split(text, ' ')), ws -> CASE WHEN size(ws) >= 2 "
        "THEN transform(sequence(0, size(ws) - 2), "
        "i -> concat_ws(' ', slice(ws, i + 1, 2))) "
        "ELSE array() END)[0]"
    )
    support = docs.agg((F.count("*") / F.lit(50.0)).alias("_min_n"))
    return (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .join(F.broadcast(support))
        .filter(F.col("n") >= F.col("_min_n"))
        .drop("_min_n")
    )


_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_NUM_RE = "[0-9]{6,}"


@query(
    "text_pii_scan",
    oracle=f"""
SELECT source,
       COUNT(*) AS n_docs,
       COUNT(*) FILTER (WHERE regexp_matches(text, '{_EMAIL_RE}'))
         AS n_with_email,
       COUNT(*) FILTER (WHERE regexp_matches(text, '{_NUM_RE}'))
         AS n_with_long_number,
       CAST(SUM(len(regexp_extract_all(text, '{_EMAIL_RE}'))) AS BIGINT)
         AS n_emails
FROM documents GROUP BY source
""",
)
def q_text_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safety/PII scan: per source, documents containing email addresses or
    long digit runs (id/phone shaped), plus total email hits — the filter
    stage every training corpus runs before release. Pure regexp built-ins,
    one scan."""
    docs = _docs(spark, sf_dir)
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.count_if(F.col("text").rlike(_EMAIL_RE)).alias("n_with_email"),
        F.count_if(F.col("text").rlike(_NUM_RE)).alias("n_with_long_number"),
        F.sum(F.regexp_count("text", F.lit(_EMAIL_RE))).alias("n_emails"),
    )


@query(
    "pipeline_shuffle_order",
    oracle="""
SELECT doc_id,
       md5(CAST(doc_id AS VARCHAR) || ':shuffle:42') AS shuffle_key,
       CAST(row_number() OVER (
         ORDER BY md5(CAST(doc_id AS VARCHAR) || ':shuffle:42')) AS BIGINT)
         AS position
FROM documents
QUALIFY position <= 200
""",
)
def q_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle: training order = rank of a seeded id
    hash — reproducible on any engine/partitioning (no rand()), re-seedable
    per epoch by changing the salt. The rank is the bucketed range rank
    (``global_order_rank``): the md5 key's fixed-width numeric prefix range-
    buckets the rows (monotone in the string order), each bucket ranks in
    parallel — no single-partition window at any scale. First 200 positions
    shown."""
    from sqlserver_cdc_to_kafka_spark.operators.merge import global_order_rank

    docs = _docs(spark, sf_dir)
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":shuffle:42")))
    keyed = docs.select("doc_id", key.alias("shuffle_key")).withColumn(
        "__prefix",
        F.conv(F.substring("shuffle_key", 1, 15), 16, 10).cast("bigint"),
    )
    ranked = global_order_rank(keyed, "shuffle_key", numeric_col="__prefix")
    return (
        ranked.select(
            "doc_id",
            "shuffle_key",
            F.col("global_rank").cast("bigint").alias("position"),
        )
        .filter(F.col("position") <= 200)
    )


@query(
    "text_repetition_signals",
    bench=True,
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
tf AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
agg AS (SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               MAX(c) AS top
        FROM tf GROUP BY 1)
SELECT doc_id, n_tokens, n_distinct,
       ROUND(top / CAST(n_tokens AS DOUBLE), 6) AS top_token_frac,
       ROUND(n_distinct / CAST(n_tokens AS DOUBLE), 6) AS distinct_ratio,
       (ROUND(top / CAST(n_tokens AS DOUBLE), 6) > 0.12 OR
        ROUND(n_distinct / CAST(n_tokens AS DOUBLE), 6) < 0.35)
         AS flagged_repetitive
FROM agg
""",
)
def q_text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/diversity signals per document with a
    repetitiveness flag — filters loop/spam/boilerplate docs from a training
    corpus. Two map-side-combined aggregations; linear at corpus scale."""
    from sqlserver_cdc_to_kafka_spark.pipeline.text import repetition_signals

    return repetition_signals(_docs(spark, sf_dir))


@query(
    "pipeline_decontaminate_eval",
    bench=True,
    oracle="""
WITH base AS (
  SELECT doc_id,
         CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                        AS BIGINT) % 100 < 95
              THEN 'train' ELSE 'eval' END AS split,
         string_split(text, ' ') AS words
  FROM documents),
sh AS (
  SELECT doc_id, split, unnest(CASE WHEN len(words) >= 4 THEN
           list_distinct(list_transform(range(1, len(words) - 2),
                         i -> array_to_string(words[i:i+3], ' ')))
           ELSE [] END) AS shingle
  FROM base),
tr AS (
  SELECT shingle, doc_id FROM sh WHERE split = 'train'
  QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 64)
SELECT e.doc_id,
       CAST(COUNT(DISTINCT e.shingle) AS BIGINT) AS n_overlap_shingles,
       CAST(COUNT(DISTINCT tr.doc_id) AS BIGINT) AS n_train_docs
FROM sh e JOIN tr ON e.shingle = tr.shingle
WHERE e.split = 'eval'
GROUP BY 1
""",
)
def q_decontaminate_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: eval documents sharing any word-4-gram with
    a train document (same deterministic 95/5 hash split as
    pipeline_split_train_eval), with overlap counts. Candidates via the
    inverted shingle index — one equality join, never eval x train.

    max_doc_freq=64 is the dedup family's stop-shingle cap, mirrored in the
    oracle's QUALIFY: shingles in >64 TRAIN docs are corpus boilerplate, not
    contamination signal, and their eval⨝train join output is quadratic in
    the boilerplate share (the r10 kill class, measured here at 1.8× on
    skewed sf1). Binds on ZERO organic shingles at every witnessed SF (max
    organic 4-gram df: 4 / 4 / 6 at sf0.001 / 0.01 / 0.1) — witnessed
    outputs are bit-identical to the uncapped form."""
    from sqlserver_cdc_to_kafka_spark.pipeline.dedup import (
        cross_split_contamination,
    )

    docs = _docs(spark, sf_dir)
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint") % 100
    with_split = docs.withColumn(
        "split", F.when(bucket < 95, "train").otherwise("eval")
    )
    return cross_split_contamination(
        with_split, "doc_id", "text", "split", k=4, max_doc_freq=64
    )


def _reduction_oracle() -> str:
    # the clusters oracle's CTE chain (everything before its final SELECT),
    # extended with a `comp` CTE materializing the per-doc component
    ctes = _clusters_oracle().split("WITH ", 1)[1].rsplit("SELECT root", 1)[0]
    return f"""
WITH RECURSIVE {ctes.strip().rstrip(',').strip()}
, comp AS (SELECT root AS doc_id, MIN(node) AS component
           FROM reach GROUP BY root)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (WHERE c.component IS NULL
                                OR c.component = d.doc_id) AS BIGINT)
         AS n_kept,
       CAST(COUNT(*) FILTER (WHERE c.component IS NOT NULL
                               AND c.component <> d.doc_id) AS BIGINT)
         AS n_dropped,
       CAST(SUM(CASE WHEN c.component IS NULL OR c.component = d.doc_id
                     THEN len(string_split(d.text, ' ')) ELSE 0 END) AS BIGINT)
         AS tokens_kept
FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
GROUP BY d.source
"""


@query("dedup_reduction_report", oracle=_reduction_oracle())
def q_dedup_reduction_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's SHIPPED artifact: per source, how many documents
    (and tokens) survive near-dup clustering — canonical cluster members
    (component == own id) and untouched singletons are kept, the rest drop.
    Composes MinHash-LSH candidates → connected components → left join back
    to the corpus; the left join is key-equi on doc_id, the cluster table is
    orders of magnitude smaller than the corpus (broadcast under AQE)."""
    from sqlserver_cdc_to_kafka_spark.pipeline.components import (
        connected_components,
    )
    from sqlserver_cdc_to_kafka_spark.pipeline.dedup import (
        minhash_lsh_candidate_pairs,
    )

    docs = _docs(spark, sf_dir)
    comp = connected_components(minhash_lsh_candidate_pairs(docs, "doc_id"))
    joined = docs.join(comp, "doc_id", "left")
    kept = F.col("component").isNull() | (F.col("component") == F.col("doc_id"))
    n_tok = F.size(F.split("text", " "))
    return joined.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.count_if(kept).alias("n_kept"),
        F.count_if(~kept).alias("n_dropped"),
        F.sum(F.when(kept, n_tok).otherwise(F.lit(0))).cast("bigint").alias("tokens_kept"),
    )


@query(
    "sketch_count_min",
    bench=True,
    oracle=f"""
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS item FROM documents),
ds AS (SELECT unnest([0, 1, 2, 3]) AS depth),
inst AS (SELECT item, depth,
                CAST('0x' || substr(md5(CAST(depth AS VARCHAR) || ':' || item),
                                    1, 8) AS BIGINT) % 256 AS bucket
         FROM toks, ds),
counters AS (SELECT depth, bucket, COUNT(*) AS c FROM inst GROUP BY 1, 2),
exact AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS exact_count
          FROM toks GROUP BY 1),
probes AS (SELECT e.item, e.exact_count, d.depth,
                  CAST('0x' || substr(md5(CAST(d.depth AS VARCHAR) || ':' ||
                                          e.item), 1, 8) AS BIGINT) % 256
                    AS bucket
           FROM exact e, ds d)
SELECT p.item, p.exact_count, CAST(MIN(c.c) AS BIGINT) AS cms_estimate
FROM probes p JOIN counters c ON p.depth = c.depth AND p.bucket = c.bucket
GROUP BY 1, 2
""",
)
def q_sketch_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus token stream, every distinct
    token's exact count next to its CMS estimate — a hash-exact gate over
    an APPROXIMATE structure (deterministic md5 row hashes make both
    engines build the identical sketch). estimate >= exact by construction."""
    from sqlserver_cdc_to_kafka_spark.pipeline.sketch import (
        count_min_estimates,
    )

    toks = _docs(spark, sf_dir).select(
        F.explode(F.split("text", " ")).alias("item")
    )
    return count_min_estimates(toks, "item")


@query(
    "sketch_hll_registers",
    oracle="""
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS item FROM documents),
h AS (SELECT CAST('0x' || substr(md5(item), 1, 15) AS BIGINT) AS hv
      FROM toks),
r AS (SELECT hv % 64 AS bucket, hv // 64 AS v FROM h)
SELECT bucket,
       CAST(MAX(CASE WHEN v = 0 THEN 55
                     ELSE bit_count((v & -v) - 1) + 1 END) AS INT) AS register
FROM r GROUP BY 1
""",
)
def q_sketch_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog register table for corpus token cardinality —
    deterministic md5 hashing and the integer-exact trailing-zeros rank
    (bit_count identity, no float log2), so the approximate sketch is
    byte-identical across engines. Registers merge with MAX per bucket:
    the distributable cardinality sketch at 100 TB."""
    from sqlserver_cdc_to_kafka_spark.pipeline.sketch import hll_registers

    toks = _docs(spark, sf_dir).select(
        F.explode(F.split("text", " ")).alias("item")
    )
    return hll_registers(toks, "item")


_QH_WIDTH = 1.0  # bin width over the events value domain [0, 500)
_QH_BINS = 500


@query(
    "sketch_quantile_histogram",
    bench=True,
    oracle=f"""
WITH hist AS (
  SELECT event_type,
         LEAST(CAST(FLOOR(value / {_QH_WIDTH}) AS BIGINT), {_QH_BINS - 1})
           AS bin,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2),
cum AS (
  SELECT event_type, bin, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY bin
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM hist),
tot AS (SELECT event_type, SUM(c) AS n FROM hist GROUP BY 1),
qs AS (SELECT unnest([0.5, 0.95, 0.99]) AS q)
SELECT c.event_type, q.q AS quantile,
       ROUND(c.bin * {_QH_WIDTH} +
             {_QH_WIDTH} * (q.q * t.n - (c.cum - c.c)) / c.c, 6) AS est_value
FROM cum c JOIN tot t USING (event_type) CROSS JOIN qs q
WHERE c.cum >= q.q * t.n AND (c.cum - c.c) < q.q * t.n
""",
)
def q_sketch_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-sketch quantiles: p50/p95/p99 per event type estimated by
    linear interpolation inside a fixed equal-width histogram — the
    mergeable, bounded-memory quantile path at 100 TB (exact percentile()
    needs a per-group sort of ALL values; the histogram is one map-side-
    combined aggregation, and the window/interpolation run over at most
    bins x types rows). Deterministic bin and float arithmetic, written
    identically in both engines."""
    from pyspark.sql import Window

    from sqlserver_cdc_to_kafka_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    hist = ev.groupBy(
        "event_type",
        F.least(
            F.floor(F.col("value") / _QH_WIDTH).cast("bigint"),
            F.lit(_QH_BINS - 1),
        ).alias("bin"),
    ).agg(F.count("*").alias("c"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("cum", F.sum("c").over(w))
    tot = hist.groupBy("event_type").agg(F.sum("c").alias("n"))
    qs = spark.createDataFrame([(0.5,), (0.95,), (0.99,)], "q double")
    j = cum.join(tot, "event_type").crossJoin(F.broadcast(qs))
    target = F.col("q") * F.col("n")
    cum_before = F.col("cum") - F.col("c")
    return (
        j.filter((F.col("cum") >= target) & (cum_before < target))
        .select(
            "event_type",
            F.col("q").alias("quantile"),
            F.round(
                F.col("bin") * _QH_WIDTH
                + _QH_WIDTH * (target - cum_before) / F.col("c"),
                6,
            ).alias("est_value"),
        )
    )
