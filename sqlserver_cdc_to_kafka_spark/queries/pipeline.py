"""LLM-data-pipeline queries (beyond-reference scope, first-class per the
brief): dedup (exact / Jaccard / MinHash-LSH / SimHash), similarity search
(brute-force cosine top-k, hyperplane LSH), text analysis, multimodal
plumbing — each over the driver's `documents` / `embeddings` tables with a
DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.pipeline.dedup import (
    exact_duplicates,
    minhash_lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
)
from sqlserver_cdc_to_kafka_spark.pipeline.multimodal import (
    attach_binary_payload,
    attach_ppm_payload,
    extract_features,
    frame_sample,
)
from sqlserver_cdc_to_kafka_spark.pipeline.similarity import (
    cosine_threshold_pairs_lsh,
    cosine_topk,
    hyperplane_signs,
    ivf_topk,
    lsh_buckets,
    lsh_params_for_threshold,
)
from sqlserver_cdc_to_kafka_spark.pipeline.text import (
    DEFAULT_STOPWORDS,
    TOKEN_REGEX,
    document_fingerprint,
    lang_id_score,
    quality_score,
    token_counts,
)
from sqlserver_cdc_to_kafka_spark.registry import query
from sqlserver_cdc_to_kafka_spark.tables import ensure_parallel, load_table


def _docs(spark, sf_dir):
    return ensure_parallel(load_table(spark, sf_dir, "documents"))


def _emb(spark, sf_dir):
    return ensure_parallel(load_table(spark, sf_dir, "embeddings"))

# DuckDB equivalent of pipeline.text.word_shingles (1-based list ops)
_DUCK_SHINGLES = """
docsh AS (
  SELECT doc_id, CASE WHEN len(words) >= 3 THEN
    list_distinct(list_transform(range(1, len(words) - 1),
                  i -> array_to_string(words[i:i+2], ' ')))
    ELSE [] END AS shingles
  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)),
shingled AS (SELECT doc_id, unnest(shingles) AS shingle FROM docsh)
"""


@query(
    "dedup_exact",
    oracle="""
SELECT md5(text) AS content_hash, MIN(doc_id) AS canonical_doc_id,
       COUNT(*) AS n_copies
FROM documents GROUP BY 1
""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content hash — one shuffle, map-side
    combine, linear at any scale."""
    docs = _docs(spark, sf_dir)
    return exact_duplicates(docs, "doc_id")


# Stop-shingle cap for the registered near-dup query: shingles in more than
# this many documents are corpus boilerplate, not duplication evidence.
# Calibrated by measurement: max organic df is 25 at sf0.1 AND at the
# uniform sf10 replica set (so the cap binds on NO witnessed dataset), while
# the skewed probe corpus (25% of docs sharing a web-footer sentence) puts
# 41 shingles above it, the hottest in 124,962 docs — without the cap that
# one shingle's group is a 125k-id collect_list and a 7.8e9-pair explode
# inside a SINGLE task (the r10 skew probe's measured kill).
_NGRAM_MAX_DOC_FREQ = 64


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH {_DUCK_SHINGLES},
rare AS (SELECT shingle FROM shingled GROUP BY shingle
         HAVING COUNT(*) <= {_NGRAM_MAX_DOC_FREQ}),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingled GROUP BY doc_id),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
          FROM shingled a JOIN shingled b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          JOIN rare r ON r.shingle = a.shingle
          GROUP BY 1, 2)
SELECT doc_a, doc_b, inter,
       sa.sz + sb.sz - inter AS union_size,
       ROUND(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE ROUND(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) >= 0.3
""",
    bench=True,
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by word-3-gram Jaccard ≥ 0.3. Candidates via the
    inverted shingle index self-join — never an all-pairs cross join.

    The stop-shingle cap (df ≤ 64, mirrored exactly in the oracle) is the
    query's scale contract: intersection counts exclude shingles shared by
    >64 documents, so a pair whose only overlap is corpus boilerplate is
    (correctly) not a near-duplicate, and the candidate stage's worst-case
    group is bounded at 64 ids / ~2k pairs regardless of corpus shape.
    Per-doc sizes still count every shingle; the derived union
    (sz_a + sz_b - inter) therefore GROWS as the cap shrinks inter, making
    the capped jaccard a conservative underestimate (pinned by
    tests/test_dedup_stop_shingles.py). On every organically-witnessed
    dataset (sf0.001–sf0.1, and uniform replicas to sf10) the cap binds on
    zero shingles and the output is bit-identical to the uncapped query;
    on the r10 skewed probe corpus the uncapped plan builds one 125k-id
    group and dies, the capped plan completes linear (measured)."""
    docs = _docs(spark, sf_dir)
    return ngram_jaccard_pairs(
        docs, "doc_id", threshold=0.3, max_doc_freq=_NGRAM_MAX_DOC_FREQ
    )


def _minhash_oracle() -> str:
    from sqlserver_cdc_to_kafka_spark.pipeline.dedup import (
        MINHASH_MERSENNE,
        MINHASH_SEEDS,
        _minhash_params,
    )

    sig_exprs = ", ".join(
        f"MIN((h * {a} + {b}) % {MINHASH_MERSENNE}) AS sig_{s}"
        for s, (a, b) in enumerate(_minhash_params(MINHASH_SEEDS))
    )
    band_exprs = ", ".join(
        "md5("
        + " || ',' || ".join(
            f"CAST(sig_{4 * band + i} AS VARCHAR)" for i in range(4)
        )
        + f") AS bh_{band}"
        for band in range(4)
    )
    band_union = " UNION ALL ".join(
        f"SELECT doc_id, {band} AS band, bh_{band} AS bh FROM banded"
        for band in range(4)
    )
    return f"""
WITH {_DUCK_SHINGLES},
hashed AS (SELECT doc_id,
                  CAST('0x' || substr(md5(shingle), 1, 8) AS BIGINT) AS h
           FROM shingled),
sigs AS (SELECT doc_id, {sig_exprs} FROM hashed GROUP BY doc_id),
banded AS (SELECT doc_id, {band_exprs} FROM sigs),
bands AS ({band_union})
SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
FROM bands a JOIN bands b2 ON a.band = b2.band AND a.bh = b2.bh
WHERE a.doc_id < b2.doc_id
"""


@query("dedup_minhash_lsh", oracle=_minhash_oracle(), bench=True)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16 seeds) + LSH(4 bands of 4): candidate near-dup pairs from
    band-hash collisions — the sub-quadratic dedup path at corpus scale."""
    docs = _docs(spark, sf_dir)
    return minhash_lsh_candidate_pairs(docs, "doc_id").select(
        F.col("doc_a").alias("doc_a"), F.col("doc_b").alias("doc_b")
    )


@query(
    "dedup_simhash",
    oracle=f"""
WITH {_DUCK_SHINGLES},
hashed AS (SELECT doc_id,
                  CAST('0x' || substr(md5(shingle), 1, 4) AS INT) AS hv
           FROM shingled),
votes AS (SELECT doc_id, b.bit,
                 SUM(CASE WHEN ((hv >> b.bit) & 1) = 1 THEN 1 ELSE -1 END) AS vote
          FROM hashed, (SELECT unnest(range(0, 16)) AS bit) b
          GROUP BY doc_id, b.bit)
SELECT doc_id,
       CAST(SUM(CASE WHEN vote > 0 THEN 1 << bit ELSE 0 END) AS BIGINT) AS simhash
FROM votes GROUP BY doc_id
""",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(16-bit) document fingerprints from per-bit shingle votes."""
    docs = _docs(spark, sf_dir)
    return simhash_fingerprints(docs, "doc_id")


# Pair-blocking fingerprint width. 60 bits (15 md5 hex chars — the same
# portable idiom as the HLL sketch), 4 bands of 15 bits: band cardinality
# 32,768, so expected bucket size is N/32768 per band. The original 16-bit
# pairs fingerprint was a measured SCALE DEFECT, not a skew one: with only
# 65,536 possible fingerprints, 500k docs (uniform sf10) pigeonhole ~8 docs
# onto every value — candidate generation AND the radius-3 output itself go
# quadratic, and the r10 probe measured the uniform run dying with a
# spilled-out shuffle after writing ~35 GB. The fingerprint-only query
# (dedup_simhash) keeps its 16-bit contract: its output is one row per doc
# at any scale; only pair BLOCKING needs width.
_SIMHASH_PAIR_BITS = 60
_SIMHASH_PAIR_BANDS = 4
_SIMHASH_BAND_BITS = _SIMHASH_PAIR_BITS // _SIMHASH_PAIR_BANDS
_SIMHASH_BAND_MASK = (1 << _SIMHASH_BAND_BITS) - 1


@query(
    "dedup_simhash_pairs",
    oracle=f"""
WITH {_DUCK_SHINGLES},
hashed AS (SELECT doc_id,
                  CAST('0x' || substr(md5(shingle), 1, {_SIMHASH_PAIR_BITS // 4})
                       AS BIGINT) AS hv
           FROM shingled),
votes AS (SELECT doc_id, b.bit,
                 SUM(CASE WHEN ((hv >> b.bit) & 1) = 1 THEN 1 ELSE -1 END) AS vote
          FROM hashed, (SELECT unnest(range(0, {_SIMHASH_PAIR_BITS})) AS bit) b
          GROUP BY doc_id, b.bit),
fp AS (SELECT doc_id,
              CAST(SUM(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << bit)
                            ELSE 0 END) AS BIGINT) AS simhash
       FROM votes GROUP BY doc_id),
bands AS (SELECT doc_id, simhash, b.band,
                 (simhash >> (b.band * {_SIMHASH_BAND_BITS}))
                   & {_SIMHASH_BAND_MASK} AS bv
          FROM fp, (SELECT unnest(range(0, {_SIMHASH_PAIR_BANDS})) AS band) b),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                a.simhash AS fa, b.simhash AS fb
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, CAST(bit_count(xor(fa, fb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(fa, fb)) <= 3
""",
)
def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via hamming-band blocking: equality self-join
    on one of 4 fingerprint bit-bands, then bit_count-XOR verify at radius 3.
    Pigeonhole makes the banding EXACT for that radius (recall 1.0 — any
    pair within hamming 3 leaves at least one of 4 bands untouched), unlike
    the probabilistic cosine-LSH family. All JVM-side bit arithmetic.
    60-bit fingerprints (see _SIMHASH_PAIR_BITS above): width is the pair
    operator's scale contract — 16 bits pigeonholes any 100k+-doc corpus
    onto 65,536 values and goes quadratic (measured at uniform sf10)."""
    from sqlserver_cdc_to_kafka_spark.pipeline.dedup import simhash_hamming_pairs

    docs = _docs(spark, sf_dir)
    return simhash_hamming_pairs(
        docs,
        "doc_id",
        bits=_SIMHASH_PAIR_BITS,
        n_bands=_SIMHASH_PAIR_BANDS,
    )


@query(
    "ann_cosine_topk",
    oracle="""
WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS c_id, embedding::DOUBLE[] AS cv FROM embeddings),
s AS (SELECT q_id, c_id,
             ROUND(list_cosine_similarity(qv, cv), 6) AS cos
      FROM q, c)
SELECT q_id, c_id, cos,
       CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS BIGINT) AS rank
FROM s QUALIFY rank <= 10
""",
    bench=True,
)
def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for 5 query vectors: broadcast queries, one
    corpus scan, JVM-side vector math (zip_with/aggregate)."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    return cosine_topk(queries, emb, "vec_id", "embedding", k=10)


def _planes_sql(planes: int | None = None) -> str:
    rows = []
    for p, signs in enumerate(hyperplane_signs(planes) if planes else hyperplane_signs()):
        arr = "[" + ", ".join(str(s) for s in signs) + "]"
        rows.append(f"SELECT {p} AS p, {arr}::DOUBLE[] AS plane")
    return " UNION ALL ".join(rows)


# tuned for the 0.4 threshold: 10 bands of 4 bits (40 planes) — see
# lsh_params_for_threshold's docstring for the recall/selectivity theory
_TP_BAND_SIZE, _TP_N_BANDS = lsh_params_for_threshold(0.4)
_TP_PLANES = _TP_BAND_SIZE * _TP_N_BANDS


def _tp_candidate_ctes() -> str:
    """Shared DuckDB CTE chain replicating the banded-LSH candidate
    generation: deterministic hyperplane bits → band hashes → candidate
    pairs (``a.vec_id < b.vec_id``). Used by the threshold-pairs oracle and
    the embedding-dedup oracle so both hash gates check the SAME candidate
    construction the Spark side uses."""
    return f"""planes AS ({_planes_sql(_TP_PLANES)}),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
bits AS (SELECT vec_id, p,
                CASE WHEN list_dot_product(v, plane) > 0 THEN 1 ELSE 0 END AS bit
         FROM e, planes),
bands AS (SELECT vec_id, p // {_TP_BAND_SIZE} AS band,
                 CAST(SUM(bit << (p % {_TP_BAND_SIZE})) AS INT) AS bh
          FROM bits GROUP BY vec_id, p // {_TP_BAND_SIZE}),
cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.bh = b.bh AND a.vec_id < b.vec_id)"""


def _threshold_pairs_lsh_oracle() -> str:
    """DuckDB replica of the banded-LSH candidate generation + exact verify
    (same deterministic hyperplanes, so both engines test the SAME candidate
    set — the hash gate checks the full composition, not just the verify)."""
    return f"""
WITH {_tp_candidate_ctes()}
SELECT vec_a, vec_b,
       ROUND(list_cosine_similarity(ea.v, eb.v), 6) AS cos
FROM cand
JOIN e ea ON ea.vec_id = vec_a
JOIN e eb ON eb.vec_id = vec_b
WHERE ROUND(list_cosine_similarity(ea.v, eb.v), 6) >= 0.4
"""


@query("ann_cosine_threshold_pairs", oracle=_threshold_pairs_lsh_oracle(), bench=True)
def q_ann_cosine_threshold_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via banded hyperplane-LSH candidates
    (equality join on (band, hash), no corpus×corpus cartesian) then the
    exact cosine verify on candidates only. NOTE the semantics: this is the
    LSH-RECALL SUBSET of "all pairs with cos ≥ 0.4", not the exhaustive set —
    params from ``lsh_params_for_threshold(0.4)`` (10 bands × 4 bits),
    measured recall ≈ 0.80 vs the quadratic ``cosine_threshold_pairs``
    baseline, pinned by ``test_threshold_pairs_lsh_recall``. Precision is
    exact. The oracle replicates the same deterministic construction, so the
    hash gate proves Spark⇄SQL parity of the full composition; the recall
    test is what pins fidelity to the exhaustive spec."""
    emb = _emb(spark, sf_dir)
    return cosine_threshold_pairs_lsh(
        emb, "vec_id", "embedding", 0.4, planes=_TP_PLANES, band_size=_TP_BAND_SIZE
    )


def _embedding_dedup_oracle() -> str:
    """Threshold pairs (same LSH construction) → recursive reachability
    closure → per-vector survivor assignment, singletons included."""
    return f"""
WITH RECURSIVE {_tp_candidate_ctes()},
pairs AS (SELECT vec_a, vec_b
          FROM cand
          JOIN e ea ON ea.vec_id = vec_a
          JOIN e eb ON eb.vec_id = vec_b
          WHERE ROUND(list_cosine_similarity(ea.v, eb.v), 6) >= 0.4),
und AS (SELECT vec_a AS src, vec_b AS dst FROM pairs
        UNION SELECT vec_b, vec_a FROM pairs),
verts AS (SELECT DISTINCT src AS vec_id FROM und),
reach(root, node) AS (
  SELECT vec_id, vec_id FROM verts
  UNION
  SELECT r.root, u.dst FROM reach r JOIN und u ON r.node = u.src),
comp AS (SELECT root AS vec_id, MIN(node) AS component
         FROM reach GROUP BY root)
SELECT emb.vec_id,
       COALESCE(c.component, emb.vec_id) AS survivor_id,
       COALESCE(c.component, emb.vec_id) <> emb.vec_id AS is_dup
FROM embeddings emb LEFT JOIN comp c ON c.vec_id = emb.vec_id
"""


@query("dedup_embedding_cosine", oracle=_embedding_dedup_oracle())
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate DEDUP (the full pipeline op, not just
    pair listing): banded hyperplane-LSH candidates → exact cosine ≥ 0.4
    verify → connected components over the near-dup graph → every vector
    mapped to its cluster's canonical survivor (min vec_id), singletons to
    themselves. The semantic dedup a training pipeline runs on embeddings —
    drop rows where ``is_dup``. Candidate generation is the equality join on
    (band, hash); components are iterative min-label propagation — no
    corpus×corpus stage anywhere."""
    from sqlserver_cdc_to_kafka_spark.pipeline.components import (
        connected_components,
    )

    emb = _emb(spark, sf_dir)
    pairs = cosine_threshold_pairs_lsh(
        emb, "vec_id", "embedding", 0.4, planes=_TP_PLANES, band_size=_TP_BAND_SIZE
    )
    comp = connected_components(pairs, a_col="vec_a", b_col="vec_b")
    return (
        emb.select("vec_id")
        .join(comp.withColumnRenamed("doc_id", "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("component", F.col("vec_id")).alias("survivor_id"),
            (F.coalesce("component", F.col("vec_id")) != F.col("vec_id")).alias(
                "is_dup"
            ),
        )
    )


@query(
    "ann_lsh_buckets",
    oracle=f"""
WITH planes AS ({_planes_sql()}),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
bits AS (SELECT vec_id, p,
                CASE WHEN list_dot_product(v, plane) > 0 THEN 1 << p ELSE 0 END AS bit
         FROM e, planes)
SELECT vec_id, CAST(SUM(bit) AS INT) AS bucket
FROM bits GROUP BY vec_id
""",
)
def q_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucket assignment (8 deterministic md5-derived planes)
    — the ANN partitioning key that turns similarity search into a
    same-bucket equality join at 100 TB."""
    emb = _emb(spark, sf_dir)
    return lsh_buckets(emb, "vec_id", "embedding")


@query(
    "ann_ivf_topk",
    oracle="""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
scored AS (
  SELECT e.vec_id, cid,
         ROUND(list_cosine_similarity(v, cv), 6) AS cs,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY ROUND(list_cosine_similarity(v, cv), 6) DESC,
                                     cid) AS crank
  FROM e, cent),
lists AS (SELECT vec_id AS c_id, cid AS cluster FROM scored WHERE crank = 1),
probes AS (SELECT vec_id AS q_id, cid AS cluster
           FROM scored WHERE vec_id < 5 AND crank <= 2),
cand AS (SELECT q_id, c_id FROM probes JOIN lists USING (cluster)),
s AS (SELECT q_id, c_id,
             ROUND(list_cosine_similarity(qe.v, ce.v), 6) AS cos
      FROM cand JOIN e qe ON qe.vec_id = q_id JOIN e ce ON ce.vec_id = c_id)
SELECT q_id, c_id, cos,
       CAST(row_number() OVER (PARTITION BY q_id
                               ORDER BY cos DESC, c_id) AS BIGINT) AS rank
FROM s QUALIFY rank <= 10
""",
    bench=True,
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN: corpus vectors assigned to their nearest of 8
    deterministic centroids; each query probes its 2 nearest clusters and
    ranks exactly within them — the partition-pruned scale path next to the
    brute-force `ann_cosine_topk` baseline."""
    emb = _emb(spark, sf_dir)
    return ivf_topk(emb, "vec_id", "embedding", query_max_id=5, k=10, nprobe=2)


_STOP_SQL = ", ".join(f"'{s}'" for s in DEFAULT_STOPWORDS)


@query(
    "text_token_count",
    oracle=f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS INT) AS n_regex_tokens
FROM documents
""",
)
def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace split + BPE-ish regex pre-tokenizer."""
    docs = _docs(spark, sf_dir)
    ws, rx = token_counts()
    return docs.select("doc_id", ws, rx)


@query(
    "text_quality_score",
    oracle=f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
       ROUND(len(list_filter(string_split(text, ' '), x -> x IN ({_STOP_SQL})))
             / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS stop_ratio,
       ROUND(least(len(string_split(text, ' ')) / 100.0, 1.0) * 0.5
             + least(len(list_filter(string_split(text, ' '),
                                     x -> x IN ({_STOP_SQL})))
                     / CAST(len(string_split(text, ' ')) AS DOUBLE) * 5.0, 1.0) * 0.4
             - least(len(regexp_extract_all(text, '[^\\w\\s]'))
                     / CAST(len(string_split(text, ' ')) AS DOUBLE), 1.0) * 0.1,
             6) AS score
FROM documents
""",
)
def q_text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length saturation + stopword ratio + punct penalty
    (C4/Gopher-rule shape)."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.round(
            F.expr(
                f"size(filter(split(text, ' '), x -> x IN ({_STOP_SQL}))) "
                f"/ CAST(size(split(text, ' ')) AS DOUBLE)"
            ),
            6,
        ).alias("stop_ratio"),
        F.round(quality_score(), 6).alias("score"),
    )


_EN_MARKERS = ("the", "a")


@query(
    "text_lang_id",
    oracle=f"""
SELECT lang,
       CASE WHEN len(list_filter(string_split(text, ' '),
                                 x -> x IN ('the', 'a')))
                 / CAST(len(string_split(text, ' ')) AS DOUBLE) >= 0.05
            THEN 'en' ELSE 'und' END AS predicted,
       COUNT(*) AS n_docs
FROM documents GROUP BY 1, 2
""",
)
def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (marker-word ratio) rolled up as a
    lang × predicted confusion matrix. On a real corpus each language gets
    its own marker list and argmax wins; the synthetic fixture shares one
    vocabulary, so the classifier itself is what's under test."""
    docs = _docs(spark, sf_dir)
    predicted = F.when(lang_id_score("text", _EN_MARKERS) >= 0.05, "en").otherwise(
        "und"
    )
    return (
        docs.select("lang", predicted.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "text_fingerprint",
    oracle="""
SELECT doc_id,
       md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint,
       CAST(strlen(text) AS BIGINT) AS n_bytes
FROM documents
""",
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint over normalized text + byte length."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        document_fingerprint().alias("fingerprint"),
        F.octet_length("text").cast("bigint").alias("n_bytes"),
    )


@query(
    "multimodal_features",
    oracle="""
WITH dims AS (
  SELECT doc_id,
         4 + doc_id % 13 AS w,
         3 + doc_id % 7 AS h,
         (doc_id * 31) % 256 AS seed
  FROM documents),
px AS (
  SELECT doc_id, (seed + i.i) % 256 AS v
  FROM dims CROSS JOIN (SELECT unnest(range(0, 16*9*3)) AS i) i
  WHERE i.i < w * h * 3)
SELECT d.doc_id, 'image/ppm' AS media_type,
       CAST(strlen('P6' || chr(10) || w || ' ' || h || chr(10) || '255'
                   || chr(10)) + w * h * 3 AS INT) AS n_bytes,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       AVG(p.v) AS px_mean,
       CAST(MIN(p.v) AS INT) AS px_min,
       CAST(MAX(p.v) AS INT) AS px_max,
       CAST(SUM(p.v) AS BIGINT) AS px_sum
FROM dims d JOIN px p USING (doc_id)
GROUP BY d.doc_id, w, h
""",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal image path, REAL end-to-end: a binary P6 PPM payload per
    document (deterministic encoder standing in for ingest), then
    Arrow-batched mapInPandas that genuinely DECODES each payload — header
    tokenizer + numpy raster parse — and derives every feature from the
    decoded array (see pipeline.multimodal.decode_ppm). The oracle
    recomputes the same features arithmetically from the generation
    formula, so a decoder bug (header offset, byte order, short raster)
    breaks the hash."""
    docs = _docs(spark, sf_dir)
    return extract_features(attach_ppm_payload(docs, "doc_id"), "doc_id")


@query(
    "multimodal_frame_sample",
    oracle="""
SELECT doc_id,
       CAST(i.i AS INT) AS frame_idx,
       CAST(i.i * 40 AS INT) AS frame_ts_ms,
       md5(text || ':' || CAST(i.i AS VARCHAR)) AS frame_hash
FROM documents
CROSS JOIN (SELECT unnest(range(0, 4)) AS i) i
WHERE i.i < 1 + strlen(text) % 4
""",
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (stubbed decode): each payload expands to its
    sampled frames inside the Arrow batch — exercises the one-to-many
    mapInPandas shape a real ffmpeg sampler uses. The oracle reproduces the
    stub arithmetic, value-checking the whole expansion path."""
    docs = _docs(spark, sf_dir)
    return frame_sample(attach_binary_payload(docs), "doc_id")


@query(
    "multimodal_audio_features",
    bench=True,  # the Arrow-batched Python-codec cost class, absent elsewhere
    oracle="""
WITH params AS (
  SELECT doc_id,
         200 + doc_id % 701 AS n,
         CASE WHEN doc_id % 2 = 0 THEN 8000 ELSE 16000 END AS rate,
         (doc_id * 53) % 65536 AS seed
  FROM documents),
s AS (
  SELECT doc_id, ((seed + 11 * i.i) % 65536) - 32768 AS v
  FROM params CROSS JOIN (SELECT unnest(range(0, 901)) AS i) i
  WHERE i.i < n)
SELECT p.doc_id, 'audio/wav' AS media_type,
       CAST(44 + 2 * n AS INT) AS n_bytes,
       CAST(rate AS INT) AS sample_rate,
       CAST(n AS INT) AS n_samples,
       n * 1000.0 / rate AS duration_ms,
       CAST(MIN(v) AS INT) AS amp_min,
       CAST(MAX(v) AS INT) AS amp_max,
       CAST(SUM(v) AS BIGINT) AS amp_sum,
       sqrt(SUM(v * v) / n) AS rms
FROM params p JOIN s USING (doc_id)
GROUP BY p.doc_id, n, rate
""",
)
def q_multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal AUDIO path, real end-to-end (the WAV twin of the PPM
    image path): a PCM16 RIFF/WAVE payload per document, then Arrow-batched
    mapInPandas that genuinely parses the container — RIFF chunk walk, fmt
    validation, np.frombuffer sample plane — and derives rate/duration/
    amplitude/RMS from the decoded waveform (pipeline.multimodal.decode_wav).
    The oracle recomputes every feature from the generation formula, so a
    parser bug (chunk offset, alignment, sign, sample width) breaks the
    hash. r15: synthesis and parse run FUSED in one Arrow pass (guide §4 —
    the two-step composition shipped every payload across the Python
    boundary twice; see pipeline.multimodal.synth_and_extract_audio_features;
    the standalone attach/extract operators remain for payload-consuming
    callers and their tests)."""
    from sqlserver_cdc_to_kafka_spark.pipeline.multimodal import (
        synth_and_extract_audio_features,
    )

    docs = _docs(spark, sf_dir)
    return synth_and_extract_audio_features(docs, "doc_id")


def _minhash_audit_oracle() -> str:
    from sqlserver_cdc_to_kafka_spark.pipeline.dedup import (
        MINHASH_MERSENNE,
        MINHASH_SEEDS,
        _minhash_params,
    )

    sig_exprs = ", ".join(
        f"MIN((h * {a} + {b}) % {MINHASH_MERSENNE}) AS sig_{s}"
        for s, (a, b) in enumerate(_minhash_params(MINHASH_SEEDS))
    )
    band_exprs = ", ".join(
        "md5("
        + " || ',' || ".join(
            f"CAST(sig_{4 * band + i} AS VARCHAR)" for i in range(4)
        )
        + f") AS bh_{band}"
        for band in range(4)
    )
    band_union = " UNION ALL ".join(
        f"SELECT doc_id, {band} AS band, bh_{band} AS bh FROM banded"
        for band in range(4)
    )
    match_expr = " + ".join(
        f"CASE WHEN sa.sig_{s} = sb.sig_{s} THEN 1 ELSE 0 END"
        for s in range(MINHASH_SEEDS)
    )
    return f"""
WITH {_DUCK_SHINGLES},
hashed AS (SELECT doc_id,
                  CAST('0x' || substr(md5(shingle), 1, 8) AS BIGINT) AS h
           FROM shingled),
sigs AS (SELECT doc_id, {sig_exprs} FROM hashed GROUP BY doc_id),
banded AS (SELECT doc_id, {band_exprs} FROM sigs),
bands AS ({band_union}),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
         FROM bands a JOIN bands b2 ON a.band = b2.band AND a.bh = b2.bh
         WHERE a.doc_id < b2.doc_id),
inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS c
          FROM shingled a JOIN shingled b ON a.shingle = b.shingle
                                         AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingled GROUP BY 1)
SELECT cand.doc_a, cand.doc_b,
       CAST({match_expr} AS BIGINT) AS n_match,
       CAST(({match_expr}) * 1000000 // {MINHASH_SEEDS} AS BIGINT) AS est_ppm,
       CAST(COALESCE(i.c, 0) AS BIGINT) AS n_inter,
       CAST(COALESCE(i.c, 0) * 1000000
            // (za.sz + zb.sz - COALESCE(i.c, 0)) AS BIGINT) AS exact_ppm
FROM cand
JOIN sigs sa ON sa.doc_id = cand.doc_a
JOIN sigs sb ON sb.doc_id = cand.doc_b
JOIN sizes za ON za.doc_id = cand.doc_a
JOIN sizes zb ON zb.doc_id = cand.doc_b
LEFT JOIN inter i ON i.da = cand.doc_a AND i.db = cand.doc_b
"""


@query("dedup_minhash_estimate_audit", oracle=_minhash_audit_oracle())
def q_minhash_estimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash ESTIMATOR CALIBRATION: for every LSH candidate pair, the
    signature-agreement estimate (matching minima / 16, in integer ppm)
    next to the exact shingle Jaccard — the audit that justifies trusting
    the sketch at 100 TB where exact verification is only affordable on
    candidates.  Both columns are integer-exact (agreement count and
    cross-multiplied ratio), so the hash gate pins an APPROXIMATION's
    quality measurement, not just its output.  Signatures and exact
    intersections reuse the same one-shuffle machinery as their standalone
    queries; the joins touch only the (small) candidate set."""
    from sqlserver_cdc_to_kafka_spark.pipeline.dedup import (
        MINHASH_SEEDS,
        minhash_lsh_candidate_pairs,
        minhash_signatures,
    )
    from sqlserver_cdc_to_kafka_spark.pipeline.text import word_shingles

    docs = _docs(spark, sf_dir)
    cand = minhash_lsh_candidate_pairs(docs, "doc_id").select("doc_a", "doc_b")
    sigs = minhash_signatures(docs, "doc_id")
    sh = docs.select(
        "doc_id", word_shingles("text", 3).alias("shingles")
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig_vector").alias("sa"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig_vector").alias("sb"))
    za = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sha"))
    zb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("shb"))
    n_match = F.expr("size(filter(zip_with(sa, sb, (x, y) -> x = y), b -> b))")
    n_inter = F.size(F.array_intersect("sha", "shb"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .join(za, "doc_a")
        .join(zb, "doc_b")
        .withColumn("n_match", n_match.cast("bigint"))
        .withColumn("n_inter", n_inter.cast("bigint"))
        .select(
            "doc_a",
            "doc_b",
            "n_match",
            F.expr(f"cast(n_match * 1000000 div {MINHASH_SEEDS} as bigint)").alias(
                "est_ppm"
            ),
            "n_inter",
            F.expr(
                "cast(n_inter * 1000000 div "
                "(size(sha) + size(shb) - n_inter) as bigint)"
            ).alias("exact_ppm"),
        )
    )
