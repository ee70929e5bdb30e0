"""Round-6 pipeline additions: RAG-style overlapping document chunking and
a distributed Bloom filter with a measured false-positive audit.

Both are engine-portable by construction (md5-derived hashes, integer
arithmetic only) so the driver's hash-exact gate applies — including to the
Bloom filter, an APPROXIMATE structure whose bitmap both engines must build
bit-for-bit identically."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.registry import query
from sqlserver_cdc_to_kafka_spark.tables import ensure_parallel, load_table

_CHUNK = 500  # chars per chunk
_STRIDE = 400  # chunk start spacing => 100-char overlap


@query(
    "pipeline_chunk_overlap",
    oracle=f"""
WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
c AS (SELECT doc_id, text,
             unnest(range(0, 1 + (greatest(n - {_CHUNK}, 0) + {_STRIDE} - 1)
                             // {_STRIDE})) AS idx
      FROM d)
SELECT doc_id, CAST(idx AS BIGINT) AS chunk_idx,
       CAST(idx * {_STRIDE} + 1 AS BIGINT) AS start_pos,
       CAST(length(substr(text, CAST(idx * {_STRIDE} + 1 AS INT), {_CHUNK}))
            AS BIGINT) AS chunk_chars,
       md5(substr(text, CAST(idx * {_STRIDE} + 1 AS INT), {_CHUNK}))
         AS chunk_hash
FROM c
""",
)
def q_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-width chunking (the RAG/embedding preprocessing
    primitive): 500-char chunks every 400 chars, so consecutive chunks
    share 100 chars and no boundary sentence is lost.  Chunk count is
    closed-form from the doc length (1 + ceil(max(n-500,0)/400)) — pure
    per-row explode, NO shuffle, NO Python: sequence+explode+substr all
    stay in whole-stage codegen.  Emits the chunk md5 (its content id for
    downstream chunk-level dedup) instead of the text, keeping the result
    narrow; at 100 TB the explode multiplies rows ~n/400× inside the scan
    stage, which AQE re-splits as needed."""
    d = ensure_parallel(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text", F.length("text").alias("n")
    )
    n_chunks = 1 + (
        (F.greatest(F.col("n") - _CHUNK, F.lit(0)) + _STRIDE - 1)
        / _STRIDE
    ).cast("bigint")
    start = (F.col("idx") * _STRIDE + 1).cast("int")
    chunk = F.col("text").substr(start, F.lit(_CHUNK))
    return (
        d.withColumn("idx", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .select(
            "doc_id",
            F.col("idx").cast("bigint").alias("chunk_idx"),
            (F.col("idx") * _STRIDE + 1).cast("bigint").alias("start_pos"),
            F.length(chunk).cast("bigint").alias("chunk_chars"),
            F.md5(chunk).alias("chunk_hash"),
        )
    )


@query(
    "sketch_bloom_filter",
    oracle="""
WITH build_keys AS (SELECT DISTINCT l_orderkey AS k FROM lineitem
                    WHERE l_returnflag = 'R'),
probes AS (SELECT DISTINCT o_orderkey AS k FROM orders),
i AS (SELECT unnest([0, 1, 2]) AS i),
bpos AS (SELECT DISTINCT
           (CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8) AS BIGINT)
            + i * (CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 9, 8)
                        AS BIGINT) * 2 + 1)) % 65536 AS pos
         FROM build_keys, i),
words AS (SELECT pos // 32 AS w,
                 bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
          FROM bpos GROUP BY 1),
ppos AS (SELECT k,
           (CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8) AS BIGINT)
            + i * (CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 9, 8)
                        AS BIGINT) * 2 + 1)) % 65536 AS pos
         FROM probes, i),
flagged AS (SELECT ppos.k
            FROM ppos LEFT JOIN (SELECT pos, 1 AS hit FROM bpos) b
              ON ppos.pos = b.pos
            GROUP BY ppos.k
            HAVING SUM(CASE WHEN hit IS NULL THEN 1 ELSE 0 END) = 0)
SELECT (SELECT COUNT(*) FROM build_keys) AS n_build_keys,
       (SELECT COUNT(*) FROM words) AS n_words,
       (SELECT CAST(SUM(bit_count(bits)) AS BIGINT) FROM words) AS n_set_bits,
       (SELECT COUNT(*) FROM probes) AS n_probes,
       (SELECT COUNT(*) FROM flagged) AS n_flagged,
       (SELECT COUNT(*) FROM probes JOIN build_keys USING (k)) AS n_true_members,
       (SELECT COUNT(*) FROM flagged f LEFT JOIN build_keys b USING (k)
        WHERE b.k IS NULL) AS n_false_positives
""",
)
def q_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Bloom filter, built and AUDITED: the filter over
    returned-order keys (m=65536 bits, k=3, md5 double hashing), probed
    with every order key, with the false-positive count measured against
    the exact semi-join.  The bitmap is (word_idx, bits) rows merged by
    bit_or — the shape that unions across partitions/shards/days; the
    membership probe joins probe positions against the ≤m-row set-bit
    table, so probing is broadcast-scale however large the build input.
    Zero false NEGATIVES is structural (flagged ⊇ members — both gates
    witness it: n_flagged ≥ n_true_members with fp = flagged − members)."""
    from sqlserver_cdc_to_kafka_spark.pipeline.sketch import (
        bloom_build_words,
        bloom_membership,
    )

    li = load_table(spark, sf_dir, "lineitem")
    build_keys = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("k"))
        .distinct()
    )
    probes = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    words = bloom_build_words(build_keys, "k")
    flagged = bloom_membership(probes, build_keys, "k")

    def one(df: DataFrame, expr, name: str) -> DataFrame:
        return df.agg(expr.alias(name))

    n_build = one(build_keys, F.count("*"), "n_build_keys")
    n_words = one(words, F.count("*"), "n_words")
    n_bits = one(words, F.sum(F.bit_count("bits")).cast("bigint"), "n_set_bits")
    n_probes = one(probes, F.count("*"), "n_probes")
    n_flagged = one(flagged, F.count("*"), "n_flagged")
    n_true = one(
        probes.join(build_keys, "k", "left_semi"), F.count("*"), "n_true_members"
    )
    n_fp = one(
        flagged.join(build_keys, "k", "left_anti"),
        F.count("*"),
        "n_false_positives",
    )
    out = n_build
    for frame in (n_words, n_bits, n_probes, n_flagged, n_true, n_fp):
        out = out.crossJoin(frame)  # seven 1-row aggregates
    return out


@query(
    "text_tfidf_topterms",
    bench=True,
    oracle="""
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term, tf, df,
         tf * (n_docs - df + 0.5) / (df + 0.5) AS score
  FROM tf JOIN df USING (term), n),
ranked AS (
  SELECT doc_id, term, tf, df, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term) AS rnk
  FROM scored)
SELECT doc_id, CAST(rnk AS INT) AS rnk, term, tf, df,
       ROUND(score, 6) AS score
FROM ranked WHERE rnk <= 3
""",
)
def q_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by a BM25-style tf-idf.

    The idf is the RATIONAL form tf*(N-df+0.5)/(df+0.5), not a logarithm:
    +,-,*,/ are IEEE-correctly-rounded in every engine so the score is
    bit-identical cross-engine, while ln() is libm-dependent (Java's
    StrictMath vs C libm can differ in the last ulp — a real hash-gate
    flake for zero analytical gain, since the ranking is monotone-identical
    for fixed tf).  Plan: tokenize-explode (no shuffle) → (doc,term) tf agg
    → term df agg → join on term (AQE broadcasts the df table while it
    fits), 1-row N broadcast, and a per-doc window whose partitions are
    bounded by per-doc vocabulary.  r15 notes: (a) df is a plain COUNT —
    tf already has exactly one row per (doc, term), so the r14
    count_distinct paid a two-phase distinct expansion for the same value;
    (b) replacing the df agg+join with a COUNT window over the term
    partition was tried and MEASURED 2× SLOWER (isolated 1.67 → 3.4–3.8 s):
    the window sorts the whole tf stream by term, while the agg's df table
    broadcast-joins without ever exchanging tf — the corpus-funnel lesson
    again (window ≠ free even when it saves an exchange on paper)."""
    from pyspark.sql import Window

    docs = ensure_parallel(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.col("tf")
            * (F.col("n_docs") - F.col("df") + 0.5)
            / (F.col("df") + 0.5),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "doc_id", "rnk", "term", "tf", "df", F.round("score", 6).alias("score")
        )
    )


_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_NUM_RE = "[0-9]{6,}"
# denylist-term stage: stand-in for a configurable entity/contaminant list
# (benchmark strings, known names) — the synthetic corpus has no digits or
# @-addresses, so this stage is what produces real redactions in the gate
_ENT_RE = "\\b(customer|supplier)\\b"


@query(
    "text_pii_redact",
    oracle=f"""
WITH red AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(
             text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
             '{_NUM_RE}', '<NUM>', 'g'),
             '{_ENT_RE}', '<ENT>', 'g') AS redacted,
         CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT)
           AS n_emails,
         CAST(len(regexp_extract_all(text, '{_NUM_RE}')) AS BIGINT)
           AS n_long_numbers,
         CAST(len(regexp_extract_all(text, '{_ENT_RE}')) AS BIGINT)
           AS n_entities
  FROM documents)
SELECT doc_id, n_emails, n_long_numbers, n_entities,
       CAST(length(redacted) AS BIGINT) AS redacted_chars,
       md5(redacted) AS redacted_hash
FROM red
WHERE n_emails > 0 OR n_long_numbers > 0 OR n_entities > 0
""",
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII/entity REDACTION (the write path text_pii_scan only counts):
    emails, long digit runs, then denylist terms replaced with typed
    placeholders, applied in a fixed order so the output is well-defined
    when patterns could overlap.
    Pure regexp_replace built-ins — one scan, no shuffle, no Python; the
    gate hashes the redacted text (via md5 — the result stays narrow) so
    both engines must produce byte-identical redactions.  Only touched
    docs are emitted: at 100 TB the untouched majority is passed through
    by doc_id elsewhere, not rewritten."""
    docs = ensure_parallel(load_table(spark, sf_dir, "documents"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
            _NUM_RE,
            "<NUM>",
        ),
        _ENT_RE,
        "<ENT>",
    )
    return (
        docs.select(
            "doc_id",
            F.regexp_count("text", F.lit(_EMAIL_RE)).cast("bigint").alias("n_emails"),
            F.regexp_count("text", F.lit(_NUM_RE)).cast("bigint").alias("n_long_numbers"),
            F.regexp_count("text", F.lit(_ENT_RE)).cast("bigint").alias("n_entities"),
            F.length(redacted).cast("bigint").alias("redacted_chars"),
            F.md5(redacted).alias("redacted_hash"),
        )
        .filter(
            (F.col("n_emails") > 0)
            | (F.col("n_long_numbers") > 0)
            | (F.col("n_entities") > 0)
        )
    )


@query(
    "pipeline_mixture_temperature",
    oracle="""
WITH per_source AS (
  SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars
  FROM documents GROUP BY source),
tot AS (SELECT SUM(n_docs) AS total_docs FROM per_source)
SELECT source, n_docs, n_chars,
       CAST(FLOOR(sqrt(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT)
         AS weight_t2_micros,
       CAST(FLOOR(sqrt(CAST(total_docs AS DOUBLE) / n_docs) * 1000000)
            AS BIGINT) AS upsample_t2_micros
FROM per_source, tot
""",
)
def q_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture reweighting (T=2): per-source sampling
    weight ∝ share^(1/T) = sqrt(n_docs) — the standard flattening that
    upweights small domains in a training mix.  T=2 is deliberate: sqrt
    and divide are IEEE-correctly-rounded in every engine (pow(x, 1/T)
    for general T is libm-dependent), so the micro-unit weights are
    bit-exact cross-engine with no tolerance games.  One grouped
    aggregate + a broadcast 1-row total; the weights feed
    pipeline_importance_weights / stratified sampling downstream."""
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
    )
    tot = per_source.agg(F.sum("n_docs").alias("total_docs"))
    return per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_chars",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1_000_000)
        .cast("bigint")
        .alias("weight_t2_micros"),
        F.floor(
            F.sqrt(F.col("total_docs").cast("double") / F.col("n_docs"))
            * 1_000_000
        )
        .cast("bigint")
        .alias("upsample_t2_micros"),
    )


_Z_BITS = 16
_DAY_US = 86_400_000_000


def _interleave_sql(xcol: str, ycol: str) -> str:
    """SQL expression interleaving the low 16 bits of two ints into a
    32-bit Z-value (x in even bit positions, y in odd) — generated
    unrolled so the SAME arithmetic runs on Spark and DuckDB."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"(({xcol} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({ycol} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


@query(
    "pipeline_zorder_layout",
    oracle=f"""
WITH ev AS (
  SELECT CAST(user_id AS BIGINT) AS uid,
         CAST(epoch_us(ts) // {_DAY_US} AS BIGINT) AS day,
         event_id
  FROM events),
z AS (SELECT event_id, uid, day,
             CAST({_interleave_sql('uid', 'day % 65536')} AS BIGINT) AS zval
      FROM ev),
b AS (SELECT event_id, uid, day, zval, zval // 256 AS zbucket FROM z)
SELECT zbucket, COUNT(*) AS n,
       MIN(uid) AS uid_min, MAX(uid) AS uid_max,
       MIN(day) AS day_min, MAX(day) AS day_max
FROM b GROUP BY zbucket
""",
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout index over (user_id, event-day): bit-
    interleaving maps the 2-D key space onto a 1-D curve where ranges stay
    LOCAL in both dimensions — the file-clustering trick (Delta ZORDER BY,
    Iceberg sort orders) that lets min/max file stats prune scans for
    either predicate column.  The query audits the layout: per 256-wide
    z-range 'file', the min/max envelope of each dimension — exactly the
    stats a scan planner would prune on.  Pure unrolled bit arithmetic
    (one expression, whole-stage codegen), one aggregate; at 100 TB this
    expression is the repartitionByRange/sortWithinPartitions key for the
    actual rewrite."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import epoch_micros

    ev = load_table(spark, sf_dir, "events")
    us = epoch_micros(ev, "ts")
    base = ev.select(
        "event_id",
        F.col("user_id").cast("bigint").alias("uid"),
        (us / _DAY_US).cast("bigint").alias("day"),
    )
    z = base.withColumn(
        "zval", F.expr(_interleave_sql("uid", "day % 65536")).cast("bigint")
    )
    return (
        z.withColumn("zbucket", (F.col("zval") / 256).cast("bigint"))
        .groupBy("zbucket")
        .agg(
            F.count("*").alias("n"),
            F.min("uid").alias("uid_min"),
            F.max("uid").alias("uid_max"),
            F.min("day").alias("day_min"),
            F.max("day").alias("day_max"),
        )
    )


_ED_K = 8  # shingle width for candidate generation
_ED_MIN_SHARED = 3  # candidate gate: shared distinct shingles
_ED_PREFIX = 300  # verify on this char prefix
_ED_MAX_DIST = 90  # near-dup verdict: ≤30% of the prefix edited
# stop-shingle cap, same discipline as dedup_ngram_jaccard/containment: the
# r10 boilerplate corpus puts 5 identical 8-grams in 25% of all docs —
# >= _ED_MIN_SHARED, so EVERY boilerplated pair became a candidate and the
# shared-session sf1-skewed bench heap-OOM'd here (measured); organic 8-gram
# df is <= the 5-gram max of 4, so 64 binds on boilerplate only
_ED_MAX_DF = 64


@query(
    "dedup_edit_distance_verify",
    bench=True,
    oracle=f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (SELECT DISTINCT doc_id,
              array_to_string(ws[i:i+{_ED_K - 1}], ' ') AS shingle
       FROM toks, LATERAL unnest(range(1, len(ws) - {_ED_K} + 2)) AS t(i)),
rare AS (SELECT shingle FROM sh GROUP BY shingle
         HAVING COUNT(*) <= {_ED_MAX_DF}),
cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                COUNT(*) AS n_shared_shingles
         FROM sh a JOIN sh b ON a.shingle = b.shingle
                            AND a.doc_id < b.doc_id
         JOIN rare r ON r.shingle = a.shingle
         GROUP BY 1, 2
         HAVING COUNT(*) >= {_ED_MIN_SHARED})
SELECT doc_a, doc_b, n_shared_shingles,
       CAST(levenshtein(substr(ta.text, 1, {_ED_PREFIX}),
                        substr(tb.text, 1, {_ED_PREFIX})) AS BIGINT)
         AS prefix_edit_dist,
       levenshtein(substr(ta.text, 1, {_ED_PREFIX}),
                   substr(tb.text, 1, {_ED_PREFIX})) <= {_ED_MAX_DIST}
         AS is_near
FROM cand
JOIN documents ta ON doc_a = ta.doc_id
JOIN documents tb ON doc_b = tb.doc_id
""",
)
def q_edit_distance_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance dedup verification: candidates from the inverted
    8-word-shingle index (≥3 shared shingles), verdict from Levenshtein
    over a 300-char prefix — the exact-but-expensive second stage that LSH
    pipelines run on their candidate pairs.

    Scale shape mirrors ngram_jaccard_pairs: ONE shuffle of the shingle
    index (groupBy shingle → sorted doc list → in-group pair explode, not
    a two-sided self-join) with the same stop-shingle contract (df ≤ 64,
    mirrored in the oracle — without it 5 corpus-boilerplate 8-grams meet
    the ≥3-shared gate on their own and every boilerplated pair becomes a
    candidate; measured heap-OOM on the r10 skewed bench), candidate count
    bounded far below |docs|², and the quadratic-in-length levenshtein
    runs on a FIXED 300-char prefix (bounded cost per pair) and only on
    candidates.  Both engines' builtin levenshtein implement classic
    unit-cost edit distance — verified value-identical, so the verdicts
    hash-match."""
    docs = ensure_parallel(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    from sqlserver_cdc_to_kafka_spark.pipeline.text import word_shingles

    idx = docs.select(
        "doc_id", F.explode(word_shingles("text", _ED_K)).alias("shingle")
    )
    grouped = (
        idx.groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("docs"))
        .filter((F.size("docs") > 1) & (F.size("docs") <= F.lit(_ED_MAX_DF)))
    )
    pairs = grouped.select(
        F.explode(
            F.expr(
                "flatten(transform(docs, (x, i) -> "
                "transform(slice(docs, i + 2, size(docs) - i - 1), "
                "y -> struct(x AS doc_a, y AS doc_b))))"
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")
    cand = (
        pairs.groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared_shingles"))
        .filter(F.col("n_shared_shingles") >= _ED_MIN_SHARED)
    )
    # BYTE-level edit distance is the query's contract (identical to
    # codepoint distance on ASCII, where every witnessed SF lives).
    # Engines disagree on non-ASCII: DuckDB's levenshtein counts BYTE
    # edits ('aeiou' vs its Greek vowel translation = 10), Spark's counts
    # codepoints (= 5) — measured on the r10 perturbed corpus, invisible
    # on ASCII. The ISO-8859-1 decode of the UTF-8 bytes maps each byte to
    # exactly one codepoint (a bijection, identity on ASCII), so Spark's
    # codepoint levenshtein over it IS the byte distance both engines agree
    # on. Prefix is taken in CHARACTERS first, matching the oracle's
    # substr.
    def _bytes_as_chars(col):
        return F.decode(F.encode(col, "UTF-8"), "ISO-8859-1")

    ta = docs.select(
        F.col("doc_id").alias("doc_a"),
        _bytes_as_chars(F.substring("text", 1, _ED_PREFIX)).alias("pa"),
    )
    tb = docs.select(
        F.col("doc_id").alias("doc_b"),
        _bytes_as_chars(F.substring("text", 1, _ED_PREFIX)).alias("pb"),
    )
    dist = F.levenshtein("pa", "pb")
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared_shingles",
            dist.cast("bigint").alias("prefix_edit_dist"),
            (dist <= _ED_MAX_DIST).alias("is_near"),
        )
    )


@query(
    "pipeline_csv_roundtrip",
    oracle="""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique
FROM documents GROUP BY 1
""",
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV corpus ingest witness (the second interchange format next to
    pipeline_jsonl_roundtrip): documents written as headered RFC-4180 CSV
    and read back through the schema-explicit quarantining reader must
    aggregate identically to the parquet source — proving quoting/escaping
    round-trips free text and that nothing was quarantined.  The reader
    stays line-splittable (no multiLine), which is what keeps a 100 TB
    CSV ingest parallel."""
    import os
    import shutil
    import tempfile
    import uuid

    from sqlserver_cdc_to_kafka_spark.pipeline.corpus_io import (
        DOCUMENTS_SCHEMA,
        read_csv_strict,
        split_corrupt,
        write_csv,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = os.path.join(tempfile.gettempdir(), f"csv_rt_{uuid.uuid4().hex[:12]}")
    write_csv(docs, path)
    clean, _corrupt = split_corrupt(read_csv_strict(spark, path, DOCUMENTS_SCHEMA))
    out = clean.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("doc_id").alias("id_checksum"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
        F.count_distinct(F.md5("text")).alias("n_unique"),
    )
    # pin the bounded per-source aggregate, then remove the scratch files
    # the lazy read would otherwise have to outlive
    out = out.localCheckpoint(eager=True)
    shutil.rmtree(path, ignore_errors=True)
    return out


@query(
    "multimodal_image_phash",
    oracle="""
WITH dims AS (
  SELECT doc_id,
         4 + doc_id % 13 AS w,
         3 + doc_id % 7 AS h,
         (doc_id * 31) % 256 AS seed
  FROM documents),
px AS (
  SELECT doc_id, w, h,
         (i.i % w) * 2 // w AS qx,
         (i.i // w) * 2 // h AS qy,
         (seed + 3*i.i) % 256 + (seed + 3*i.i + 1) % 256
           + (seed + 3*i.i + 2) % 256 AS rgb
  FROM dims CROSS JOIN (SELECT unnest(range(0, 16*9)) AS i) i
  WHERE i.i < w * h),
q AS (SELECT doc_id, qy, qx, SUM(rgb) AS rgb_sum, COUNT(*) AS n_px
      FROM px GROUP BY 1, 2, 3),
sig AS (
  SELECT doc_id,
         'p' || string_agg(CAST(rgb_sum * 8 // (n_px * 766) AS VARCHAR),
                           '' ORDER BY qy, qx) AS phash
  FROM q GROUP BY doc_id)
SELECT doc_id, phash,
       CAST(COUNT(*) OVER (PARTITION BY phash) AS BIGINT) AS n_same_phash
FROM sig
""",
)
def q_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image hash + near-dup grouping over the REAL decode
    path: every payload decodes through the PPM parser, reduces to a 2×2
    block-mean grid (resolution-normalizing — images of different sizes
    can collide, which is the point), each block mean quantizes to 3 bits,
    and the 12-bit signature groups visually-similar images.  The oracle
    recomputes pixels arithmetically from the generation formula, so any
    decoder or reduction bug breaks the hash; integer quantization
    (rgb_sum*8 // (n_px*766)) keeps the signature engine-exact.  Plan:
    mapInPandas (Arrow) → two hash aggregates; the phash group count is
    the image-dedup candidate set size."""
    from sqlserver_cdc_to_kafka_spark.pipeline.multimodal import (
        attach_ppm_payload,
        quadrant_sums,
    )
    from pyspark.sql import Window

    docs = ensure_parallel(load_table(spark, sf_dir, "documents")).select("doc_id")
    quads = quadrant_sums(attach_ppm_payload(docs, "doc_id"), "doc_id")
    qdigit = F.expr("cast(rgb_sum * 8 div (n_px * 766) as string)")
    sig = (
        quads.withColumn("qdigit", qdigit)
        .groupBy("doc_id")
        .agg(
            F.concat(
                F.lit("p"),
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("qy", "qx", F.col("qdigit").alias("d"))
                            )
                        ),
                        lambda s: s["d"],
                    ),
                ),
            ).alias("phash")
        )
    )
    w = Window.partitionBy("phash")
    return sig.select(
        "doc_id", "phash", F.count("*").over(w).cast("bigint").alias("n_same_phash")
    )


_VAD_FRAME = 100  # samples per energy frame
_VAD_THRESH = 16_384 * _VAD_FRAME  # abs-sum activity threshold (≈ mean level)


@query(
    "multimodal_audio_segments",
    oracle=f"""
WITH params AS (
  SELECT doc_id,
         200 + doc_id % 701 AS n,
         (doc_id * 53) % 65536 AS seed
  FROM documents),
samp AS (
  SELECT doc_id, i.i // {_VAD_FRAME} AS frame_idx,
         abs((seed + 11 * i.i) % 65536 - 32768) AS a
  FROM params CROSS JOIN (SELECT unnest(range(0, 901)) AS i) i
  WHERE i.i < n),
fr AS (
  SELECT doc_id, frame_idx, SUM(a) AS abs_sum, COUNT(*) AS n_samples
  FROM samp GROUP BY 1, 2),
act AS (
  SELECT doc_id, frame_idx, abs_sum,
         frame_idx - row_number() OVER (PARTITION BY doc_id
                                        ORDER BY frame_idx) AS grp
  FROM fr WHERE abs_sum > {_VAD_THRESH})
SELECT doc_id,
       CAST(MIN(frame_idx) AS BIGINT) AS start_frame,
       CAST(MAX(frame_idx) AS BIGINT) AS end_frame,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(abs_sum) AS BIGINT) AS energy_sum
FROM act GROUP BY doc_id, grp
""",
)
def q_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio activity segmentation (the VAD shape) over the REAL decode
    path: every clip parses through the RIFF/WAVE chunk walker, reduces to
    integer frame abs-sums in one numpy pass (Python only at the codec
    edge), then CATALYST finds the active segments — classic
    gaps-and-islands (frame_idx − row_number) over frames above the
    threshold.  Integer energies keep it engine-exact; the oracle
    recomputes frames arithmetically from the sample formula, so a chunk-
    walk or byte-order bug in the decoder breaks the hash.  One shuffle on
    doc_id for the window + final aggregate."""
    from pyspark.sql import Window

    from sqlserver_cdc_to_kafka_spark.pipeline.multimodal import (
        attach_wav_payload,
        frame_energy,
    )

    docs = ensure_parallel(load_table(spark, sf_dir, "documents")).select("doc_id")
    frames = frame_energy(attach_wav_payload(docs, "doc_id"), "doc_id")
    active = frames.filter(F.col("abs_sum") > _VAD_THRESH)
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    grouped = active.withColumn(
        "grp", F.col("frame_idx") - F.row_number().over(w)
    )
    return grouped.groupBy("doc_id", "grp").agg(
        F.min("frame_idx").alias("start_frame"),
        F.max("frame_idx").alias("end_frame"),
        F.count("*").alias("n_frames"),
        F.sum("abs_sum").alias("energy_sum"),
    ).drop("grp")


@query(
    "pipeline_dataset_diff",
    oracle="""
WITH v1 AS (SELECT doc_id, source, md5(text) AS h FROM documents),
v2 AS (SELECT doc_id, source,
              md5(CASE WHEN doc_id % 5 = 0 THEN lower(text) ELSE text END) AS h
       FROM documents
       WHERE lang = 'en' OR doc_id % 7 <> 0),
d AS (
  SELECT COALESCE(v1.source, v2.source) AS source,
         CASE WHEN v2.doc_id IS NULL THEN 'removed'
              WHEN v1.doc_id IS NULL THEN 'added'
              WHEN v1.h <> v2.h THEN 'modified'
              ELSE 'unchanged' END AS change_type
  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
SELECT source, change_type, COUNT(*) AS n_docs
FROM d GROUP BY 1, 2
""",
)
def q_dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-version diff (the corpus governance op behind every release
    note): v2 simulates a curation pass — a filter drop (non-English docs
    at doc_id%7=0) and a re-normalization rewrite (lowercasing every 5th
    doc) — and the diff classifies every doc added/removed/modified/
    unchanged via ONE full outer join on doc_id comparing content hashes,
    never the texts themselves (the hash projection keeps the shuffle
    narrow at 100 TB; text stays in the scan).  Counts per (source,
    change_type) are the release report."""
    docs = load_table(spark, sf_dir, "documents")
    v1 = docs.select("doc_id", "source", F.md5("text").alias("h"))
    v2 = (
        docs.filter((F.col("lang") == "en") | (F.col("doc_id") % 7 != 0))
        .select(
            "doc_id",
            "source",
            F.md5(
                F.when(F.col("doc_id") % 5 == 0, F.lower("text")).otherwise(
                    F.col("text")
                )
            ).alias("h"),
        )
    )
    d = v1.alias("a").join(
        v2.alias("b"), F.col("a.doc_id") == F.col("b.doc_id"), "full_outer"
    )
    change = (
        F.when(F.col("b.doc_id").isNull(), "removed")
        .when(F.col("a.doc_id").isNull(), "added")
        .when(F.col("a.h") != F.col("b.h"), "modified")
        .otherwise("unchanged")
    )
    return (
        d.select(
            F.coalesce(F.col("a.source"), F.col("b.source")).alias("source"),
            change.alias("change_type"),
        )
        .groupBy("source", "change_type")
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "sketch_hll_per_source",
    oracle="""
WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS item
              FROM documents),
h AS (SELECT source,
             CAST('0x' || substr(md5(item), 1, 15) AS BIGINT) AS hv
      FROM toks),
r AS (SELECT source, hv % 64 AS bucket, hv // 64 AS v FROM h),
per_source AS (
  SELECT source, CAST(bucket AS BIGINT) AS bucket,
         CAST(MAX(CASE WHEN v = 0 THEN 55
                       ELSE bit_count((v & -v) - 1) + 1 END) AS INT)
           AS register
  FROM r GROUP BY 1, 2)
SELECT source, bucket, register FROM per_source
UNION ALL
SELECT '<all>', bucket, CAST(MAX(register) AS INT)
FROM per_source GROUP BY bucket
""",
)
def q_hll_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group HyperLogLog + merge witness: token-cardinality registers
    per source, AND the global sketch derived by MERGING the per-source
    sketches (MAX per bucket) — emitted as the '<all>' rows.  The merge IS
    the 100 TB story: per-shard/per-day/per-source sketches union by the
    same MAX that built them, so the '<all>' registers from this query
    necessarily equal sketch_hll_registers' directly-built global sketch.
    One shuffle to (source, bucket), then a bucket-only re-aggregate of
    ≤ sources×64 rows."""
    docs = ensure_parallel(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "source", F.explode(F.split("text", " ")).alias("item")
    )
    hv = F.conv(F.substring(F.md5(F.col("item")), 1, 15), 16, 10).cast("bigint")
    r = toks.select(
        "source",
        (hv % 64).alias("bucket"),
        F.shiftright(hv, 6).alias("v"),
    )
    rank = F.expr("CASE WHEN v = 0 THEN 55 ELSE bit_count((v & -v) - 1) + 1 END")
    per_source = (
        r.withColumn("rank", rank)
        .groupBy("source", F.col("bucket").cast("bigint").alias("bucket"))
        .agg(F.max("rank").cast("int").alias("register"))
    )
    merged = (
        per_source.groupBy("bucket")
        .agg(F.max("register").cast("int").alias("register"))
        .select(F.lit("<all>").alias("source"), "bucket", "register")
    )
    return per_source.unionByName(merged)


_CT_K = 5  # shingle width for containment
_CT_MIN = 0.5  # containment threshold
# Stop-shingle cap, same calibration discipline as dedup_ngram_jaccard's:
# max organic 5-gram df is 4 at uniform sf10 (measured), so 64 binds on
# nothing but corpus boilerplate — where, uncapped, the r10 skew probe's
# 8 boilerplate 5-grams x 124,962 docs exploded 1.5e10 ORDERED pairs
# inside single tasks and killed the run (uniform sf10 completes in 49 s).
_CT_MAX_DF = 64


@query(
    "dedup_containment_pairs",
    oracle=f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (SELECT DISTINCT doc_id,
              array_to_string(ws[i:i+{_CT_K - 1}], ' ') AS shingle
       FROM toks, LATERAL unnest(range(1, len(ws) - {_CT_K} + 2)) AS t(i)),
rare AS (SELECT shingle FROM sh GROUP BY shingle
         HAVING COUNT(*) <= {_CT_MAX_DF}),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
           FROM sh a JOIN sh b ON a.shingle = b.shingle
                              AND a.doc_id <> b.doc_id
           JOIN rare r ON r.shingle = a.shingle
           GROUP BY 1, 2)
SELECT doc_a, doc_b, n_shared,
       sa.n_sh AS n_a,
       CAST(n_shared * 1000000 // sa.n_sh AS BIGINT) AS containment_ppm
FROM shared
JOIN sizes sa ON doc_a = sa.doc_id
WHERE n_shared * 2 >= sa.n_sh
""",
)
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTAINMENT near-dup pairs: |A∩B| / |A| ≥ 50% of A's distinct
    5-shingles appear in B — the DIRECTION-SENSITIVE overlap measure
    Jaccard misses (a short doc quoted inside a long one scores near-zero
    Jaccard but full containment; the asymmetry also says which doc to
    drop).  Ordered pairs by construction.  Same single-shuffle inverted-
    index candidate generation as the Jaccard op, with the same
    stop-shingle scale contract (df ≤ 64, mirrored in the oracle):
    shingles shared by more documents than the cap are boilerplate, not
    containment evidence, and excluding them bounds the worst-case group
    regardless of corpus shape (n_sh still counts every shingle, so capped
    containment is a conservative underestimate).  The threshold test and
    the reported ratio are integer arithmetic (cross-multiply + ppm
    integer division) — no float division in the gate."""
    from sqlserver_cdc_to_kafka_spark.pipeline.text import word_shingles

    docs = ensure_parallel(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    sh = docs.select("doc_id", word_shingles("text", _CT_K).alias("shingles"))
    sizes = sh.select("doc_id", F.size("shingles").cast("bigint").alias("n_sh"))
    idx = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    grouped = (
        idx.groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("docs"))
        .filter(
            (F.size("docs") > 1) & (F.size("docs") <= F.lit(_CT_MAX_DF))
        )
    )
    # ordered pairs (both directions): containment is asymmetric
    pairs = grouped.select(
        F.explode(
            F.expr(
                "flatten(transform(docs, (x, i) -> "
                "transform(filter(docs, y -> y != x), "
                "y -> struct(x AS doc_a, y AS doc_b))))"
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")
    shared = pairs.groupBy("doc_a", "doc_b").agg(F.count("*").alias("n_shared"))
    return (
        shared.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .filter(F.col("n_shared") * 2 >= F.col("n_sh"))
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.col("n_sh").alias("n_a"),
            F.expr("cast(n_shared * 1000000 div n_sh as bigint)").alias(
                "containment_ppm"
            ),
        )
    )


@query(
    "pipeline_score_rank_normalize",
    oracle="""
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         rank() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rnk,
         COUNT(*) OVER (PARTITION BY source) AS n_src
  FROM documents)
SELECT doc_id, source, CAST(rnk AS BIGINT) AS rnk,
       CAST((rnk - 1) * 1000000 // (n_src - 1) AS BIGINT) AS pctl_ppm
FROM ranked WHERE n_src > 1
""",
)
def q_score_rank_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source rank normalization of a quality signal (n_chars as the
    stand-in score): each doc's within-source percentile in integer ppm —
    the calibration that makes scores COMPARABLE ACROSS SOURCES before a
    global quality cut (raw score distributions differ per domain; a
    fixed threshold keeps web spam while dropping good code).  Rank-based,
    so it is distribution-free and engine-exact (integer rank arithmetic,
    not percent_rank's float); (score, doc_id) ordering makes ranks
    total.  One window per source partition."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wc = Window.partitionBy("source")
    return (
        docs.select(
            "doc_id",
            "source",
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.count("*").over(wc).alias("n_src"),
        )
        .filter(F.col("n_src") > 1)
        .select(
            "doc_id",
            "source",
            "rnk",
            F.expr("cast((rnk - 1) * 1000000 div (n_src - 1) as bigint)").alias(
                "pctl_ppm"
            ),
        )
    )


@query(
    "multimodal_video_frames",
    oracle="""
WITH dims AS (
  SELECT doc_id,
         4 + doc_id % 13 AS w,
         3 + doc_id % 7 AS h,
         (doc_id * 31) % 256 AS seed,
         1 + doc_id % 4 AS n_frames
  FROM documents),
frames AS (
  SELECT doc_id, w, h, seed, f.f AS frame_idx
  FROM dims CROSS JOIN (SELECT unnest(range(0, 4)) AS f) f
  WHERE f.f < n_frames),
px AS (
  SELECT doc_id, frame_idx, w, h,
         ((seed + 17 * frame_idx) % 256 + i.i) % 256 AS v
  FROM frames CROSS JOIN (SELECT unnest(range(0, 16*9*3)) AS i) i
  WHERE i.i < w * h * 3)
SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
       CAST(frame_idx * 40 AS INT) AS frame_ts_ms,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(SUM(v) AS BIGINT) AS px_sum
FROM px GROUP BY doc_id, frame_idx, w, h
""",
)
def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-frame video-like decode, REAL end-to-end (replacing the
    earlier deterministic-fake frame sampler as the container path): the
    payload is a concatenated-P6 netpbm STREAM — a genuine multi-image
    container — and the demuxer walks it header by header, slicing each
    frame's raster by its own parsed dimensions (no out-of-band frame
    table).  Per-frame pixel sums come from the decoded arrays; the
    oracle recomputes them arithmetically, so a demux drift of even one
    byte (header length, comment handling, raster stride) breaks every
    subsequent frame's hash.  Arrow-batched 1→N mapInPandas, Python only
    at the codec edge."""
    from sqlserver_cdc_to_kafka_spark.pipeline.multimodal import (
        attach_ppm_stream_payload,
        stream_frame_stats,
    )

    docs = ensure_parallel(load_table(spark, sf_dir, "documents")).select("doc_id")
    return stream_frame_stats(attach_ppm_stream_payload(docs, "doc_id"), "doc_id")


_VOCAB_K = 64  # vocabulary size (top-K corpus words)


@query(
    "pipeline_vocab_coverage",
    oracle=f"""
WITH toks AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
              FROM documents),
freq AS (SELECT w, COUNT(*) AS n FROM toks GROUP BY w),
vocab AS (SELECT w FROM freq ORDER BY n DESC, w LIMIT {_VOCAB_K}),
per_doc AS (
  SELECT doc_id, source, COUNT(*) AS n_tokens,
         SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS n_oov
  FROM toks LEFT JOIN vocab v USING (w)
  GROUP BY 1, 2)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(n_oov) AS BIGINT) AS n_oov,
       CAST(SUM(n_oov) * 1000000 // SUM(n_tokens) AS BIGINT) AS oov_ppm
FROM per_doc GROUP BY source
""",
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary coverage: induce a top-K (=64) word vocab
    from corpus frequency (ties broken lexically — deterministic), then
    measure per-source out-of-vocabulary rates in integer ppm — the
    coverage analysis run before fixing a tokenizer's vocab size (high
    OOV on a source = that domain will fragment into bytes).  The vocab
    is a bounded top-K (TakeOrderedAndProject, never a global sort) that
    AQE broadcasts into the membership join; one tokenize-explode feeds
    both the frequency aggregate and the coverage join."""
    docs = ensure_parallel(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("w")
    )
    vocab = (
        toks.groupBy("w")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "w")
        .limit(_VOCAB_K)
        .select("w", F.lit(1).alias("in_vocab"))
    )
    per_doc = (
        toks.join(vocab, "w", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias(
                "n_oov"
            ),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum("n_oov").cast("bigint").alias("n_oov"),
        F.expr(
            "cast(sum(n_oov) * 1000000 div sum(n_tokens) as bigint)"
        ).alias("oov_ppm"),
    )


_CV_FOLDS = 5


@query(
    "pipeline_cv_folds",
    oracle=f"""
WITH assigned AS (
  SELECT doc_id, source,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':cv:42'), 1, 8)
              AS BIGINT) % {_CV_FOLDS} AS fold
  FROM documents)
SELECT CAST(fold AS BIGINT) AS fold, source,
       COUNT(*) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM assigned GROUP BY 1, 2
""",
)
def q_cv_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: fold =
    salted-id-hash mod k — reproducible on any engine/partitioning (never
    rand()), re-saltable per experiment, and INDEPENDENT of the
    train/eval split hash and the shard hash (different salt → different
    hash stream, so fold membership doesn't correlate with either).  The
    per-(fold, source) counts audit balance; the id checksum pins exact
    membership, not just sizes."""
    docs = load_table(spark, sf_dir, "documents")
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":cv:42"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % _CV_FOLDS
    )
    return (
        docs.select("doc_id", "source", fold.alias("fold"))
        .groupBy("fold", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
    )


_HY_JACCARD = 0.3
_HY_COS = 0.4
# the lexical side reuses ngram_jaccard_pairs and carries the same
# stop-shingle contract (df <= 64; see dedup_ngram_jaccard's calibration)
_HY_MAX_DF = 64


@query(
    "dedup_hybrid_consensus",
    oracle=f"""
WITH docsh AS (
  SELECT doc_id, CASE WHEN len(words) >= 3 THEN
    list_distinct(list_transform(range(1, len(words) - 1),
                  i -> array_to_string(words[i:i+2], ' ')))
    ELSE [] END AS shingles
  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)),
shingled AS (SELECT doc_id, unnest(shingles) AS shingle FROM docsh),
hyrare AS (SELECT shingle FROM shingled GROUP BY shingle
           HAVING COUNT(*) <= {_HY_MAX_DF}),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingled GROUP BY doc_id),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
          FROM shingled a JOIN shingled b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          JOIN hyrare r ON r.shingle = a.shingle
          GROUP BY 1, 2),
tpairs AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE ROUND(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6)
        >= {_HY_JACCARD}),
ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       FROM embeddings),
epairs AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM ev a JOIN ev b ON a.vec_id < b.vec_id
  WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= {_HY_COS}),
u AS (
  SELECT COALESCE(t.doc_a, e.doc_a) AS doc_a,
         COALESCE(t.doc_b, e.doc_b) AS doc_b,
         CASE WHEN t.doc_a IS NOT NULL AND e.doc_a IS NOT NULL THEN 'both'
              WHEN t.doc_a IS NOT NULL THEN 'text_only'
              ELSE 'embedding_only' END AS consensus
  FROM tpairs t FULL OUTER JOIN epairs e
    ON t.doc_a = e.doc_a AND t.doc_b = e.doc_b)
SELECT consensus, COUNT(*) AS n_pairs
FROM u GROUP BY consensus
""",
)
def q_hybrid_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID dedup consensus: near-dup pairs found by lexical 3-gram
    Jaccard vs by embedding cosine, full-outer-joined into a three-way
    agreement report (both / text_only / embedding_only) — the signal-
    reconciliation audit run before committing to one dedup stack
    (embedding-only pairs = paraphrases lexical dedup misses; text-only =
    template twins whose embeddings diverge).  Joins exploit the aligned
    doc_id/vec_id key space; each side reuses its standalone machinery
    (inverted shingle index; exact cosine baseline — production swaps in
    the LSH variant at scale, same interface)."""
    from sqlserver_cdc_to_kafka_spark.pipeline.dedup import ngram_jaccard_pairs
    from sqlserver_cdc_to_kafka_spark.pipeline.similarity import (
        cosine_threshold_pairs,
    )

    docs = ensure_parallel(load_table(spark, sf_dir, "documents"))
    emb = ensure_parallel(load_table(spark, sf_dir, "embeddings"))
    tpairs = ngram_jaccard_pairs(
        docs, "doc_id", threshold=_HY_JACCARD, max_doc_freq=_HY_MAX_DF
    ).select("doc_a", "doc_b")
    epairs = cosine_threshold_pairs(emb, "vec_id", "embedding", _HY_COS).select(
        F.col("vec_a").alias("e_a"), F.col("vec_b").alias("e_b")
    )
    u = tpairs.join(
        epairs,
        (tpairs.doc_a == epairs.e_a) & (tpairs.doc_b == epairs.e_b),
        "full_outer",
    )
    consensus = (
        F.when(F.col("doc_a").isNotNull() & F.col("e_a").isNotNull(), "both")
        .when(F.col("doc_a").isNotNull(), "text_only")
        .otherwise("embedding_only")
    )
    return (
        u.select(consensus.alias("consensus"))
        .groupBy("consensus")
        .agg(F.count("*").alias("n_pairs"))
    )


@query(
    "text_ngram_novelty",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
bg AS (SELECT DISTINCT doc_id,
              ws[i] || ' ' || ws[i+1] AS bigram
       FROM toks, LATERAL unnest(range(1, len(ws))) AS t(i)),
df AS (SELECT bigram, COUNT(*) AS docfreq FROM bg GROUP BY bigram),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_bigrams,
         SUM(CASE WHEN docfreq = 1 THEN 1 ELSE 0 END) AS n_unique_to_doc
  FROM bg JOIN df USING (bigram) GROUP BY doc_id)
SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
       CAST(n_unique_to_doc AS BIGINT) AS n_unique_to_doc,
       CAST(n_unique_to_doc * 1000000 // n_bigrams AS BIGINT) AS novelty_ppm
FROM per_doc WHERE n_bigrams > 0
""",
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram NOVELTY score: per document, the fraction of its distinct
    bigrams that occur in NO other document (corpus docfreq = 1) — the
    self-information signal data curation uses opposite dedup: low
    novelty ≈ boilerplate/templated, high novelty ≈ unique content worth
    upweighting.  One bigram-explode feeds both the corpus doc-frequency
    aggregate and the per-doc rollup (co-shuffled join on the bigram);
    the ppm ratio is integer division.  The docfreq side is exactly the
    inverted index the dedup ops build — same machinery, inverted
    purpose."""
    docs = ensure_parallel(load_table(spark, sf_dir, "documents"))
    from sqlserver_cdc_to_kafka_spark.pipeline.text import word_shingles

    bg = docs.select(
        "doc_id", F.explode(word_shingles("text", 2)).alias("bigram")
    )
    df_tab = bg.groupBy("bigram").agg(F.count("*").alias("docfreq"))
    per_doc = (
        bg.join(df_tab, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(F.when(F.col("docfreq") == 1, 1).otherwise(0)).alias(
                "n_unique_to_doc"
            ),
        )
    )
    return per_doc.filter(F.col("n_bigrams") > 0).select(
        "doc_id",
        F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
        F.col("n_unique_to_doc").cast("bigint").alias("n_unique_to_doc"),
        F.expr(
            "cast(n_unique_to_doc * 1000000 div n_bigrams as bigint)"
        ).alias("novelty_ppm"),
    )
