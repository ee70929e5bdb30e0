"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (the whole point of these at 100 TB):
- **exact**: hash-groupBy — one shuffle on the content hash, map-side combine.
- **ngram Jaccard**: candidate pairs ONLY via the inverted shingle index
  (explode → self-join on shingle) — never an all-pairs cross join; hot
  shingles are the skew risk → AQE skew-join / frequency cap.
- **MinHash+LSH**: signatures are one agg per (doc, seed); banding turns
  near-dup search into an equality join on (band, band_hash) — the standard
  sub-quadratic path. Portable hashing: ``min(md5(seed || shingle))`` —
  lexicographic min of hex digests, identical in any engine.
- **SimHash**: per-bit votes aggregated from shingle hashes; fingerprint is
  a small int, so candidate pairs come from exact-match (or small-radius)
  joins on the fingerprint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.pipeline.text import word_shingles

MINHASH_SEEDS = 16
LSH_BAND_SIZE = 4  # 16 sigs / 4 = 4 bands


def exact_duplicates(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct content, with the
    canonical (min) id and the copy count."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias(f"canonical_{id_col}"),
            F.count("*").alias("n_copies"),
        )
    )


def shingle_index(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Inverted index: (id, shingle) — the candidate-generation backbone."""
    return df.select(
        F.col(id_col), F.explode(word_shingles(text_col)).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    threshold: float = 0.3,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Near-dup pairs by word-3-gram Jaccard ≥ threshold.

    Candidate generation: ONE shuffle of the inverted index —
    ``groupBy(shingle) → sorted doc list → in-group pair explode`` — instead
    of the classic two-sided self-join (which shuffles the index twice and
    hash-joins it against itself). Per-doc shingle counts RIDE ALONG through
    the index (one extra int per exchange row) so the jaccard denominator
    needs NO size joins downstream — the r14 form joined the pair table
    against the size projection twice (guide §2.3 "shuffle keys and metadata
    instead of payloads", inverted: the metadata is small enough to carry).

    ``max_doc_freq`` (off by default to keep results exact): drop shingles
    appearing in more than N docs before pairing — the standard stop-shingle
    cap that bounds the worst-case group at web scale, where a boilerplate
    phrase would otherwise produce a quadratic group."""
    sh = df.select(F.col(id_col), word_shingles(text_col).alias("shingles"))
    idx = sh.select(
        F.col(id_col), F.size("shingles").alias("sz"),
        F.explode("shingles").alias("shingle"),
    )
    # sort by struct(id, sz) == sort by id (ids are unique), so the pair
    # explode below still emits doc_a < doc_b deterministically
    grouped = idx.groupBy("shingle").agg(
        F.sort_array(F.collect_list(F.struct(F.col(id_col).alias("i"), "sz"))).alias(
            "docs"
        )
    )
    if max_doc_freq is not None:
        grouped = grouped.filter(F.size("docs") <= max_doc_freq)
    # all i<j pairs within each shingle's (sorted) doc list
    pairs = grouped.filter(F.size("docs") > 1).select(
        F.explode(
            F.expr(
                "flatten(transform(docs, (x, i) -> "
                "transform(slice(docs, i + 2, size(docs)), y -> "
                "struct(x.i AS doc_a, x.sz AS sz_a, y.i AS doc_b, y.sz AS sz_b))))"
            )
        ).alias("p")
    ).select("p.doc_a", "p.sz_a", "p.doc_b", "p.sz_b")
    # sz_a/sz_b are functionally dependent on doc_a/doc_b — adding them to
    # the grouping key changes no groups and keeps the aggregate deterministic
    return (
        pairs.groupBy("doc_a", "doc_b", "sz_a", "sz_b")
        .agg(F.count("*").alias("inter"))
        .select(
            "doc_a",
            "doc_b",
            "inter",
            (F.col("sz_a") + F.col("sz_b") - F.col("inter")).alias("union_size"),
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# Universal-hash parameters: sig_s = min((a_s * h + b_s) mod MERSENNE) where
# h is a 32-bit md5-derived base hash. One md5 per shingle total; the other
# 15 "hash functions" are integer arithmetic. a < 2^7 and h < 2^32 keep the
# product far from bigint overflow. Constants are fixed so results are
# deterministic and reproducible in any engine.
MINHASH_MERSENNE = 2_147_483_647  # 2^31 - 1


def _minhash_params(seeds: int) -> list[tuple[int, int]]:
    return [(2 * s + 3, s * s + 7) for s in range(seeds)]


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    seeds: int = MINHASH_SEEDS,
    index: DataFrame | None = None,
) -> DataFrame:
    """Per-doc MinHash signature vector via universal hashing over ONE
    md5-derived base hash per shingle. All ``seeds`` minima are parallel
    aggregate expressions over one pass of the exploded shingle index
    (map-side partial min) — never rows ×seeds.

    ``index`` (r16): a caller-supplied ``(id_col, shingle)`` inverted index
    (typically persisted) to read instead of re-deriving the shingle explode
    from the corpus — the r15 dedup_two_stage plan shingled the corpus FOUR
    times because the LSH candidate pass and the exact-verify pass each
    derived the index independently per join side."""
    idx = shingle_index(df, id_col, text_col) if index is None else index
    base = F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("bigint")
    hashed = idx.select(id_col, base.alias("h"))
    min_exprs = [
        F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(MINHASH_MERSENNE)).alias(
            f"sig_{s}"
        )
        for s, (a, b) in enumerate(_minhash_params(seeds))
    ]
    sigs = hashed.groupBy(id_col).agg(*min_exprs)
    return sigs.select(
        id_col, F.array(*[F.col(f"sig_{s}") for s in range(seeds)]).alias("sig_vector")
    )


def minhash_lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    seeds: int = MINHASH_SEEDS,
    band_size: int = LSH_BAND_SIZE,
    index: DataFrame | None = None,
) -> DataFrame:
    """LSH banding: hash each band of the signature; docs colliding in ANY
    band are candidates. Sub-quadratic: candidates come from a groupBy/join
    on (band, band_hash), never an all-pairs comparison. ``index`` as in
    ``minhash_signatures``."""
    sigs = minhash_signatures(df, id_col, text_col, seeds, index=index)
    n_bands = seeds // band_size
    band_exprs = [
        F.md5(
            F.concat_ws(
                ",",
                *[
                    F.col("sig_vector")[b * band_size + i].cast("string")
                    for i in range(band_size)
                ],
            )
        ).alias(f"band_{b}")
        for b in range(n_bands)
    ]
    banded = sigs.select(id_col, *band_exprs)
    melted = banded.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"band_{b}").alias("bh"))
                    for b in range(n_bands)
                ]
            )
        ).alias("e"),
    ).select(id_col, F.col("e.band").alias("band"), F.col("e.bh").alias("bh"))
    a = melted.select(F.col(id_col).alias("doc_a"), "band", "bh")
    b = melted.select(F.col(id_col).alias("doc_b"), "band", "bh")
    # SHUFFLE_MERGE hint (r16, guide §2.4/§3.1): both self-join sides are
    # the SAME banded-signature subtree, so forcing the shuffled join makes
    # their exchanges canonically identical and AQE plans one as a
    # ReusedExchange — the whole shingle+minhash derivation runs ONCE
    # instead of once per side (verified in plans/r16/dedup_minhash_lsh_
    # after.txt). The previous plan broadcast one side, which (a) derived
    # the corpus subtree twice and (b) broadcast a CORPUS-sized relation —
    # a guaranteed >8 GB broadcast failure at 100 TB. SMJ spills gracefully
    # and the hot-bucket skew falls under AQE skew-join handling.
    return (
        a.join(b.hint("shuffle_merge"), ["band", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def simhash_fingerprints(
    df: DataFrame, id_col: str, text_col: str = "text", bits: int = 16
) -> DataFrame:
    """SimHash: each shingle votes ±1 per bit (bit b of the shingle's hash);
    fingerprint bit b is 1 iff the vote sum is positive. Shingle hash = the
    first ``bits/4`` hex chars of md5 (portable across engines); bits must
    be a multiple of 4 and ≤ 60 so the value stays inside a signed bigint."""
    if bits % 4 or bits > 60:
        raise ValueError("bits must be a multiple of 4, at most 60")
    idx = shingle_index(df, id_col, text_col)
    hashed = idx.select(
        id_col,
        F.conv(F.substring(F.md5("shingle"), 1, bits // 4), 16, 10)
        .cast("bigint")
        .alias("hv"),
    )
    # one aggregation, `bits` parallel vote expressions — no row explosion
    vote_exprs = [
        F.sum(
            F.when(F.expr(f"(shiftright(hv, {b}) & 1) = 1"), 1).otherwise(-1)
        ).alias(f"vote_{b}")
        for b in range(bits)
    ]
    votes = hashed.groupBy(id_col).agg(*vote_exprs)
    fp = None
    for b in range(bits):
        term = F.when(F.col(f"vote_{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return votes.select(id_col, fp.cast("bigint").alias("simhash"))


def simhash_hamming_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    bits: int = 16,
    n_bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs from SimHash fingerprints: candidates share at least
    one of ``n_bands`` equal-width bit-bands of the fingerprint (equality
    self-join on (band, band_value) — never all-pairs), verified by
    ``bit_count(a XOR b) <= max_hamming``.

    Unlike cosine-LSH this banding is EXACT for its radius, not
    probabilistic: by pigeonhole, any pair within hamming distance
    ``n_bands - 1`` differs in at most ``n_bands - 1`` bands, so at least
    one band matches and the pair is always a candidate. With the defaults
    (16 bits, 4 bands, radius 3) recall is 1.0 by construction; precision is
    exact via the verify. Returns (doc_a, doc_b, hamming)."""
    if bits % n_bands:
        raise ValueError("bits must divide evenly into n_bands")
    if max_hamming > n_bands - 1:
        raise ValueError(
            "pigeonhole guarantee needs max_hamming <= n_bands - 1"
        )
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    fp = simhash_fingerprints(df, id_col, text_col, bits)
    bands = fp.select(
        F.col(id_col),
        "simhash",
        F.explode(
            F.array(*[F.lit(b) for b in range(n_bands)])
        ).alias("band"),
    ).withColumn(
        "bv",
        F.expr(f"shiftright(simhash, band * {band_bits}) & {mask}"),
    )
    a = bands.select(
        F.col(id_col).alias("doc_a"), F.col("simhash").alias("fp_a"), "band", "bv"
    )
    b = bands.select(
        F.col(id_col).alias("doc_b"), F.col("simhash").alias("fp_b"), "band", "bv"
    )
    return (
        a.join(b, ["band", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.expr("bit_count(fp_a ^ fp_b)").alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def cross_split_contamination(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    split_col: str = "split",
    k: int = 4,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Eval-set decontamination: for every eval document, count the distinct
    word k-gram shingles it shares with ANY train document, and how many
    train documents it collides with. Mirrors the reference pipeline concern
    of never training on eval text (beyond-reference scope; the classic
    13-gram decontamination check, k scaled to the fixture corpus).

    Scale shape: one inverted-index equality join on the shingle — identical
    candidate-generation backbone as n-gram Jaccard dedup, never an
    eval x train cross join. The train side is the big one (95%); the eval
    side is the natural broadcast/bloom candidate at production scale, which
    AQE picks up from size stats rather than a hint (correct at any ratio).

    ``max_doc_freq``: drop shingles appearing in more than N TRAIN docs
    before the join — the same stop-shingle cap as the dedup family
    (ngram_jaccard_pairs), for the same reason: the eval⨝train equi-join
    output for ONE shingle is df_eval × df_train rows, quadratic in the
    share of a boilerplate phrase that straddles both splits (measured:
    a 25%-boilerplate corpus is 1.8× at sf1 and a multi-1e9-row join at
    sf10 — the r10 dedup kill class, reached through the decontamination
    entry point). Capping only the train side keeps the bound linear in
    eval size (≤ N rows joined per eval shingle instance) and is the
    semantically right side: a phrase in >N train docs is corpus
    boilerplate, not eval contamination signal."""
    sh = df.select(
        F.col(id_col),
        F.col(split_col),
        F.explode(word_shingles(text_col, k)).alias("shingle"),
    )
    train = sh.filter(F.col(split_col) == "train").select(
        F.col("shingle"), F.col(id_col).alias("__train_doc")
    )
    ev = sh.filter(F.col(split_col) == "eval").select(F.col(id_col), "shingle")
    if max_doc_freq is not None:
        # Order matters for the premium: semi-join the train index down to
        # eval-present shingles FIRST (a semi join keeps whole shingle
        # groups, so per-shingle train df is unchanged — exactly equivalent
        # to capping the full index), THEN group only the survivors for the
        # cap. Grouping the FULL train index instead costs a corpus-wide
        # collect_list+explode: measured 45.1 s vs 26 s at uniform sf10.
        # The groupBy reuses the semi join's hash partitioning on shingle,
        # so the cap adds one shuffle of the train index, not two.
        #
        # The r11 advisory suggested a count-based cap (groupBy.count →
        # filter → leftsemi) so an ultra-hot shingle never materializes a
        # single-task doc array.  Measured (r12, isolated best-of-2 at
        # sf10): count over the full index 31.1 s; count over the semi-join
        # survivors 27.1 s (the survivor subtree re-tokenizes the corpus
        # once per consumer); persist(survivors)+count 16.4 s uniform but
        # 30.1 s SKEWED (the cache materializes every hot-shingle row the
        # collect_list form holds only transiently) — vs 13.4 s uniform /
        # 14.7 s skewed for this form.  The one-pass collect_list wins on
        # both axes; its per-group array is bounded by the hottest
        # EVAL-PRESENT shingle's train df (~119k rows ≈ 1 MB at skewed
        # sf10) and becomes the cheaper trade only if a future SF pushes
        # that group past task memory.
        train = (
            train.join(ev.select("shingle").distinct(), "shingle", "leftsemi")
            .groupBy("shingle")
            .agg(F.collect_list("__train_doc").alias("__docs"))
            .filter(F.size("__docs") <= max_doc_freq)
            .select("shingle", F.explode("__docs").alias("__train_doc"))
        )
    return ev.join(train, "shingle").groupBy(id_col).agg(
        F.count_distinct(F.col("shingle")).alias("n_overlap_shingles"),
        F.count_distinct(F.col("__train_doc")).alias("n_train_docs"),
    )
