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
    df: DataFrame, id_col: str, text_col: str = "text", threshold: float = 0.3
) -> DataFrame:
    """Near-dup pairs by word-3-gram Jaccard ≥ threshold. Candidates come
    from the inverted index self-join (pairs sharing ≥1 shingle), then the
    exact Jaccard is computed from intersection + per-doc shingle counts."""
    idx = shingle_index(df, id_col, text_col)
    sizes = idx.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = idx.select(F.col(id_col).alias("doc_a"), "shingle")
    b = idx.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
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


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str = "text", seeds: int = MINHASH_SEEDS
) -> DataFrame:
    """Per-doc MinHash signature vector: sig[s] = min(md5(s || ':' || shingle))
    over the doc's shingles. Portable and deterministic — lexicographic min
    over hex digests."""
    idx = shingle_index(df, id_col, text_col)
    seeded = idx.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(seeds - 1))).alias("seed"),
        "shingle",
    )
    sigs = seeded.groupBy(id_col, "seed").agg(
        F.min(
            F.md5(F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("shingle")))
        ).alias("sig")
    )
    return sigs.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("seed", "sig"))), lambda s: s["sig"]
        ).alias("sig_vector")
    )


def minhash_lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    seeds: int = MINHASH_SEEDS,
    band_size: int = LSH_BAND_SIZE,
) -> DataFrame:
    """LSH banding: hash each band of the signature; docs colliding in ANY
    band are candidates. Sub-quadratic: candidates come from a groupBy/join
    on (band, band_hash), never an all-pairs comparison."""
    sigs = minhash_signatures(df, id_col, text_col, seeds)
    n_bands = seeds // band_size
    band_exprs = [
        F.md5(
            F.concat_ws(
                "", *[F.col("sig_vector")[b * band_size + i] for i in range(band_size)]
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
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def simhash_fingerprints(
    df: DataFrame, id_col: str, text_col: str = "text", bits: int = 16
) -> DataFrame:
    """SimHash: each shingle votes ±1 per bit (bit b of the shingle's hash);
    fingerprint bit b is 1 iff the vote sum is positive. Shingle hash = first
    4 hex chars of md5 → 16-bit value (portable across engines)."""
    idx = shingle_index(df, id_col, text_col)
    hashed = idx.select(
        id_col,
        F.conv(F.substring(F.md5("shingle"), 1, 4), 16, 10).cast("int").alias("hv"),
    )
    per_bit = hashed.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
        "hv",
    ).groupBy(id_col, "bit").agg(
        F.sum(
            F.when(F.expr("(shiftright(hv, bit) & 1) = 1"), 1).otherwise(-1)
        ).alias("vote")
    )
    return per_bit.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("vote") > 0, F.expr("shiftleft(1, bit)")).otherwise(0)
        )
        .cast("bigint")
        .alias("simhash")
    )
