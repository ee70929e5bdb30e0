"""Text-analysis operators for LLM training-data pipelines (beyond-reference
scope, BASELINE.json north star): shingling, token counting, quality scoring,
language-ID heuristics, document fingerprinting.

All pure built-in expressions (split / transform / filter / regexp_*) — no
UDFs, so everything stays in whole-stage codegen and scales linearly with a
single scan. At 100 TB these run as one map-only stage per document partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_STOPWORDS = ("the", "a", "of", "and", "to")

# whitespace tokens OR single punctuation — a BPE-ish pre-tokenizer split
TOKEN_REGEX = r"\w+|[^\w\s]"


def word_shingles(text_col: str = "text", k: int = 3) -> Column:
    """Distinct word k-gram shingles (the MinHash/Jaccard input unit).

    The single-element ``transform(array(split(..)), ws -> ...)`` wrapper is
    a let-binding: it forces the split to evaluate ONCE per row. Inlining
    ``split`` into the inner lambda instead makes Spark re-split the text for
    every shingle — quadratic per document (measured 5-10× slower on the
    bench corpus)."""
    return F.expr(
        f"transform(array(split({text_col}, ' ')), ws -> "
        f"CASE WHEN size(ws) >= {k} THEN "
        f"array_distinct(transform(sequence(0, size(ws) - {k}), "
        f"i -> concat_ws(' ', slice(ws, i + 1, {k})))) "
        f"ELSE array() END)[0]"
    )


def token_counts(text_col: str = "text") -> tuple[Column, Column]:
    """(whitespace token count, regex token count)."""
    ws = F.size(F.split(F.col(text_col), " "))
    rx = F.regexp_count(F.col(text_col), F.lit(TOKEN_REGEX))
    return ws.alias("n_ws_tokens"), rx.alias("n_regex_tokens")


def stopword_ratio(
    text_col: str = "text", stopwords: Sequence[str] = DEFAULT_STOPWORDS
) -> Column:
    """Fraction of whitespace tokens that are stopwords."""
    quoted = ", ".join(f"'{s}'" for s in stopwords)
    return F.expr(
        f"size(filter(split({text_col}, ' '), x -> x IN ({quoted}))) "
        f"/ CAST(size(split({text_col}, ' ')) AS DOUBLE)"
    )


def quality_score(text_col: str = "text") -> Column:
    """Composite quality heuristic: length saturation + stopword presence +
    punctuation penalty (the shape of C4/Gopher-style quality rules)."""
    n_tokens = F.size(F.split(F.col(text_col), " ")).cast("double")
    len_component = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    stop_component = F.least(stopword_ratio(text_col) * 5.0, F.lit(1.0))
    punct = F.regexp_count(F.col(text_col), F.lit(r"[^\w\s]")).cast("double")
    punct_penalty = F.least(punct / n_tokens, F.lit(1.0))
    return (
        len_component * 0.5 + stop_component * 0.4 - punct_penalty * 0.1
    )


def lang_id_score(text_col: str, markers: Sequence[str]) -> Column:
    """Marker-hit ratio for one language's marker-word list (n-gram/stopword
    language-ID heuristic; on a real corpus each language gets its own
    marker list and argmax wins)."""
    quoted = ", ".join(f"'{m}'" for m in markers)
    return F.expr(
        f"size(filter(split({text_col}, ' '), x -> x IN ({quoted}))) "
        f"/ CAST(size(split({text_col}, ' ')) AS DOUBLE)"
    )


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_frac_max: float = 0.12,
    distinct_ratio_min: float = 0.35,
) -> DataFrame:
    """Gopher-style per-document repetition signals: token count, distinct
    token count, the most-frequent-token fraction, and the distinct-token
    ratio, plus a repetitiveness flag (top fraction too high OR diversity
    too low) — the standard filter for loop/spam/boilerplate documents in a
    training-data pipeline.

    Scale shape: explode tokens, then two key-partitioned aggregations
    ((doc, token) term frequency → per-doc rollup), both with map-side
    partials. Shuffles only compact (id, token, count) triples — linear at
    corpus scale, no per-document serialization point. The flag compares
    ROUNDED fractions so any engine computing the same rounding agrees
    exactly on the boundary."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    tf = toks.groupBy(id_col, "tok").agg(F.count("*").alias("c"))
    agg = tf.groupBy(id_col).agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_distinct"),
        F.max("c").alias("__top"),
    )
    top_frac = F.round(F.col("__top") / F.col("n_tokens"), 6)
    distinct_ratio = F.round(F.col("n_distinct") / F.col("n_tokens"), 6)
    return agg.select(
        F.col(id_col),
        "n_tokens",
        "n_distinct",
        top_frac.alias("top_token_frac"),
        distinct_ratio.alias("distinct_ratio"),
        (
            (top_frac > F.lit(top_frac_max))
            | (distinct_ratio < F.lit(distinct_ratio_min))
        ).alias("flagged_repetitive"),
    )


def document_fingerprint(text_col: str = "text") -> Column:
    """Content fingerprint: md5 over case- and whitespace-normalized text —
    the exact-dedup key that survives formatting noise."""
    normalized = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return F.md5(normalized)
