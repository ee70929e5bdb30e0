"""Generate a larger scale-factor dataset by key-offset replication.

The driver ships sf0.001/0.01/0.1; the round-7 VERDICT's stretch task asks
for one more measured decade (sf1) so the 100× scale claims rest on timings,
not only on the scale-stress invariants.  This tool replicates each sf0.1
table FACTOR times with every entity key (and the FKs that reference it)
offset by ``replica * OFFSET`` — FK joins stay consistent within a replica
and never cross replicas, so join/agg selectivities match the source SF and
row counts scale exactly ×FACTOR.  region/nation are fixed dimensions in
TPC-H and are copied unchanged (their FKs are untouched).

Default (verbatim) mode repeats text/embedding payloads unchanged across
replicas — identical to the scale-stress protocol
(tests/test_scale_stress.py), so dedup-family queries see FACTOR-sized
identical groups by construction and near-dup PAIR counts grow
quadratically in FACTOR (the round-8 sf1 probe's two >10× ratios were
exactly this output explosion, not engine super-linearity).

``--perturb`` (round-8 VERDICT task 4) applies a deterministic per-replica
transform that keeps WITHIN-replica duplicate structure intact while
decorrelating ACROSS replicas, so dedup/ANN output grows ≈×FACTOR
(realistic duplicate rates) instead of ×FACTOR²:

- ``documents.text``: per-replica vowel substitution via ``translate`` —
  a character bijection ('aeiou' → five replica-keyed Greek codepoints
  absent from the ASCII source), so within a replica every word-shingle
  relation is EXACTLY preserved (bijections on characters are bijections
  on shingles) while across replicas nearly every shingle differs
  (word-3-gram Jaccard ≈ 0).  Length-preserving, so ``n_chars`` stays
  consistent.  Replica 0 is verbatim.
- ``embeddings.embedding``: per-replica orthogonal transform — cyclic
  coordinate rotation by ``(replica*7) mod dim`` composed with an
  md5-keyed per-coordinate ±1 sign pattern (exact in IEEE; the signed
  permutation group).  Orthogonal maps preserve every within-replica dot
  product/norm (up to float summation order), so within-replica cosine
  structure is intact; across replicas the transform decorrelates
  (measured on the shipped sf0.1 sample: same-origin cross-replica cosine
  mean ≈0.01, max <0.4 = the query threshold).  The md5-keyed signs make
  every replica's transform distinct for ANY factor — rotation alone
  repeats mod dim, which would hand replicas i and i+dim identical
  embeddings at factor > dim.  Replica 0 is verbatim.

``--skew`` (round-9 VERDICT task 1) makes the scaled dataset Zipfian instead
of uniform — the one scale axis the three measured decades never exercised.
Replication alone preserves the source's balanced key distribution inside
every replica, so every measured shuffle had balanced partitions by
construction; real 100 TB corpora have a hot user / hot customer / shared
boilerplate.  Crucially the hot keys must be GLOBAL, not per-replica: a
within-replica Zipf draw dilutes across FACTOR replicas (the per-replica
head is ~8k rows in a 10M-row table — invisible to a 32-partition shuffle).
So the draw is a bounded-Pareto inverse-CDF (the continuous Zipf
approximation, exponent ``--skew-alpha`` ≈ 1.1) over the FULL replicated key
domain, mapped back into valid replica key ranges
(``key = (rank-1) % U + ((rank-1) // U) * OFFSET``) — rank 1 is one
globally-hot key (~8–10% of all rows at alpha 1.1), the tail spans every
replica, and FK validity is preserved exactly:

- ``events.user_id``: Zipf-drawn over all FACTOR×U users, seeded by the
  globally-unique shifted event_id (deterministic).  Stresses per-user
  window sorts (sessionize — holistic, non-combinable) and per-user aggs.
- ``orders.o_custkey``: Zipf-drawn over all FACTOR×C customer keys — every
  drawn key exists in the replicated customer table, so customer⋈orders
  selectivity stays total while one customer owns ~a tenth of all orders.
- ``documents``: a fixed ASCII boilerplate sentence is appended to ~25% of
  documents (hash-chosen, post-perturb so it stays IDENTICAL across
  replicas) — the web-crawl footer pattern that hands shingle-based dedup a
  set of hot shingles each shared by a quarter of the corpus; n_chars is
  adjusted to stay consistent with the new text.

    python tools/gen_scaled_sf.py --out .localdata/sf1            # verbatim
    python tools/gen_scaled_sf.py --out .localdata/sf1p --perturb # realistic
    python tools/gen_scaled_sf.py --out .localdata/sf1s --perturb --skew
"""

from __future__ import annotations

import argparse
import os

import duckdb

# Tables whose REALISTIC ingest layout is clustered (an event log lands in
# timestamp order) get an explicit ORDER BY on write: with streaming COPY
# (preserve_insertion_order=false) rows interleave randomly, and a random
# layout changed `events_gapfill_hourly`'s sf10 cost 7.6 -> 53.8 s on
# identical data (measured): its 105M-group partial aggregation bounds each
# map task's hash table to the task's time window ONLY when the scan is
# time-clustered — randomly laid-out input makes every task see every
# (user, hour) group, so map-side combine degrades to a full spill. Other
# tables stay streamed: replication never key-clusters them anyway (the
# order-preserving layout is source-row-major — adjacent rows are the SAME
# source row in different replicas, i.e. keys 10M apart), and their probed
# queries measured layout-insensitive (everything else shifted only the
# 1.0–1.6x host band while gapfill moved 7x).
CLUSTER: dict[str, str] = {"events": "ts"}

# one global offset; replica key ranges are [i*OFFSET, i*OFFSET + max_key],
# collision-free iff every source key < OFFSET (asserted below per table —
# round-8 ADVICE: pointing --src at a larger dataset must fail loudly, not
# silently corrupt FK joins)
OFFSET = 10_000_000

# table -> id columns to shift per replica (key + FK sides use the same
# offset, keeping intra-replica joins exact)
SHIFT: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _vowel_targets(replica: int) -> str:
    """Five distinct non-ASCII codepoints per replica (Greek block), so the
    per-replica character map is a bijection on the ASCII source alphabet."""
    if replica == 0:
        return "aeiou"
    base = 0x3B1 + 5 * (replica - 1)  # α.. onward, 5 per replica
    return "".join(chr(base + k) for k in range(5))


def _sign_pattern(replica: int, dim: int) -> list[float]:
    """Deterministic ±1.0 pattern per replica from md5 bits — distinct for
    every replica index, so the transform family never repeats."""
    import hashlib

    bits: list[int] = []
    counter = 0
    while len(bits) < dim:
        h = hashlib.md5(f"gen-scaled-sf-signs-{replica}-{counter}".encode()).digest()
        for byte in h:
            for k in range(8):
                bits.append((byte >> k) & 1)
        counter += 1
    return [1.0 if b else -1.0 for b in bits[:dim]]


# appended (post-perturb, so it is byte-identical across replicas) to ~25%
# of documents under --skew: ~11 globally-hot word-3-grams, each in a
# quarter of the corpus — the boilerplate-footer shape of real web crawls
BOILERPLATE = (
    "all rights reserved subscribe to our newsletter "
    "for updates terms of service apply"
)
_BOILER_MOD = 4  # hash(doc_id) % 4 == 0 -> boilerplated (~25%)


def _rp(path: str) -> str:
    """read_parquet-able path: multi-file tables are DIRECTORIES (the
    --files output shape), which DuckDB reads only via a glob."""
    return f"{path}/*.parquet" if os.path.isdir(path) else path


def _zipf_key_expr(
    id_seed: str, src_card: int, factor: int, alpha: float
) -> str:
    """SQL drawing a globally-Zipfian key over the replicated key domain.

    Bounded-Pareto inverse CDF (continuous Zipf): with s=alpha and N total
    keys, x = (1 + u*(N^(1-s) - 1))^(1/(1-s)) maps uniform u in [0,1) to a
    rank in [1, N] with P(rank <= k) ~ Zipf mass. The rank then maps DENSELY
    back into the replicated key space — (rank-1) % U is the within-replica
    key, (rank-1) // U picks the replica offset — so every drawn key is a
    key the replication actually created (FK-exact) and rank 1 is globally
    hot. u comes from duckdb's hash() of the globally-unique seed column:
    deterministic, row-stable, independent of file order."""
    n_total = src_card * factor
    one_minus_s = 1.0 - alpha
    u = f"((hash({id_seed}) % 1000000007) / 1000000007.0)"
    x = (
        f"pow(1.0 + {u} * (pow({n_total}, {one_minus_s}) - 1.0), "
        f"{1.0 / one_minus_s})"
    )
    rank = f"CAST(least(greatest(floor({x}), 1), {n_total}) AS BIGINT)"
    return (
        f"((({rank}) - 1) % {src_card} + "
        f"((({rank}) - 1) // {src_card}) * {OFFSET})"
    )


def _perturb_expr(
    table: str, replica_var: str, factor: int, emb_dim: int
) -> str | None:
    """SQL REPLACE fragment perturbing the payload column for this table,
    keyed on the replica index column ``replica_var``; None = no payload."""
    if table == "documents":
        cases = " ".join(
            f"WHEN {replica_var} = {i} THEN "
            f"translate(text, 'aeiou', '{_vowel_targets(i)}')"
            for i in range(1, factor)
        )
        return f"CASE WHEN {replica_var} = 0 THEN text {cases} END AS text"
    if table == "embeddings":
        # rotation by (i*7) mod dim composed with the per-replica sign
        # pattern; list slices are 1-based inclusive in DuckDB
        rot = f"(({replica_var} * 7) % len(embedding))"
        rotated = f"list_concat(embedding[{rot} + 1:], embedding[1:{rot}])"
        cases = " ".join(
            f"WHEN {replica_var} = {i} THEN "
            f"list_transform({rotated}, (e, k) -> e * (CAST("
            f"{_sign_pattern(i, emb_dim)} AS FLOAT[]))[k])"
            for i in range(1, factor)
        )
        return (
            f"CASE WHEN {replica_var} = 0 THEN embedding {cases} END AS embedding"
        )
    return None


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--src", default="/root/testdata/sf0.1")
    p.add_argument("--out", default=".localdata/sf1")
    p.add_argument("--factor", type=int, default=10)
    p.add_argument(
        "--perturb",
        action="store_true",
        help="deterministically perturb text/embedding payloads per replica "
        "(realistic duplicate rates; replica 0 verbatim)",
    )
    p.add_argument(
        "--skew",
        action="store_true",
        help="globally-Zipfian events.user_id / orders.o_custkey and a "
        "shared boilerplate suffix on ~25%% of documents (hot-key probe "
        "data; composes with --perturb)",
    )
    p.add_argument(
        "--skew-alpha",
        type=float,
        default=1.1,
        help="Zipf exponent for --skew (default 1.1)",
    )
    p.add_argument(
        "--files",
        type=int,
        default=32,
        help="target parquet files per BIG table (directory output via "
        "FILE_SIZE_BYTES). A single file caps Spark's scan parallelism at "
        "its row-group count (4-5 for documents at sf10 — measured: it "
        "poisons straggler ratios because the probe's denominator is "
        "starved tasks, not slow ones). 0/1 = legacy single file.",
    )
    p.add_argument(
        "--min-file-bytes",
        type=int,
        default=1024 * 1024,
        help="never split below this per-file size (small tables stay "
        "single-file regardless of --files). 1 MiB default: documents at "
        "sf10 is only ~1.9 MiB/file compressed yet its single-file form "
        "has 4-5 row groups = 4-5 scan tasks on 32 slots (the r10 probe "
        "poison) — the floor exists for region/nation-sized dimensions, "
        "not for anything a probe scans",
    )
    args = p.parse_args()
    # the bounded-Pareto inverse CDF in _zipf_key_expr divides by (1-alpha):
    # alpha == 1.0 is a ZeroDivisionError while BUILDING the SQL, and
    # alpha < 1 silently inverts the distribution shape (rank N hot instead
    # of rank 1).  Fail loud at the argument boundary.
    if args.skew_alpha <= 1.0:
        p.error(
            f"--skew-alpha must be > 1.0 (got {args.skew_alpha}): the "
            "bounded-Pareto mapping is undefined at 1.0 and shape-inverted "
            "below it; use e.g. 1.0001 to approximate classic Zipf s=1"
        )

    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    # Without this, COPY preserves input row order and must MATERIALIZE the
    # whole replicated result before writing — fine at factor 100 (fits in
    # the buffer pool) but at factor 1000 the 600M-row lineitem spilled
    # >15 GB to disk with the parquet file still at 0 bytes (measured).
    # Row order in the output carries no meaning here: every downstream
    # query/oracle is order-independent and the perturbation is keyed on
    # the per-row replica index, not file position — so let COPY stream.
    con.execute("SET preserve_insertion_order = false")
    emb_dim = con.execute(
        f"SELECT max(len(embedding)) FROM "
        f"read_parquet('{_rp(os.path.join(args.src, 'embeddings.parquet'))}')"
    ).fetchone()[0]
    user_card = cust_card = 0
    if args.skew:
        # key-domain cardinalities for the global Zipf draw; source keys are
        # dense from 0 (asserted by the rank mapping's % arithmetic — a
        # sparse domain would only make some ranks alias existing keys,
        # never invent one, but dense sources keep the distribution exact)
        user_card = (
            con.execute(
                f"SELECT max(user_id) + 1 FROM "
                f"read_parquet('{_rp(os.path.join(args.src, 'events.parquet'))}')"
            ).fetchone()[0]
        )
        cust_card = (
            con.execute(
                f"SELECT max(c_custkey) + 1 FROM "
                f"read_parquet('{_rp(os.path.join(args.src, 'customer.parquet'))}')"
            ).fetchone()[0]
        )
    for table, cols in SHIFT.items():
        src = os.path.join(args.src, f"{table}.parquet")
        dst = os.path.join(args.out, f"{table}.parquet")
        for c in cols:  # collision guard (round-8 ADVICE)
            mx = con.execute(
                f"SELECT max({c}) FROM read_parquet('{_rp(src)}')"
            ).fetchone()[0]
            if mx is not None and mx >= OFFSET:
                raise SystemExit(
                    f"{table}.{c}: max source key {mx} >= OFFSET {OFFSET}; "
                    f"replica key ranges would collide — raise OFFSET"
                )
        if not cols:
            sql = f"SELECT * FROM read_parquet('{_rp(src)}')"
        else:
            repl_parts = [f"{c} + r.i * {OFFSET} AS {c}" for c in cols]
            if args.perturb:
                pexpr = _perturb_expr(table, "r.i", args.factor, emb_dim)
                if pexpr:
                    repl_parts.append(pexpr)
            if args.skew and table == "events":
                # seed on the globally-unique shifted event_id so the draw
                # is per-row deterministic and replica-independent
                repl_parts = [
                    p for p in repl_parts if not p.endswith(" AS user_id")
                ] + [
                    _zipf_key_expr(
                        f"t.event_id + r.i * {OFFSET}",
                        user_card,
                        args.factor,
                        args.skew_alpha,
                    )
                    + " AS user_id"
                ]
            if args.skew and table == "orders":
                repl_parts = [
                    p for p in repl_parts if not p.endswith(" AS o_custkey")
                ] + [
                    _zipf_key_expr(
                        f"t.o_orderkey + r.i * {OFFSET}",
                        cust_card,
                        args.factor,
                        args.skew_alpha,
                    )
                    + " AS o_custkey"
                ]
            sql = (
                f"SELECT t.* REPLACE ({', '.join(repl_parts)}) "
                f"FROM read_parquet('{_rp(src)}') t CROSS JOIN range({args.factor}) r(i)"
            )
            if args.skew and table == "documents":
                # outer wrapper: doc_id is already globally unique here;
                # keep n_chars consistent with the appended boilerplate
                blen = len(BOILERPLATE) + 1
                sql = (
                    f"SELECT * REPLACE ("
                    f"CASE WHEN hash(doc_id) % {_BOILER_MOD} = 0 "
                    f"THEN text || ' {BOILERPLATE}' ELSE text END AS text, "
                    f"CASE WHEN hash(doc_id) % {_BOILER_MOD} = 0 "
                    f"THEN n_chars + {blen} ELSE n_chars END AS n_chars) "
                    f"FROM ({sql})"
                )
        if table in CLUSTER:
            # the sort materializes, but only for the (small) clustered
            # tables — the factor-1000 lineitem OOM that motivated
            # streaming COPY stays on the streamed path
            sql += f" ORDER BY {CLUSTER[table]}"
        # multi-file output for big non-clustered tables: the per-file
        # target is source-size x factor / --files, floored so tiny tables
        # stay single-file; clustered tables stay single-file to keep the
        # sort's row-group locality
        per_file = 0
        if args.files > 1 and table not in CLUSTER:
            est = os.path.getsize(src) * max(args.factor, 1)
            per_file = est // args.files
        if per_file >= args.min_file_bytes:
            # FILE_SIZE_BYTES only rolls files at ROW GROUP boundaries, so
            # the group size must be a fraction of the per-file row target
            # or small tables land in one giant group = one file anyway
            rows_total = con.execute(
                f"SELECT count(*) FROM read_parquet('{_rp(src)}')"
            ).fetchone()[0] * max(args.factor, 1)
            rg = max(min(rows_total // args.files // 4, 122_880), 2_048)
            con.execute(
                f"COPY ({sql}) TO '{dst}' "
                f"(FORMAT PARQUET, FILE_SIZE_BYTES {per_file}, "
                f"ROW_GROUP_SIZE {rg})"
            )
            read_back = f"{dst}/*.parquet"
        else:
            con.execute(f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET)")
            read_back = dst
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{read_back}')"
        ).fetchone()[0]
        nf = len(os.listdir(dst)) if os.path.isdir(dst) else 1
        print(f"{table}: {n} rows -> {dst} ({nf} file{'s' if nf != 1 else ''})")


if __name__ == "__main__":
    main()
