"""Generate a larger scale-factor dataset by key-offset replication.

The driver ships sf0.001/0.01/0.1; the round-7 VERDICT's stretch task asks
for one more measured decade (sf1) so the 100× scale claims rest on timings,
not only on the scale-stress invariants.  This tool replicates each sf0.1
table FACTOR times with every entity key (and the FKs that reference it)
offset by ``replica * OFFSET`` — FK joins stay consistent within a replica
and never cross replicas, so join/agg selectivities match the source SF and
row counts scale exactly ×FACTOR.  region/nation are fixed dimensions in
TPC-H and are copied unchanged (their FKs are untouched).

Text/embedding payloads repeat verbatim across replicas — identical to the
scale-stress protocol (tests/test_scale_stress.py), so dedup-family queries
see FACTOR-sized identical groups by construction.

    python tools/gen_scaled_sf.py --out .localdata/sf1          # 10x sf0.1
"""

from __future__ import annotations

import argparse
import os

import duckdb

# one global offset, far above every sf0.1 key (max key there is 149_999)
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


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--src", default="/root/testdata/sf0.1")
    p.add_argument("--out", default=".localdata/sf1")
    p.add_argument("--factor", type=int, default=10)
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    for table, cols in SHIFT.items():
        src = os.path.join(args.src, f"{table}.parquet")
        dst = os.path.join(args.out, f"{table}.parquet")
        if not cols:
            sql = f"SELECT * FROM read_parquet('{src}')"
        else:
            repl = ", ".join(f"{c} + r.i * {OFFSET} AS {c}" for c in cols)
            sql = (
                f"SELECT t.* REPLACE ({repl}) "
                f"FROM read_parquet('{src}') t CROSS JOIN range({args.factor}) r(i)"
            )
        con.execute(f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{table}: {n} rows -> {dst}")


if __name__ == "__main__":
    main()
