"""Local replica of the driver's correctness gate.

Runs every registered query on Spark AND its DuckDB oracle over the same
parquet tables, canonicalizes both results (columns sorted by name, rows
sorted by all columns, floats rounded) and diffs them.

Usage:
    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqlserver_cdc_to_kafka_spark.tables import TABLES  # noqa: E402


def canonicalize(df: pd.DataFrame, float_decimals: int = 6) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # Decimal / bytes normalization
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(float_decimals)
        elif np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # DuckDB's default memory budget is 80% of RAM and it cannot see the
    # Spark JVM sharing the box; at sf1p the quadratic oracle queries
    # (all-pairs similarity) pushed the combined process past 110 GB and
    # within sight of the OOM killer (measured). Cap the oracle so it
    # spills to disk instead of racing Spark for the last gigabyte.
    con.execute("SET memory_limit = '48GB'")
    con.execute("SET temp_directory = '.oracle_tmp'")
    for t in TABLES:
        # multi-file tables (gen_scaled_sf --files) are directories; DuckDB
        # needs the glob while Spark reads the directory path natively
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument(
        "--tz",
        default=None,
        help="override spark.sql.session.timeZone (e.g. America/New_York) — "
        "oracle parity must hold under ANY session tz; queries are designed "
        "to expose timestamps only as epoch numbers",
    )
    ap.add_argument(
        "--shuffle-partitions",
        type=int,
        default=None,
        help="override spark.sql.shuffle.partitions — results must be "
        "partition-count invariant (probe with an odd value like 7)",
    )
    ap.add_argument(
        "--no-aqe",
        action="store_true",
        help="disable adaptive query execution — results must be invariant "
        "to AQE's runtime re-planning (coalesce, skew-join splits)",
    )
    ap.add_argument(
        "--no-codegen",
        action="store_true",
        help="disable whole-stage codegen — results must be invariant to "
        "the interpreted vs generated evaluation path",
    )
    ap.add_argument(
        "--json",
        default=None,
        metavar="PATH",
        help="also write per-query results as a JSON object in the same "
        "shape as the driver's CORRECTNESS_r*.json (rows_match / "
        "schema_match / hash_match / spark_rows / oracle_rows / err) — "
        "the committed LOCALCHECK_r*.json artifact that makes full local "
        "sweeps auditable without a re-run",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from sqlserver_cdc_to_kafka_spark.registry import load_all
    from sqlserver_cdc_to_kafka_spark.session import get_spark

    registry = load_all()
    names = args.names or sorted(registry)
    spark = get_spark("oracle-check")
    if args.tz:
        spark.conf.set("spark.sql.session.timeZone", args.tz)
    if args.shuffle_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
    if args.no_aqe:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    if args.no_codegen:
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
    con = duckdb_conn(args.sf)

    n_pass = n_fail = 0
    report: dict[str, dict] = {}

    def record(
        name: str,
        *,
        rows_match: bool | None,
        schema_match: bool | None,
        hash_match: bool | None,
        spark_rows=None,
        oracle_rows=None,
        err=None,
    ) -> None:
        report[name] = {
            "rows_match": rows_match,
            "schema_match": schema_match,
            "hash_match": hash_match,
            "spark_rows": spark_rows,
            "oracle_rows": oracle_rows,
            "err": err,
        }

    for name in names:
        q = registry[name]
        t0 = time.time()
        try:
            got = canonicalize(q.fn(spark, args.sf).toPandas())
        except Exception:
            print(f"FAIL {name}: spark raised")
            traceback.print_exc()
            record(
                name,
                rows_match=False,
                schema_match=False,
                hash_match=False,
                err="spark raised: " + traceback.format_exc().splitlines()[-1],
            )
            n_fail += 1
            continue
        if q.oracle is None:
            # Rows-only query: nothing was COMPARED, so record null for the
            # three match fields instead of true — a LOCALCHECK artifact must
            # not overstate what it verified (round-7 ADVICE item).  The
            # query still counts as a pass: it ran and produced rows.
            print(f"SKIP {name}: no oracle (rows-only), rows={len(got)} [{time.time()-t0:.1f}s]")
            record(
                name,
                rows_match=None,
                schema_match=None,
                hash_match=None,
                spark_rows=len(got),
                err=None,
            )
            report[name]["status"] = "rows-only (no oracle; ran, not compared)"
            n_pass += 1
            continue
        try:
            want = canonicalize(con.execute(q.oracle).fetchdf())
        except Exception:
            print(f"FAIL {name}: duckdb raised")
            traceback.print_exc()
            record(
                name,
                rows_match=False,
                schema_match=False,
                hash_match=False,
                spark_rows=len(got),
                err="duckdb raised: " + traceback.format_exc().splitlines()[-1],
            )
            n_fail += 1
            continue
        ok = True
        schema_ok = True
        rows_ok = len(got) == len(want)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            ok = schema_ok = False
        elif not rows_ok:
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            ok = False
        else:
            for c in got.columns:
                g, w = got[c], want[c]
                # The driver's value hash is dtype-sensitive: a DuckDB HUGEINT
                # (SUM over integers) arrives as float64 while Spark emits
                # int64 — numerically equal, hash-different. Flag it here.
                g_int = np.issubdtype(g.dtype, np.integer)
                w_int = np.issubdtype(w.dtype, np.integer)
                g_flt = np.issubdtype(g.dtype, np.floating)
                w_flt = np.issubdtype(w.dtype, np.floating)
                if (g_int and w_flt) or (g_flt and w_int):
                    print(
                        f"FAIL {name}: column {c} dtype skew "
                        f"spark={g.dtype} duckdb={w.dtype} "
                        "(driver hash would mismatch — CAST the oracle)"
                    )
                    ok = schema_ok = False
                    break
                if np.issubdtype(g.dtype, np.floating) or np.issubdtype(w.dtype, np.floating):
                    eq = np.isclose(
                        g.astype(float), w.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True
                    ).all()
                else:
                    eq = (g.fillna("<null>") == w.fillna("<null>")).all() if g.dtype == object else g.equals(w)
                if not eq:
                    bad = (
                        ~(g.fillna("<null>") == w.fillna("<null>"))
                        if g.dtype == object
                        else ~(g == w) & ~(g.isna() & w.isna())
                    )
                    idx = np.where(bad)[0][:3]
                    print(f"FAIL {name}: column {c} differs, e.g. rows {idx.tolist()}:")
                    for i in idx:
                        print(f"   spark={g.iloc[i]!r} duckdb={w.iloc[i]!r}")
                    ok = False
                    break
        record(
            name,
            rows_match=rows_ok,
            schema_match=schema_ok,
            hash_match=ok,
            spark_rows=len(got),
            oracle_rows=len(want),
        )
        if ok:
            print(f"PASS {name}: rows={len(got)} [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            n_fail += 1

    if args.json:
        import json

        with open(args.json, "w") as fh:
            json.dump(report, fh, indent=1)
        print(f"wrote {args.json} ({len(report)} queries)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
