"""Pins for tools/gen_scaled_sf.py — the sf1 scale-probe dataset generator.

The sf1 bench decade's validity rests on two constructions this file pins:

- key-offset replication keeps FK joins intra-replica and collision-free
  (the round-8 ADVICE guard: a source with keys >= OFFSET must fail loudly);
- ``--perturb`` keeps WITHIN-replica duplicate structure exact while
  decorrelating ACROSS replicas, so dedup/ANN outputs grow ~linearly in the
  factor instead of quadratically (round-8 VERDICT task 4).

DuckDB-only (no Spark session) — runs in seconds on the sf0.001 tables.
"""

from __future__ import annotations

import math
import subprocess
import sys

import duckdb
import pytest

TOOL = "tools/gen_scaled_sf.py"
SRC = "/root/testdata/sf0.001"


def _gen(tmp_path, *extra: str) -> str:
    out = str(tmp_path / "scaled")
    subprocess.run(
        [sys.executable, TOOL, "--src", SRC, "--out", out, "--factor", "3", *extra],
        check=True,
        capture_output=True,
        text=True,
    )
    return out


@pytest.fixture(scope="module")
def perturbed(tmp_path_factory):
    return _gen(tmp_path_factory.mktemp("sf"), "--perturb")


def test_row_counts_scale_by_factor_and_fks_stay_intra_replica(perturbed):
    con = duckdb.connect()
    src_orders = con.execute(
        f"SELECT count(*) FROM read_parquet('{SRC}/orders.parquet')"
    ).fetchone()[0]
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{perturbed}/orders.parquet')"
    ).fetchone()[0]
    assert n == 3 * src_orders
    # fixed dimensions copied unchanged
    assert (
        con.execute(
            f"SELECT count(*) FROM read_parquet('{perturbed}/region.parquet')"
        ).fetchone()[0]
        == 5
    )
    # every order's customer lives in the same replica (o_custkey div OFFSET
    # == o_orderkey div OFFSET) and the FK resolves
    dangling = con.execute(
        f"""
        SELECT count(*) FROM read_parquet('{perturbed}/orders.parquet') o
        LEFT JOIN read_parquet('{perturbed}/customer.parquet') c
          ON c.c_custkey = o.o_custkey
        WHERE c.c_custkey IS NULL
           OR o.o_custkey // 10000000 != o.o_orderkey // 10000000
        """
    ).fetchone()[0]
    assert dangling == 0


def test_collision_guard_rejects_oversized_source_keys(tmp_path):
    bad_src = tmp_path / "badsrc"
    bad_src.mkdir()
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{bad_src}/{t}.parquet' (FORMAT PARQUET)"
        )
    # poison one shifted key column past OFFSET
    con.execute(
        f"COPY (SELECT * REPLACE (c_custkey + 10000000 AS c_custkey) "
        f"FROM read_parquet('{SRC}/customer.parquet')) "
        f"TO '{bad_src}/customer.parquet' (FORMAT PARQUET)"
    )
    proc = subprocess.run(
        [
            sys.executable,
            TOOL,
            "--src",
            str(bad_src),
            "--out",
            str(tmp_path / "out"),
            "--factor",
            "2",
        ],
        capture_output=True,
        text=True,
    )
    assert proc.returncode != 0
    assert "collide" in proc.stderr


def test_perturb_text_is_length_preserving_bijection_per_replica(perturbed):
    con = duckdb.connect()
    # replica 0 verbatim; replicas 1,2 vowel-translated, same length
    rows = con.execute(
        f"""
        SELECT p.doc_id // 10000000 AS replica,
               count(*) AS n,
               sum(CASE WHEN len(p.text) = len(s.text) THEN 1 ELSE 0 END) AS same_len,
               sum(CASE WHEN p.text = s.text THEN 1 ELSE 0 END) AS verbatim
        FROM read_parquet('{perturbed}/documents.parquet') p
        JOIN read_parquet('{SRC}/documents.parquet') s
          ON s.doc_id = p.doc_id % 10000000
        GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    assert [r[0] for r in rows] == [0, 1, 2]
    for replica, n, same_len, verbatim in rows:
        assert same_len == n  # translate is length-preserving
        if replica == 0:
            assert verbatim == n
        else:
            assert verbatim == 0  # every doc contains a vowel in this corpus
    # the per-replica character maps are injective bijections: distinct
    # source texts stay distinct inside each replica
    dup = con.execute(
        f"""
        SELECT max(cnt) FROM (
          SELECT doc_id // 10000000 AS replica, text, count(*) AS cnt
          FROM read_parquet('{perturbed}/documents.parquet') GROUP BY 1, 2)
        """
    ).fetchone()[0]
    src_dup = con.execute(
        f"SELECT max(cnt) FROM (SELECT text, count(*) AS cnt "
        f"FROM read_parquet('{SRC}/documents.parquet') GROUP BY 1)"
    ).fetchone()[0]
    assert dup == src_dup  # no new within-replica text collisions


def test_perturb_embeddings_orthogonal_within_decorrelated_across(perturbed):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding "
        f"FROM read_parquet('{perturbed}/embeddings.parquet') "
        f"WHERE vec_id % 10000000 < 40 ORDER BY vec_id"
    ).fetchall()
    by_rep: dict[int, dict[int, list[float]]] = {}
    for vid, emb in rows:
        by_rep.setdefault(vid // 10000000, {})[vid % 10000000] = emb

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    base = by_rep[0]
    keys = sorted(base)
    for rep in (1, 2):
        for k in keys:
            # orthogonal transform: norm exactly preserved (rotation is a
            # permutation, negation is sign-exact in IEEE)
            na = math.sqrt(sum(x * x for x in base[k]))
            nb = math.sqrt(sum(x * x for x in by_rep[rep][k]))
            assert abs(na - nb) < 1e-4
        # within-replica cosine structure preserved to float-sum-order noise
        for i in range(0, len(keys) - 1, 2):
            a, b = keys[i], keys[i + 1]
            assert abs(
                cos(base[a], base[b]) - cos(by_rep[rep][a], by_rep[rep][b])
            ) < 1e-5
        # across replicas the same-origin vector is decorrelated well below
        # the 0.4 query threshold
        cross = [abs(cos(base[k], by_rep[rep][k])) for k in keys]
        assert max(cross) < 0.4


def test_sign_patterns_distinct_beyond_rotation_period():
    """Rotation alone repeats mod dim (replica i and i+dim would share a
    transform at factor > dim); the md5-keyed sign patterns must make every
    replica's transform distinct for any plausible factor."""
    sys.path.insert(0, ".")
    from tools.gen_scaled_sf import _sign_pattern

    pats = [tuple(_sign_pattern(i, 64)) for i in range(1, 200)]
    assert len(set(pats)) == len(pats)
    for p in pats:
        assert set(p) <= {1.0, -1.0} and len(p) == 64


def test_events_output_is_time_clustered(perturbed):
    """Events must be written in timestamp order (CLUSTER = {events: ts}):
    an event log's realistic ingest layout is time-clustered, and with the
    streamed (unordered) COPY a random layout was measured to cost
    `events_gapfill_hourly` 7x at sf10 — its 105M-group partial aggregation
    only bounds each map task's hash table when the scan is time-clustered.
    Other tables stay streamed (replication is source-row-major; no key
    clustering exists to preserve)."""
    con = duckdb.connect()
    # file_row_number gives the EXPLICIT file position; row_number() OVER ()
    # with no ORDER BY only tracked it via DuckDB's preserve_insertion_order
    # default, which the SQL standard doesn't guarantee (r9 ADVICE)
    unsorted = con.execute(
        f"SELECT count(*) FROM (SELECT ts, lag(ts) OVER (ORDER BY file_row_number) prev "
        f"FROM read_parquet('{perturbed}/events.parquet', file_row_number=true)) "
        f"WHERE prev IS NOT NULL AND ts < prev"
    ).fetchone()[0]
    assert unsorted == 0


@pytest.fixture(scope="module")
def skewed(tmp_path_factory):
    return _gen(tmp_path_factory.mktemp("sfskew"), "--perturb", "--skew")


def test_skew_user_draw_is_globally_zipfian_and_domain_valid(skewed):
    """--skew must create ONE globally-hot user (not a per-replica hot user
    that dilutes across replicas) while every drawn key stays inside a key
    range the replication actually created."""
    con = duckdb.connect()
    total, top_user, top_cnt = con.execute(
        f"""
        SELECT (SELECT count(*) FROM read_parquet('{skewed}/events.parquet')),
               user_id, count(*)
        FROM read_parquet('{skewed}/events.parquet')
        GROUP BY user_id ORDER BY count(*) DESC LIMIT 1
        """
    ).fetchone()
    # bounded-Pareto rank 1 at alpha=1.1 over N=45 users holds ~15-25% of
    # rows; uniform would be 1/45 ~ 2.2%. Generous band, strict vs uniform.
    share = top_cnt / total
    assert 0.05 < share < 0.45, f"rank-1 user share {share} not Zipf-shaped"
    assert share > 5 * (1 / 45), "hot user indistinguishable from uniform"
    assert top_user == 0, "rank 1 must map to global key 0 (replica 0)"
    # domain validity: within-replica key < source cardinality (15 users at
    # sf0.001), replica index < factor
    bad = con.execute(
        f"""
        SELECT count(*) FROM read_parquet('{skewed}/events.parquet')
        WHERE user_id % 10000000 >= 15 OR user_id // 10000000 >= 3
           OR user_id < 0
        """
    ).fetchone()[0]
    assert bad == 0


def test_skew_custkey_draw_keeps_fk_exact(skewed):
    """Every Zipf-drawn o_custkey must exist in the replicated customer
    table (the draw maps ranks into created key ranges, never inventing
    keys) and the head must be globally hot."""
    con = duckdb.connect()
    dangling = con.execute(
        f"""
        SELECT count(*) FROM read_parquet('{skewed}/orders.parquet') o
        LEFT JOIN read_parquet('{skewed}/customer.parquet') c
          ON c.c_custkey = o.o_custkey
        WHERE c.c_custkey IS NULL
        """
    ).fetchone()[0]
    assert dangling == 0
    total, top_cnt = con.execute(
        f"""
        SELECT (SELECT count(*) FROM read_parquet('{skewed}/orders.parquet')),
               count(*)
        FROM read_parquet('{skewed}/orders.parquet')
        GROUP BY o_custkey ORDER BY count(*) DESC LIMIT 1
        """
    ).fetchone()
    assert top_cnt / total > 5 * (1 / 450), "no global hot customer"


def test_skew_boilerplate_is_cross_replica_identical_and_consistent(skewed):
    """The boilerplate suffix must be byte-identical across replicas (it is
    appended AFTER the per-replica vowel perturbation — that is what makes
    its shingles globally hot), hit ~25% of documents, and keep n_chars
    consistent with the new text."""
    con = duckdb.connect()
    boiler, total, bad_len = con.execute(
        f"""
        SELECT count(*) FILTER (text LIKE '%terms of service apply'),
               count(*),
               count(*) FILTER (n_chars <> len(text))
        FROM read_parquet('{skewed}/documents.parquet')
        """
    ).fetchone()
    assert bad_len == 0, "n_chars out of sync with skewed text"
    assert 0.15 < boiler / total < 0.35, f"boilerplate frac {boiler/total}"
    # present in every replica (global hotness, not replica-0-only)
    replicas = con.execute(
        f"""
        SELECT count(DISTINCT doc_id // 10000000)
        FROM read_parquet('{skewed}/documents.parquet')
        WHERE text LIKE '%terms of service apply'
        """
    ).fetchone()[0]
    assert replicas == 3
    # composes with --perturb: non-replica-0 docs still vowel-translated
    greek_range = f"[{chr(0x3B1)}-{chr(0x3FF)}]"
    greek = con.execute(
        f"""
        SELECT count(*) FROM read_parquet('{skewed}/documents.parquet')
        WHERE doc_id >= 10000000 AND regexp_matches(text, '{greek_range}')
        """
    ).fetchone()[0]
    assert greek > 0, "--skew must not disable --perturb's translation"


def test_multi_file_output_splits_big_tables_and_preserves_counts(tmp_path):
    """--files N writes big non-clustered tables as DIRECTORIES of >1
    parquet file (scan parallelism at sf10 was capped at the single
    file's 4-5 row groups — the r10 straggler-probe poison), with row
    counts and FK structure identical to single-file output."""
    import os

    out = str(tmp_path / "multi")
    subprocess.run(
        [sys.executable, TOOL, "--src", SRC, "--out", out, "--factor", "3",
         "--files", "4", "--min-file-bytes", "1"],
        check=True, capture_output=True, text=True,
    )
    con = duckdb.connect()
    # lineitem is big + non-clustered -> directory with multiple files
    li = os.path.join(out, "lineitem.parquet")
    assert os.path.isdir(li), "big table should be a multi-file directory"
    assert len(os.listdir(li)) > 1
    n = con.execute(f"SELECT count(*) FROM read_parquet('{li}/*.parquet')").fetchone()[0]
    n_src = con.execute(f"SELECT count(*) FROM read_parquet('{SRC}/lineitem.parquet')").fetchone()[0]
    assert n == 3 * n_src
    # events is CLUSTERED (ts order) -> stays a single sorted file
    assert os.path.isfile(os.path.join(out, "events.parquet"))
    # FKs stay intra-replica across the file split: every order key the
    # lineitems reference exists in the replicated orders table
    orders = os.path.join(out, "orders.parquet")
    orc = f"read_parquet('{orders}/*.parquet')" if os.path.isdir(orders) else f"read_parquet('{orders}')"
    dangling = con.execute(
        f"SELECT count(*) FROM read_parquet('{li}/*.parquet') l "
        f"LEFT JOIN {orc} o ON l.l_orderkey = o.o_orderkey "
        f"WHERE o.o_orderkey IS NULL"
    ).fetchone()[0]
    assert dangling == 0


def test_skew_alpha_at_or_below_one_rejected(tmp_path):
    r = subprocess.run(
        [sys.executable, TOOL, "--src", SRC, "--out", str(tmp_path / "x"),
         "--factor", "2", "--skew", "--skew-alpha", "1.0"],
        capture_output=True, text=True,
    )
    assert r.returncode != 0
    assert "skew-alpha" in r.stderr
