"""Distributed-selection order statistics (operators/selection.py):
value-identical to the sort-based answer on adversarial shapes — single
element groups, all-equal values, extreme ranks, values straddling
bucket boundaries."""

from __future__ import annotations

from sqlserver_cdc_to_kafka_spark.operators.selection import exact_group_kth


def _check(spark, data, rank_fns):
    df = spark.createDataFrame(data, "g string, v long")
    got = {
        g: res for g, _n, res in exact_group_kth(df, "g", "v", rank_fns)
    }
    want = {}
    by_g = {}
    for g, v in data:
        by_g.setdefault(g, []).append(v)
    for g, vs in by_g.items():
        vs = sorted(vs)
        want[g] = {
            label: vs[fn(len(vs)) - 1] for label, fn in rank_fns.items()
        }
    assert got == want


def test_selection_matches_sorted_ranks(spark):
    data = [("a", v) for v in [5, 1, 9, 3, 7, 11, 2, 8]] + [
        ("b", v) for v in [100, 50, 75]
    ]
    _check(
        spark,
        data,
        {
            "p50": lambda n: (n + 1) // 2,
            "p90": lambda n: (9 * n + 9) // 10,
            "min": lambda n: 1,
            "max": lambda n: n,
        },
    )


def test_selection_single_element_and_equal_values(spark):
    data = [("solo", 42)] + [("flat", 7)] * 5
    _check(
        spark,
        [("solo", 42)] + [("flat", 7) for _ in range(5)],
        {"p50": lambda n: (n + 1) // 2, "max": lambda n: n},
    )


def test_selection_bucket_boundary_values(spark):
    # values chosen so the range/1024 width forces several per bucket
    data = [("g", v) for v in range(0, 5000, 13)]
    _check(
        spark,
        data,
        {"p25": lambda n: (n + 3) // 4, "p99": lambda n: (99 * n + 99) // 100},
    )


def test_selection_negative_values(spark):
    data = [("g", v) for v in [-50, -1, 0, 3, -999, 17]]
    _check(spark, data, {"p50": lambda n: (n + 1) // 2, "min": lambda n: 1})


def test_selection_huge_range_bucket_boundaries(spark):
    """Regression: with a 2^60 value range the bucket width is ~2^50, and
    double division (v - lo)/w can round a just-below-boundary value into
    the NEXT bucket (v = k*w - 1 is not double-representable at this
    magnitude), disagreeing with pass 2's integer range filter and
    breaking the EXACT guarantee.  Bucketing must use integer floored
    division."""
    w = (1 << 50) + 1  # the width exact_group_kth derives for range 2^60
    data = [("g", 0), ("g", 1 << 60)] + [
        ("g", k * w - 1) for k in (37, 512, 900)
    ] + [("g", k * w) for k in (37, 900)]
    _check(
        spark,
        data,
        {
            "p50": lambda n: (n + 1) // 2,
            "p25": lambda n: (n + 3) // 4,
            "max": lambda n: n,
        },
    )
