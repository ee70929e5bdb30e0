"""The float-sum-boundary class is pinned statically (round-12 VERDICT #1).

The r12 end-of-round witness caught `pipeline_domain_mixture` flapping
because FLOOR consumed a value derived from a float SUM — combine-order
bits decided the floor when the product sat analytically on an integer.
The fix was ROUND(x,6)-before-FLOOR, mirrored in the oracle; this test
pins the *class*: tools/plan_audit.py:float_boundary_audit statically
scans every package function (AST + expr-string SQL) and every registered
oracle for floor/ceil/int-cast fed by an order-dependent float aggregate
without an intervening round().  Every member needs a written rationale in
FLOAT_BOUNDARY_BY_CONTRACT proving its floor order-independent; counts are
pinned exactly so a NEW unrounded floor in an already-listed function
fails here too (membership alone would let it slip).

Pure AST + registry import — no SparkSession needed.
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from plan_audit import FLOAT_BOUNDARY_BY_CONTRACT, float_boundary_audit  # noqa: E402


def test_members_exactly_match_contract_with_pinned_counts():
    sites, flags = float_boundary_audit()
    assert flags == [], "\n".join(flags)
    # exact counts, not just membership: q_domain_mixture's one remaining
    # unrounded floor is the exact-integer `thresh`; q_embedding_quantize's
    # two are the per-element x/scale quantizers (and their oracle mirrors);
    # the r14 double-column sum-taint widening (round-13 ADVICE) adds three
    # members whose boundary sites are per-row epoch-bucket casts and whose
    # tainting sums are DECIMAL (exact) — adjudicated in the contract
    assert sites == {
        "queries/audit.py:q_metrics_rollup": 1,
        "queries/behavior.py:q_gapfill_hourly": 1,
        "queries/behavior.py:q_gapfill_locf": 1,
        "queries/pipeline2.py:q_domain_mixture": 1,
        "queries/pipeline3.py:q_embedding_quantize": 2,
        "oracle:pipeline_domain_mixture": 1,
        "oracle:pipeline_embedding_quantize": 2,
    }


def test_every_contract_rationale_is_substantive():
    for site, why in FLOAT_BOUNDARY_BY_CONTRACT.items():
        assert len(why) > 60, f"{site}: rationale too thin to adjudicate"


def test_detector_would_have_caught_the_r12_bug():
    # Regression-proof the detector itself: a synthetic module with the
    # PRE-FIX shape (floor of a float-sum-derived product, no round) must
    # produce an unadjudicated-member flag.
    import tempfile
    import textwrap

    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "repro.py"), "w") as f:
            f.write(
                textwrap.dedent(
                    """
                    from pyspark.sql import functions as F

                    def pre_fix_mixture(counts, alpha, budget):
                        tot = counts.agg(
                            F.sum(F.pow(F.col("n").cast("double"), alpha)).alias("z")
                        )
                        return counts.crossJoin(tot).withColumn(
                            "n_target",
                            F.floor(F.col("corpus_n") * budget * F.col("w")),
                        )
                    """
                )
            )
        sites, flags = float_boundary_audit(pkg_root=d)
        assert sites == {"repro.py:pre_fix_mixture": 1}
        assert any("pre_fix_mixture" in fl for fl in flags)


def test_detector_catches_bare_double_column_sum():
    # Round-13 ADVICE false-negative: a float sum with NO float marker in
    # the expression — sum over a base-schema DOUBLE column — must now
    # taint, so a floor fed by it is flagged.
    import tempfile
    import textwrap

    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "repro.py"), "w") as f:
            f.write(
                textwrap.dedent(
                    """
                    from pyspark.sql import functions as F

                    def revenue_floor(orders):
                        tot = orders.groupBy("o_custkey").agg(
                            F.sum(F.col("o_totalprice")).alias("rev")
                        )
                        return tot.withColumn("tier", F.floor(F.col("rev")))
                    """
                )
            )
        sites, flags = float_boundary_audit(pkg_root=d)
        assert sites == {"repro.py:revenue_floor": 1}
        assert any("revenue_floor" in fl for fl in flags)


def test_nested_defs_scan_under_their_own_scope():
    # Round-13 ADVICE: a nested helper must not be scanned twice (own name
    # + enclosing body) and its taint must not leak into the outer scope.
    import tempfile
    import textwrap

    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "repro.py"), "w") as f:
            f.write(
                textwrap.dedent(
                    """
                    from pyspark.sql import functions as F

                    def outer(df):
                        def inner(g):
                            z = g.agg(F.avg("x").alias("m"))
                            return z.withColumn("b", F.floor(F.col("m")))
                        # outer has a floor but NO float aggregate of its
                        # own — inner's avg must not taint it
                        return df.withColumn("k", F.floor(F.col("n")))
                    """
                )
            )
        sites, _flags = float_boundary_audit(pkg_root=d)
        assert sites == {"repro.py:outer.inner": 1}
