"""The unordered-collect / nondeterministic-order class is pinned statically
(round-13 VERDICT task 1 — the sibling of the float-sum-boundary class).

The class: collect_list/collect_set (array order = combine order),
first/any_value/last/nth_value (which row wins), rand/
monotonically_increasing_id (partition placement) reaching query output
without an order-insensitivity discipline.  array_sort/sort_array/
map_from_entries wrapping is recognized structurally (Spark side) and an
internal ORDER BY is recognized textually (DuckDB oracle side); every other
member needs a written rationale in ORDER_DEPENDENCE_BY_CONTRACT — total
window order, group-constant argument, explode-back-to-set — with counts
pinned exactly so a NEW undisciplined construct in an already-listed
function fails here too.  r12 proved this bug family hides from green
sweeps for many rounds; this gate closes it without re-discovery.

Pure AST + registry import — no SparkSession needed.
"""

import os
import sys
import tempfile
import textwrap

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from plan_audit import ORDER_DEPENDENCE_BY_CONTRACT, order_dependence_audit  # noqa: E402


def test_members_exactly_match_contract_with_pinned_counts():
    sites, flags = order_dependence_audit()
    assert flags == [], "\n".join(flags)
    # exact counts, not just membership — every member's discipline is a
    # written rationale (total window order / group-constant firsts /
    # explode-to-set), adjudicated in ORDER_DEPENDENCE_BY_CONTRACT
    assert sites == {
        "operators/asof.py:asof_join": 1,
        "pipeline/dedup.py:cross_split_contamination": 1,
        "queries/behavior.py:q_gapfill_locf": 1,
        "queries/pipeline2.py:q_domain_mixture": 3,
        "queries/pipeline6.py:q_window_suite": 3,
        "oracle:events_gapfill_locf": 1,
        "oracle:olap_window_suite": 3,
    }


def test_every_contract_rationale_is_substantive():
    for site, why in ORDER_DEPENDENCE_BY_CONTRACT.items():
        assert len(why) > 60, f"{site}: rationale too thin to adjudicate"


def test_detector_catches_unordered_collect_and_rand():
    # Synthetic repro of the class: collect_list rendered to a string with
    # no array_sort (combine order reaches output) and a rand() filter
    # (partition placement reaches output) must flag; the array_sort- and
    # map_from_entries-disciplined twins must not.
    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "repro.py"), "w") as f:
            f.write(
                textwrap.dedent(
                    """
                    from pyspark.sql import functions as F

                    def leaky_topics(df):
                        return df.groupBy("k").agg(
                            F.concat_ws(",", F.collect_list("v")).alias("vs")
                        )

                    def leaky_sample(df):
                        return df.withColumn("r", F.rand(42)).filter(F.col("r") < 0.1)

                    def disciplined_topics(df):
                        return df.groupBy("k").agg(
                            F.concat_ws(",", F.array_sort(F.collect_list("v"))).alias("vs")
                        )

                    def disciplined_lookup(df):
                        return df.groupBy("k").agg(
                            F.map_from_entries(
                                F.collect_list(F.struct("b", "c"))
                            ).alias("m")
                        )
                    """
                )
            )
        sites, flags = order_dependence_audit(pkg_root=d)
        assert sites == {"repro.py:leaky_topics": 1, "repro.py:leaky_sample": 1}
        assert any("leaky_topics" in fl for fl in flags)
        assert any("leaky_sample" in fl for fl in flags)


def test_detector_catches_expr_string_form_and_scopes_nested_defs():
    # The same constructs inside expr()/selectExpr() SQL strings must be
    # caught textually, and a nested helper's hit must be keyed under its
    # own qualified name only (no double count, round-13 ADVICE).
    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "repro.py"), "w") as f:
            f.write(
                textwrap.dedent(
                    '''
                    def sql_form(df):
                        return df.selectExpr("first(v) as pick")

                    def outer(df):
                        def inner(g):
                            return g.selectExpr("collect_list(v) as vs")
                        return df

                    def sql_disciplined(df):
                        return df.selectExpr(
                            "array_sort(collect_list(v)) as vs"
                        )
                    '''
                )
            )
        sites, _flags = order_dependence_audit(pkg_root=d)
        assert sites == {"repro.py:sql_form": 1, "repro.py:outer.inner": 1}
