"""Physical-plan audit: dump explain(formatted) for the headline queries and
check the plan properties that matter at 100 TB:

- parquet scans carry PushedFilters / pruned ReadSchema;
- small-side joins are BroadcastHashJoin (no shuffle of the big side);
- expressions stay inside WholeStageCodegen spans;
- no CartesianProduct except where the operator is quadratic by definition.

Beyond the plan text, two SOURCE-level anti-pattern scans over each bench
query's implementation (the plan can't show these):

- complete-mode memory sinks (the whole aggregate lands in the driver every
  micro-batch — never acceptable in a headline/scale-path query);
- row-at-a-time Python loops (``iterrows``/``itertuples``/``collect()``
  iteration) inside the query body — Arrow-batched or JVM-side only.

Plus a package-wide PERSIST AUDIT (round-11 VERDICT task 4): every
``.persist()``/``.cache()`` call site whose enclosing function contains no
matching ``.unpersist()`` is "caller-managed" — the function returns a lazy
plan that reads the cache, so an in-function release would fire before any
job runs (measured: queries/graph.py round-11).  Each such site must carry a
written rationale in UNRELEASED_PERSIST_BY_CONTRACT below; the count is
pinned in PLANSCAN so growth is visible, and an unlisted site (or a stale
allowlist entry) is a FLAG.

Usage: python tools/plan_audit.py [--sf DIR] [name ...]   (writes PLANS.md)
Exits non-zero if any FLAG fires on a bench query.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MARKERS = [
    ("PushedFilters: \\[[^]]*(IsNotNull|GreaterThan|LessThan|EqualTo)", "filter pushdown to parquet"),
    ("BroadcastHashJoin|BroadcastNestedLoopJoin", "broadcast join (no big-side shuffle)"),
    ("codegen id", "whole-stage codegen span"),
    ("CartesianProduct", "cartesian product (check intent!)"),
    ("hashpartitioning\\(", "hash shuffle"),
    ("rangepartitioning\\(", "range shuffle"),
    ("SortMergeJoin", "sort-merge join"),
    ("ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", "Arrow-batched Python"),
    ("HashAggregate", "hash aggregate (map-side partials)"),
]


def source_flags(fn) -> list[str]:
    """Scan the query fn's own source (and same-module helpers it calls,
    one level deep) for scale anti-patterns the physical plan can't show."""
    import inspect

    flags: list[str] = []
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        return flags
    mod = inspect.getmodule(fn)
    # pull in same-module helpers referenced by the query body
    for name in re.findall(r"\b(\w+)\s*\(", src):
        helper = getattr(mod, name, None) if mod else None
        if callable(helper) and getattr(helper, "__module__", None) == getattr(
            fn, "__module__", ""
        ):
            try:
                src += "\n" + inspect.getsource(helper)
            except (OSError, TypeError):
                pass
    if re.search(r"output_mode\s*=\s*[\"']complete[\"']|outputMode\(\s*[\"']complete", src):
        flags.append("FLAG: complete-mode sink (driver accumulates full aggregate)")
    if re.search(r"\.iterrows\(\)|\.itertuples\(\)", src):
        flags.append("FLAG: row-at-a-time pandas loop (use vectorized ops)")
    if re.search(r"for\s+\w+\s+in\s+\w*\.?collect\(\)", src):
        flags.append("FLAG: driver-side loop over collect() (not distributed)")
    return flags


_TREE_LINE = re.compile(r"^[\s:+\-]*(?:\*\s*)?(\w[\w ]*?)\s+\((\d+)\)\s*$")
# block-local: an Exchange detail block is exactly header + Input + Arguments;
# a DOTALL .*? here would skip past this block's own Arguments line and bind
# the id to a LATER exchange's SinglePartition (measured false positive)
_SP_EXCHANGE = re.compile(
    r"^\((\d+)\) Exchange\s*\nInput[^\n]*\nArguments: SinglePartition", re.M
)
# ancestors that legitimately reduce data before/at a single-partition
# exchange: global aggregates see one row per map task; limits are bounded
# by their literal
_BENIGN_ANCESTORS = (
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "GlobalLimit",
    "CollectLimit",
    "TakeOrderedAndProject",
)
# operators that pass unbounded data through unchanged — keep walking up
_PASSTHROUGH_ANCESTORS = ("Sort", "Project", "Filter", "ColumnarToRow")


def single_partition_window_count(plan: str) -> int:
    """Count Exchange SinglePartition nodes that feed a WINDOW (directly or
    through sort/project passthroughs) — the plan shape where EVERY row of
    an unbounded relation funnels through ONE task (a no-partition
    ``Window.orderBy``).  Global-aggregate and limit single-partition
    exchanges are benign (their input is already reduced map-side) and are
    not counted; an UNKNOWN ancestor counts, conservatively, so new plan
    shapes surface as flags instead of slipping past the audit."""
    sp_ids = {m.group(1) for m in _SP_EXCHANGE.finditer(plan)}
    if not sp_ids:
        return 0
    # (depth, name, id) for every operator line of every plan/subquery tree
    tree: list[tuple[int, str, str]] = []
    for line in plan.splitlines():
        m = _TREE_LINE.match(line)
        if m:
            tree.append((line.index(m.group(1)), m.group(1).strip(), m.group(2)))
    n = 0
    for i, (depth, name, nid) in enumerate(tree):
        if nid not in sp_ids or name != "Exchange":
            continue
        cur = depth
        for j in range(i - 1, -1, -1):
            d, nm, _ = tree[j]
            if d >= cur:
                continue
            cur = d
            if nm.startswith("Window"):  # Window / WindowGroupLimit
                n += 1
                break
            if nm in _BENIGN_ANCESTORS:
                break
            if nm in _PASSTHROUGH_ANCESTORS:
                continue
            n += 1  # unknown consumer of a single-partition exchange
            break
    return n


# Queries whose physical plan may legitimately contain a single-partition
# window exchange because the windowed relation is BOUNDED BY CONTRACT —
# a constant or slowly-growing domain, not data volume.  Adjudicated one
# by one in round 11 (the last unaudited plan-shape class); any query with
# winSP > 0 not in this dict is a FLAG and the scan exits non-zero.
SINGLEPART_BY_CONTRACT: dict[str, str] = {
    "dedup_threshold_sweep": (
        "cumulative window over the Jaccard-decile band histogram — the "
        "windowed relation is <= 11 rows (bands 0..10) at ANY data size"
    ),
    "events_session_depth_histogram": (
        "cumulative-share window over the per-depth session histogram — "
        "bounded by the maximum observed session depth (~1e3 for a "
        "10-minute gap rule), not by event volume"
    ),
    "olap_order_backlog": (
        "running balance over per-DAY open/close deltas — the windowed "
        "relation is one row per calendar day (~1e4 rows over three "
        "decades), aggregated before the window"
    ),
    "pipeline_mixture_budget": (
        "greedy prefix-sum over one row per corpus SOURCE (a handful; "
        "grows with catalog curation, not data volume)"
    ),
}


# Queries whose physical plan may legitimately contain a CartesianProduct,
# name -> justification.  MEASURED EMPTY: the full-registry scan found zero
# CartesianProduct nodes — even the quadratic-by-contract baselines
# (ts_user_similarity_topk's all-pairs form, the bounded ANN/Kendall audit
# samples) express their pair spaces as equi-joins or 1-row/bounded
# broadcast NLJs.  Any cartesian appearing in any query is therefore a
# scale bug until a justification is added here — the scan exits non-zero.
CARTESIAN_BY_CONTRACT: dict[str, str] = {}


# Caller-managed persist sites: functions that .persist()/.cache() a frame
# and intentionally do NOT release it, because the function returns a LAZY
# plan that reads the cache — an in-function unpersist (even try/finally)
# fires before any job runs, so the cache would never exist during execution
# (measured at queries/graph.py in round 11; the r10 audit mislabeled that
# site as a working release).  Reclamation is Spark's LRU storage eviction
# plus the harness's clearCache between bench reps.  Keyed
# "pkg-relative-path:function"; every unreleased site found by the AST scan
# must appear here with a rationale, and every entry here must still exist
# in the source — either mismatch is a FLAG and the scan exits non-zero, so
# the set cannot grow or rot silently (round-11 VERDICT task 4).
UNRELEASED_PERSIST_BY_CONTRACT: dict[str, str] = {
    "operators/row_compare.py:mismatch_blocks": (
        "the bounds collect plus BOTH global-rank passes of the returned "
        "lazy plan read `diff`; cache must outlive the function"
    ),
    "pipeline/clustering.py:kmeans_fit": (
        "every k-means round re-reads the feature frame; the returned "
        "assignment plan still reads through the cache"
    ),
    "pipeline/components.py:connected_components": (
        "adjacency + seed labels are re-read by every label-propagation "
        "round; the returned converged plan reads their lineage"
    ),
    "pipeline/components.py:connected_components_star": (
        "the vertex base is read by every convergence round and the final "
        "left join; per-round edge caches ARE released in-loop (the +1 is "
        "the seed), only the vertex cache is caller-managed"
    ),
    "pipeline/corpus_io.py:split_corrupt": (
        "both returned (clean, corrupt) views re-read the materialized "
        "parse — the documented _corrupt_record pattern requires it"
    ),
    "pipeline/similarity.py:cosine_threshold_pairs_lsh": (
        "the LSH self-join consumes the band-signature frame twice; "
        "without the cache the Arrow signature pass runs once per side"
    ),
    "pipeline/similarity.py:ivf_topk": (
        "the centroid-assignment frame feeds BOTH the inverted lists and "
        "the probe side of the returned top-k plan"
    ),
    "queries/cdc.py:_merged_with_rank": (
        "the frontier collect plus the returned lazy rank plan both read "
        "`merged`"
    ),
    "queries/graph.py:q_pagerank_bipartite": (
        "every pagerank iteration plus the degree pass reads `edges`; "
        "without the live cache the join+distinct edge derivation "
        "recomputes per iteration (the flaky 8 g heap death at sf10)"
    ),
    "queries/pipeline3.py:incremental_dedup_status": (
        "both the incoming and corpus sides of the returned status union "
        "read the fingerprint/shingle base"
    ),
    "queries/pipeline4.py:q_corpus_build_funnel": (
        "the five funnel stage counts share the dominant quality scan; "
        "the returned one-job union is lazy by registry contract"
    ),
}


def persist_audit(pkg_root: str | None = None) -> tuple[dict[str, int], list[str]]:
    """Package-wide AST scan: net .persist()/.cache() minus .unpersist()
    calls per enclosing function.  A positive net is an unreleased
    (caller-managed) persist site and must be adjudicated in
    UNRELEASED_PERSIST_BY_CONTRACT; a contract entry whose site no longer
    nets positive is stale.  Either mismatch returns a FLAG.  The net-count
    heuristic assumes an unpersist in a function releases a frame persisted
    in that same function (true of every site in this repo; a future
    cross-function release would need a key-level rethink, not a silent
    pass)."""
    import ast

    if pkg_root is None:
        pkg_root = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "sqlserver_cdc_to_kafka_spark",
        )
    sites: dict[str, int] = {}
    for root, _dirs, files in os.walk(pkg_root):
        for fname in sorted(files):
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            rel = os.path.relpath(path, pkg_root).replace(os.sep, "/")
            with open(path) as f:
                tree = ast.parse(f.read())

            class _V(ast.NodeVisitor):
                def __init__(self) -> None:
                    self.stack = ["<module>"]
                    self.net: dict[str, int] = {}

                def visit_FunctionDef(self, node):  # noqa: N802
                    self.stack.append(node.name)
                    self.generic_visit(node)
                    self.stack.pop()

                visit_AsyncFunctionDef = visit_FunctionDef  # noqa: N815

                def visit_Call(self, node):  # noqa: N802
                    f = node.func
                    if isinstance(f, ast.Attribute) and f.attr in (
                        "persist",
                        "cache",
                        "unpersist",
                    ):
                        d = -1 if f.attr == "unpersist" else 1
                        k = self.stack[-1]
                        self.net[k] = self.net.get(k, 0) + d
                    self.generic_visit(node)

            v = _V()
            v.visit(tree)
            for fn_name, net in v.net.items():
                if net > 0:
                    sites[f"{rel}:{fn_name}"] = net
    flags: list[str] = []
    for site in sorted(sites):
        if site not in UNRELEASED_PERSIST_BY_CONTRACT:
            flags.append(
                f"FLAG: unreleased persist without rationale: {site} (×{sites[site]})"
            )
    for site in sorted(UNRELEASED_PERSIST_BY_CONTRACT):
        if site not in sites:
            flags.append(
                f"FLAG: stale UNRELEASED_PERSIST_BY_CONTRACT entry (site gone): {site}"
            )
    return sites, flags


def scan_all(spark, registry, names, args) -> int:
    """Registry-wide anti-pattern scan: one table row per query (no full
    plan dumps — 264 plans would be unreadable).  Flags a CartesianProduct
    in any query not in CARTESIAN_BY_CONTRACT, plus the source-level scans;
    records join/shuffle/Python counts for every query so reviewers can see
    at a glance where the shuffles are."""
    lines = [
        "# PLANSCAN — registry-wide physical-plan anti-pattern scan",
        "",
        f"Generated by `tools/plan_audit.py --scan-all` at sf dir `{args.sf}`.",
        "Every registered query's initial physical plan, summarized:",
        "cartesians (legal only for the documented quadratic-by-contract",
        "baselines below), broadcast / sort-merge joins, hash shuffles,",
        "Arrow-batched Python stages, plus the source-level scans",
        "(complete-mode sinks, row-at-a-time loops).",
        "",
        "| query | cart | bcast | smj | shuffle | winSP | pyArrow | flags |",
        "|---|---|---|---|---|---|---|---|",
    ]
    n_flags = 0
    cart_seen: dict[str, int] = {}
    winsp_seen: dict[str, int] = {}
    for name in names:
        q = registry[name]
        try:
            df = q.fn(spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001 — scan must report, not die
            lines.append(f"| {name} | - | - | - | - | - | - | ERROR: {exc} |")
            n_flags += 1
            print(f"{name}: ERROR {exc}")
            continue
        cart = len(re.findall(r"CartesianProduct", plan))
        bcast = len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan))
        smj = len(re.findall(r"SortMergeJoin", plan))
        shuf = len(re.findall(r"hashpartitioning\(|rangepartitioning\(", plan))
        pya = len(
            re.findall(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|FlatMapCoGroupsInPandas", plan)
        )
        winsp = single_partition_window_count(plan)
        flags = source_flags(q.fn)
        if cart:
            cart_seen[name] = cart
            if name not in CARTESIAN_BY_CONTRACT:
                flags.append("FLAG: undocumented CartesianProduct")
        if winsp:
            winsp_seen[name] = winsp
            if name not in SINGLEPART_BY_CONTRACT:
                flags.append("FLAG: undocumented single-partition window")
        n_flags += len(flags)
        lines.append(
            f"| {name} | {cart} | {bcast} | {smj} | {shuf} | {winsp} | {pya} | "
            f"{'; '.join(flags) if flags else ''} |"
        )
    lines += ["", "## Single-partition windows by contract", ""]
    if SINGLEPART_BY_CONTRACT:
        for name, why in sorted(SINGLEPART_BY_CONTRACT.items()):
            hit = (
                f"×{winsp_seen[name]}" if name in winsp_seen else "not present in plan"
            )
            lines.append(f"- `{name}` ({hit}): {why}")
    else:
        lines.append("(none)")
    psites, pflags = persist_audit()
    n_flags += len(pflags)
    lines += [
        "",
        "## Caller-managed persists (unreleased by design)",
        "",
        f"Package-wide AST audit (`tools/plan_audit.py persist_audit`): "
        f"**{sum(psites.values())} unreleased persist/cache calls across "
        f"{len(psites)} functions** — pinned; growth without a written "
        "rationale in UNRELEASED_PERSIST_BY_CONTRACT is a FLAG. These are "
        "the lazy-return sites where an in-function release would fire "
        "before any job runs; reclamation is LRU eviction + the harness's "
        "clearCache between bench reps.",
        "",
    ]
    for site in sorted(psites):
        why = UNRELEASED_PERSIST_BY_CONTRACT.get(site, "**UNADJUDICATED**")
        lines.append(f"- `{site}` (×{psites[site]}): {why}")
    for fl in pflags:
        lines.append(f"- **{fl}**")
        print(fl)
    lines += ["", "## Cartesians by contract", ""]
    if CARTESIAN_BY_CONTRACT:
        for name, why in sorted(CARTESIAN_BY_CONTRACT.items()):
            hit = f"×{cart_seen[name]}" if name in cart_seen else "not present in plan"
            lines.append(f"- `{name}` ({hit}): {why}")
    else:
        lines.append(
            "(none — the registry-wide scan measures ZERO CartesianProduct "
            "nodes; even the documented quadratic-by-contract baselines use "
            "equi-joins / bounded broadcast NLJs for their pair spaces)"
        )
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(
        f"wrote {args.out} — {len(names)} queries, "
        + (f"{n_flags} FLAGS" if n_flags else "no flags")
    )
    return 1 if n_flags else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="PLANS.md")
    ap.add_argument(
        "--scan-all",
        action="store_true",
        help="scan EVERY registered query (not just bench) for scale "
        "anti-patterns; writes a compact per-query table instead of full "
        "plans — the registry-wide audit artifact (PLANSCAN.md)",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from sqlserver_cdc_to_kafka_spark.registry import load_all
    from sqlserver_cdc_to_kafka_spark.session import get_spark

    registry = load_all()
    if args.scan_all:
        names = args.names or sorted(registry)
        if args.out == "PLANS.md":
            args.out = "PLANSCAN.md"
    else:
        names = args.names or sorted(n for n, q in registry.items() if q.bench)
    spark = get_spark("plan-audit")

    if args.scan_all:
        return scan_all(spark, registry, names, args)

    lines = [
        "# PLANS — physical-plan audit of the headline queries",
        "",
        f"Generated by `tools/plan_audit.py` at sf dir `{args.sf}`. For each",
        "bench query: the plan-property summary (pushdown, broadcast, codegen,",
        "shuffles) and the formatted physical plan. Regenerate after any",
        "operator change.",
        "",
    ]
    n_flags = 0
    for name in names:
        q = registry[name]
        df = q.fn(spark, args.sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        found = []
        for pat, label in MARKERS:
            n = len(re.findall(pat, plan))
            if n:
                found.append(f"{label} ×{n}")
        flags = source_flags(q.fn)
        n_flags += len(flags)
        lines += [
            f"## {name}",
            "",
            "Properties: " + ("; ".join(found) if found else "(none matched)"),
        ]
        if flags:
            lines += [""] + [f"**{f}**" for f in flags]
        lines += [
            "",
            "```",
            plan.strip(),
            "```",
            "",
        ]
        print(f"{name}: {'; '.join(found + flags)}")
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {args.out}" + (f" — {n_flags} FLAGS" if n_flags else ", no flags"))
    return 1 if n_flags else 0


if __name__ == "__main__":
    raise SystemExit(main())
