"""Physical-plan audit: sweep every registered query and flag scale smells.

Flags (SURVEY.md §4.3 discipline):
- BatchEvalPython        — row-at-a-time Python UDF in the plan (only
                           ``udf_python_scalar`` is allowed to have one);
- CartesianProduct       — unpruned cross product (only ``join_cross``
                           is allowed; theta joins should be broadcast
                           nested-loop, similarity ops pre-pruned);
- exchanges > 6          — shuffle-heavy plan worth a second look;
- nested output type     — array/map/struct column in a registered
                           query's output schema (result-comparison
                           harnesses cannot canonicalize nested cells).

Usage: python tools/audit_plans.py [--sf DIR] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: Queries that exist to demonstrate the Python-eval surface itself.
ALLOWED_ROW_UDF = {"udf_python_scalar", "udtf_table_fn", "udtf_analyze_polymorphic"}
ALLOWED_CARTESIAN = {"join_cross"}
EXCHANGE_BUDGET = 6
#: Iterative algorithms pay per-iteration shuffles by nature (argmin +
#: centroid recompute per Lloyd step); they get a wider budget.
EXCHANGE_OVERRIDES = {
    "ml_kmeans_lloyd": 16,
    # llm_semdedup composes the kmeans assignment (centroid aggregate +
    # argmin window) with a cluster-partitioned pairwise join and a
    # rollup — 7 exchanges, each on a different key by necessity.
    "llm_semdedup": 8,
    # Static-explain counts for plans whose shared frames are persisted:
    # before materialization, formatted explain re-prints the cached
    # subtree under EVERY consumer, so its exchanges are counted once
    # per consumer.  At runtime each cached frame shuffles once.
    # graph_clustering_local: persisted oriented+adj feed 4 consumers
    # (tri via src, tri via dst, tcount union, deg join), so their
    # build-side exchanges print up to 4 times.
    "graph_clustering_local": 26,
    # graph_two_hop_reach: persisted edge list feeds 3 consumers
    # (SCALE.md round-7 plan-audit note).
    "graph_two_hop_reach": 20,
    # graph_hits_scores: HITS_ITERS=4 unrolled iterations consume the
    # persisted ≤600-row trade-edge frame twice per round (authority
    # join + hub join), so its build-side exchanges print 8×; every
    # per-round table is nation-grain (≤25 rows).  At runtime the
    # fact-table aggregation shuffles once.
    "graph_hits_scores": 22,
    # report_rfm_segmentation: 3 chained distrank.global_ntile passes
    # over the CUSTOMER-grain table (3 range + 3 count-agg + 3 hash
    # shuffles replacing three single-executor global sorts — the
    # documented round-7 de-globalization trade, SCALE.md).
    "report_rfm_segmentation": 9,
}


def audit(spark, names, sf_dir: str) -> dict[str, list[str]]:
    """Build each query's physical plan and return {name: [flags]}.

    Importable so the round-9 pytest guard
    (tests/test_plans.py::test_full_registry_plan_audit) can pin the
    advisory set without shelling out; a query that fails to PLAN gets
    an ``error:`` flag.
    """
    from covid_19_data_analysis_bigdata_spark import core

    out: dict[str, list[str]] = {}
    for name in names:
        try:
            df = core.QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            out[name] = [f"error: {exc}"]
            continue
        flags = []
        nested = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if nested:
            flags.append(f"nested-output={','.join(nested)}")
        if "BatchEvalPython" in plan and name not in ALLOWED_ROW_UDF:
            flags.append("row-UDF")
        if "CartesianProduct" in plan and name not in ALLOWED_CARTESIAN:
            flags.append("cartesian")
        n_ex = sum(
            1
            for line in plan.splitlines()
            if line.strip().startswith(("+- Exchange", ":- Exchange", "Exchange ("))
        )
        if n_ex > EXCHANGE_OVERRIDES.get(name, EXCHANGE_BUDGET):
            flags.append(f"exchanges={n_ex}")
        if flags:
            out[name] = flags
    return out


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
        args = [a for a in args if a != sf_dir]

    from covid_19_data_analysis_bigdata_spark import core
    from covid_19_data_analysis_bigdata_spark.session import get_spark

    core.load_all()
    spark = get_spark("plan-audit")
    names = args or sorted(core.QUERIES)

    flagged = audit(spark, names, sf_dir)
    for name, flags in flagged.items():
        if flags and flags[0].startswith("error:"):
            print(f"ERROR {name}: {flags[0][7:]}")
        else:
            print(f"FLAG {name}: {', '.join(flags)}")
    print(f"{len(names)} plans audited, {len(flagged)} flagged")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
