"""Same-session ALTERNATING conf A/B for declared queries.

Optimization-guide §1 + the ambient-drift rule (OPTIMIZATION_r14.md):
on this box only alternating same-session samples are attributable, so
for each query this interleaves state A and state B noop-sink runs
(A,B,A,B,...) after one warm run per state, and prints per-state
medians.  The conf is applied by mutating ``session.RUNTIME_CONFS``
(``ensure_confs`` re-applies that dict on every query call, so a bare
``spark.conf.set`` would be overwritten).

Usage:
    python tools/ab_conf.py --conf spark.sql.adaptive.coalescePartitions.parallelismFirst \
        --a true --b false [--samples 5] [--json out.json] name ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--conf", required=True)
    ap.add_argument("--a", required=True, help="state-A conf value")
    ap.add_argument("--b", required=True, help="state-B conf value")
    ap.add_argument("--samples", type=int, default=5,
                    help="timed samples PER STATE (interleaved)")
    ap.add_argument("--sink", choices=("noop", "topandas"), default="noop",
                    help="noop = computation only (guide §1.4); topandas = "
                    "the bench's Arrow-transport path (what PERF_r* times)")
    ap.add_argument("--json", default=None, help="write results JSON here")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from covid_19_data_analysis_bigdata_spark import session as sess_mod
    from covid_19_data_analysis_bigdata_spark.session import get_spark
    from covid_19_data_analysis_bigdata_spark.cache import clear_cache
    import __spark_entry__ as entry

    spark = get_spark("ab_conf")
    qs = entry.queries()
    conf_default = sess_mod.RUNTIME_CONFS.get(args.conf)

    def run_once(name: str, value: str) -> float:
        sess_mod.RUNTIME_CONFS[args.conf] = value
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, args.sf)
        if args.sink == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.toPandas()
        return round(time.time() - t0, 3)

    results: dict[str, dict] = {}
    for name in args.names:
        clear_cache()
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"ab_conf:{name}")
        try:
            # one warm run per state (codegen, scan caches)
            run_once(name, args.a)
            run_once(name, args.b)
            a_s: list[float] = []
            b_s: list[float] = []
            for _ in range(args.samples):
                a_s.append(run_once(name, args.a))
                b_s.append(run_once(name, args.b))
            med_a = sorted(a_s)[len(a_s) // 2]
            med_b = sorted(b_s)[len(b_s) // 2]
            results[name] = {
                "conf": args.conf, "a": args.a, "b": args.b,
                "median_a": med_a, "median_b": med_b,
                "ratio_b_over_a": round(med_b / med_a, 3) if med_a else None,
                "samples_a": a_s, "samples_b": b_s,
            }
            print(f"{name}\tA({args.a})={med_a:.3f}\tB({args.b})={med_b:.3f}"
                  f"\tB/A={med_b / med_a:.3f}\t{a_s} vs {b_s}")
        finally:
            spark.sparkContext.setJobDescription(None)
            # restore the session default for whatever runs next
            if conf_default is None:
                sess_mod.RUNTIME_CONFS.pop(args.conf, None)
            else:
                sess_mod.RUNTIME_CONFS[args.conf] = conf_default

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
