"""Same-session ALTERNATING A/B over a Python module attribute.

Companion to tools/ab_conf.py for knobs that are engine code rather
than Spark confs (e.g. ``sources.io.SPREAD_ENABLED``).  For each query
this interleaves state A and state B noop-sink runs (A,B,A,B,...) after
one warm run per state, and prints per-state medians — the only
attributable comparison on this box (OPTIMIZATION_r14.md ambient-drift
note).  Values are parsed with ``ast.literal_eval`` so booleans and
numbers round-trip.

Usage:
    python tools/ab_flag.py \
        --attr covid_19_data_analysis_bigdata_spark.sources.io.SPREAD_ENABLED \
        --a True --b False [--samples 5] [--json out.json] name ...
"""

from __future__ import annotations

import argparse
import ast
import importlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--attr", required=True,
                    help="dotted path module.ATTR to flip between states")
    ap.add_argument("--a", required=True, help="state-A value (python literal)")
    ap.add_argument("--b", required=True, help="state-B value (python literal)")
    ap.add_argument("--samples", type=int, default=5,
                    help="timed samples PER STATE (interleaved)")
    ap.add_argument("--json", default=None, help="write results JSON here")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    mod_path, attr = args.attr.rsplit(".", 1)
    mod = importlib.import_module(mod_path)
    default = getattr(mod, attr)
    val_a = ast.literal_eval(args.a)
    val_b = ast.literal_eval(args.b)

    from covid_19_data_analysis_bigdata_spark.session import get_spark
    from covid_19_data_analysis_bigdata_spark.cache import clear_cache
    import __spark_entry__ as entry

    spark = get_spark("ab_flag")
    qs = entry.queries()

    def run_once(name: str, value) -> float:
        setattr(mod, attr, value)
        fn = qs[name]
        t0 = time.time()
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    results: dict[str, dict] = {}
    for name in args.names:
        clear_cache()
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"ab_flag:{name}")
        try:
            run_once(name, val_a)  # warm per state (codegen, scan caches)
            run_once(name, val_b)
            a_s: list[float] = []
            b_s: list[float] = []
            for _ in range(args.samples):
                a_s.append(run_once(name, val_a))
                b_s.append(run_once(name, val_b))
            med_a = sorted(a_s)[len(a_s) // 2]
            med_b = sorted(b_s)[len(b_s) // 2]
            results[name] = {
                "attr": args.attr, "a": args.a, "b": args.b,
                "median_a": med_a, "median_b": med_b,
                "ratio_b_over_a": round(med_b / med_a, 3) if med_a else None,
                "samples_a": a_s, "samples_b": b_s,
            }
            print(f"{name}\tA({args.a})={med_a:.3f}\tB({args.b})={med_b:.3f}"
                  f"\tB/A={med_b / med_a:.3f}\t{a_s} vs {b_s}")
        finally:
            spark.sparkContext.setJobDescription(None)
            setattr(mod, attr, default)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
