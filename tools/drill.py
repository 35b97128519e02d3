"""Per-query optimization drill: noop-sink timing + formatted-plan dump.

Optimization-guide §1 instrumentation (r14): time the COMPUTATION of a
query in isolation — ``df.write.format("noop")`` eagerly computes every
column of every row and discards the result, so the measurement excludes
the bench's Arrow/toPandas transport and any sink — and dump
``explain("formatted")`` so plan-shape claims (Exchange count, join
strategy, PushedFilters, Python-eval nodes) are checkable artifacts.

Usage:
    python tools/drill.py [--sf DIR] [--plan-dir plans/r14] \
        [--suffix before] [--samples 3] name ...

Prints one line per query: ``name  median  [samples...]`` and, with
--plan-dir, writes ``<plan-dir>/<name>_<suffix>.txt``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def formatted_plan(df) -> str:
    """``explain("formatted")`` output as a string.

    Tries the JVM helper (exact same string ``df.explain`` prints);
    falls back to capturing ``df.explain`` stdout if the private
    PySpark internals move (they are not API — ADVICE r14).
    """
    try:
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    except Exception:
        import contextlib
        import io as _io

        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument(
        "--plan-only",
        action="store_true",
        help="dump plans without executing (no warm run, no timing)",
    )
    ap.add_argument(
        "--json",
        default=None,
        help="append {name, median, samples} records to this JSON file "
        "(committed per round so drill-median claims are auditable — "
        "VERDICT r14 item 7)",
    )
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from covid_19_data_analysis_bigdata_spark.session import get_spark
    from covid_19_data_analysis_bigdata_spark.cache import clear_cache
    import __spark_entry__ as entry

    spark = get_spark("drill")
    qs = entry.queries()

    for name in args.names:
        fn = qs[name]
        clear_cache()
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"drill:{name}")
        try:
            df = fn(spark, args.sf)
            if args.plan_dir:
                os.makedirs(args.plan_dir, exist_ok=True)
                plan = formatted_plan(df)
                out = os.path.join(
                    args.plan_dir, f"{name}_{args.suffix}.txt"
                )
                with open(out, "w") as f:
                    f.write(plan)
            if args.plan_only:
                print(f"{name}\tplan-only")
                continue
            # warm once (scan caches, codegen), then timed noop runs
            df.write.format("noop").mode("overwrite").save()
            samples = []
            for _ in range(args.samples):
                t0 = time.time()
                fn(spark, args.sf).write.format(
                    "noop"
                ).mode("overwrite").save()
                samples.append(round(time.time() - t0, 3))
            med = sorted(samples)[len(samples) // 2]
            print(f"{name}\t{med:.3f}\t{samples}")
            if args.json:
                log = {}
                if os.path.exists(args.json):
                    with open(args.json) as f:
                        log = json.load(f)
                log.setdefault(name, []).append(
                    {"suffix": args.suffix, "median": med,
                     "samples": samples, "sf": args.sf}
                )
                with open(args.json, "w") as f:
                    json.dump(log, f, indent=2)
        finally:
            spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
