"""Empirical scaling check: replicate the sf0.1 corpus N× with remapped
keys into scratch, then time a chosen query set at 1× and N×.

This is the local-mode stand-in for a cluster scale test (SCALE.md
"Measured scaling"): a plan whose cost is dominated by scan +
partial-aggregation should absorb N× data inside the fixed 32-thread
parallelism headroom (ratio ≪ N), while genuinely sort-/volume-bound
plans track data size.  Replication remaps the *entity* keys (orders,
events, users, documents, vectors) so per-key structures really grow;
dimension tables (region/nation/customer/supplier/part) are shared, as
they would be at 100 TB.

Usage:
    python tools/scalebench.py [--copies 4] [--queries a,b,c]
Prints one JSON line: {"copies": N, "queries": {name: {"x1": s, "xN": s}}}
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEY_OFFSET = 10_000_000

#: (table, [key columns to offset per copy]) — dims are shared.
REPLICATED = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation", "customer", "supplier", "part"]

DEFAULT_QUERIES = [
    "llm_bm25_rank",
    "llm_winnowing",
    "llm_sparse_cosine",
    "llm_gopher_rules",
    "report_last_touch_attribution",
    "report_event_transitions",
    "agg_bitmap_distinct",
    "agg_decimal_exact",
    "ts_ohlc_bars",
    "report_dau_wau_stickiness",
    "dq_referential_orphans",
    "llm_tokenizer_coverage",
]


def build_replica(spark, src: str, dst: str, copies: int) -> None:
    from pyspark.sql import functions as F

    from covid_19_data_analysis_bigdata_spark.sources.io import load_table

    os.makedirs(dst, exist_ok=True)
    for t in DIMS:
        shutil.copy(
            os.path.join(src, f"{t}.parquet"), os.path.join(dst, f"{t}.parquet")
        )
    for t, keys in REPLICATED.items():
        df = load_table(spark, src, t)
        parts = []
        for i in range(copies):
            c = df
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * KEY_OFFSET))
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        # one file per table keeps the fixture layout identical to the
        # generated testdata (scan parallelism comes from row groups)
        out.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(dst, f"_{t}")
        )
        part_file = [
            f
            for f in os.listdir(os.path.join(dst, f"_{t}"))
            if f.endswith(".parquet")
        ][0]
        shutil.move(
            os.path.join(dst, f"_{t}", part_file),
            os.path.join(dst, f"{t}.parquet"),
        )
        shutil.rmtree(os.path.join(dst, f"_{t}"))


def time_query(fn, spark, sf_dir: str, n: int = 3) -> float:
    fn(spark, sf_dir).toPandas()  # warm
    samples = []
    for _ in range(n):
        t0 = time.time()
        fn(spark, sf_dir).toPandas()
        samples.append(time.time() - t0)
    return round(statistics.median(samples), 3)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=4)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/spark_graft_scalebench")
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    args = ap.parse_args()

    from covid_19_data_analysis_bigdata_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("scalebench")
    qs = entry_mod.queries()
    names = [n for n in args.queries.split(",") if n]

    marker = os.path.join(args.dst, f".built_{args.copies}x")
    if not os.path.exists(marker):
        build_replica(spark, args.src, args.dst, args.copies)
        open(marker, "w").write("ok")

    out = {}
    for name in names:
        fn = qs[name]
        out[name] = {
            "x1": time_query(fn, spark, args.src),
            f"x{args.copies}": time_query(fn, spark, args.dst),
        }
    print(json.dumps({"copies": args.copies, "queries": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
