"""Local replica of the driver's t2 correctness gate.

Runs each ``queries()[name]`` on Spark and the matching
``oracle_sql()[name]`` on DuckDB over the same sf dir, then compares
row-count, column-name set, and order-insensitive values (exact
equality — stricter than any value-hash the driver could use).

Usage:
    python tools/check.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    """Canonicalize a cell value for cross-engine comparison.

    TYPE-STRICT: numerics are tagged with their Python type class so a
    bigint/double divergence between engines (``4`` vs ``4.0``) or a
    decimal-vs-float one (``Decimal('4.00')`` vs ``4.0``) FAILS here the
    same way it fails an external comparator that hashes *rendered*
    values.  The round-3 ``math_funcs`` driver failure (DuckDB
    ceil/floor → DOUBLE, sign → TINYINT vs Spark BIGINT/DOUBLE) passed
    the old numeric-equality norm() — this closes that gap.  Integer
    *widths* are not distinguished (INT vs BIGINT both render "4"), but
    bool/int/float/Decimal classes are.
    """
    if v is None:
        return None
    if isinstance(v, bool):  # before int: bool is an int subclass
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        return ("float", repr(v))  # repr: distinguishes -0.0, keeps full precision
    if isinstance(v, Decimal):
        return ("dec", str(v))  # str keeps scale: '4.00' != '4.0' when rendered
    if isinstance(v, datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, date):
        return ("date", v.isoformat())
    if isinstance(v, (bytes, bytearray)):
        return ("bin", bytes(v))
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v


def canon_spark(dt) -> object:
    """Spark DataType → canonical type class for cross-engine compare."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.DecimalType):
        return "dec"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    if isinstance(dt, T.BinaryType):
        return "bin"
    if isinstance(dt, T.ArrayType):
        return ("array", canon_spark(dt.elementType))
    if isinstance(dt, T.MapType):
        return ("map", canon_spark(dt.keyType), canon_spark(dt.valueType))
    if isinstance(dt, T.StructType):
        return ("struct",) + tuple(
            (f.name, canon_spark(f.dataType)) for f in dt.fields
        )
    return ("other", str(dt))


def canon_duck(t) -> object:
    """DuckDB type → canonical class.  HUGEINT/UHUGEINT/UBIGINT map to a
    deliberate "int128" class Spark can never emit, so a DuckDB integer
    overflow-widening (``sum(BIGINT)`` → HUGEINT) FAILS the type gate
    even though the rendered values match — exactly how the external
    driver's type/render-sensitive hash behaves.  This is the round-3/4
    ADVICE item: compare declared engine types, not just Python values.
    """
    tid = str(t.id).upper() if hasattr(t, "id") else str(t).upper()
    s = str(t).upper()
    if tid in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
               "UTINYINT", "USMALLINT", "UINTEGER"):
        return "int"
    if tid in ("HUGEINT", "UHUGEINT", "UBIGINT"):
        return "int128"
    if tid in ("FLOAT", "DOUBLE"):
        return "float"
    if tid == "BOOLEAN":
        return "bool"
    if tid == "VARCHAR":
        return "str"
    if tid.startswith("DECIMAL") or s.startswith("DECIMAL"):
        return "dec"
    if tid == "DATE":
        return "date"
    if tid.startswith("TIMESTAMP"):
        return "ts"
    if tid == "BLOB":
        return "bin"
    if tid in ("LIST", "ARRAY"):
        try:
            return ("array", canon_duck(t.child))
        except Exception:  # noqa: BLE001
            return ("array", "?")
    if tid == "MAP":
        try:
            return ("map", canon_duck(t.key), canon_duck(t.value))
        except Exception:  # noqa: BLE001
            return ("map", "?", "?")
    if tid == "STRUCT":
        try:
            return ("struct",) + tuple(
                (n, canon_duck(ct)) for n, ct in t.children
            )
        except Exception:  # noqa: BLE001
            return ("struct", "?")
    if tid == "NULL" or s == '"NULL"':
        return "null"  # typeless NULL literal: matches anything
    return ("other", s)


def type_problems(scols, sschema, ocols, otypes) -> list[str]:
    """Compare engine-declared column types by name; return divergences."""
    smap = {f.name: canon_spark(f.dataType) for f in sschema.fields}
    omap = {c: canon_duck(t) for c, t in zip(ocols, otypes)}
    bad = []
    for c in sorted(set(smap) & set(omap)):
        sc, oc = smap[c], omap[c]
        if oc == "null" or sc == oc:
            continue
        bad.append(f"{c}: spark={sc} oracle={oc}")
    return bad


def to_multiset(columns, rows):
    """Rows → Counter of normalized tuples with columns ordered by name.

    Counter equality IS exact multiset equality — semantically identical
    to the sorted-list compare this replaces, without the O(n log n)
    sort keyed on repr() of every row (measured: unpivot_melt's 2.4 M
    rows spent ~100 s in the harness compare at sf0.1, dwarfing the
    9.7 s Spark + 4.0 s oracle the entry attributes to the engines)."""
    from collections import Counter

    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return Counter(tuple(norm(r[i]) for i in order) for r in rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument(
        "--plain",
        action="store_true",
        help="use a bare SparkSession (no engine confs) to replicate the "
        "external driver's environment — every query must self-apply its "
        "runtime confs through the scan layer",
    )
    ap.add_argument(
        "--first",
        type=int,
        default=0,
        metavar="N",
        help="check only the first N queries in REGISTRATION order (the "
        "window an external sweep samples), instead of all sorted names",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as E
    from covid_19_data_analysis_bigdata_spark.session import get_spark
    from covid_19_data_analysis_bigdata_spark.sources.io import _source_fingerprint

    # Stamp the data fingerprint so a committed artifact is self-dating:
    # regenerated testdata changes the fingerprint and exposes stale green.
    print(f"# sf_dir={args.sf} source_fingerprint={_source_fingerprint(args.sf)}"
          + (" session=plain" if args.plain else ""))

    qs, orc = E.queries(), E.oracle_sql()
    if args.first and args.names:
        print("--first and explicit names are mutually exclusive")
        return 2
    if args.first:
        names = list(qs)[: args.first]
    else:
        names = args.names or sorted(qs)
    missing = [n for n in names if n not in qs]
    if missing:
        print(f"unknown queries: {missing}")
        return 2

    if args.plain:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").appName(
            "check-plain"
        ).getOrCreate()
    else:
        spark = get_spark()
    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = n_weak = 0
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, args.sf)
            scols = df.columns
            srows = df.collect()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if name not in orc:
            print(f"WEAK {name}: rows={len(srows)} cols={sorted(scols)} ({time.time()-t0:.1f}s)")
            n_weak += 1
            continue
        t1 = time.time()
        try:
            rel = con.sql(orc[name])
            ocols = rel.columns
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        t_oracle = time.time() - t1

        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        tbad = type_problems(scols, df.schema, ocols, rel.types)
        if tbad:
            problems.append("types " + "; ".join(tbad))
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            sm, om = to_multiset(scols, [tuple(r) for r in srows]), to_multiset(ocols, orows)
            if sm != om:
                only_s = sm - om
                only_o = om - sm
                n_diff = max(sum(only_s.values()), sum(only_o.values()))
                first_s = next(iter(only_s), None)
                first_o = next(iter(only_o), None)
                problems.append(
                    f"values differ in {n_diff} rows; "
                    f"spark-only={first_s} oracle-only={first_o}"
                )
        if problems:
            print(f"FAIL {name}: " + " | ".join(problems))
            n_fail += 1
        else:
            # Per-engine attribution (r11 verdict task 2): a >5 s sweep
            # entry must say whether the cost is the Spark query or
            # DuckDB's (often brute-force) oracle.
            print(
                f"PASS {name}: rows={len(srows)} ({time.time()-t0:.1f}s; "
                f"spark={t_spark:.1f}s oracle={t_oracle:.1f}s)"
            )
            n_pass += 1

    print(f"\n{n_pass} pass, {n_weak} weak, {n_fail} fail / {len(names)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
