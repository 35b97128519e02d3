"""Scan every DuckDB oracle for columns whose declared type falls outside
the cross-engine-safe lattice (HUGEINT/INT128, UHUGEINT, etc.).

A DuckDB ``sum(BIGINT)`` silently widens to HUGEINT; the values render
identically to Spark's BIGINT so a value-compare passes, but any
type/render-sensitive hash (the external driver's) fails.  This scanner
is the repo's standing guard against that class: it runs ONLY the DuckDB
side (fast, no Spark) and prints every oracle column whose type Spark
cannot emit.

Usage: python tools/scan_oracle_types.py [--sf DIR]
Exit 1 if any unsafe column is found.
"""

from __future__ import annotations

import argparse
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# DuckDB type ids Spark can emit with identical rendering.  Integer widths
# up to BIGINT all render the same; HUGEINT does too for in-range values,
# but the driver's hash is type-sensitive, so it is NOT safe.
SAFE = {
    "BOOLEAN", "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER",  # fit in BIGINT
    "FLOAT", "DOUBLE", "VARCHAR", "DATE", "TIMESTAMP", "BLOB",
    "TIMESTAMP WITH TIME ZONE", "INTERVAL", "NULL",
}
UNSAFE = {"HUGEINT", "UHUGEINT", "UBIGINT", "TIME", "BIT", "UUID"}


def classify(t) -> list[str]:
    """Return list of unsafe leaf type ids inside a (possibly nested) type."""
    s = str(t)
    tid = str(t.id).upper() if hasattr(t, "id") else s.upper()
    bad = []
    # Nested types: recurse on children when the API exposes them.
    if tid in ("LIST", "ARRAY"):
        try:
            return classify(t.child)
        except Exception:  # noqa: BLE001
            pass
    if tid == "STRUCT":
        try:
            for _, ct in t.children:
                bad.extend(classify(ct))
            return bad
        except Exception:  # noqa: BLE001
            pass
    if tid == "MAP":
        try:
            bad.extend(classify(t.key))
            bad.extend(classify(t.value))
            return bad
        except Exception:  # noqa: BLE001
            pass
    if tid.upper() in UNSAFE or "HUGEINT" in s.upper():
        return [s]
    if tid.upper().startswith("DECIMAL"):
        # DECIMAL of ANY precision is hash-unsafe as an OUTPUT column.
        # The r12 "p<=18 is INT64-backed and therefore safe" rule was
        # empirically DISPROVED in r13: the external driver renders
        # DuckDB decimal columns through the pandas/float64 path, and
        # float64 shortest-repr drops trailing zeros at the declared
        # scale (net('N') 1003322369.8990 -> '1003322369.899') while
        # Spark's Decimal keeps scale — bit-identical values,
        # guaranteed hash mismatch whenever any value ends in a zero
        # digit.  Decimals are fine INTERNALLY (wide accumulators);
        # the emit step must cast to BIGINT / scaled integers / DOUBLE.
        return [s]
    return []


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    orc = E.oracle_sql()
    n_bad = n_err = 0
    for name, sql in orc.items():
        try:
            rel = con.sql(sql)
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            n_err += 1
            continue
        for col, typ in zip(rel.columns, rel.types):
            bad = classify(typ)
            if bad:
                print(f"UNSAFE {name}.{col}: {bad}")
                n_bad += 1
    print(f"\n{len(orc)} oracles scanned, {n_bad} unsafe columns, {n_err} errors")
    return 1 if (n_bad or n_err) else 0


if __name__ == "__main__":
    raise SystemExit(main())
