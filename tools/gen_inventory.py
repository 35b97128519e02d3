"""Generate OPERATORS.md — the registry-derived operator inventory.

One row per registered query: module, oracle strength, and the first
docstring line.  Regenerate after adding operators:

    python tools/gen_inventory.py > OPERATORS.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from covid_19_data_analysis_bigdata_spark import core

    core.load_all()
    print("# Operator inventory (generated from the query registry)")
    print()
    print(
        f"{len(core.QUERIES)} queries; {len(core.ORACLES)} with exact-value "
        "DuckDB oracles (strong), the rest rows-only (weak). "
        "Regenerate: `python tools/gen_inventory.py > OPERATORS.md`."
    )
    print()
    print("| query | module | oracle | what it does |")
    print("| --- | --- | --- | --- |")
    by_module: dict[str, list[str]] = {}
    for name in sorted(core.QUERIES):
        by_module.setdefault(core.QUERIES[name].__module__, []).append(name)
    for module in sorted(by_module):
        short_mod = module.rsplit(".", 1)[-1]
        for name in by_module[module]:
            fn = core.QUERIES[name]
            doc = (fn.__doc__ or "").strip().splitlines()
            first = doc[0].strip() if doc else ""
            strength = "strong" if name in core.ORACLES else "weak"
            print(f"| `{name}` | {short_mod} | {strength} | {first} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
