"""Generate OPERATORS.md — the registry-derived operator inventory.

One row per registered query: module, oracle strength, and the first
docstring sentence (whole sentence, however the source wraps it).
Regenerate after adding operators:

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
            # First paragraph, joined to one line, cut at the first
            # sentence end — a complete summary regardless of how the
            # docstring happens to wrap.
            doc = (fn.__doc__ or "").strip()
            para = " ".join(
                line.strip() for line in doc.split("\n\n")[0].splitlines()
            )
            cut = para.find(". ")
            first = para[: cut + 1] if cut != -1 else para
            first = first.replace("|", "\\|")
            strength = "strong" if name in core.ORACLES else "weak"
            print(f"| `{name}` | {short_mod} | {strength} | {first} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
