"""External-evidence dashboard: which registry queries have driver rows?

Joins the registry (registration order) against every committed
CORRECTNESS_r*.json and prints, per family prefix, how many queries have
at least one external (driver) correctness row — so each round's
_WINDOW_PRIORITY rotation can be aimed at the thinnest pools instead of
hand-audited (round-7 verdict task 8).

    python tools/evidence.py            # family table + thin pools
    python tools/evidence.py --unsampled  # full never-sampled id list
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from covid_19_data_analysis_bigdata_spark import core  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sampled_ids() -> dict[str, list[str]]:
    """id -> rounds in which the driver sampled it."""
    out: dict[str, list[str]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(path).replace("CORRECTNESS_", "").replace(".json", "")
        with open(path) as f:
            for name in json.load(f):
                out.setdefault(name, []).append(rnd)
    return out


def family(name: str) -> str:
    return name.split("_", 1)[0]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--unsampled", action="store_true")
    args = ap.parse_args()

    core.load_all()
    names = list(core.QUERIES)
    seen = sampled_ids()

    fams: dict[str, list[str]] = {}
    for n in names:
        fams.setdefault(family(n), []).append(n)

    rows = []
    for fam, members in sorted(fams.items()):
        have = [m for m in members if m in seen]
        rows.append((fam, len(have), len(members)))

    print(f"# registry={len(names)} with-external={len([n for n in names if n in seen])}")
    print(f"{'family':<14} {'ext':>4} {'total':>6} {'pct':>5}")
    for fam, have, tot in sorted(rows, key=lambda r: r[1] / r[2]):
        print(f"{fam:<14} {have:>4} {tot:>6} {100 * have // tot:>4}%")

    if args.unsampled:
        print("\n# never-sampled ids (registration order):")
        for n in names:
            if n not in seen:
                print(n)
    return 0


if __name__ == "__main__":
    sys.exit(main())
