"""Diff two CHECK_r*.txt sweep artifacts: per-query timing deltas with
spark/oracle attribution, plus pass/weak/fail census changes.

Mechanizes the cross-round question every round's review answers by
hand: "which queries got slower, is the slowdown Spark-side or
oracle-side, and does the total drift?"  Timing deltas on a shared
machine are ambient-noise-prone — the output is ranked evidence for a
matched-conditions A/B (bench.py runs one automatically for the
headline set), not a verdict by itself.

Usage:
    python tools/compare_sweeps.py CHECK_r12.txt CHECK_r13.txt \
        [--min-delta 1.0] [--min-ratio 1.4]

Exit code is always 0 (reporting tool, not a gate); the gate on sweep
health is the FAIL count inside each artifact, not the diff.
"""

from __future__ import annotations

import argparse
import re

_LINE = re.compile(
    r"(PASS|WEAK|FAIL) (\S+): rows=\d+ (?:cols=\[[^]]*\] )?"
    r"\(([\d.]+)s(?:; spark=([\d.]+)s oracle=([\d.]+)s)?\)"
)
# check.py's REAL failure shapes carry no rows=/timing at all:
#   FAIL name: spark error: Type: msg
#   FAIL name: duckdb error: Type: msg
#   FAIL name: rowcount spark=3 oracle=4 | values differ ...
# (r13 ADVICE: without this pattern a genuine PASS->FAIL never appears
# in the STATUS CHANGES census — the query just drops into only-old.)
_FAIL_LINE = re.compile(r"FAIL (\S+): (?!rows=\d)")


def parse(path: str) -> dict[str, dict]:
    out: dict[str, dict] = {}
    for line in open(path, errors="replace"):
        m = _LINE.search(line)
        if m:
            status, name, tot, sp, orc = m.groups()
            out[name] = {
                "status": status,
                "total": float(tot),
                "spark": float(sp) if sp else None,
                "oracle": float(orc) if orc else None,
            }
            continue
        f = _FAIL_LINE.search(line)
        if f:
            out[f.group(1)] = {
                "status": "FAIL",
                "total": None,
                "spark": None,
                "oracle": None,
            }
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--min-delta", type=float, default=1.0,
                    help="report only |delta| above this many seconds")
    ap.add_argument("--min-ratio", type=float, default=1.4,
                    help="report regressions only above this ratio")
    args = ap.parse_args()

    a, b = parse(args.old), parse(args.new)
    common = sorted(set(a) & set(b))
    only_a, only_b = sorted(set(a) - set(b)), sorted(set(b) - set(a))

    status_changes = [
        (q, a[q]["status"], b[q]["status"])
        for q in common
        if a[q]["status"] != b[q]["status"]
    ]
    # FAIL rows parsed from the error-line shapes carry no timing;
    # totals and timing deltas are computed over the timed subset only.
    timed = [
        q for q in common
        if a[q]["total"] is not None and b[q]["total"] is not None
    ]
    ta = sum(a[q]["total"] for q in timed)
    tb = sum(b[q]["total"] for q in timed)
    print(f"{len(common)} common queries; only-old={only_a or 'none'}; "
          f"only-new={only_b or 'none'}")
    print(f"common-query total: {ta:.1f}s -> {tb:.1f}s "
          f"({tb / ta:.3f}x)" if ta else "no common timings")
    if status_changes:
        print("\nSTATUS CHANGES:")
        for q, sa, sb in status_changes:
            print(f"  {q}: {sa} -> {sb}")

    def attributed(q) -> str:
        sa, sb = a[q].get("spark"), b[q].get("spark")
        oa, ob = a[q].get("oracle"), b[q].get("oracle")
        if None in (sa, sb, oa, ob):
            return ""
        side = "spark" if (sb - sa) >= (ob - oa) else "oracle"
        return f" [{side}-side: spark {sa:.1f}->{sb:.1f} oracle {oa:.1f}->{ob:.1f}]"

    regs = [
        q for q in timed
        if b[q]["total"] - a[q]["total"] > args.min_delta
        and b[q]["total"] / max(a[q]["total"], 0.05) > args.min_ratio
    ]
    regs.sort(key=lambda q: a[q]["total"] - b[q]["total"])
    if regs:
        print(f"\nSLOWER (> +{args.min_delta}s and > {args.min_ratio}x):")
        for q in regs:
            print(f"  {q}: {a[q]['total']}s -> {b[q]['total']}s"
                  f"{attributed(q)}")
    imps = [
        q for q in timed
        if a[q]["total"] - b[q]["total"] > args.min_delta
    ]
    imps.sort(key=lambda q: b[q]["total"] - a[q]["total"])
    if imps:
        print(f"\nFASTER (> -{args.min_delta}s):")
        for q in imps[:15]:
            print(f"  {q}: {a[q]['total']}s -> {b[q]['total']}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
