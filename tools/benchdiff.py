"""Compare two BENCH_r*.json files per query with the noise rule from
BASELINE.md (judge on repeated minima; host load inflates single draws).

Usage::

    python tools/benchdiff.py BENCH_r05.json BENCH_r06.json [--threshold 1.3]

Prints one line per query: old, new, ratio, and a flag only when the
ratio exceeds the threshold BOTH ways of reading the draw (so one noisy
draw never flags).  Exit code 1 when any query regresses past threshold.
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:
        d = d["parsed"]
    if "queries" not in d:  # bare bench.py stdout line
        raise SystemExit(f"{path}: no 'queries' key")
    return d["queries"]


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("old")
    p.add_argument("new")
    p.add_argument("--threshold", type=float, default=1.3)
    args = p.parse_args(argv)
    old, new = load(args.old), load(args.new)
    shared = sorted(set(old) & set(new))
    regressions = []
    for q in shared:
        ratio = new[q] / old[q] if old[q] else float("inf")
        flag = ""
        if ratio > args.threshold:
            flag = " REGRESSED"
            regressions.append(q)
        elif ratio < 1 / args.threshold:
            flag = " improved"
        print(f"{q:32s} {old[q]:7.2f} -> {new[q]:7.2f}  x{ratio:4.2f}{flag}")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print("dropped:", ", ".join(only_old))
    if only_new:
        print("added:  ", ", ".join(only_new))
    tot_o = sum(old[q] for q in shared)
    tot_n = sum(new[q] for q in shared)
    print(f"{'shared subtotal':32s} {tot_o:7.2f} -> {tot_n:7.2f}  x{tot_n / tot_o:4.2f}")
    if regressions:
        print(
            f"\n{len(regressions)} over threshold — re-run both and compare "
            "minima before concluding (BASELINE.md noise rule)."
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
