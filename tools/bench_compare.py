"""Round-over-round bench comparison.

Run: python tools/bench_compare.py NEW.json OLD.json [OLD2.json ...]

Accepts either bench.py's raw one-line JSON ({"queries": {...}}) or the
driver's BENCH_r{N}.json wrapper ({"parsed": {"queries": {...}}}).
Prints a per-query table plus the common-subset total ratio against each
OLD file — the number that separates a real regression from an
environment-wide floor (if every untouched query moved by the same
factor, the environment moved, not the code).
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:
        d = d["parsed"]
    return d["queries"]


def main(argv: list[str]) -> int:
    if len(argv) < 3:
        print(__doc__)
        return 2
    new = _load(argv[1])
    olds = {p: _load(p) for p in argv[2:]}
    hdr = f"{'query':34} {'new':>7}"
    for p in olds:
        hdr += f" {p.rsplit('/', 1)[-1][:12]:>12} {'ratio':>6}"
    print(hdr)
    for name, t in new.items():
        line = f"{name:34} {t:>7}"
        for q in olds.values():
            o = q.get(name)
            line += (
                f" {o:>12} {t / o:>6.2f}" if o else f" {'-':>12} {'':>6}"
            )
        print(line)
    for p, q in olds.items():
        # zero-time entries (rounded sub-ms samples or hand-edited rows)
        # would blow up the ratio math — exclude them like the per-line
        # formatter does
        common = [k for k in new if q.get(k)]
        if not common:
            continue
        ratio = sum(new[k] for k in common) / sum(q[k] for k in common)
        worst = max(common, key=lambda k: new[k] / q[k])
        print(
            f"vs {p}: common-{len(common)} ratio {ratio:.2f}; "
            f"worst {worst} {new[worst] / q[worst]:.2f}x"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
