"""Per-key best across several bench JSONs vs a baseline set — the
noise-robust comparison this sandbox requires (single runs swing 0.3x-3x;
see OPTIMIZATION_r12.md / r13 "Measurement conditions").

Usage: python tools/bench_best.py baseline1.json[,baseline2...] \
       final1.json[,final2...]
"""
from __future__ import annotations

import json
import math
import sys


def _times(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    return {**d.get("queries", {}), **d.get("extended_queries", {})}


def best(paths: list[str]) -> dict[str, float]:
    out: dict[str, float] = {}
    for p in paths:
        for k, v in _times(p).items():
            out[k] = min(out.get(k, float("inf")), v)
    return out


def main() -> None:
    base = best(sys.argv[1].split(","))
    now = best(sys.argv[2].split(","))
    common = sorted(set(base) & set(now))
    ratios = []
    for k in common:
        r = now[k] / base[k] if base[k] > 0 else float("inf")
        ratios.append(r)
        print(f"{k:28s} {base[k]:8.3f} -> {now[k]:8.3f}  ({r:4.2f}x)")
    geo = math.exp(sum(math.log(r) for r in ratios) / len(ratios))
    med = sorted(ratios)[len(ratios) // 2]
    print(f"\n{len(common)} keys: geomean {geo:.3f}, median {med:.3f}")


if __name__ == "__main__":
    main()
