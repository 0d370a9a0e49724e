"""F18 — runtime-regression tracking over the per-round bench history.

The reference logs per-run execution times and compares them between
runs (SURVEY.md §2 F18; runtime bookkeeping in the app runner). Here:
read every BENCH_r*.json at the repo root, align per-query timings,
and flag regressions beyond a noise threshold (this VM's run-to-run
noise is 20-40%, so the default flags only >1.5x).

Usage: python scripts/regression.py [--threshold 1.5]
Exit code 1 if any regression is flagged (CI-gate friendly).
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def load_history(repo: Path = REPO) -> list[tuple[str, dict]]:
    """[(round_tag, {query: sec})] sorted by round number."""
    hist = []
    for p in sorted(repo.glob("BENCH_r*.json")):
        m = re.match(r"BENCH_r(\d+)\.json", p.name)
        if not m:
            continue
        try:
            rec = json.loads(p.read_text())
        except ValueError:
            continue
        q = dict(rec.get("queries", {}))
        kg = rec.get("kg") or {}
        if "triples_per_sec" in kg:
            q["_kg_triples_per_sec"] = kg["triples_per_sec"]
        hist.append((int(m.group(1)), q))
    return [(f"r{n:02d}", q) for n, q in sorted(hist)]


def regressions(
    hist: list[tuple[str, dict]], threshold: float = 1.5
) -> list[tuple[str, str, str, float, float, float]]:
    """(query, prev_round, cur_round, prev, cur, ratio) for every
    adjacent-round slowdown beyond threshold. Timings: ratio = cur/prev
    (>1 is slower). Throughput rows (prefixed _): ratio = prev/cur."""
    out = []
    for (tag_a, a), (tag_b, b) in zip(hist, hist[1:]):
        for q in sorted(set(a) & set(b)):
            prev, cur = a[q], b[q]
            if not (isinstance(prev, (int, float)) and isinstance(cur, (int, float))):
                continue
            if prev <= 0 or cur <= 0:
                continue
            ratio = (prev / cur) if q.startswith("_") else (cur / prev)
            if ratio > threshold:
                out.append((q, tag_a, tag_b, prev, cur, ratio))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=1.5)
    args = ap.parse_args()
    hist = load_history()
    if len(hist) < 2:
        print(f"{len(hist)} bench round(s) on disk — nothing to compare")
        return 0
    flagged = regressions(hist, args.threshold)
    for q, ta, tb, prev, cur, ratio in flagged:
        print(f"REGRESSION {q}: {ta}={prev:g} -> {tb}={cur:g} ({ratio:.2f}x)")
    if not flagged:
        print(
            f"no regressions >{args.threshold}x across "
            f"{len(hist)} rounds ({', '.join(t for t, _ in hist)})"
        )
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
