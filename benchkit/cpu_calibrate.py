"""Spark-free CPU-scaling calibration for the measurement box.

Runs a FIXED amount of pure-Python regex work (the same compiled
patterns the extraction stage uses, over synthetic pages of the bench
world's shape) split across P processes, for each P in --levels.
No Spark, no disk, no shuffle — if this does not scale from N to 4N
processes, nothing on this box can, and the per-stage efficiency
numbers in BENCH/stage_scaling.json are VM-bound, not plan-bound.

    python benchkit/cpu_calibrate.py --levels 1 8 32 --pages 48000
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_page(i: int) -> str:
    from web_scraper_spark.sources.fixtures import FIELDS, render_page

    fields = {k: f"v{i}_{j}" for j, k in enumerate(FIELDS)}
    links = [f"https://h{i % 97}.example.com/p/{i}/{j}" for j in range(3)]
    return render_page(fields, links, f"Reservation {i}")


def _work(args: tuple[int, int]) -> int:
    """Extract fields + text + outlinks from n synthetic pages."""
    seed, n = args
    from web_scraper_spark.sources.fixtures import (
        extract_fields_py,
        extract_outlinks_py,
        extract_text_py,
    )

    total = 0
    pages = [_make_page(seed * 1000 + i % 50) for i in range(50)]
    for i in range(n):
        html = pages[i % 50]
        total += len(extract_fields_py(html))
        total += len(extract_text_py(html))
        total += len(extract_outlinks_py(html))
    return total


def run_level(procs: int, pages: int) -> float:
    chunk = pages // procs
    with mp.Pool(procs) as pool:
        t0 = time.monotonic()
        pool.map(_work, [(p, chunk) for p in range(procs)])
        return time.monotonic() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", type=int, nargs="+", default=[1, 8, 32])
    ap.add_argument("--pages", type=int, default=48_000)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    results = {}
    for p in args.levels:
        best = min(run_level(p, args.pages) for _ in range(args.runs))
        results[p] = {
            "wall_sec": round(best, 2),
            "pages_per_sec": round(args.pages / best, 1),
        }
        print(f"procs={p}: {results[p]}", flush=True)

    levels = sorted(results)
    out = {"pages": args.pages, "levels": results, "speedup_vs_first": {}}
    base = results[levels[0]]["pages_per_sec"]
    for p in levels:
        out["speedup_vs_first"][p] = round(results[p]["pages_per_sec"] / base, 2)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH", "cpu_calibration.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["speedup_vs_first"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
