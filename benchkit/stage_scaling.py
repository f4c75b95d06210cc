"""Per-stage two-parallelism scaling evidence → BENCH/stage_scaling.json.

The round-level efficiency number on this single box is noise- and
bandwidth-dominated (see BENCH/BASELINE.md). This harness isolates the
CPU-bound stages of the round and measures each at local[N] and
local[4N] with the input pre-staged in the OS page cache (full warm-up
pass before timing, best-of-R timed runs, noop sink so no output disk
write is on the clock):

- ``extract``     — Arrow-batched page extraction (regex fields + full
                    text + outlinks), the round's dominant CPU stage
- ``politeness``  — per-host window budget + global distributed limit
- ``seen``        — exact (url_hash, url) anti-join vs a half-seen set
- ``canonhash``   — URL canonicalize + xxhash64 (pure codegen scalar)

    python benchkit/stage_scaling.py [--n 8] [--hosts 1000] [--yachts 10] [--runs 3]

Child mode (one JVM per parallelism level):

    python benchkit/stage_scaling.py --child --cpus 8 ...
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _ensure_frontier(spark, world_dir: str) -> str:
    """Materialize the initialized frontier once per world (candidates
    input for the politeness / seen stages)."""
    out = f"{world_dir}/frontier.parquet"
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    import shutil
    import tempfile

    from web_scraper_spark.plans.rounds import CrawlEngine
    from web_scraper_spark.sources.catalog import ParquetSnapshotCatalog
    from web_scraper_spark.sources.fixtures import PolitenessSpec

    state = tempfile.mkdtemp(prefix="wss_stage_state_")
    try:
        catalog = ParquetSnapshotCatalog(spark, state)
        engine = CrawlEngine(spark, catalog, PolitenessSpec(), n_buckets=32)
        seeds = spark.read.parquet(f"{world_dir}/seeds.parquet")
        engine.init_frontier(seeds, "2025-04-12", "2025-10-25")
        catalog.read("frontier").write.mode("overwrite").parquet(out)
    finally:
        shutil.rmtree(state, ignore_errors=True)
    return out


def _ensure_narrow(spark, cache: str, rows: int, n_hosts: int = 50_000) -> str:
    """A big synthetic NARROW frontier (no html) for the politeness /
    seen / canonhash stages — the wide-page world is far too small to
    lift those past the per-job overhead floor (~0.5 s), which would
    masquerade as 'no scaling'. Pure-expression generation, cached."""
    from pyspark.sql import functions as F

    path = os.path.join(cache, f"narrow_{rows}.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        host = F.concat(
            F.lit("charter"),
            F.pmod(F.xxhash64("id"), F.lit(n_hosts)).cast("string"),
            F.lit(".example.com"),
        )
        url = F.concat(
            F.lit("https://"), host, F.lit("/p/"), F.col("id").cast("string")
        )
        (
            spark.range(rows)
            .select(
                host.alias("host"),
                url.alias("url"),
                F.xxhash64(url).alias("url_hash"),
                F.lit(0).alias("depth"),
                F.lit(0).alias("discovery_round"),
                F.pmod(F.col("id"), F.lit(997)).cast("int").alias("seed_rank"),
                F.pmod(F.col("id"), F.lit(37)).cast("int").alias("yacht_rank"),
                F.pmod(F.col("id"), F.lit(28)).cast("int").alias("period_idx"),
            )
            # many small files: scan splits cannot subdivide parquet row
            # groups, so a low-parallelism generator writing 2 fat files
            # would cap every later scan at ~4 tasks regardless of cores
            .repartition(64)
            .write.mode("overwrite")
            .parquet(path)
        )
    return path


def run_child(args) -> None:
    from pyspark.sql import functions as F

    from bench import build_bench_world
    from web_scraper_spark.functions.urls import canonicalize_url, url_hash
    from web_scraper_spark.operators.extract import extract_pages
    from web_scraper_spark.operators.politeness import select_polite
    from web_scraper_spark.operators.seen import filter_unseen
    from web_scraper_spark.session import get_spark
    from web_scraper_spark.sources.fixtures import PolitenessSpec

    spark = get_spark(
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        app_name=f"wss-stage-{args.cpus}",
        # shuffle/spill files on tmpfs: the single shared spindle is a
        # per-box artifact every parallelism level pays identically
        extra_conf={"spark.local.dir": "/dev/shm/wss-spark-local"},
    )
    world = build_bench_world(spark, args.hosts, args.yachts, args.cache)
    narrow_path = _ensure_narrow(spark, args.cache, args.narrow_rows)

    pages = spark.read.parquet(f"{world}/pages_resolved.parquet").select(
        "url_hash", "url_canon", "html"
    )
    frontier = spark.read.parquet(narrow_path)
    robots = spark.range(50_000).select(
        F.concat(
            F.lit("charter"), F.col("id").cast("string"), F.lit(".example.com")
        ).alias("host"),
        F.when(F.col("id") % 2 == 0, 30).otherwise(15).alias("crawl_delay_s"),
    )
    # host budget binds (100-200 rows/host) so the window does real
    # work; the global budget is ABOVE the data size — a limit smaller
    # than the input early-exits the scan and fakes the timing (a 2-core
    # run 'beats' 8 cores by consuming less)
    spec = PolitenessSpec(
        round_seconds=3000, global_batch_urls=100_000_000, global_pause_s=3000
    )
    seen = (
        frontier.filter(F.col("url_hash") % 2 == 0).select("url_hash", "url")
    )
    urls = frontier.select("url")

    stages = {
        "extract": lambda: _noop(extract_pages(pages, "html")),
        "politeness": lambda: _noop(select_polite(frontier, robots, spec)),
        "seen": lambda: _noop(
            filter_unseen(frontier, seen, confirm_cols=["url_hash", "url"])
        ),
        "canonhash": lambda: _noop(
            urls.select(url_hash(canonicalize_url(F.col("url"))).alias("h"))
        ),
    }
    rows = {
        "extract": pages.count(),  # also pre-stages pages in page cache
        "politeness": frontier.count(),
        "seen": frontier.count(),
        "canonhash": frontier.count(),
    }
    if args.stages:
        wanted = set(args.stages.split(","))
        stages = {k: v for k, v in stages.items() if k in wanted}

    result = {"cpus": args.cpus, "rows": rows, "stages": {}}
    for name, fn in stages.items():
        fn()  # warm-up: page cache, JIT, python workers — not timed
        best = None
        for _ in range(args.runs):
            # drop any .cache() a previous identical plan left behind —
            # the CacheManager matches canonicalized plans ACROSS runs,
            # so a re-built politeness stage would silently read the
            # prior run's cached range-sort instead of doing the work
            spark.catalog.clearCache()
            t0 = time.monotonic()
            fn()
            dt = time.monotonic() - t0
            best = dt if best is None or dt < best else best
        result["stages"][name] = {
            "wall_sec": round(best, 3),
            "rows_per_sec": round(rows[name] / best, 1),
        }
    print("STAGE_RESULT " + json.dumps(result))
    spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--hosts", type=int, default=1000)
    ap.add_argument("--yachts", type=int, default=10)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cache", default="/tmp/wss_bench_cache")
    ap.add_argument("--narrow-rows", type=int, default=24_000_000)
    ap.add_argument("--stages", default="", help="comma list; empty = all")
    args = ap.parse_args()

    if args.child:
        run_child(args)
        return 0

    levels = {}
    for cpus in (args.n, args.n * 4):
        out = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--child",
                "--cpus", str(cpus),
                "--hosts", str(args.hosts),
                "--yachts", str(args.yachts),
                "--runs", str(args.runs),
                "--cache", args.cache,
                "--narrow-rows", str(args.narrow_rows),
                "--stages", args.stages,
            ],
            capture_output=True,
            text=True,
            cwd=REPO,
            check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("STAGE_RESULT ")][-1]
        levels[cpus] = json.loads(line[len("STAGE_RESULT "):])
        print(f"local[{cpus}]: " + json.dumps(levels[cpus]["stages"]), flush=True)

    lo, hi = levels[args.n], levels[args.n * 4]
    eff = {
        s: round(
            (hi["stages"][s]["rows_per_sec"] / lo["stages"][s]["rows_per_sec"]) / 4,
            3,
        )
        for s in lo["stages"]
    }
    summary = {
        "world": f"{args.hosts} hosts x {args.yachts} yachts x 28 periods",
        "runs_per_stage": args.runs,
        "n": lo,
        "n4": hi,
        "efficiency": eff,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(
        os.path.join(REPO, "BENCH", f"stage_scaling_n{args.n}.json"), "w"
    ) as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(eff, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
