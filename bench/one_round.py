"""Run ONE crawl round at a given parallelism; print one JSON line.

Child process for bench/scaling.py (each parallelism level needs its own
JVM). The fixture world is cached, so successive invocations measure the
same input.

    python bench/one_round.py --cpus 8 --hosts 400 --yachts 10
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--hosts", type=int, default=400)
    ap.add_argument("--yachts", type=int, default=10)
    ap.add_argument("--cache", default="/tmp/wss_bench_cache")
    args = ap.parse_args()

    from bench import build_bench_world, run_crawl_round
    from web_scraper_spark.session import get_spark

    os.makedirs(args.cache, exist_ok=True)
    world_dir = build_bench_world(args.hosts, args.yachts, args.cache)

    spark = get_spark(
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        app_name=f"wss-scale-{args.cpus}",
    )
    result = run_crawl_round(spark, world_dir)
    result.update(cpus=args.cpus, hosts=args.hosts, yachts=args.yachts)
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
