"""Run ONE crawl round at a given parallelism; print one JSON line.

Child process for benchkit/scaling.py (each parallelism level needs its own
JVM). The fixture world is cached, so successive invocations measure the
same input.

    python benchkit/one_round.py --cpus 8 --hosts 400 --yachts 10
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
    # warm-up world (JIT/worker-spawn/page-fault warm-up) is small so
    # low-parallelism levels don't spend minutes warming up
    ap.add_argument("--warmup-hosts", type=int, default=120)
    ap.add_argument("--warmup-yachts", type=int, default=8)
    args = ap.parse_args()

    from bench import build_bench_world, run_crawl_round
    from web_scraper_spark.session import get_spark

    os.makedirs(args.cache, exist_ok=True)
    extra = {}
    evdir = os.environ.get("WSS_EVENTLOG_DIR")
    if evdir:
        # per-stage attribution for scaling diagnosis: parse the event
        # log with benchkit/parse_eventlog.py after the run
        os.makedirs(evdir, exist_ok=True)
        extra = {
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
        }
    spark = get_spark(
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        app_name=f"wss-scale-{args.cpus}",
        extra_conf=extra,
    )
    world_dir = build_bench_world(spark, args.hosts, args.yachts, args.cache)
    # warm-up round on a small world (throwaway state): JIT, python-worker
    # spawn, heap growth — so the measured round is steady-state
    warm_dir = build_bench_world(spark, args.warmup_hosts, args.warmup_yachts, args.cache)
    run_crawl_round(spark, warm_dir)
    result = run_crawl_round(spark, world_dir)
    result.update(cpus=args.cpus, hosts=args.hosts, yachts=args.yachts)
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
