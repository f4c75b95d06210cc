"""Pinned two-parallelism scaling for the document-text stages
(pdf_text_extract / docx_text_extract / zip_entry_index) →
BENCH/doc_scaling_r5.json.

Same protocol as the media-stage run (BENCH/media_scaling_r5.json):
one fresh JVM per parallelism level, `taskset` pinning the whole
process tree to N cores so local[N] really means N cores (not N Spark
threads time-slicing 32), a full warm-up pass before timing, noop sink
so no output write is on the clock.

    python benchkit/doc_scaling.py [--n-payloads 300000] [--lo 2] [--hi 8]
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


def stages():
    from web_scraper_spark.operators.pdf import (
        pdf_text_extract,
        with_synth_pdf_text,
    )
    from web_scraper_spark.operators.tarindex import (
        tar_entry_index,
        with_synth_tar,
    )
    from web_scraper_spark.operators.zipindex import (
        docx_text_extract,
        epub_text_extract,
        with_synth_docx,
        with_synth_epub,
        with_synth_xlsx,
        with_synth_zip,
        xlsx_text_extract,
        zip_entry_index,
    )

    return [
        ("pdf_text_extract", with_synth_pdf_text, pdf_text_extract),
        ("docx_text_extract", with_synth_docx, docx_text_extract),
        ("epub_text_extract", with_synth_epub, epub_text_extract),
        ("xlsx_text_extract", with_synth_xlsx, xlsx_text_extract),
        ("zip_entry_index", with_synth_zip, zip_entry_index),
        ("tar_entry_index", with_synth_tar, tar_entry_index),
    ]


def run_child(cpus: int, n: int) -> None:
    from pyspark.sql import functions as F

    from web_scraper_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 4,
        app_name=f"doc-scaling-{cpus}",
    )
    results = {}
    for name, synth, index in stages():
        base = spark.range(0, n).select(F.col("id").alias("doc_id"))
        df = index(synth(base.repartition(cpus * 4)))
        df.write.format("noop").mode("overwrite").save()  # warm-up
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        wall = time.monotonic() - t0
        results[name] = {
            "wall_s": round(wall, 2),
            "payloads_per_s": int(n / wall),
        }
    print("DOC_RESULT " + json.dumps(results), flush=True)
    spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--n-payloads", type=int, default=300_000)
    ap.add_argument("--lo", type=int, default=2)
    ap.add_argument("--hi", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "doc_scaling_r5.json"))
    args = ap.parse_args()

    if args.child:
        run_child(args.cpus, args.n_payloads)
        return 0

    levels = {}
    for cpus in (args.lo, args.hi):
        cores = ",".join(str(c) for c in range(cpus))
        out = subprocess.run(
            [
                "taskset", "-c", cores,
                sys.executable, os.path.abspath(__file__),
                "--child", "--cpus", str(cpus),
                "--n-payloads", str(args.n_payloads),
            ],
            capture_output=True, text=True, cwd=REPO, check=True,
        )
        line = [
            l for l in out.stdout.splitlines() if l.startswith("DOC_RESULT ")
        ][-1]
        levels[cpus] = json.loads(line[len("DOC_RESULT "):])
        print(f"local[{cpus}] pinned: {json.dumps(levels[cpus])}", flush=True)

    ratio = args.hi / args.lo
    summary = {
        "n_payloads": args.n_payloads,
        "pinned": True,
        "levels": [args.lo, args.hi],
        "stages": [
            {
                "stage": s,
                f"n{args.lo}_payloads_per_s": levels[args.lo][s]["payloads_per_s"],
                f"n{args.hi}_payloads_per_s": levels[args.hi][s]["payloads_per_s"],
                f"efficiency_{args.lo}_to_{args.hi}": round(
                    levels[args.hi][s]["payloads_per_s"]
                    / levels[args.lo][s]["payloads_per_s"]
                    / ratio,
                    3,
                ),
            }
            for s in levels[args.lo]
        ],
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print("wrote", args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
