"""Media-stage throughput: N synthetic payloads through each decoder/
index stage on local[CPUS], one Arrow mapInPandas pass per stage.

    python benchkit/media_decode.py [--n 200000] [--out BENCH/media_decode_r5.json]

Numbers measure per-payload stage overhead + decode arithmetic on
small synthetic payloads (not I/O); a warm-up pass runs first, and the
second timed run is reported, matching the protocol of the r4 artifact
(BENCH/media_decode_r4.json).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def stages():
    from web_scraper_spark.operators.audio import (
        adts_frame_index,
        mp3_frame_index,
        with_synth_adts,
        with_synth_mp3,
    )
    from web_scraper_spark.operators.av1 import av1_obu_index, with_synth_av1
    from web_scraper_spark.operators.h264 import (
        h264_nal_index,
        hevc_nal_index,
        with_synth_h264,
        with_synth_hevc,
    )
    from web_scraper_spark.operators.mpegts import (
        mpegts_packet_index,
        with_synth_ts,
    )
    from web_scraper_spark.operators.video import (
        mp4_frame_index,
        webm_frame_index,
        with_synth_mp4,
        with_synth_webm,
    )
    from web_scraper_spark.operators.pdf import (
        pdf_text_extract,
        with_synth_pdf_text,
    )
    from web_scraper_spark.operators.vp9 import (
        vp9_frame_index,
        with_synth_vp9,
    )

    return [
        ("pdf_text_extract", with_synth_pdf_text, pdf_text_extract),
        ("mp4_frame_index", with_synth_mp4, mp4_frame_index),
        ("webm_frame_index", with_synth_webm, webm_frame_index),
        ("mp3_frame_index", with_synth_mp3, mp3_frame_index),
        ("h264_nal_index", with_synth_h264, h264_nal_index),
        ("hevc_nal_index", with_synth_hevc, hevc_nal_index),
        ("av1_obu_index", with_synth_av1, av1_obu_index),
        ("vp9_frame_index", with_synth_vp9, vp9_frame_index),
        ("adts_frame_index", with_synth_adts, adts_frame_index),
        ("mpegts_packet_index", with_synth_ts, mpegts_packet_index),
    ]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "media_decode_r5.json"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from web_scraper_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        master=f"local[{cpus}]", shuffle_partitions=cpus, app_name="media-decode"
    )
    ids = (
        spark.range(0, args.n)
        .repartition(cpus * 4)
        .select(F.col("id").alias("doc_id"))
        .persist()
    )
    ids.count()

    results = []
    for name, synth, index in stages():
        df = index(synth(ids))
        df.count()  # warm-up: JIT, Arrow workers, codegen
        t0 = time.time()
        rows = df.count()
        wall = time.time() - t0
        rec = {
            "stage": name,
            "rows": rows,
            "wall_s": round(wall, 2),
            "payloads_per_s": int(args.n / wall),
        }
        results.append(rec)
        print(rec, flush=True)

    out = {"n_payloads": args.n, "cpus": cpus, "stages": results}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
