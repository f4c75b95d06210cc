"""Streaming-incremental frontier merge (foreachBatch) and the
applyInPandasWithState politeness gate: cross-batch state, exactly-once
file pickup, hash-collision-safe dedup."""

from __future__ import annotations

import os
import shutil
import tempfile
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from web_scraper_spark.streaming.incremental import (
    politeness_gate_stream,
    run_discovery_merge_stream,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="wss_incr_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write_discoveries(path: str, rows: list[tuple[str, int]]) -> None:
    tbl = pa.table(
        {
            "raw_link": pa.array([r[0] for r in rows], pa.string()),
            "parent_depth": pa.array([r[1] for r in rows], pa.int32()),
        }
    )
    pq.write_table(tbl, path)


def test_discovery_merge_stream_incremental(spark, tmpdir):
    disc = os.path.join(tmpdir, "disc")
    frontier = os.path.join(tmpdir, "frontier")
    ckpt = os.path.join(tmpdir, "ckpt")
    os.makedirs(disc)

    # batch 1: duplicates + canonical variants + a malformed link
    _write_discoveries(
        os.path.join(disc, "b1.parquet"),
        [
            ("https://A.example.com/x?b=2&a=1", 0),
            ("https://a.example.com:443/x?a=1&b=2#frag", 3),  # same canonical
            ("https://a.example.com/y", 1),
            ("::not a url::", 0),
        ],
    )
    run_discovery_merge_stream(spark, disc, frontier, ckpt)
    rows = {r.url: r for r in spark.read.parquet(frontier).collect()}
    assert set(rows) == {
        "https://a.example.com/x?a=1&b=2",
        "https://a.example.com/y",
    }
    # min-depth dedup within the batch: parent depths 0 and 3 -> depth 1
    assert rows["https://a.example.com/x?a=1&b=2"].depth == 1

    # re-run with no new files: checkpoint makes it a no-op
    run_discovery_merge_stream(spark, disc, frontier, ckpt)
    assert spark.read.parquet(frontier).count() == 2

    # batch 2: one known URL (shallower parent!) + one new
    _write_discoveries(
        os.path.join(disc, "b2.parquet"),
        [
            ("https://a.example.com/y", 0),
            ("https://b.example.com/z", 2),
        ],
    )
    run_discovery_merge_stream(spark, disc, frontier, ckpt)
    rows = {r.url: r for r in spark.read.parquet(frontier).collect()}
    assert set(rows) == {
        "https://a.example.com/x?a=1&b=2",
        "https://a.example.com/y",
        "https://b.example.com/z",
    }
    # first-discovery depth wins (same anti-join semantics as the batch
    # engine's W4): the later shallower parent does not rewrite depth
    assert rows["https://a.example.com/y"].depth == 2
    assert rows["https://b.example.com/z"].depth == 3


def _write_candidates(path: str, host: str, n: int, start: int) -> None:
    tbl = pa.table(
        {
            "host": pa.array([host] * n, pa.string()),
            "url": pa.array(
                [f"https://{host}/p/{i:05d}" for i in range(start, start + n)],
                pa.string(),
            ),
            "seed_rank": pa.array(list(range(start, start + n)), pa.int64()),
        }
    )
    pq.write_table(tbl, path)


def test_politeness_gate_state_spans_micro_batches(spark, tmpdir):
    """Budget 100: 60 candidates arrive in batch 1, 60 more in batch 2 —
    the state store carries the admitted count across batches, so batch 2
    admits exactly the remaining 40."""
    cand = os.path.join(tmpdir, "cand")
    ckpt = os.path.join(tmpdir, "gate_ckpt")
    os.makedirs(cand)
    f1 = os.path.join(cand, "c1.parquet")
    f2 = os.path.join(cand, "c2.parquet")
    _write_candidates(f1, "hosta.example.com", 60, 0)
    _write_candidates(f2, "hosta.example.com", 60, 60)
    # force two micro-batches in file order (file source orders by mtime)
    now = time.time()
    os.utime(f1, (now - 60, now - 60))
    os.utime(f2, (now, now))
    # a second, tiny host shares the stream and is unaffected
    f3 = os.path.join(cand, "c3.parquet")
    _write_candidates(f3, "hostb.example.com", 10, 0)
    os.utime(f3, (now - 60, now - 60))

    stream = (
        spark.readStream.schema("host string, url string, seed_rank long")
        .option("maxFilesPerTrigger", 2)
        .parquet(cand + "/*")
    )
    out = politeness_gate_stream(stream, host_budget=100)
    q = (
        out.writeStream.format("memory")
        .queryName("gate_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM gate_out").collect()

    a = sorted(
        (r for r in got if r.host == "hosta.example.com"),
        key=lambda r: r.admit_seq,
    )
    b = [r for r in got if r.host == "hostb.example.com"]
    assert len(a) == 100  # 60 + 40, never the full 120
    assert [r.admit_seq for r in a] == list(range(1, 101))
    # batch 1's urls all admitted; batch 2 contributed exactly 40
    assert sum(1 for r in a if r.url < "https://hosta.example.com/p/00060") == 60
    assert len(b) == 10
