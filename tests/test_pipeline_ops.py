"""Round-4 pipeline operators: sessionization, word-bigram LM,
link reciprocity, SemDeDup pruning — hand-checkable semantics plus a
streaming parity run for session_window."""

from __future__ import annotations

import math
import os
import shutil
import tempfile
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from web_scraper_spark.operators.linkspam import reciprocity_stats
from web_scraper_spark.operators.lm_words import (
    doc_bigrams,
    score_bigram_lm,
    train_bigram_lm,
    word_tokens,
)
from web_scraper_spark.operators.semdedup import assign_cells, semdedup_prune
from web_scraper_spark.operators.sessions import sessionize

T0 = datetime(2025, 5, 1, 12, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")


# ---------------------------------------------------------------------------
# sessionize
# ---------------------------------------------------------------------------


def test_sessionize_gap_boundary_merges_at_exact_gap(spark):
    """Spark's session_window merges windows that TOUCH: an event at
    exactly prev_ts + gap is the same session (new session iff
    diff > gap) — the boundary contract the oracle twin pins."""
    rows = [
        (1, T0, 1.0),
        (1, T0 + timedelta(minutes=30, seconds=1), 1.0),  # > gap -> NEW
        (2, T0, 1.0),
        (2, T0 + timedelta(minutes=30), 1.0),  # == gap -> merges
    ]
    out = {
        (r["user_id"], r["session_start"]): r
        for r in sessionize(_events(spark, rows), gap="30 minutes").collect()
    }
    assert len([k for k in out if k[0] == 1]) == 2
    assert len([k for k in out if k[0] == 2]) == 1
    merged = out[(2, T0)]
    assert merged["n_events"] == 2
    assert merged["session_end"] == T0 + timedelta(minutes=60)


def test_sessionize_chain_merges_and_end_is_last_plus_gap(spark):
    """Events each 20 min apart chain into ONE session spanning > gap."""
    rows = [(7, T0 + timedelta(minutes=20 * i), 2.5) for i in range(5)]
    out = sessionize(_events(spark, rows), gap="30 minutes").collect()
    assert len(out) == 1
    s = out[0]
    assert s["session_start"] == T0
    assert s["session_end"] == T0 + timedelta(minutes=80 + 30)
    assert s["n_events"] == 5 and s["sum_value"] == 12.5


def test_sessionize_streaming_parity(spark):
    """The SAME session_window expression runs under Structured
    Streaming (availableNow + watermark) and finalized sessions match
    the batch answer — the §2.9 stateful-streaming contract."""
    rows = [
        (1, T0, 1.0),
        (1, T0 + timedelta(minutes=5), 2.0),
        (1, T0 + timedelta(hours=3), 4.0),
        (2, T0 + timedelta(minutes=1), 8.0),
        # sentinel far in the future pushes the watermark past all of
        # the above so their sessions finalize in append mode
        (99, T0 + timedelta(days=30), 0.0),
    ]
    tmp = tempfile.mkdtemp(prefix="wss_sess_")
    try:
        src, out_dir, ckpt = tmp + "/src", tmp + "/out", tmp + "/ckpt"
        batch_df = _events(spark, rows)
        batch_df.write.parquet(src)
        stream = (
            spark.readStream.schema(batch_df.schema)
            .parquet(src)
            .withWatermark("ts", "1 hour")
            .groupBy("user_id", F.session_window("ts", "30 minutes"))
            .agg(F.count("*").alias("n_events"))
            .select(
                "user_id",
                F.col("session_window.start").alias("session_start"),
                "n_events",
            )
        )
        (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )
        streamed = {
            (r["user_id"], r["session_start"]): r["n_events"]
            for r in spark.read.parquet(out_dir).collect()
        }
        batch = {
            (r["user_id"], r["session_start"]): r["n_events"]
            for r in sessionize(batch_df, gap="30 minutes").collect()
            if r["user_id"] != 99  # sentinel's own session is unflushed
        }
        assert batch and batch.items() <= streamed.items()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# word-bigram LM
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_word_tokens_ascii_fold(spark):
    row = (
        spark.range(1)
        .select(word_tokens(F.lit("Hello,  WORLD—42 naïve")).alias("t"))
        .first()
    )
    # non-ASCII folds to a separator BEFORE lowercasing: naïve -> na, ve
    assert row["t"] == ["hello", "world", "42", "na", "ve"]


def test_bigram_lm_hand_computed(spark):
    docs = _docs(spark, [(1, "a b a b"), (2, "a b"), (3, "c")])
    # bigrams: d1 (a,b) (b,a) (a,b); d2 (a,b)  | vocab {a,b,c} V=3
    # c(a,b)=3 c(b,a)=1 ; hist a=3 b=1 ; alpha=0.5
    model = {
        (r["w1"], r["w2"]): r["logp"]
        for r in train_bigram_lm(docs, alpha=0.5).collect()
    }
    assert math.isclose(model[("a", "b")], math.log10(3.5 / 4.5), rel_tol=1e-12)
    assert math.isclose(model[("b", "a")], math.log10(1.5 / 2.5), rel_tol=1e-12)
    scored = {
        r["doc_id"]: r
        for r in score_bigram_lm(docs, train_bigram_lm(docs, alpha=0.5)).collect()
    }
    assert 3 not in scored  # single-token doc: no bigrams, no row
    assert scored[2]["n_bigrams"] == 1
    expected = round(
        (2 * math.log10(3.5 / 4.5) + math.log10(1.5 / 2.5)) / 3, 6
    )
    assert scored[1]["lp_avg"] == pytest.approx(expected, abs=1e-6)


def test_bigram_explode_skips_short_docs(spark):
    docs = _docs(spark, [(1, ""), (2, "one"), (3, "two words")])
    assert doc_bigrams(docs).count() == 1


# ---------------------------------------------------------------------------
# link reciprocity
# ---------------------------------------------------------------------------


def test_reciprocity_hand_graph(spark):
    # a<->b reciprocal; a->c one-way; d isolated sink (in only);
    # duplicate edge a->b must not double-count
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c"), ("c", "d"), ("a", "b")],
        "src string, dst string",
    )
    out = {r["host"]: r for r in reciprocity_stats(edges).collect()}
    a, c, d = out["a"], out["c"], out["d"]
    assert (a["out_degree"], a["in_degree"], a["n_reciprocal"]) == (2, 1, 1)
    assert a["reciprocity"] == 0.5 and a["in_out_ratio"] == 0.5
    assert (c["out_degree"], c["n_reciprocal"]) == (1, 0)
    assert d["out_degree"] == 0 and d["reciprocity"] is None
    assert out["b"]["reciprocity"] == 1.0


def test_reciprocity_drops_self_loops(spark):
    edges = spark.createDataFrame(
        [("a", "a"), ("a", "b")], "src string, dst string"
    )
    out = {r["host"]: r for r in reciprocity_stats(edges).collect()}
    assert out["a"]["out_degree"] == 1 and out["a"]["n_reciprocal"] == 0


# ---------------------------------------------------------------------------
# SemDeDup
# ---------------------------------------------------------------------------


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_semdedup_drops_exact_dup_keeps_lowest_id(spark):
    # two orthogonal directions -> two clusters; 100 is an exact copy
    # of 0 (cos 1.0, dropped); 1 is its cluster's lowest id (kept even
    # though 100 duplicates IT too — only LOWER ids count against you)
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (100, [1.0, 0.0]),
        (101, [0.0, 0.9]),
    ]
    out = {r["vec_id"]: r for r in semdedup_prune(_emb(spark, rows), tau=0.9, n_cells=2).collect()}
    assert out[0]["keep"] and out[0]["max_cos_lower"] is None
    assert not out[100]["keep"] and out[100]["max_cos_lower"] == 1.0
    assert out[1]["keep"]
    assert not out[101]["keep"]  # cos(101, 1) = 1.0 after normalization


def test_semdedup_pairs_are_cluster_bounded(spark):
    # near-identical vectors in DIFFERENT clusters are never compared
    rows = [
        (0, [1.0, 0.0]),
        (1, [-1.0, 0.05]),  # own cluster (cos to cell 0 is negative)
        (50, [-1.0, 0.049]),  # near-dup of 1, same cluster -> dropped
        (51, [1.0, 0.001]),  # near-dup of 0, cluster 0 -> dropped
    ]
    out = {r["vec_id"]: r for r in semdedup_prune(_emb(spark, rows), tau=0.9, n_cells=2).collect()}
    cells = {v: out[v]["cell_id"] for v in out}
    assert cells[50] == cells[1] != cells[0]
    assert out[50]["keep"] is False and out[51]["keep"] is False
    assert out[0]["keep"] and out[1]["keep"]


def test_assign_cells_tie_breaks_to_lowest_cell(spark):
    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (9, [1.0, 0.0])]
    out = {r["vec_id"]: r["cell_id"] for r in assign_cells(_emb(spark, rows), n_cells=2).collect()}
    # both centroids identical -> every vector ties -> lowest cell wins
    assert out == {0: 0, 1: 0, 9: 0}
