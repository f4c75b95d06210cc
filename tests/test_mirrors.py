"""Mirror-host detection (operators/mirrors.py).

The battery row (`mirror_hosts`) pins the pipeline against an
independent DuckDB self-join oracle at corpus scale; here: the
boilerplate cap actually bounds skew, containment scoring, thresholds.
"""

from __future__ import annotations

from web_scraper_spark.operators.mirrors import mirror_hosts


def _pairs(spark, rows, **kw):
    df = spark.createDataFrame(rows, "host string, fingerprint string")
    out = mirror_hosts(df, **kw).collect()
    return {(r["host_a"], r["host_b"]): r for r in out}


def test_mirror_pair_and_containment(spark):
    rows = [("a", f"f{i}") for i in range(10)]
    rows += [("b", f"f{i}") for i in range(8)]  # b contained in a
    rows += [("c", f"g{i}") for i in range(10)]  # unrelated
    out = _pairs(spark, rows, min_shared=5)
    assert list(out) == [("a", "b")]
    r = out[("a", "b")]
    assert r["shared"] == 8
    # denominator is the SMALLER host's full fp count -> containment = 1
    assert r["overlap"] == 1.0


def test_boilerplate_cap_kills_template_pairs(spark):
    # 10 hosts all serve the same error page: without the cap that is
    # C(10,2)=45 spurious pairs from ONE fingerprint
    rows = [(f"h{i}", "error-template") for i in range(10)]
    rows += [(f"h{i}", f"own{i}_{j}") for i in range(10) for j in range(5)]
    assert _pairs(spark, rows, min_shared=1, max_fp_hosts=8) == {}
    # the same fingerprint on only 2 hosts IS evidence
    rows2 = [("x", "shared"), ("y", "shared")]
    out = _pairs(spark, rows2, min_shared=1, max_fp_hosts=8)
    assert out[("x", "y")]["shared"] == 1


def test_min_shared_threshold_and_dup_rows(spark):
    # duplicate (host, fp) observations collapse before counting
    rows = [("a", "f1")] * 3 + [("b", "f1")] * 2 + [("a", "f2"), ("b", "f2")]
    assert _pairs(spark, rows, min_shared=3) == {}
    out = _pairs(spark, rows, min_shared=2)
    assert out[("a", "b")]["shared"] == 2
