"""Host-graph prioritization: PageRank invariants on hand-checkable
graphs, dangling-mass redistribution, and the feedback blend."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from web_scraper_spark.operators.linkgraph import (
    host_edges,
    host_priority,
    host_stats,
    pagerank,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, weight long")


def test_pagerank_sums_to_one_and_ranks_hub(spark):
    # a, b, c all link to hub; hub links back to a only
    e = _edges(
        spark,
        [("a", "hub", 1), ("b", "hub", 1), ("c", "hub", 1), ("hub", "a", 1)],
    )
    # hub->a returns ALL mass, so ranks carry a period-2 component
    # decaying at d^2 per step — iterate far enough to converge
    out = {r["node"]: r["rank"] for r in pagerank(e, n_iter=40).collect()}
    assert math.isclose(sum(out.values()), 1.0, rel_tol=1e-9)
    assert out["hub"] == max(out.values())
    assert out["a"] > out["b"] == out["c"]


def test_pagerank_dangling_mass_redistributed(spark):
    # d has no out-edges: its rank must leak back uniformly, not vanish
    e = _edges(spark, [("a", "d", 1), ("b", "d", 1), ("c", "d", 1)])
    out = {r["node"]: r["rank"] for r in pagerank(e, n_iter=5).collect()}
    assert math.isclose(sum(out.values()), 1.0, rel_tol=1e-9)
    assert out["d"] == max(out.values())


def test_pagerank_weights_matter(spark):
    # u splits 3:1 between x and y
    e = _edges(spark, [("u", "x", 3), ("u", "y", 1)])
    out = {r["node"]: r["rank"] for r in pagerank(e, n_iter=1).collect()}
    n = 3
    # uniform part = teleport + redistributed dangling mass (x and y
    # have no out-edges, each holding rank 1/3 at iteration start)
    base = (1 - 0.85) / n + 0.85 * (2 / 3) / n
    assert math.isclose(out["x"] - base, 3 * (out["y"] - base), rel_tol=1e-9)


def test_host_edges_drops_self_links_and_aggregates(spark):
    ext = spark.createDataFrame(
        [
            ("a.com", ["https://b.com/1", "https://b.com/2", "https://a.com/x"]),
            ("a.com", ["https://b.com/3"]),
        ],
        "host string, outlinks array<string>",
    )
    rows = {(r["src"], r["dst"]): r["weight"] for r in host_edges(ext).collect()}
    assert rows == {("a.com", "b.com"): 3}


def test_host_priority_neutral_priors(spark):
    ranks = spark.createDataFrame(
        [("a", 0.6), ("b", 0.3)], "node string, rank double"
    )
    stats = host_stats(
        spark.createDataFrame(
            [("a", "success"), ("a", "error"), ("c", "success")],
            "host string, status string",
        )
    )
    out = {r["host"]: r for r in host_priority(ranks, stats).collect()}
    # never-fetched host keeps the 0.5 prior; ungraphed host gets rank 0
    assert out["b"]["success_rate"] == 0.5
    assert out["c"]["rank"] == 0.0
    # a: full rank share + 0.5 success; priority = .7*1 + .3*.5
    assert math.isclose(out["a"]["priority"], 0.85, abs_tol=1e-6)
    assert out["a"]["priority"] > out["b"]["priority"]


def test_adaptive_crawl_delay_backoff_tiers(spark):
    from web_scraper_spark.operators.linkgraph import adaptive_crawl_delay

    # error rates 0.0, 0.1, 0.25, 0.5, 1.0 → doublings 0,1,2,4(cap),4
    log = []
    for host, n_err in (("h0", 0), ("h1", 1), ("h2", 2), ("h3", 5), ("h4", 8)):
        log += [(host, "error")] * n_err + [(host, "success")] * (8 - n_err)
    stats = host_stats(
        spark.createDataFrame(log, "host string, status string")
    )
    out = {r.host: r.crawl_delay_s for r in adaptive_crawl_delay(stats).collect()}
    assert out == {"h0": 30, "h1": 60, "h2": 120, "h3": 480, "h4": 480}


def test_adaptive_delay_shrinks_polite_budget(spark):
    """The backoff composes with select_polite: a doubled delay halves
    the per-round host budget."""
    from web_scraper_spark.operators.linkgraph import adaptive_crawl_delay
    from web_scraper_spark.operators.politeness import select_polite
    from web_scraper_spark.sources.fixtures import PolitenessSpec

    stats = host_stats(
        spark.createDataFrame(
            [("slow", "error")] * 4 + [("slow", "success")] * 4
            + [("fast", "success")] * 8,
            "host string, status string",
        )
    )
    robots = adaptive_crawl_delay(stats, base_delay_s=30).select(
        "host", "crawl_delay_s"
    )
    cand = spark.createDataFrame(
        [(h, f"https://{h}/{i}", i) for h in ("slow", "fast") for i in range(100)],
        "host string, url string, seed_rank int",
    ).selectExpr(
        "host", "url", "seed_rank", "0 as depth", "0 as discovery_round",
        "0 as yacht_rank", "0 as period_idx",
    )
    spec = PolitenessSpec(round_seconds=600, global_batch_urls=10_000,
                          global_pause_s=3600)
    picked = select_polite(cand, robots, spec).groupBy("host").count()
    out = {r.host: r["count"] for r in picked.collect()}
    # fast: 600/30 = 20; slow at 0.5 error rate → 4 doublings? no:
    # floor(0.5/0.1)=5 capped at 4 → 30*16=480 → budget max(1, 600/480)=1
    assert out == {"fast": 20, "slow": 1}


def test_trustrank_seeds_hold_trust_spam_farm_gets_none(spark):
    """Gyöngyi et al. VLDB'04 core property: a spam cluster that is
    unreachable from the trusted core gets (near-)zero trust no matter
    how much in-degree it manufactures among itself."""
    from web_scraper_spark.operators.linkgraph import trustrank

    e = _edges(
        spark,
        [
            # good core: seed g links to a, a to b
            ("g", "a", 1), ("a", "b", 1), ("b", "g", 1),
            # spam farm: s1/s2 link to each other AND to the spam target
            ("s1", "spam", 5), ("s2", "spam", 5),
            ("spam", "s1", 1), ("spam", "s2", 1),
        ],
    )
    out = {r["node"]: r["trust"] for r in trustrank(e, ["g"], n_iter=20).collect()}
    assert math.isclose(sum(out.values()), 1.0, rel_tol=1e-9)
    # the whole spam component is unreachable from g → zero trust
    assert out["spam"] == out["s1"] == out["s2"] == 0.0
    assert out["g"] > 0 and out["a"] > 0 and out["b"] > 0


def test_trustrank_requires_a_seed_in_graph(spark):
    import pytest
    from web_scraper_spark.operators.linkgraph import trustrank

    e = _edges(spark, [("a", "b", 1)])
    with pytest.raises(ValueError):
        trustrank(e, ["nope"], n_iter=1)


def test_spam_mass_separates_farm_from_core(spark):
    """Mass estimation (VLDB'06): relative spam mass ≈ 1 for nodes whose
    PageRank is all self-manufactured, ≤ 0 for the trusted core."""
    from web_scraper_spark.operators.linkgraph import spam_mass, trustrank

    e = _edges(
        spark,
        [
            ("g", "a", 1), ("a", "g", 1),
            ("s1", "spam", 5), ("s2", "spam", 5),
            ("spam", "s1", 1), ("spam", "s2", 1),
        ],
    )
    pr = pagerank(e, n_iter=20)
    tr = trustrank(e, ["g"], n_iter=20)
    out = {r["node"]: r["spam_mass"] for r in spam_mass(pr, tr).collect()}
    assert out["spam"] == 1.0  # all rank unexplained by trust
    # seeds hold concentrated trust >> their pagerank share
    assert out["g"] < 0


def test_opic_conserves_cash_and_ranks_by_inflow(spark):
    """OPIC invariants: importance sums to 1 at any horizon (the paper's
    unbiased-at-any-stopping-point property), and the node every walk
    funnels into dominates."""
    from web_scraper_spark.operators.linkgraph import opic

    e = _edges(
        spark,
        [("a", "hub", 1), ("b", "hub", 1), ("c", "hub", 1), ("hub", "a", 1)],
    )
    for horizon in (1, 3, 10):
        out = {
            r["node"]: r["importance"] for r in opic(e, n_iter=horizon).collect()
        }
        assert math.isclose(sum(out.values()), 1.0, rel_tol=1e-9), horizon
    assert out["hub"] == max(out.values())
    assert out["a"] > out["b"] == out["c"]


def test_opic_dangling_cash_respread(spark):
    """A sink node banks its cash but the cash re-enters circulation
    uniformly — nothing leaks (total importance stays 1)."""
    from web_scraper_spark.operators.linkgraph import opic

    e = _edges(spark, [("a", "d", 1), ("b", "d", 1), ("c", "d", 1)])
    out = {r["node"]: r["importance"] for r in opic(e, n_iter=6).collect()}
    assert math.isclose(sum(out.values()), 1.0, rel_tol=1e-9)
    assert out["d"] == max(out.values())
