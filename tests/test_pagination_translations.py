"""Pagination chains (operators/pagination.py) and hreflang clusters
(operators/translations.py).

The battery rows (`pagination_chains`, `hreflang_clusters`) pin both
end-to-end pipelines against closed-form DuckDB oracles at corpus
scale; here: adversarial graph shapes — cycles, branching, dangling
targets, one-directional declarations, singletons.
"""

from __future__ import annotations

from pyspark.sql import Row

from web_scraper_spark.operators.pagination import pagination_chains
from web_scraper_spark.operators.translations import hreflang_clusters


def _chains(spark, pairs):
    df = spark.createDataFrame(pairs, "url string, next_href string")
    return {r["url"]: r for r in pagination_chains(df).collect()}


def test_linear_chain_and_singleton(spark):
    rows = _chains(
        spark,
        [("a1", "a2"), ("a2", "a3"), ("a3", None), ("solo", None)],
    )
    assert (rows["a1"]["chain_head"], rows["a1"]["position"]) == ("a1", 0)
    assert (rows["a3"]["chain_head"], rows["a3"]["position"]) == ("a1", 2)
    assert all(rows[u]["chain_len"] == 3 for u in ("a1", "a2", "a3"))
    assert rows["solo"]["chain_head"] == "solo" and rows["solo"]["chain_len"] == 1


def test_cycle_flags_loop(spark):
    rows = _chains(spark, [("c1", "c2"), ("c2", "c1")])
    assert all(r["is_loop"] for r in rows.values())
    assert all(r["chain_head"] is None for r in rows.values())


def test_branching_resolves_to_min_pred(spark):
    # two pages declare next=mid: the lexicographically-smaller wins,
    # the chain stays linear instead of double-counting
    rows = _chains(spark, [("b1", "mid"), ("b2", "mid"), ("mid", None)])
    assert rows["mid"]["chain_head"] == "b1" and rows["mid"]["position"] == 1
    # the losing branch is its own head
    assert rows["b2"]["chain_head"] == "b2" and rows["b2"]["position"] == 0


def test_dangling_next_no_phantom(spark):
    rows = _chains(spark, [("d1", "not-crawled")])
    assert list(rows) == ["d1"]
    assert rows["d1"]["chain_len"] == 1


def _meta(spark, decls):
    rows = [
        Row(url=u, hreflang=[Row(lang=lg, href=h) for lg, h in alts])
        for u, alts in decls
    ]
    df = spark.createDataFrame(
        rows,
        "url string, hreflang array<struct<lang:string,href:string>>",
    )
    return {r["url"]: r for r in hreflang_clusters(df).collect()}


def test_transitive_one_directional_closure(spark):
    # fr declares only en; en declares everyone; tr declares nothing
    # (it is pulled in as a TARGET) — closure must still be one cluster
    out = _meta(
        spark,
        [
            ("en", [("fr", "fr"), ("tr", "tr"), ("de", "de")]),
            ("fr", [("en", "en")]),
            ("de", [("en", "en")]),
        ],
    )
    assert set(out) == {"en", "fr", "de", "tr"}
    assert all(r["cluster"] == "de" and r["cluster_size"] == 4 for r in out.values())


def test_disjoint_clusters_and_absence(spark):
    out = _meta(
        spark,
        [
            ("a-en", [("tr", "a-tr")]),
            ("b-en", [("tr", "b-tr")]),
            ("loner", []),  # no alternates -> no row
        ],
    )
    assert "loner" not in out
    assert out["a-tr"]["cluster"] == "a-en" and out["a-tr"]["cluster_size"] == 2
    assert out["b-en"]["cluster"] == "b-en" and out["b-en"]["cluster_size"] == 2
