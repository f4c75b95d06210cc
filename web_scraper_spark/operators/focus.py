"""Focused-crawl frontier scoring (fish-search / shark-search family).

A focused crawler spends its fetch budget on pages *likely to be
on-topic*, scoring each frontier candidate BEFORE fetching from two
pre-fetch signals (De Bra's fish-search, WWW'94; Hersovici et al.'s
shark-search, WWW7 '98; Chakrabarti et al., "Focused crawling", 1999):

- **inherited relevance**: a decayed share of the parent page's topic
  score — children of relevant pages are more likely relevant;
- **anchor relevance**: term overlap between the link's anchor text
  and the topic term set — the link's own description of its target.

    score(child) = gamma * decay * score(parent)
                 + (1 - gamma) * |terms(anchor) ∩ topic| / |topic|

A child discovered from several parents keeps its best score (max),
the standard shark-search aggregation.

The reference scraper has no notion of topical priority — its crawl
order is the config dict's listing order; this operator upgrades the
engine's priority blend (operators/priority.py, linkgraph.host_priority)
with content-aware scheduling.

Spark shapes: the topic term set is a broadcast-sized literal array;
anchor tokenization is ``split`` + ``array_distinct`` +
``array_intersect`` (pure Columns, codegen); scoring is one projection
over the discoveries edge list and ONE hash aggregate (max per child)
— data-proportional, no UDFs, no iteration over the page corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["focus_scores"]


def focus_scores(
    discoveries: DataFrame,
    parent_scores: DataFrame,
    topic_terms: list[str],
    decay: float = 0.5,
    gamma: float = 0.7,
    parent_col: str = "parent_url",
    child_col: str = "url",
    anchor_col: str = "anchor_text",
) -> DataFrame:
    """Score frontier candidates for a focused crawl.

    ``discoveries``: (parent_url, url, anchor_text) outlink records —
    the extraction stage's discovery output with anchors
    (operators/anchors.py). ``parent_scores``: (url, score) relevance
    of already-fetched pages (0..1). Parents missing a score count as
    0 (a seed-relevance prior belongs to the caller).

    Returns (url, focus_score) with one row per distinct child,
    ``focus_score`` the max over its incoming links, rounded to 9 dp
    (cross-engine float parity).
    """
    if not topic_terms:
        raise ValueError("topic_terms must be non-empty")
    topic = F.array(*[F.lit(t.lower()) for t in sorted(set(topic_terms))])
    n_topic = float(len(set(t.lower() for t in topic_terms)))

    anchor_terms = F.array_distinct(
        F.filter(
            F.split(F.lower(F.coalesce(F.col(anchor_col), F.lit(""))), r"\s+"),
            lambda t: t != "",
        )
    )
    anchor_rel = (
        F.size(F.array_intersect(anchor_terms, topic)) / F.lit(n_topic)
    )

    parents = parent_scores.select(
        F.col("url").alias(parent_col), F.col("score").alias("__pscore")
    )
    scored = (
        discoveries.join(parents, parent_col, "left")
        .withColumn(
            "__score",
            F.lit(gamma)
            * F.lit(decay)
            * F.coalesce(F.col("__pscore"), F.lit(0.0))
            + F.lit(1.0 - gamma) * anchor_rel,
        )
    )
    return (
        scored.groupBy(F.col(child_col).alias("url"))
        .agg(F.round(F.max("__score"), 9).alias("focus_score"))
    )
