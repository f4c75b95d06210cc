"""Link-graph spam signals: reciprocity and in/out-degree balance.

Link farms and mutual-promotion rings reciprocate a far higher
fraction of their outlinks than organic sites do (reciprocal-link
density is a classic spam feature in the TrustRank / link-farm
literature); crawl schedulers demote hosts whose outlink profile is
dominated by reciprocated edges. This operator computes, per host:

- ``out_degree`` / ``in_degree`` over the DISTINCT host edge set,
- ``n_reciprocal`` — outgoing edges whose reverse edge also exists,
- ``reciprocity`` = n_reciprocal / out_degree (null when no outlinks),
- ``in_out_ratio`` = in_degree / out_degree (null when no outlinks).

Scale shape: reciprocity is detected WITHOUT a self-join — each
distinct edge maps to its unordered pair key ``(least, greatest)`` and
one hash agg counts the directions seen per pair (2 = reciprocal).
The whole operator is therefore three hash aggs + one explode over
reciprocal pairs + a 3-way outer join on host, all edge-table-
proportional (the HOST graph — million-node scale — never the page
corpus). The DuckDB oracle twin computes the same answer by the
independent EXISTS-self-join method, so agreement verifies the
pair-key trick rather than mirroring it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reciprocity_stats(edges: DataFrame) -> DataFrame:
    """Per-host link reciprocity over an edge table with ``src``/``dst``.

    Self-loops are dropped; multi-edges collapse to the distinct edge
    set first (one map-side-combinable agg) so counts are structural,
    not frequency-weighted.
    """
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    pair_dirs = e.select(
        F.least("src", "dst").alias("a"),
        F.greatest("src", "dst").alias("b"),
        (F.col("src") < F.col("dst")).cast("int").alias("fwd"),
    )
    recip_pairs = (
        pair_dirs.groupBy("a", "b")
        .agg(F.countDistinct("fwd").alias("ndir"))
        .filter(F.col("ndir") == 2)
    )
    # a reciprocal pair contributes one reciprocated OUTGOING edge to
    # each endpoint (edges are distinct, so pair count == edge count)
    recip_per_host = (
        recip_pairs.select(F.explode(F.array("a", "b")).alias("host"))
        .groupBy("host")
        .agg(F.count("*").alias("n_reciprocal"))
    )
    out_deg = e.groupBy(F.col("src").alias("host")).agg(
        F.count("*").alias("out_degree")
    )
    in_deg = e.groupBy(F.col("dst").alias("host")).agg(
        F.count("*").alias("in_degree")
    )
    stats = (
        out_deg.join(in_deg, "host", "full_outer")
        .join(recip_per_host, "host", "left")
        .select(
            "host",
            F.coalesce("out_degree", F.lit(0)).cast("long").alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).cast("long").alias("in_degree"),
            F.coalesce("n_reciprocal", F.lit(0)).cast("long").alias("n_reciprocal"),
        )
    )
    return stats.select(
        "host",
        "out_degree",
        "in_degree",
        "n_reciprocal",
        F.when(
            F.col("out_degree") > 0,
            F.round(F.col("n_reciprocal") / F.col("out_degree"), 6),
        ).alias("reciprocity"),
        F.when(
            F.col("out_degree") > 0,
            F.round(F.col("in_degree") / F.col("out_degree"), 6),
        ).alias("in_out_ratio"),
    )
