"""Mirror-host detection: host pairs serving the same content.

Mirrors (the same site under several hostnames: CDNs, country TLDs,
scraper re-hosts) waste crawl budget and poison dedup statistics at the
HOST grain rather than the page grain — detecting them lets the
scheduler collapse whole hosts instead of rediscovering every page-level
duplicate. The classic formulation is Bharat & Broder, "Mirror, mirror
on the Web" (WWW'99): score host pairs by shared content fingerprints
over host size.

Distributed shape (the part that must survive 100 TB):

1. ``(fingerprint, host)`` distinct — one hash-agg shuffle.
2. **Boilerplate cap**: fingerprints on more than ``max_fp_hosts``
   hosts are shared *templates* (error pages, parked-domain chrome),
   not mirror evidence — and they are exactly the skew bombs that make
   a naive fingerprint self-join quadratic. Dropping them bounds every
   per-fingerprint group, so the pair join emits at most
   C(max_fp_hosts, 2) rows per fingerprint. Never all-pairs.
3. Self-join per fingerprint with ``host_a < host_b`` → pair counts.
4. Overlap = shared / min(|fps(a)|, |fps(b)|), sizes measured on the
   UNFILTERED per-host fingerprint sets so boilerplate-heavy hosts are
   not flattered by the cap.

Cross-check: the battery oracle recomputes pairs by an independent SQL
self-join over the same construction, so a bound, dedup, or denominator
bug breaks the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["mirror_hosts"]


def mirror_hosts(
    docs: DataFrame,
    host_col: str = "host",
    fp_col: str = "fingerprint",
    min_shared: int = 5,
    max_fp_hosts: int = 8,
) -> DataFrame:
    """Host pairs ``(host_a, host_b, shared, overlap)`` with at least
    ``min_shared`` common fingerprints, ``host_a < host_b``.

    ``shared`` counts fingerprints below the boilerplate cap present on
    both hosts; ``overlap`` divides by the smaller host's full distinct
    fingerprint count (1.0 = the smaller host is entirely contained in
    the larger). Output is small (suspect pairs), so downstream can
    afford exact per-pair verification.
    """
    fh = docs.select(
        F.col(fp_col).alias("fp"), F.col(host_col).alias("host")
    ).distinct()
    sizes = fh.groupBy("host").agg(F.count("*").alias("n_fps"))
    fp_hosts = fh.groupBy("fp").agg(F.count("*").alias("nh"))
    usable = fp_hosts.filter((F.col("nh") >= 2) & (F.col("nh") <= max_fp_hosts))
    fh2 = fh.join(usable.select("fp"), "fp", "left_semi")
    a, b = fh2.alias("a"), fh2.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp")) & (F.col("a.host") < F.col("b.host")),
        )
        .groupBy(
            F.col("a.host").alias("host_a"), F.col("b.host").alias("host_b")
        )
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    return (
        pairs.join(sizes.withColumnRenamed("host", "host_a"), "host_a")
        .withColumnRenamed("n_fps", "n_a")
        .join(sizes.withColumnRenamed("host", "host_b"), "host_b")
        .withColumnRenamed("n_fps", "n_b")
        .select(
            "host_a",
            "host_b",
            "shared",
            F.round(F.col("shared") / F.least("n_a", "n_b"), 4).alias("overlap"),
        )
    )
