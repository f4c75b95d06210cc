"""Crawler-trap detection: URL templatization + per-host expansion
signals.

The reference crawls a fixed, hand-curated URL list, so it can't fall
into traps. A frontier that follows discovered links can: infinite
calendars, session-id paths, and faceted-search grids generate
unbounded *distinct* URLs from a handful of *templates* (the classic
signal — Heydon & Najork's Mercator crawler used exactly this
"URL pattern collapse" family of heuristics). A host whose distinct
paths vastly outnumber its path templates is manufacturing URLs; the
scheduler should cap or quarantine it.

Template = path with digit runs collapsed to ``N`` and long hex runs
(session ids, content hashes) to ``H``, so ``/cal/2026/08/17`` and
``/cal/2026/08/18`` are ONE template ``/cal/N/N/N``.

Plan shape at 10^10 URLs: two hash aggregations — (host, template)
partial counts, then per-host rollup. Distinct-path counting rides the
first aggregation (paths are disjoint across templates by
construction, so the per-template distincts SUM to the host total —
no second distinct pass over the corpus). Pure Columns, RE2-safe
patterns (portable to the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["url_template", "trap_signals"]

# hex first (a hex run contains digit runs), then digits
_HEX_RUN = "[0-9a-f]{8,}"
_DIGIT_RUN = "[0-9]+"


def url_template(path: F.Column) -> F.Column:
    """Collapse volatile path components: long hex runs -> ``H``,
    digit runs -> ``N``."""
    return F.regexp_replace(
        F.regexp_replace(path, _HEX_RUN, "H"), _DIGIT_RUN, "N"
    )


def trap_signals(
    urls: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
    expansion_threshold: float = 50.0,
) -> DataFrame:
    """Per-host URL-manufacturing signals over ``(host, path)`` rows.

    Returns::

        (host, n_urls, n_paths, n_templates, max_template_paths,
         expansion, trap)

    ``expansion`` = distinct paths per template; ``trap`` flags hosts
    whose ratio exceeds ``expansion_threshold``. The paths of a
    template are a partition of the host's paths, so per-template
    distinct counts sum exactly to the host's distinct-path count.
    """
    per_template = (
        urls.select(
            F.col(host_col).alias("host"),
            F.col(path_col).alias("path"),
            url_template(F.col(path_col)).alias("template"),
        )
        .groupBy("host", "template")
        .agg(
            F.count("*").cast("long").alias("n_urls"),
            F.countDistinct("path").alias("n_paths"),
        )
    )
    agg = per_template.groupBy("host").agg(
        F.sum("n_urls").cast("long").alias("n_urls"),
        F.sum("n_paths").cast("long").alias("n_paths"),
        F.count("*").cast("long").alias("n_templates"),
        F.max("n_paths").cast("long").alias("max_template_paths"),
    )
    expansion = F.round(
        F.col("n_paths") / F.col("n_templates").cast("double"), 6
    )
    return agg.select(
        "host",
        "n_urls",
        "n_paths",
        "n_templates",
        "max_template_paths",
        expansion.alias("expansion"),
        (expansion >= F.lit(expansion_threshold)).alias("trap"),
    )
