"""Set-based politeness scheduling (ops R1-R5 + robots R9).

The reference rate-shapes with wall-clock sleeps: 30 s per detail fetch
(nausys_tracker.py:399), 15 s per MMK quote (mmk_tracker.py:319), and a
global 7-per-3600 s batch pause (nausys_tracker.py:431-438). A crawl
round represents ``PolitenessSpec.round_seconds`` of virtual time, so
sleeps become row budgets (see sources/fixtures.PolitenessSpec — single
source of truth shared with the oracle):

- per-host: ``row_number() OVER (PARTITION BY host ORDER BY priority)``
  kept while ≤ host budget. One shuffle by host; hot hosts are bounded
  *by construction* because the budget caps rows per host before any
  further stage — the politeness window is itself the skew-killer for
  downstream fetch/extract (plus AQE skew handling on the joins).
- global: total order by the priority key + ``limit`` — Spark executes
  ordered-limit as TakeOrdered (per-partition top-G then merge), NOT a
  single-partition window, so it scales.

Robots (new in this engine; absent in the reference, which crawls behind
a login): per-host disallow prefixes + crawl-delay live in a small table
broadcast to the join; a disallowed path is split out for permanent
blocking, and crawl_delay feeds the per-host budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.fixtures import PolitenessSpec
from .limits import global_priority_limit
from .priority import PRIORITY_COLS

__all__ = ["split_robots", "select_polite"]

# above this budget, TakeOrdered's driver merge (K partitions x G rows)
# stops being cheap — switch to the distributed range-partitioned limit
DISTRIBUTED_LIMIT_THRESHOLD = 100_000


def split_robots(
    candidates: DataFrame, robots: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """(allowed, blocked). ``robots``: (host, disallow array<string>
    [, allow array<string>], crawl_delay_s). Small table → broadcast
    hash join, no shuffle of the candidate side.

    Matching is full RFC 9309 §2.2.2 via ``robots_txt.
    compile_rule_patterns`` + ``robots_blocked_expr``: ``*`` / trailing
    ``$`` wildcards, Allow vs Disallow longest-match precedence (ties →
    Allow). Patterns compile once on the broadcast side; plain prefix
    rules (the common case, and everything the fixture worlds emit)
    match with ``startswith`` — no regex on the hot path unless a rule
    actually uses a wildcard."""
    from .robots_txt import (
        compile_rule_patterns,
        robots_blocked_expr,
        robots_match_target,
    )

    # RFC 9309 match target = path + '?query' (empty path → '/'), so
    # query-bearing rules ('/*?', '/search?q=') actually fire and
    # 'Disallow: /' blocks the bare root URL
    target = robots_match_target(F.col("url"))
    compiled = compile_rule_patterns(robots).select("host", "rules")
    joined = candidates.join(F.broadcast(compiled), "host", "left").withColumn(
        "__blocked", robots_blocked_expr(target, F.col("rules"))
    )
    allowed = joined.filter(~F.col("__blocked")).drop("__blocked", "rules")
    blocked = joined.filter(F.col("__blocked")).drop("__blocked", "rules")
    return allowed, blocked


def select_polite(
    candidates: DataFrame,
    robots: DataFrame,
    spec: PolitenessSpec,
    cache_handles: list | None = None,
    candidate_upper_bound: int | None = None,
    grain: str = "host",
) -> DataFrame:
    """Politeness-budgeted, priority-ordered selection for one round.

    Output = the reference-equivalent set: per host, the first
    ``host_budget`` rows in priority order; globally, the first
    ``global_budget`` of those in total priority order.

    ``candidate_upper_bound``: a known upper bound on ``candidates``
    rows (e.g. the frontier count, a footer-only parquet statistic).
    When the bound proves the global budget cannot bind, the global
    limit machinery (range partition + persist + count jobs for the
    distributed top-G) is skipped entirely — it would select everything
    anyway.

    ``grain``: the politeness identity. ``"host"`` (default, the
    reference-parity grain) budgets per hostname; ``"domain"`` budgets
    per registrable domain (eTLD+1 via ``functions.domains``), so a
    site fanning out wildcard subdomains — or a crawler trap minting
    hostnames — cannot multiply its share of the round. At domain grain
    the budget is a SINGLE value per registrable domain (derived from
    the max member-host crawl-delay in the robots table), so the
    domain-wide priority rank filters against one number and selection
    stays monotonic in priority. Hosts with no extractable registrable
    domain (IPs, single labels) fall back to their own hostname as the
    group key.
    """
    if grain not in ("host", "domain"):
        raise ValueError(f"unknown politeness grain {grain!r}")

    def budget_from_delay(delay):
        # zero-guard mirrors PolitenessSpec.host_budget's max(1, delay):
        # a 'Crawl-delay: 0' robots line must not divide by zero (ANSI
        # abort) / grant an infinite budget
        return F.greatest(
            F.lit(1),
            (
                F.lit(spec.round_seconds)
                / F.greatest(
                    F.lit(1),
                    F.coalesce(delay, F.lit(spec.default_crawl_delay_s)),
                )
            ).cast("long"),
        )

    if grain == "domain":
        from ..functions.domains import registrable_domain

        # ONE budget per grain key, not per member host: the window rank
        # is domain-wide, so filtering it against each row's per-host
        # budget makes selection non-monotonic in priority (a rank-3 row
        # from a budget-1 host drops while a lower-priority row from a
        # sibling host passes) and can under-fill every host's budget.
        # The grain budget derives from the domain's MAX member
        # crawl-delay in the robots table — the strictest member governs
        # the whole domain; domains with no robots entry fall back to
        # the default delay. Computed on the broadcast-sized robots
        # side, so the candidate side pays no extra shuffle.
        grain_budgets = (
            robots.select(
                F.coalesce(
                    registrable_domain(F.col("host")), F.col("host")
                ).alias("__grain"),
                F.coalesce(
                    F.col("crawl_delay_s"), F.lit(spec.default_crawl_delay_s)
                ).alias("__delay"),
            )
            .groupBy("__grain")
            .agg(budget_from_delay(F.max("__delay")).alias("__budget"))
        )
        default_budget = max(
            1, spec.round_seconds // max(1, spec.default_crawl_delay_s)
        )
        with_delay = (
            candidates.withColumn(
                "__grain",
                F.coalesce(registrable_domain(F.col("host")), F.col("host")),
            )
            .join(F.broadcast(grain_budgets), "__grain", "left")
            .withColumn(
                "__host_budget",
                F.coalesce(F.col("__budget"), F.lit(int(default_budget))),
            )
            .drop("__budget")
        )
        grain_col = "__grain"
    else:
        with_delay = candidates.join(
            F.broadcast(robots.select("host", "crawl_delay_s")), "host", "left"
        ).withColumn("__host_budget", budget_from_delay(F.col("crawl_delay_s")))
        grain_col = "host"
    w_host = Window.partitionBy(grain_col).orderBy(
        *[F.col(c).asc() for c in PRIORITY_COLS]
    )
    # A LITERAL rank cap rides along with the exact per-host (variable)
    # budget filter: only a literal rank predicate triggers Catalyst's
    # InferWindowGroupLimit, which inserts the map-side PARTIAL
    # WindowGroupLimit BEFORE the host shuffle. Without it, a hot host's
    # entire frontier volume shuffles to one reducer; with it, each map
    # task forwards at most ``round_seconds`` rows per host (delay >= 1 s
    # after the zero-guard bounds every host budget by round_seconds).
    # The variable filter then applies the exact budget on the reduced
    # rows. Pinned by tests/test_skew.py.
    rank_cap = max(1, spec.round_seconds)
    per_host = (
        with_delay.withColumn("__rn_host", F.row_number().over(w_host))
        .filter(
            (F.col("__rn_host") <= F.lit(rank_cap))
            & (F.col("__rn_host") <= F.col("__host_budget"))
        )
        .drop("__rn_host", "__host_budget", "crawl_delay_s", "__grain")
    )

    # global budget: TakeOrdered for modest G (distributed top-G, driver
    # merge); range-partitioned exact limit for frontier-scale G; no
    # limit at all when the budget provably exceeds the candidate count
    if (
        candidate_upper_bound is not None
        and candidate_upper_bound <= spec.global_budget
    ):
        return per_host
    if spec.global_budget > DISTRIBUTED_LIMIT_THRESHOLD:
        return global_priority_limit(
            per_host, PRIORITY_COLS, spec.global_budget, cache_handles=cache_handles
        )
    return per_host.orderBy(*[F.col(c).asc() for c in PRIORITY_COLS]).limit(
        spec.global_budget
    )
