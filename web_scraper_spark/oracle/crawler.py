"""Sequential reference-oracle crawler (pure Python, virtual clock).

Re-states the reference's crawl-loop semantics (nausys_tracker.py:340-441:
triple loop + dedup + retry + budgets; mmk_tracker.py:112-342) as an
explicit round state machine. The distributed engine
(``web_scraper_spark.plans.rounds``) must produce EXACTLY this:

- the same URL-seen membership set,
- the same per-host fetch order (global interleaving may differ — the
  reference is sequential, the engine is parallel; the north rule pins
  per-host order only),
- byte-identical extracted text per url,
- the same frontier states / attempts / fetch-log statuses.

Round semantics (shared spec — keep in sync with plans/rounds.py):

1. candidates = frontier rows with state='pending' and not_before<=round.
2. robots: path matching a disallow prefix → state='robots_blocked',
   logged once with status='robots'.
3. per-host politeness: within a host order by PRIORITY KEY
   (depth, discovery_round, seed_rank, yacht_rank, period_idx, url);
   keep the first host_budget(crawl_delay).
4. global budget: order survivors by the same key; keep first
   global_budget.
5. fetch (lookup in pages-by-canonical-url):
   - missing page  → status='error' (max_request_number_reached),
     attempts+=1, not_before=round+backoff; attempts>=3 → state='failed'
     (nausys_tracker.py:216-321 timeout/retry semantics).
   - error page    → status='empty', state='fetched', url enters seen —
     mirrors `if not resp.ok: return None` (nausys_tracker.py:265-267).
   - good page     → extract 16 fields + text, status='success',
     state='fetched', url enters seen; outlinks are canonicalized and
     queued as discoveries.
6. discoveries merge into the frontier at END of round (depth+1,
   discovery_round=round) — batch-barrier semantics matching the
   engine's dataflow; duplicates vs frontier∪seen are dropped.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from ..sources.fixtures import (
    FIELDS,
    PolitenessSpec,
    World,
    extract_fields_py,
    extract_outlinks_py,
    extract_text_py,
)
from .pyurl import canonicalize_url_py

__all__ = ["OracleCrawler", "FrontierEntry", "priority_key"]

ERROR_MARKER = "<!--STATUS:500-->"
DISCOVERED_SEED_RANK = 999
DISCOVERED_YACHT_RANK = 9999
DISCOVERED_PERIOD_IDX = 9999


@dataclass
class FrontierEntry:
    url: str  # canonical
    host: str
    depth: int
    discovery_round: int
    seed_rank: int
    yacht_rank: int
    period_idx: int
    competitor: str = ""
    yacht_id: str = ""
    period_from: str = ""
    period_to: str = ""
    state: str = "pending"
    attempts: int = 0
    not_before: int = 0


def priority_key(e: FrontierEntry) -> tuple:
    return (e.depth, e.discovery_round, e.seed_rank, e.yacht_rank, e.period_idx, e.url)


@dataclass
class OracleCrawler:
    world: World
    spec: PolitenessSpec = dc_field(default_factory=PolitenessSpec)

    def __post_init__(self):
        self.frontier: dict[str, FrontierEntry] = {}
        self.seen: set[str] = set()
        self.fetch_log: list[dict] = []
        self.extractions: dict[str, dict] = {}  # url -> {text, fields, ...}
        self.order_per_host: dict[str, list[str]] = {}
        self.pages_by_canon: dict[str, dict] = {}
        for p in self.world.pages:
            canon = canonicalize_url_py(p["url"])
            # latest warc_ts wins (J5 latest-row semantics); ties broken
            # by raw url desc — the same total order resolve_pages uses,
            # so engine and oracle pick the same page even when two raw
            # URLs share a canonical form and a timestamp
            prev = self.pages_by_canon.get(canon)
            if prev is None or (p["warc_ts"], p["url"]) >= (prev["warc_ts"], prev["url"]):
                self.pages_by_canon[canon] = p
        self.robots_by_host = {r["host"]: r for r in self.world.robots}
        self.seed_rank_by_host = {s["host"]: s["seed_rank"] for s in self.world.seeds}
        self._init_frontier()

    def _init_frontier(self) -> None:
        for t in self.world.tasks:
            canon = canonicalize_url_py(t["url"])
            self.frontier[canon] = FrontierEntry(
                url=canon,
                host=t["host"],
                depth=0,
                discovery_round=0,
                seed_rank=t["seed_rank"],
                yacht_rank=t["yacht_rank"],
                period_idx=t["period_idx"],
                competitor=t["competitor"],
                yacht_id=t["yacht_id"],
                period_from=t["period_from"],
                period_to=t["period_to"],
            )

    # -- helpers -----------------------------------------------------------
    def _crawl_delay(self, host: str) -> int:
        r = self.robots_by_host.get(host)
        return r["crawl_delay_s"] if r else self.spec.default_crawl_delay_s

    def _robots_blocked(self, e: FrontierEntry) -> bool:
        r = self.robots_by_host.get(e.host)
        if not r:
            return False
        # RFC 9309 match target: path + '?query' (same as the engine's
        # robots_match_target) — query-bearing rules must fire here too
        from .pyrobots import match_target

        return any(match_target(e.url).startswith(p) for p in r["disallow"])

    # -- one round ---------------------------------------------------------
    def run_round(self, round_id: int) -> dict:
        candidates = [
            e
            for e in self.frontier.values()
            if e.state == "pending" and e.not_before <= round_id
        ]

        # robots gate
        allowed: list[FrontierEntry] = []
        for e in sorted(candidates, key=priority_key):
            if self._robots_blocked(e):
                e.state = "robots_blocked"
                self.fetch_log.append(
                    {"round_id": round_id, "url": e.url, "host": e.host,
                     "status": "robots", "error": "disallowed"}
                )
            else:
                allowed.append(e)

        # per-host budget
        selected: list[FrontierEntry] = []
        by_host: dict[str, list[FrontierEntry]] = {}
        for e in allowed:
            by_host.setdefault(e.host, []).append(e)
        for host, entries in by_host.items():
            budget = self.spec.host_budget(self._crawl_delay(host))
            selected.extend(entries[:budget])  # already priority-sorted

        # global budget
        selected.sort(key=priority_key)
        selected = selected[: self.spec.global_budget]

        # fetch + extract
        discoveries: dict[str, FrontierEntry] = {}
        n_success = n_empty = n_error = 0
        for e in selected:
            self.order_per_host.setdefault(e.host, []).append(e.url)
            page = self.pages_by_canon.get(e.url)
            if page is None:
                e.attempts += 1
                if e.attempts >= self.spec.retry_max_attempts:
                    e.state = "failed"
                else:
                    e.not_before = round_id + self.spec.retry_backoff_rounds
                self.fetch_log.append(
                    {"round_id": round_id, "url": e.url, "host": e.host,
                     "status": "error", "error": "max_request_number_reached"}
                )
                n_error += 1
                continue
            html = page["html"].decode("utf-8")
            if html.startswith(ERROR_MARKER):
                e.state = "fetched"
                self.seen.add(e.url)
                self.fetch_log.append(
                    {"round_id": round_id, "url": e.url, "host": e.host,
                     "status": "empty", "error": None}
                )
                n_empty += 1
                continue
            fields = extract_fields_py(html)
            text = extract_text_py(html)
            self.extractions[e.url] = {
                "url": e.url,
                "competitor": e.competitor,
                "yacht_id": e.yacht_id,
                "period_from": e.period_from,
                "period_to": e.period_to,
                "round_id": round_id,
                "text": text,
                "fields": fields,
            }
            e.state = "fetched"
            self.seen.add(e.url)
            self.fetch_log.append(
                {"round_id": round_id, "url": e.url, "host": e.host,
                 "status": "success", "error": None}
            )
            n_success += 1
            for link in extract_outlinks_py(html):
                canon = canonicalize_url_py(link)
                if canon is None or canon in self.frontier or canon in self.seen:
                    continue
                if canon in discoveries:
                    continue
                host = canon.split("://", 1)[1].split("/", 1)[0].split(":")[0]
                discoveries[canon] = FrontierEntry(
                    url=canon,
                    host=host,
                    depth=e.depth + 1,
                    discovery_round=round_id,
                    seed_rank=self.seed_rank_by_host.get(host, DISCOVERED_SEED_RANK),
                    yacht_rank=DISCOVERED_YACHT_RANK,
                    period_idx=DISCOVERED_PERIOD_IDX,
                    competitor="",
                    yacht_id="",
                )

        # end-of-round discovery merge
        for canon, entry in discoveries.items():
            self.frontier[canon] = entry

        return {
            "round_id": round_id,
            "selected": len(selected),
            "success": n_success,
            "empty": n_empty,
            "error": n_error,
            "discovered": len(discoveries),
        }

    def run(self, n_rounds: int) -> list[dict]:
        return [self.run_round(r) for r in range(1, n_rounds + 1)]
