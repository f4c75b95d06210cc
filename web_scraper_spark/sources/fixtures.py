"""Deterministic synthetic crawl world (seed=42) — FIXTURES.md made real.

Spark-free on purpose: the pure-Python oracle and the pytest suite build
the same world without a JVM; Spark materialization happens in
``pages_source.load_*``. Everything is a pure function of ``FixtureConfig``
so the engine and the oracle agree on every byte.

Mirrors of reference behavior (citations into /root/reference/):
- competitor/yacht seed skew: src/infra/config/config.py:1-147 (16
  competitors, 33 yachts, counts 1..7 — miber_sailing has 7).
- weekly periods: nausys_tracker.py:323-338 (``generate_weekly_dates``,
  17:00 → +7d 08:00).
- 16-field extraction schema: nausys_tracker.py:269-286 (XPath ids).
- European currency strings: mmk_tracker.py:31-39 (``format_currency``).
- politeness budgets: nausys_tracker.py:399 (30 s), mmk_tracker.py:319
  (15 s), nausys_tracker.py:431-438 (7 per 3600 s global batch).
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta

__all__ = [
    "FIELDS",
    "FixtureConfig",
    "PolitenessSpec",
    "format_currency",
    "generate_weekly_dates",
    "build_world",
    "render_page",
    "extract_fields_py",
    "extract_text_py",
    "extract_outlinks_py",
]

# The 16 extraction fields, in reference declaration order
# (nausys_tracker.py:269-286). Order matters: the golden `text` is the
# field lines joined in THIS order.
FIELDS = [
    "discount_name",
    "yacht_name",
    "company_name",
    "port_from",
    "port_to",
    "deposit",
    "discount_percent",
    "list_price",
    "discount",
    "total_price",
    "commission_percent",
    "commission",
    "client_price",
    "agency_price",
    "agency_income",
    "total_advanced_payment",
]

PORTS = ["Fethiye", "Gocek", "Marmaris", "Bodrum", "Orhaniye", "Kas", "Kemer"]

# Yacht-count skew mirroring config.py:1-147 (sum = 33).
YACHT_COUNTS = [5, 2, 1, 1, 1, 4, 1, 1, 1, 7, 1, 2, 1, 2, 2, 1]


def format_currency(value: float) -> str:
    """European currency string — verbatim reference semantics
    (mmk_tracker.py:31-39: US-format then swap ',' and '.' via 'X')."""
    try:
        s = "{:,.2f}".format(value)
    except Exception:
        s = "0.00"
    return s.replace(",", "X").replace(".", ",").replace("X", ".")


def generate_weekly_dates(
    start_date_str: str = "2025-04-12", end_date_str: str = "2025-10-25"
) -> list[tuple[str, str]]:
    """Weekly (period_from 17:00, period_to +7d 08:00) pairs — verbatim
    reference semantics (nausys_tracker.py:323-338)."""
    start_date = datetime.strptime(start_date_str, "%Y-%m-%d")
    end_date = datetime.strptime(end_date_str, "%Y-%m-%d")
    pairs = []
    current = start_date
    while current < end_date:
        p_from = f"{current.strftime('%Y-%m-%d')} 17:00:00"
        p_to = f"{(current + timedelta(days=7)).strftime('%Y-%m-%d')} 08:00:00"
        pairs.append((p_from, p_to))
        current += timedelta(days=7)
    return pairs


@dataclass(frozen=True)
class PolitenessSpec:
    """Budget parameters; single source of truth for oracle AND engine.

    The reference spends wall-clock (sleep 30 s / 15 s per fetch,
    7-yacht batches with 3600 s pauses). A crawl *round* represents
    ``round_seconds`` of virtual time, so:

    - per-host budget  = max(1, round_seconds // crawl_delay_s(host))
    - global budget    = global_batch_urls * max(1, round_seconds // global_pause_s)

    ``global_batch_urls`` is the reference's 7-yachts-per-hour expressed
    in URL units (7 yachts x 28 periods by default).
    """

    round_seconds: int = 3600
    global_batch_urls: int = 7 * 28
    global_pause_s: int = 3600
    # crawl delay per host comes from the robots fixture; these are the
    # two reference-derived classes used when robots has no entry:
    default_crawl_delay_s: int = 30
    retry_max_attempts: int = 3  # nausys_tracker.py:222-224
    retry_backoff_rounds: int = 1  # 3600 s sleep ≈ one round later

    def host_budget(self, crawl_delay_s: int) -> int:
        return max(1, self.round_seconds // max(1, crawl_delay_s))

    @property
    def global_budget(self) -> int:
        return self.global_batch_urls * max(1, self.round_seconds // self.global_pause_s)


@dataclass(frozen=True)
class FixtureConfig:
    seed: int = 42
    n_competitors: int = 16
    yacht_counts: tuple[int, ...] = tuple(YACHT_COUNTS)
    period_start: str = "2025-04-12"
    period_end: str = "2025-10-25"
    # crawl-delay class per host: even competitor rank → 30 s
    # (nausys-class), odd → 15 s (mmk-class).
    dirty_url_fraction: float = 0.35
    missing_page_fraction: float = 0.04  # timeout/retry path
    error_page_fraction: float = 0.03  # http-error path
    discovered_yachts_per_comp: int = 1  # depth-1 discoveries via outlinks
    politeness: PolitenessSpec = field(default_factory=PolitenessSpec)

    def scaled(self, n_competitors: int, yachts_each: int) -> "FixtureConfig":
        return FixtureConfig(
            seed=self.seed,
            n_competitors=n_competitors,
            yacht_counts=tuple([yachts_each] * n_competitors),
            period_start=self.period_start,
            period_end=self.period_end,
            dirty_url_fraction=self.dirty_url_fraction,
            missing_page_fraction=self.missing_page_fraction,
            error_page_fraction=self.error_page_fraction,
            discovered_yachts_per_comp=self.discovered_yachts_per_comp,
            politeness=self.politeness,
        )


# --------------------------------------------------------------------------
# world construction
# --------------------------------------------------------------------------


def _mk_url(host: str, yacht_id: str, p_from: str, p_to: str) -> str:
    """Clean task URL. Query params intentionally in non-sorted order so
    canonicalization has work to do."""
    d_from = p_from.split(" ")[0]
    d_to = p_to.split(" ")[0]
    return f"https://{host}/yacht/{yacht_id}/period/{d_from}?period_to={d_to}&period_from={d_from}"


def _dirty_variant(url: str, rng: random.Random) -> str:
    """A messy-but-equivalent form of ``url`` (uppercase host, :443,
    fragment, reversed params) — canonicalizes to the same identity."""
    scheme, rest = url.split("://", 1)
    host, tail = rest.split("/", 1)
    choice = rng.randrange(4)
    if choice == 0:
        host = host.upper()
    elif choice == 1:
        host = host + ":443"
    elif choice == 2:
        url = f"{scheme}://{host}/{tail}#sec{rng.randrange(10)}"
        return url
    else:
        if "?" in tail:
            path, q = tail.split("?", 1)
            tail = path + "?" + "&".join(reversed(q.split("&")))
    return f"{scheme}://{host}/{tail}"


def render_page(fields: dict[str, str | None], outlinks: list[str], title: str) -> str:
    """Deterministic synthetic reservation-dialog page.

    Span ids mirror the reference's JSF component ids
    (nausys_tracker.py:269-286) so the extraction schema is honest; a
    missing field renders no span (→ extractor yields None, like the
    reference's empty-XPath branch at nausys_tracker.py:293-295).
    """
    rows = []
    for k in FIELDS:
        v = fields.get(k)
        if v is None:
            continue
        rows.append(
            f'<tr><td class="label">{k}</td>'
            f'<td><span id="yachtReservationDialogForm:tabView:{k}">{v}</span></td></tr>'
        )
    links = "\n".join(f'<a href="{u}">{i}</a>' for i, u in enumerate(outlinks))
    return (
        "<html><head><title>" + title + "</title></head><body>\n"
        '<div id="yachtReservationDialogForm"><table><tbody>\n'
        + "\n".join(rows)
        + "\n</tbody></table></div>\n"
        + '<div class="outlinks">\n' + links + "\n</div>\n"
        "</body></html>"
    )


import re as _re

_SPAN_RE = _re.compile(
    r'<span id="yachtReservationDialogForm:tabView:([a-z_]+)">(.*?)</span>', _re.S
)
_HREF_RE = _re.compile(r'<a href="([^"]+)"')
_TAG_RE = _re.compile(r"<[^>]*>")
_WS_RE = _re.compile(r"\s+")


def extract_fields_py(html: str) -> dict[str, str | None]:
    """Reference-extractor twin: per-field text content, stripped
    (nausys_tracker.py:288-296 semantics); missing element → None."""
    found = {k: v.strip() for k, v in _SPAN_RE.findall(html)}
    return {k: found.get(k) for k in FIELDS}


def extract_text_py(html: str) -> str:
    """Golden text: full-page visible text — every tag stripped,
    whitespace collapsed to single spaces, trimmed. This is the
    Common-Crawl-style `pages.text` semantics (the whole document's
    text content, reference `text_content()` applied page-wide) and
    the byte-identical parity target."""
    return _WS_RE.sub(" ", _TAG_RE.sub(" ", html)).strip()


def extract_outlinks_py(html: str) -> list[str]:
    return _HREF_RE.findall(html)


@dataclass
class World:
    """The full synthetic crawl universe."""

    config: FixtureConfig
    seeds: list[dict]  # competitor registry rows
    robots: list[dict]  # per-host robots rules
    tasks: list[dict]  # seed-expanded task URLs (depth 0)
    pages: list[dict]  # the `pages` table incl. discovered + blocked pages
    periods: list[tuple[str, str]]


def build_world(config: FixtureConfig | None = None) -> World:
    cfg = config or FixtureConfig()
    rng = random.Random(cfg.seed)
    periods = generate_weekly_dates(cfg.period_start, cfg.period_end)

    seeds: list[dict] = []
    robots: list[dict] = []
    tasks: list[dict] = []
    pages: list[dict] = []
    page_urls: set[str] = set()

    epoch = datetime(2025, 4, 1, 0, 0, 0)
    row_idx = 0

    for rank in range(cfg.n_competitors):
        comp = f"comp{rank:02d}"
        host = f"charter{rank:02d}.example.com"
        n_yachts = cfg.yacht_counts[rank % len(cfg.yacht_counts)]
        # zero-padded index: lexicographic name order == insertion order
        # even for >=10 yachts per host (the engine ranks yachts by name,
        # the oracle by dict insertion order — they must agree)
        yacht_ids = {
            f"yacht_{comp}_{j:03d}": str(10_000_000 + rng.randrange(80_000_000))
            for j in range(n_yachts)
        }
        seeds.append(
            {
                "competitor_name": comp,
                "host": host,
                "yacht_ids": yacht_ids,
                "params": {"currency": "EUR", "flexibility": "on", "rank": str(rank)},
                "seed_rank": rank,
            }
        )
        crawl_delay = 30 if rank % 2 == 0 else 15
        robots.append(
            {
                "host": host,
                "disallow": ["/private", "/admin"],
                "crawl_delay_s": crawl_delay,
            }
        )

        # one discovered (non-seed) yacht per competitor, reachable only
        # via outlinks — exercises frontier growth at depth 1.
        discovered_ids = [
            str(90_000_000 + rng.randrange(9_000_000))
            for _ in range(cfg.discovered_yachts_per_comp)
        ]

        for yacht_rank, (yname, yid) in enumerate(yacht_ids.items()):
            for period_idx, (p_from, p_to) in enumerate(periods):
                url = _mk_url(host, yid, p_from, p_to)
                tasks.append(
                    {
                        "url": url,
                        "host": host,
                        "competitor": comp,
                        "yacht_id": yid,
                        "yacht_name": yname,
                        "seed_rank": rank,
                        "yacht_rank": yacht_rank,
                        "period_idx": period_idx,
                        "period_from": p_from,
                        "period_to": p_to,
                        "depth": 0,
                    }
                )
                r = rng.random()
                if r < cfg.missing_page_fraction:
                    continue  # no page → fetch timeout path
                is_error = r < cfg.missing_page_fraction + cfg.error_page_fraction

                page_url = url
                if rng.random() < cfg.dirty_url_fraction:
                    page_url = _dirty_variant(url, rng)

                outlinks = []
                if period_idx + 1 < len(periods):
                    nf, nt = periods[period_idx + 1]
                    outlinks.append(_mk_url(host, yid, nf, nt))
                if yacht_rank == 0 and period_idx == 0:
                    for did in discovered_ids:
                        outlinks.append(_mk_url(host, did, periods[0][0], periods[0][1]))
                outlinks.append(f"https://{host}/private/internal/{yid}")  # robots-blocked

                if is_error:
                    html = "<!--STATUS:500--><html><body>Server Error</body></html>"
                    text = ""
                else:
                    base = 800.0 + (hash_stable(yid) % 4000) + 25.0 * period_idx
                    discount_pct = rng.choice([0, 0, 10, 15, 20])
                    list_price = base
                    total = round(base * (1 - discount_pct / 100.0), 2)
                    commission = round(total * 0.18, 2)
                    fields = {
                        "discount_name": "Discount" if discount_pct else "",
                        "yacht_name": yname.replace("_", " ").title(),
                        "company_name": comp.title() + " Charter",
                        "port_from": PORTS[hash_stable(yid) % len(PORTS)],
                        "port_to": PORTS[(hash_stable(yid) + period_idx) % len(PORTS)],
                        "deposit": format_currency(2500.0),
                        "discount_percent": f"{discount_pct}%",
                        "list_price": format_currency(list_price),
                        "discount": "-" + format_currency(list_price - total),
                        "total_price": format_currency(total),
                        "commission_percent": "18%",
                        "commission": format_currency(commission),
                        "client_price": format_currency(total),
                        "agency_price": format_currency(total - commission),
                        "agency_income": format_currency(commission),
                        "total_advanced_payment": format_currency(round(total * 0.5, 2)),
                    }
                    if rng.random() < 0.02:
                        fields["commission_percent"] = None  # missing-span path
                    html = render_page(fields, outlinks, f"Reservation {yid}")
                    text = extract_text_py(html)

                pages.append(
                    {
                        "url": page_url,
                        "warc_ts": epoch + timedelta(seconds=row_idx),
                        "html": html.encode("utf-8"),
                        "text": text,
                        "lang": rng.choice(["en", "en", "tr"]),
                    }
                )
                page_urls.add(url)
                row_idx += 1

        # pages for discovered yachts (depth-1 targets): first period only.
        for did in discovered_ids:
            p_from, p_to = periods[0]
            durl = _mk_url(host, did, p_from, p_to)
            fields = {k: "" for k in FIELDS}
            fields.update(
                {
                    "yacht_name": f"Discovered {did}",
                    "company_name": comp.title() + " Charter",
                    "total_price": format_currency(999.0),
                    "list_price": format_currency(999.0),
                }
            )
            html = render_page(fields, [], f"Reservation {did}")
            pages.append(
                {
                    "url": durl,
                    "warc_ts": epoch + timedelta(seconds=row_idx),
                    "html": html.encode("utf-8"),
                    "text": extract_text_py(html),
                    "lang": "en",
                }
            )
            page_urls.add(durl)
            row_idx += 1

    return World(config=cfg, seeds=seeds, robots=robots, tasks=tasks, pages=pages, periods=periods)


def hash_stable(s: str) -> int:
    """Deterministic small hash (Python's hash() is salted per-process)."""
    h = 2166136261
    for ch in s.encode():
        h = (h ^ ch) * 16777619 & 0xFFFFFFFF
    return h
