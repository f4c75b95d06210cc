"""Crawl rounds as declarative DataFrame jobs (the §3.1/§3.2 lifecycle).

One round = one driver invocation (the reference's daily-scheduler cycle,
bot_controller.py:89-107, with wall-clock sleeps re-expressed as budgets):

    frontier ─ pending/not_before ─ robots gate ─ seen anti-join
             ─ politeness select ─ fetch (pages-table lookup join)
             ─ outcome split (success / empty / timeout)
             ─ extract (Arrow UDF) ─ discoveries merge-back
             ─ snapshot commits (frontier v<round>) + round manifest

Every write is idempotent for a fixed round id (snapshot version =
round id; log partitions = dynamic overwrite on round_id), so a crashed
or re-run round converges to the same state — the checkpoint/resume
story. Selection is a pure function of the previous snapshot, so a
resumed round re-derives the identical set (SURVEY.md §4.2).

Scale notes (10^10 frontier):
- candidates/frontier stay bucket-partitioned by ``pmod(url_hash, B)``;
  the seen anti-join and discovery merge are then co-partitioned joins.
- the politeness window shuffles by host once; its budget output bounds
  per-host rows, killing hot-host skew for the fetch/extract stages.
- the fetch join broadcasts nothing big; AQE handles residual skew.
- the wide ``html`` column is dropped inside the extract stage, so only
  selected rows' pages are ever decoded and nothing wide shuffles on.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.urls import canonicalize_url, host_bucket, url_hash
from ..operators.extract import extract_pages
from ..operators.politeness import select_polite, split_robots
from ..operators.priority import (
    DISCOVERED_PERIOD_IDX,
    DISCOVERED_SEED_RANK,
    DISCOVERED_YACHT_RANK,
    PRIORITY_COLS,
)
from ..operators.revisit import (
    RevisitPolicy,
    schedule_from_stats,
    update_revisit_stats,
)
from ..operators.seen import build_seen_bloom, filter_unseen
from ..sources.catalog import ParquetSnapshotCatalog
from ..sources.fixtures import PolitenessSpec

__all__ = ["CrawlEngine", "FRONTIER_COLS"]

FRONTIER_COLS = [
    "url",
    "url_hash",
    "host",
    "host_bucket",
    "depth",
    "discovery_round",
    "seed_rank",
    "yacht_rank",
    "period_idx",
    "competitor",
    "yacht_id",
    "period_from",
    "period_to",
    "state",
    "attempts",
    "not_before",
]

_TIMEOUT_ERROR = "max_request_number_reached"  # nausys_tracker.py:299


def _parse_spark_bytes(v: str) -> int:
    """Parse a Spark byte-size conf value ("33554432", "128MB", "32m")."""
    s = str(v).strip().lower()
    mult = 1
    for suffix, m in (
        ("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30), ("tb", 1 << 40),
        ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("t", 1 << 40),
        ("b", 1),
    ):
        if s.endswith(suffix):
            s, mult = s[: -len(suffix)], m
            break
    return int(float(s) * mult)


def _scan_input_bytes(spark: SparkSession, df: DataFrame, max_files: int = 4096):
    """(total bytes, file count) of a file-backed DataFrame's input.

    Metadata-only (no Spark job): file statuses via the Hadoop FS
    client. Returns None when the frame is not a plain file scan or has
    more than ``max_files`` files — large inputs split plenty at the
    default size and don't need the hint (and per-file py4j calls would
    be driver-side O(files)).
    """
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files or len(files) > max_files:
        return None
    total = 0
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    try:
        for f in files:
            path = jvm.org.apache.hadoop.fs.Path(f)
            fs = path.getFileSystem(hconf)
            total += fs.getFileStatus(path).getLen()
    except Exception:
        return None
    return total, len(files)


def extraction_split_target(
    total_bytes: int,
    n_files: int,
    parallelism: int,
    cur_max_partition: int,
    cur_open_cost: int,
    waves: int = 4,
) -> "tuple[int, int] | None":
    """New (maxPartitionBytes, openCostInBytes) for the extraction scan,
    or None when the current settings already yield enough splits.

    Parquet splits are sized by BYTES, but the extraction stage's cost
    per split is Python CPU per ROW — a compact pages table (zstd html)
    can be byte-cheap yet extraction-expensive. When the scan would
    produce fewer than ``waves × parallelism`` splits, the stage runs in
    under-filled waves (measured: a 149 MB / 64-file bench world
    coalesced to 13 splits at the 32 MB default + 4 MB open cost, so
    local[8] ran its dominant 58 s stage at 1.6 uneven waves while
    local[2] sat at a comfortable 6.5 — which shows up directly as lost
    N→4N scaling). At 100 TB the default never binds (3M+ splits); this
    floor only engages for small, UDF-cost-dominated scans.
    """
    target_splits = max(1, waves * parallelism)
    effective = total_bytes + n_files * cur_open_cost
    if effective >= cur_max_partition * target_splits:
        return None  # already enough splits
    tgt = max(1 << 20, total_bytes // target_splits or 1)
    if tgt >= cur_max_partition:
        return None
    open_cost = max(4096, min(cur_open_cost, tgt // 8))
    return tgt, open_cost


class _extraction_split_scope:
    """Scope a smaller parquet split size around the extraction action.

    Session-conf changes take effect at plan time of the next action,
    so wrapping the extractions write re-splits the fused pages-scan +
    Arrow-extraction stage only; the previous values are restored on
    exit (the round driver is sequential, so the scope is race-free).
    """

    MPB = "spark.sql.files.maxPartitionBytes"
    OPEN = "spark.sql.files.openCostInBytes"

    def __init__(self, spark: SparkSession, pages_df: DataFrame | None):
        self.spark = spark
        self.pages_df = pages_df
        self._saved: "list[tuple[str, str]]" = []

    def __enter__(self):
        if self.pages_df is None:
            return self
        info = _scan_input_bytes(self.spark, self.pages_df)
        if info is None:
            return self
        total, n_files = info
        try:
            cur_mpb = self.spark.conf.get(self.MPB)
            cur_open = self.spark.conf.get(self.OPEN)
            hint = extraction_split_target(
                total,
                n_files,
                self.spark.sparkContext.defaultParallelism,
                _parse_spark_bytes(cur_mpb),
                _parse_spark_bytes(cur_open),
            )
        except Exception:
            return self
        if hint is None:
            return self
        self._saved = [(self.MPB, cur_mpb), (self.OPEN, cur_open)]
        self.spark.conf.set(self.MPB, str(hint[0]))
        self.spark.conf.set(self.OPEN, str(hint[1]))
        return self

    def __exit__(self, *exc):
        for key, val in self._saved:
            self.spark.conf.set(key, val)
        return False


@dataclass
class CrawlEngine:
    spark: SparkSession
    catalog: ParquetSnapshotCatalog
    spec: PolitenessSpec
    n_buckets: int = 16
    use_bloom: bool = True
    bloom_fpp: float = 0.01
    # html-fetch join strategy: "broadcast" ships the politeness-bounded
    # selection to the pages scan (html never shuffles; driver builds the
    # hash table — right when the budget is small); "shuffle" hash-joins
    # both sides with a salted repartition (right when the selection is
    # large relative to driver memory). "auto" (default) picks by the
    # round's global budget — the politeness stage caps the selection at
    # exactly spec.global_budget rows, so the budget is a sound size
    # estimate known at plan time. Env override for benches.
    fetch_join: str = os.environ.get("WSS_FETCH_JOIN", "auto")
    # live-fetch mode: a client factory (one construction per Python
    # worker, P12) switches the round's fetch stage from the pages-table
    # lookup join to the Arrow-batched HTTP stage — same politeness-
    # bounded input, same outcome split/extraction/frontier transitions
    # downstream (parity pinned by tests/test_live_round.py). None =
    # offline lookup mode (the only network-free mode in this sandbox).
    client_factory: Callable[[], object] | None = None
    # keep this many frontier/seen_bloom snapshot versions (None = all).
    # Every round is a copy-on-write snapshot; an unbounded daily crawl
    # retains its full history forever without this. Resume only ever
    # needs the last committed round; deeper time travel is a retention
    # policy choice.
    snapshot_retention: int | None = None
    # frontier persistence strategy:
    #   "cow" — every round commits a full copy-on-write frontier
    #           snapshot (simple; write cost is frontier-proportional:
    #           ~22 s/round at a 10M-row frontier in the steady-state
    #           bench, and the one history-sized cost at 10^10);
    #   "mor" — merge-on-read: a round writes ONLY its changed rows
    #           (state transitions + discoveries — budget-proportional)
    #           as a `frontier_delta` round partition; reads overlay
    #           deltas onto the last snapshot (latest-per-key), and
    #           every `mor_compact_every` rounds the merged view is
    #           folded into a fresh snapshot and the deltas dropped.
    #           This is exactly Iceberg's MoR row-delta design; on a
    #           real Iceberg catalog the read-side overlay collapses
    #           into the scan (equality deletes) instead of the
    #           explicit window/anti-join the parquet shim runs.
    frontier_mode: str = "cow"
    mor_compact_every: int = 8
    # adaptive re-crawl (None = off, the reference-parity mode): a
    # RevisitPolicy turns `fetched` frontier rows whose change-rate
    # schedule says they are due back into candidates. The schedule is
    # derived from a compact per-URL stats snapshot (`revisit_stats`,
    # one row per content URL: visit/interval/change counters + last
    # fingerprint) merged each round with that round's extractions —
    # budget-proportional maintenance like the seen-bloom OR-merge,
    # never a rescan of the extraction history. Revisit candidates
    # bypass the URL-seen anti-join (seen dedup gates *discovery*;
    # revisit gates *freshness*) but still pass the robots gate and
    # compete for the same politeness budget.
    revisit: "RevisitPolicy | None" = None
    # politeness identity: "host" (reference-parity default) or
    # "domain" — budget per registrable domain (eTLD+1), closing the
    # wildcard-subdomain / minted-hostname budget-multiplication hole
    # (functions/domains.py; operators/politeness.select_polite grain)
    politeness_grain: str = "host"

    # above this many selected URLs, broadcasting the selection means a
    # multi-hundred-MB driver hash table (measured: 600k rows needed a
    # 20 GiB heap) — switch to the salted shuffle join
    BROADCAST_FETCH_THRESHOLD: int = 100_000
    # up to here the 8-byte selected-key set ships to the pages scan as
    # a broadcast left-semi (~160 MB at the cap) and html never leaves
    # the scan layout; beyond it the shuffle join takes over. On a real
    # cluster a bloom-filter key set extends the semi window further.
    SEMI_FETCH_THRESHOLD: int = 20_000_000
    # selection sizes up to here broadcast the narrow crawl attrs onto
    # the extraction output so extracted text never shuffles either
    ATTRS_BROADCAST_THRESHOLD: int = 1_000_000

    def _resolve_fetch_join(self, frontier: DataFrame, frontier_rows: int | None = None) -> str:
        """Pick the html-fetch join strategy from a sound plan-time
        bound on the selection size: the politeness stage emits at most
        ``min(global_budget, frontier rows)`` rows. The frontier count
        is a footer-only parquet scan (count(*) prunes every column),
        so the estimate costs no data I/O; pass ``frontier_rows`` to
        reuse a count the round already took.

        Ladder: ``broadcast`` (whole selection broadcasts into the
        scan) → ``semi`` (only the 64-bit keys broadcast; extraction
        runs on the scan partitioning and the wide html column crosses
        ZERO exchanges) → ``shuffle`` (both sides exchange on the URL
        identity; the uniform hash key kills hot-host skew)."""
        if self.fetch_join != "auto":
            return self.fetch_join
        est = self._selection_upper_bound(frontier, frontier_rows)
        if est <= self.BROADCAST_FETCH_THRESHOLD:
            return "broadcast"
        return "semi" if est <= self.SEMI_FETCH_THRESHOLD else "shuffle"

    def _selection_upper_bound(
        self, frontier: DataFrame, frontier_rows: int | None = None
    ) -> int:
        est = self.spec.global_budget
        if est > self.BROADCAST_FETCH_THRESHOLD:
            est = min(
                est,
                frontier_rows if frontier_rows is not None else frontier.count(),
            )
        return est

    # ------------------------------------------------------------------
    # frontier bootstrap: T1 (weekly periods) + T3 (seeds x periods)
    # ------------------------------------------------------------------
    def init_frontier(
        self,
        seeds: DataFrame,
        period_start: str,
        period_end: str,
    ) -> DataFrame:
        """Seed expansion as pure DataFrame ops.

        T1 — ``generate_weekly_dates`` (nausys_tracker.py:323-338) via
        ``sequence + explode`` (period pairs: from 17:00 → +7d 08:00,
        last start strictly < end).
        T3 — the reference's triple loop (nausys_tracker.py:367-397)
        as explode(yacht_ids) x crossJoin(periods). ``yacht_rank`` is
        the lexicographic rank of the yacht name within a competitor
        (the fixture encodes config insertion order into the names).
        """
        periods = (
            self.spark.range(1)
            .select(
                F.explode(
                    F.sequence(
                        F.to_date(F.lit(period_start)),
                        F.to_date(F.lit(period_end)),
                        F.expr("interval 7 days"),
                    )
                ).alias("d")
            )
            .filter(F.col("d") < F.to_date(F.lit(period_end)))
            .select(
                F.col("d"),
                F.concat(F.date_format("d", "yyyy-MM-dd"), F.lit(" 17:00:00")).alias(
                    "period_from"
                ),
                F.concat(
                    F.date_format(F.date_add("d", 7), "yyyy-MM-dd"),
                    F.lit(" 08:00:00"),
                ).alias("period_to"),
            )
            .withColumn("period_idx", F.row_number().over(Window.orderBy("d")) - 1)
            .drop("d")
        )

        yachts = (
            seeds.select(
                F.col("competitor_name").alias("competitor"),
                "host",
                "seed_rank",
                F.explode("yacht_ids").alias("yacht_name", "yacht_id"),
            )
            .withColumn(
                "yacht_rank",
                F.row_number().over(Window.partitionBy("host").orderBy("yacht_name")) - 1,
            )
        )

        tasks = yachts.crossJoin(F.broadcast(periods))
        d_from = F.substring("period_from", 1, 10)
        d_to = F.substring("period_to", 1, 10)
        raw_url = F.concat(
            F.lit("https://"),
            F.col("host"),
            F.lit("/yacht/"),
            F.col("yacht_id"),
            F.lit("/period/"),
            d_from,
            F.lit("?period_to="),
            d_to,
            F.lit("&period_from="),
            d_from,
        )
        frontier = (
            tasks.withColumn("url", canonicalize_url(raw_url))
            .withColumn("url_hash", url_hash(F.col("url")))
            .withColumn("host_bucket", host_bucket(F.col("host"), self.n_buckets))
            .withColumn("depth", F.lit(0))
            .withColumn("discovery_round", F.lit(0))
            .withColumn("state", F.lit("pending"))
            .withColumn("attempts", F.lit(0))
            .withColumn("not_before", F.lit(0))
            .select(*FRONTIER_COLS)
        )
        self.catalog.write_snapshot(
            "frontier", frontier.repartition(self.n_buckets, "host_bucket"), version=0
        )
        return self.catalog.read("frontier")

    def _read_frontier(self, as_of_round: int) -> DataFrame:
        """The frontier as of ``as_of_round``.

        cow: plain snapshot read (no shuffle). mor: overlay the delta
        partitions in ``(base, as_of]`` onto the newest snapshot ≤
        ``as_of`` — latest-per-key within the deltas (delta-
        proportional shuffle), then a key anti-join to drop superseded
        base rows. A key appears at most once per round partition, so
        ``round_id`` is a total per-key order. Resume/time-travel reads
        pick the right base from the version history, so re-reading an
        old round after later compactions stays correct."""
        if self.frontier_mode != "mor":
            return self.catalog.read("frontier", version=as_of_round)
        base_v = max(
            v for v in self.catalog.versions("frontier") if v <= as_of_round
        )
        base = self.catalog.read("frontier", version=base_v)
        delta_rounds = [
            r
            for r in self.catalog.log_round_ids("frontier_delta")
            if base_v < r <= as_of_round
        ]
        if not delta_rounds:
            return base
        deltas = self.catalog.read_log("frontier_delta").filter(
            (F.col("round_id") > base_v) & (F.col("round_id") <= as_of_round)
        )
        w = Window.partitionBy("url_hash", "url").orderBy(
            F.col("round_id").desc()
        )
        latest = (
            deltas.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(*FRONTIER_COLS)
        )
        survivors = base.join(
            deltas.select("url_hash", "url").distinct(),
            ["url_hash", "url"],
            "left_anti",
        )
        return survivors.unionByName(latest)

    # how much larger than the current seen set a (re)built filter is
    # sized — the headroom later rounds grow into before the next rebuild
    BLOOM_HEADROOM: int = 4

    def _bloom_geometry(self, seen_total: int) -> tuple[int, int]:
        from ..operators.bloom import bloom_params

        expected = max(1000, seen_total // self.n_buckets * self.BLOOM_HEADROOM)
        return bloom_params(expected, self.bloom_fpp)

    def _probe_bloom(
        self, seen: DataFrame, seen_total_prev: int, round_id: int
    ) -> tuple[DataFrame, tuple[int, int]]:
        """(bloom table, (m_bits, k)) for this round's prefilter.

        Reuses the persisted ``seen_bloom`` snapshot when it is exactly
        one round old and still has capacity at the target FPP;
        otherwise rebuilds from the seen set, sized with
        ``BLOOM_HEADROOM`` so subsequent rounds go back to incremental
        merges (scalable-bloom amortization: rebuilds are O(log growth)
        over the crawl's life, not per-round).
        """
        from ..operators.bloom import bloom_capacity

        if self.catalog.current_version("seen_bloom") == round_id - 1:
            tbl = self.catalog.read("seen_bloom", version=round_id - 1)
            row = tbl.select("m_bits", "k_hashes").first()
            per_bucket = max(1, seen_total_prev // self.n_buckets)
            if row is not None and bloom_capacity(
                int(row.m_bits), self.bloom_fpp
            ) >= per_bucket:
                return tbl, (int(row.m_bits), int(row.k_hashes))
        geom = self._bloom_geometry(seen_total_prev)
        tbl = build_seen_bloom(
            seen, n_buckets=self.n_buckets, fpp=self.bloom_fpp,
            expected_items_per_bucket=1, params=geom,
        )
        return tbl, geom

    def _write_bloom_snapshot(
        self,
        fetched: DataFrame,
        seen: DataFrame,
        bloom: DataFrame | None,
        bloom_geom: tuple[int, int] | None,
        seen_total_prev: int,
        round_id: int,
    ) -> None:
        """Maintain the persisted seen-filter: OR-merge this round's
        newly-seen hashes into the probe filter, or bootstrap a full
        filter when none existed (round 1 / geometry reset)."""
        from ..operators.bloom import merge_bloom_tables

        new_seen = fetched.filter(
            F.col("outcome").isin("success", "empty")
        ).select("url_hash")
        if bloom is not None and bloom_geom is not None:
            delta = build_seen_bloom(
                new_seen, n_buckets=self.n_buckets, fpp=self.bloom_fpp,
                expected_items_per_bucket=1, params=bloom_geom,
            )
            merged = merge_bloom_tables(bloom, delta)
        else:
            # bootstrap: seen set is (pre-round seen ∪ this round's new);
            # size by the budget bound — no count job needed
            geom = self._bloom_geometry(
                seen_total_prev + self.spec.global_budget
            )
            merged = build_seen_bloom(
                seen.select("url_hash").unionByName(new_seen),
                n_buckets=self.n_buckets, fpp=self.bloom_fpp,
                expected_items_per_bucket=1, params=geom,
            )
        self.catalog.write_snapshot("seen_bloom", merged, version=round_id)

    # ------------------------------------------------------------------
    def _fetch_live(
        self, selected: DataFrame, round_id: int
    ) -> tuple[DataFrame, DataFrame]:
        """Live-mode fetch: Arrow HTTP stage (one client per Python
        worker, P12) + idempotent raw materialization — the WARC-analog
        store. The raw round partition is written BEFORE any consumer
        runs, making the at-least-once task-level fetch exactly-once at
        round level: re-runs of a committed round never refetch, and
        every downstream consumer (outcome split, extraction, fetch
        log) reads the WRITTEN bytes with column pruning — wide bodies
        are never cached and never refetched.

        F3 status map, mirroring the lookup path's page_status split:
        HTTP 200 → success, any other HTTP status → empty (fetched, no
        usable content — nausys_tracker.py:299's non-200 branch),
        status ≤ 0/null (network failure) → timeout. Round parity with
        the lookup join is pinned by tests/test_live_round.py.
        """
        from ..sources.http_fetch import http_fetch_stage

        raw = http_fetch_stage(selected, self.client_factory, keep_cols=True)
        raw_rows = raw.select(
            F.lit(round_id).alias("round_id"),
            *selected.columns,
            "status",
            F.encode(F.col("body"), "utf-8").alias("html"),
            "worker_pid",
            "client_seq",
        )
        self.catalog.write_round_partition("fetch_raw", raw_rows)
        back = self.catalog.read_log("fetch_raw").filter(
            F.col("round_id") == round_id
        )
        fetched = (
            back.drop("html", "worker_pid", "client_seq", "round_id")
            .withColumn(
                "outcome",
                F.when(
                    F.col("status").isNull() | (F.col("status") <= 0), "timeout"
                )
                .when(F.col("status") == 200, "success")
                .otherwise("empty"),
            )
            .drop("status")
            .cache()
        )
        with_html = back.filter(F.col("status") == 200).drop(
            "status", "worker_pid", "client_seq", "round_id"
        )
        return fetched, with_html

    # ------------------------------------------------------------------
    def _revisit_versions(self) -> list[int]:
        if not self.catalog.exists("revisit_stats"):
            return []
        return self.catalog.versions("revisit_stats")

    # ------------------------------------------------------------------
    def _seen(self, frontier: DataFrame) -> DataFrame:
        # url rides along as the collision confirm key for the exact
        # anti-join (the bloom build only reads url_hash)
        return frontier.filter(F.col("state") == "fetched").select("url_hash", "url")

    def _log_rows(self, df: DataFrame, round_id: int, status, error) -> DataFrame:
        status_col = status if not isinstance(status, str) else F.lit(status)
        error_col = error if not isinstance(error, (str, type(None))) else F.lit(error)
        return df.select(
            F.lit(round_id).alias("round_id"),
            "url",
            "host",
            status_col.alias("status"),
            error_col.cast("string").alias("error"),
            F.spark_partition_id().alias("partition_id"),
            *[F.col(c) for c in PRIORITY_COLS if c != "url"],
        )

    # ------------------------------------------------------------------
    def run_round(
        self,
        round_id: int,
        pages_resolved: DataFrame,
        robots: DataFrame,
        seeds: DataFrame,
    ) -> dict:
        """Execute (or resume past) one crawl round."""
        if self.catalog.round_committed(round_id):
            return self.catalog.read_round_manifest(round_id)
        t0 = time.monotonic()
        # per-section walls (scaling diagnosis: which sections are
        # data-proportional vs fixed overhead) — keyed by pipeline order
        sections: dict[str, float] = {}
        _mark = [t0]

        def _section(name: str) -> None:
            now = time.monotonic()
            sections[name] = round(now - _mark[0], 3)
            _mark[0] = now

        round_caches: list = []
        frontier = self._read_frontier(round_id - 1)
        if self.frontier_mode == "mor":
            # The merged (base ⊕ deltas) view is consumed by ~5 jobs per
            # round (candidates, seen, count, discovery anti-join, state
            # transitions). Unpersisted, EVERY one re-runs the overlay
            # window + anti-join over the full frontier — measured 10-60 s
            # of recompute per job at a 10M-row frontier, dwarfing the
            # delta-write savings. Persist SERIALIZED (spillable) once;
            # a real Iceberg catalog removes this entirely by folding the
            # row-delta overlay into the scan.
            from pyspark import StorageLevel

            frontier = frontier.persist(StorageLevel.MEMORY_AND_DISK)
            round_caches.append(frontier)

        candidates = frontier.filter(
            (F.col("state") == "pending") & (F.col("not_before") <= round_id)
        )

        # adaptive re-crawl: fetched rows whose schedule is due rejoin
        # the candidate set. The schedule reads the PREVIOUS round's
        # stats snapshot (pure function of committed state — resume
        # re-derives the identical due set).
        revisit_on = self.revisit is not None and any(
            v <= round_id - 1 for v in self._revisit_versions()
        )
        if revisit_on:
            stats_v = max(
                v for v in self._revisit_versions() if v <= round_id - 1
            )
            due_keys = (
                schedule_from_stats(
                    self.catalog.read("revisit_stats", version=stats_v),
                    self.revisit,
                    key_cols=["url_hash", "url"],
                )
                .filter(F.col("next_due") <= round_id)
                .select("url_hash", "url")
            )
            due = frontier.filter(F.col("state") == "fetched").join(
                due_keys, ["url_hash", "url"], "left_semi"
            )
            candidates = candidates.unionByName(due)

        # R9 robots gate (broadcast join)
        allowed, blocked = split_robots(candidates, robots)

        # S6/J1 URL-seen dedup: bloom prefilter + exact anti-join.
        # The seen-set size comes from the previous round's manifest
        # (driver-side JSON) — no count job; bloom is skipped entirely
        # while the seen set is empty (round 1). The filter itself is
        # PERSISTED per round and maintained incrementally (bitwise-OR
        # of this round's delta) — at a 10^10 seen set a per-round full
        # rebuild would rescan every seen hash, while the merge touches
        # only n_buckets bitset rows + the budget-bounded delta.
        seen = self._seen(frontier)
        seen_total_prev = 0
        if round_id > 1 and self.catalog.round_committed(round_id - 1):
            seen_total_prev = self.catalog.read_round_manifest(round_id - 1).get(
                "seen_total", 0
            )
        bloom = None
        bloom_geom = None
        if self.use_bloom and seen_total_prev > 0:
            bloom, bloom_geom = self._probe_bloom(seen, seen_total_prev, round_id)
        # string-confirmed anti-join: at 10^10 URLs xxhash64 collisions
        # exist, and a collision here would silently skip a real URL.
        # Revisit candidates (state `fetched`) are BY DEFINITION seen —
        # they skip the anti-join instead of being killed by it.
        if revisit_on:
            unseen = filter_unseen(
                allowed.filter(F.col("state") == "pending"),
                seen,
                bloom,
                self.n_buckets,
                confirm_cols=["url_hash", "url"],
            ).unionByName(allowed.filter(F.col("state") == "fetched"))
        else:
            unseen = filter_unseen(
                allowed, seen, bloom, self.n_buckets,
                confirm_cols=["url_hash", "url"],
            )

        # R1-R5 politeness + R8 priority + global budget. The frontier
        # row count (one footer-only statistics job) serves two
        # plan-time decisions: skipping the global-limit machinery when
        # the budget provably cannot bind, and the fetch-join strategy.
        frontier_rows = frontier.count()
        _section("plan_prep")
        selected = select_polite(
            unseen,
            robots,
            self.spec,
            cache_handles=round_caches,
            candidate_upper_bound=frontier_rows,
            grain=self.politeness_grain,
        )

        semi_extracted = None
        if self.client_factory is not None:
            # live mode: Arrow-batched HTTP stage, no join at all
            fetched, with_html = self._fetch_live(selected, round_id)
        else:
            # offline mode: fetch = lookup join against the pages table
            # on the 64-bit key, string-confirmed (hash-collision
            # guard). Two-phase for width: phase 1 joins a NARROW
            # projection (url identity + page_status, no html) to
            # classify outcomes; phase 2 re-joins html for the success
            # rows only — the wide binary column is never read for
            # timeouts/errors and never shuffles with the outcome split.
            page_keys = pages_resolved.select(
                F.col("url_hash").alias("p_hash"),
                F.col("url_canon").alias("p_url"),
                "page_status",
            )
            fetched = (
                selected.join(
                    page_keys,
                    (selected.url_hash == page_keys.p_hash)
                    & (selected.url == page_keys.p_url),
                    "left",
                )
                .withColumn(
                    "outcome",
                    F.when(F.col("p_url").isNull(), "timeout")
                    .when(F.col("page_status") == "error", "empty")
                    .otherwise("success"),
                )
                .drop("p_hash", "p_url", "page_status")
                .cache()
            )
            successes = fetched.filter(F.col("outcome") == "success").drop(
                "outcome"
            )

            # Pull html ONLY for success rows.
            page_html = pages_resolved.select(
                F.col("url_hash").alias("p2h"),
                F.col("url_canon").alias("p2u"),
                "html",
            )
            join_cond = (successes.url_hash == page_html.p2h) & (
                successes.url == page_html.p2u
            )
            fetch_strategy = self._resolve_fetch_join(frontier, frontier_rows)
            if fetch_strategy == "broadcast":
                # html never shuffles: the selection ships to the pages scan
                with_html = page_html.join(
                    F.broadcast(successes), join_cond
                ).drop("p2h", "p2u")
            elif fetch_strategy == "semi":
                # html never leaves the SCAN layout even at budget-scale
                # selections: only the 8-byte key set ships to the pages
                # scan (left-semi on the 64-bit identity — a collision
                # false-positive just extracts one extra page, dropped
                # by the exact attrs join below), extraction runs fused
                # with the scan stage on its file-split granularity, and
                # the crawl attrs attach to the html-FREE extraction
                # output. With the attrs side broadcast (budget-bounded,
                # narrow) the extracted text crosses zero exchanges too.
                # Event-log evidence (BENCH/scaling_round.md): the
                # shuffle path moved the ~wide html through TWO ~530 MB
                # exchanges per round; this path moves none.
                sel_keys = successes.select(F.col("url_hash").alias("k_hash"))
                pages_sel = page_html.join(
                    F.broadcast(sel_keys),
                    page_html.p2h == F.col("k_hash"),
                    "left_semi",
                ).select(
                    F.col("p2h").alias("url_hash"),
                    F.col("p2u").alias("url"),
                    "html",
                )
                ext_raw = extract_pages(pages_sel)
                est = self._selection_upper_bound(frontier, frontier_rows)
                attrs = (
                    F.broadcast(successes)
                    if est <= self.ATTRS_BROADCAST_THRESHOLD
                    else successes
                )
                # exact (url_hash, url) inner join: restores string-
                # confirmed identity, same contract as the other paths
                semi_extracted = ext_raw.join(attrs, ["url_hash", "url"])
            else:
                # shuffle hash join + per-row re-hash: html shuffles
                # once, but no driver-side hash-table build; extraction
                # runs hash-partitioned on the 64-bit url_hash itself,
                # so rows land uniformly no matter how skewed the host
                # mix is. (The earlier (host_bucket, url_hash % par)
                # salt gave a hot host only `par` salt values hashed
                # into `par` partitions — balls-in-bins collisions left
                # the max partition 2-3x the mean; pinned adversarially
                # in tests/test_skew.py round-level layout test.)
                par = self.spark.sparkContext.defaultParallelism
                with_html = (
                    successes.join(page_html, join_cond)
                    .drop("p2h", "p2u")
                    .repartition(par, F.col("url_hash"))
                )
        timeouts = fetched.filter(F.col("outcome") == "timeout").drop("outcome")
        empties = fetched.filter(F.col("outcome") == "empty").drop("outcome")

        # P1 extraction — the only Python stage, Arrow-batched. Per-host
        # volume is already bounded upstream by the politeness budget,
        # which is what kills hot-host skew before this stage.
        # The extraction product is materialized ONCE to the catalog and
        # every downstream consumer (fetch log, discoveries) reads the
        # WRITTEN partition with column pruning. Never .cache() this
        # frame: at 600k ~19 KB pages the deserialized rows are ~8 GiB
        # of storage pool, which squeezed execution memory until the
        # frontier-merge hash aggregate threw AGGREGATE_OUT_OF_MEMORY on
        # the default heap — and at 100 TB caching the extraction output
        # is not an option at all. ``partition_id`` (the extraction
        # task's lineage) is materialized into the table so the re-read
        # preserves W3 per-partition lineage.
        extracted = (
            semi_extracted
            if semi_extracted is not None
            else extract_pages(with_html)
        )

        extractions = extracted.select(
            F.lit(round_id).alias("round_id"),
            "url",
            "url_hash",
            "competitor",
            "yacht_id",
            "period_from",
            "period_to",
            "details",
            "text",
            "host",
            "outlinks",
            F.spark_partition_id().alias("partition_id"),
            *[F.col(c) for c in PRIORITY_COLS if c != "url"],
        )
        # the write action plans the fused pages-scan + extraction stage;
        # scope a byte-split floor so the Python-cost-dominated stage gets
        # >= 4 waves x parallelism tasks even on a byte-compact pages table
        with _extraction_split_scope(
            self.spark,
            pages_resolved if self.client_factory is None else None,
        ):
            self.catalog.write_round_partition("extractions", extractions)
        _section("select_fetch_extract")
        ext = self.catalog.read_log("extractions").filter(
            F.col("round_id") == round_id
        )

        if self.revisit is not None:
            # incremental change-rate stats: merge this round's content
            # fingerprints into the per-URL counters (full-outer join,
            # visit side bounded by the budget). Reads the previous
            # snapshot, writes version=round_id — idempotent on re-run
            # like every other per-round commit.
            prev_stats = None
            prev_vs = [v for v in self._revisit_versions() if v <= round_id - 1]
            if prev_vs:
                prev_stats = self.catalog.read(
                    "revisit_stats", version=max(prev_vs)
                )
            visits = ext.select(
                "url_hash",
                "url",
                F.lit(round_id).alias("round_id"),
                F.md5(F.col("text")).alias("fingerprint"),
            )
            self.catalog.write_snapshot(
                "revisit_stats",
                update_revisit_stats(
                    prev_stats, visits, key_cols=["url_hash", "url"]
                ),
                version=round_id,
            )

        # W3 fetch log (per-partition lineage + metrics source)
        log = (
            self._log_rows(blocked, round_id, "robots", "disallowed")
            .unionByName(
                self._log_rows(timeouts, round_id, "error", _TIMEOUT_ERROR)
            )
            .unionByName(self._log_rows(empties, round_id, "empty", None))
            .unionByName(
                # success rows come off the written extractions table —
                # narrow projection, stored lineage partition_id
                ext.select(
                    F.lit(round_id).alias("round_id"),
                    "url",
                    "host",
                    F.lit("success").alias("status"),
                    F.lit(None).cast("string").alias("error"),
                    "partition_id",
                    *[F.col(c) for c in PRIORITY_COLS if c != "url"],
                )
            )
        )
        _section("revisit_stats")
        # status totals ride the log write as an observation (the A6
        # scalar counts previously re-read the written metrics table —
        # one more sequential driver job per round)
        status_obs = Observation(f"statuses_r{round_id}")
        log = log.observe(
            status_obs,
            *[
                F.sum(F.when(F.col("status") == s, 1).otherwise(0)).alias(s)
                for s in ("success", "empty", "error", "robots")
            ],
        )
        self.catalog.write_round_partition("fetch_log", log)
        _section("fetch_log_write")

        # W4 frontier merge-back: discoveries (depth+1), state updates
        seed_ranks = seeds.select(
            F.col("host").alias("d_host"), F.col("seed_rank").alias("d_seed_rank")
        )
        discoveries = (
            ext.select(
                F.col("depth").alias("parent_depth"),
                F.explode("outlinks").alias("raw_link"),
            )
            .withColumn("url", canonicalize_url(F.col("raw_link")))
            .filter(F.col("url").isNotNull())
            .withColumn("host", F.lower(F.try_parse_url(F.col("url"), F.lit("HOST"))))
            .groupBy("url", "host")
            .agg(F.min(F.col("parent_depth") + 1).alias("depth"))
            .join(F.broadcast(seed_ranks), F.col("host") == F.col("d_host"), "left")
            .select(
                "url",
                url_hash(F.col("url")).alias("url_hash"),
                "host",
                host_bucket(F.col("host"), self.n_buckets).alias("host_bucket"),
                "depth",
                F.lit(round_id).alias("discovery_round"),
                F.coalesce("d_seed_rank", F.lit(DISCOVERED_SEED_RANK)).alias(
                    "seed_rank"
                ),
                F.lit(DISCOVERED_YACHT_RANK).alias("yacht_rank"),
                F.lit(DISCOVERED_PERIOD_IDX).alias("period_idx"),
                F.lit("").alias("competitor"),
                F.lit("").alias("yacht_id"),
                F.lit("").alias("period_from"),
                F.lit("").alias("period_to"),
                F.lit("pending").alias("state"),
                F.lit(0).alias("attempts"),
                F.lit(0).alias("not_before"),
            )
            # (url_hash, url) anti-join: hash alone would drop a new URL
            # that collides with an existing frontier entry
            .join(frontier.select("url_hash", "url"), ["url_hash", "url"], "left_anti")
        )

        # state transitions (R6 retry/backoff machine) — outcome comes
        # straight from the cached narrow fetch classification; the
        # merge key is string-confirmed like the fetch join, so a hash
        # collision cannot mark the wrong pending row fetched
        outcome = fetched.select("url_hash", "url", "outcome")

        def _transitions(joined: DataFrame) -> DataFrame:
            """R6 state machine over frontier rows carrying an
            ``outcome`` column (NULL = untouched). Column order matters:
            ``not_before`` tests the UPDATED state (still pending ⇒
            retry scheduled; exhausted ⇒ failed, no backoff)."""
            return (
                joined.withColumn(
                    "state",
                    F.when(
                        F.col("outcome").isin("success", "empty"), F.lit("fetched")
                    )
                    .when(
                        (F.col("outcome") == "timeout")
                        # only a PENDING row can exhaust into `failed`:
                        # a revisit timeout keeps the row `fetched` —
                        # stale content beats forgetting we have it
                        & (F.col("state") == "pending")
                        & (F.col("attempts") + 1 >= self.spec.retry_max_attempts),
                        F.lit("failed"),
                    )
                    .otherwise(F.col("state")),
                )
                .withColumn(
                    "attempts",
                    F.when(
                        F.col("outcome") == "timeout", F.col("attempts") + 1
                    ).otherwise(F.col("attempts")),
                )
                .withColumn(
                    "not_before",
                    F.when(
                        (F.col("outcome") == "timeout")
                        & (F.col("state") == "pending"),
                        F.lit(round_id + self.spec.retry_backoff_rounds),
                    ).otherwise(F.col("not_before")),
                )
                .drop("outcome")
            )

        mor_delta_round = (
            self.frontier_mode == "mor"
            and round_id % self.mor_compact_every != 0
        )

        def _write_bloom() -> float:
            if not self.use_bloom:
                return 0.0
            tb = time.monotonic()
            self._write_bloom_snapshot(
                fetched, seen, bloom, bloom_geom, seen_total_prev, round_id
            )
            return time.monotonic() - tb

        # discovery count rides the state write as an OBSERVATION —
        # previously a separate count job that re-scanned the entire
        # just-written snapshot (frontier-proportional: a full-table
        # scan per round at 10^10 rows). Observed metrics are computed
        # by the write's own tasks for free.
        disc_obs = Observation(f"discoveries_r{round_id}")
        _disc_expr = F.sum(
            F.when(F.col("discovery_round") == round_id, 1).otherwise(0)
        ).alias("n")

        bloom_merge_s = 0.0
        if mor_delta_round:
            # ORDER MATTERS: commit the seen-bloom BEFORE the delta
            # write. The delta lands under the same `frontier_delta`
            # path the merged view READS, and Spark's recacheByPath
            # invalidates every cached plan touching that path — the
            # persisted frontier and the cached fetch classification
            # included. Writing the bloom first lets it consume the
            # still-valid caches (measured: 1.2 s vs 30-57 s of overlay
            # recompute when it ran after the delta write). A crash
            # between the two leaves seen_bloom at round_id with no
            # committed round — the re-run's probe sees the version
            # mismatch and falls back to a full rebuild, so correctness
            # is unaffected.
            bloom_merge_s = _write_bloom()
        tw = time.monotonic()
        if mor_delta_round:
            # W4 as an Iceberg-style row delta: ONLY the rows this round
            # changed — outcome transitions (≤ budget rows), newly
            # robots-blocked rows, and discoveries. Write cost is
            # budget-proportional regardless of frontier size; the
            # overlay happens at read time (_read_frontier).
            touched = _transitions(
                frontier.join(outcome, ["url_hash", "url"], "inner")
            )
            delta = (
                touched.select(*FRONTIER_COLS)
                .unionByName(
                    blocked.withColumn(
                        "state", F.lit("robots_blocked")
                    ).select(*FRONTIER_COLS)
                )
                .unionByName(discoveries)
                .withColumn("round_id", F.lit(round_id))
                .observe(disc_obs, _disc_expr)
            )
            self.catalog.write_round_partition("frontier_delta", delta)
        else:
            new_frontier = _transitions(
                frontier.join(outcome, ["url_hash", "url"], "left")
            )
            # robots-blocked rows become permanent
            new_frontier = (
                new_frontier.join(
                    blocked.select("url_hash", "url", F.lit(True).alias("__rb")),
                    ["url_hash", "url"],
                    "left",
                )
                .withColumn(
                    "state",
                    F.when(
                        F.col("__rb").isNotNull(), F.lit("robots_blocked")
                    ).otherwise(F.col("state")),
                )
                .drop("__rb")
                .select(*FRONTIER_COLS)
                .unionByName(discoveries)
                .observe(disc_obs, _disc_expr)
            )
            self.catalog.write_snapshot(
                "frontier",
                new_frontier.repartition(self.n_buckets, "host_bucket"),
                version=round_id,
            )
            if self.frontier_mode == "mor":
                # compaction point: deltas ≤ round_id are folded into
                # the snapshot just committed
                self.catalog.drop_log_partitions("frontier_delta", round_id)
        frontier_write_s = time.monotonic() - tw

        # persist the incremental URL-seen filter for the next round
        # (delta rounds already committed it above, pre-invalidation)
        if not mor_delta_round:
            bloom_merge_s = _write_bloom()
        _section("state_commit")

        # metrics rollup (A6): per-host counts + throughput. All counts
        # derive from the already-written round partitions (small parquet
        # scans) — no recomputation of the crawl pipeline.
        wall_s = time.monotonic() - t0
        per_host = (
            self.catalog.read_log("fetch_log")
            .filter(F.col("round_id") == round_id)
            .groupBy("round_id", "host", "status")
            .agg(F.count("*").alias("n"))
            .withColumn("wall_seconds", F.lit(wall_s))
        )
        self.catalog.write_round_partition("metrics", per_host)

        # collected by the fetch-log write's tasks (Observation above)
        status_totals = {
            k: int(v or 0) for k, v in status_obs.get.items()
        }
        # collected by the state write's own tasks (Observation above);
        # None only when the write produced zero rows
        n_discovered = int(disc_obs.get["n"] or 0)
        counts = {
            "selected": sum(
                v for k, v in status_totals.items() if k != "robots"
            ),
            "success": status_totals.get("success", 0),
            "empty": status_totals.get("empty", 0),
            "error": status_totals.get("error", 0),
            "robots": status_totals.get("robots", 0),
            "discovered": n_discovered,
        }

        # revisits re-fetch already-seen URLs: they must not inflate
        # the seen total (which sizes the bloom and gates its rebuild)
        n_revisit_seen = 0
        if revisit_on:
            counts["revisited"] = fetched.filter(
                F.col("state") == "fetched"
            ).count()
            n_revisit_seen = fetched.filter(
                (F.col("state") == "fetched")
                & F.col("outcome").isin("success", "empty")
            ).count()

        info = {
            **counts,
            "seen_total": seen_total_prev
            + counts["success"]
            + counts["empty"]
            - n_revisit_seen,
            "wall_seconds": wall_s,
            # state-maintenance split: per-round cost of the frontier
            # CoW snapshot and the incremental seen-filter OR-merge —
            # the two writes that must stay budget-proportional as the
            # frontier/seen set grows (steady-state bench evidence)
            "frontier_write_seconds": round(frontier_write_s, 3),
            "bloom_merge_seconds": round(bloom_merge_s, 3),
            "urls_per_sec": counts["selected"] / wall_s if wall_s > 0 else 0.0,
            # mor delta rounds do not advance the snapshot version —
            # the round's state lives in its frontier_delta partition
            "frontier_version": self.catalog.current_version("frontier"),
        }
        _section("metrics_rollup")
        info["sections"] = sections
        self.catalog.commit_round(round_id, info)
        if self.snapshot_retention is not None:
            # maintenance AFTER the round commit: expiring only versions
            # older than the retention window can never touch the
            # snapshot a resume would read
            self.catalog.expire_snapshots("frontier", self.snapshot_retention)
            if self.use_bloom:
                self.catalog.expire_snapshots(
                    "seen_bloom", self.snapshot_retention
                )
            if self.revisit is not None:
                self.catalog.expire_snapshots(
                    "revisit_stats", self.snapshot_retention
                )
        fetched.unpersist()
        for h in round_caches:
            h.unpersist()
        return {"round_id": round_id, "status": "committed", **info}

    # ------------------------------------------------------------------
    def run(
        self,
        n_rounds: int,
        pages_resolved: DataFrame,
        robots: DataFrame,
        seeds: DataFrame,
    ) -> list[dict]:
        """Run rounds 1..n, resuming past any already-committed round."""
        return [
            self.run_round(r, pages_resolved, robots, seeds)
            for r in range(1, n_rounds + 1)
        ]
