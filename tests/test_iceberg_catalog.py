"""IcebergCatalog SQL-text pins + sandbox fallback behavior.

The iceberg-spark-runtime jar is not in this sandbox, so the catalog's
statements are pinned at the SQL-text level (the builders are pure) and
the execution surface is verified to fail loudly — never silently — when
no Iceberg catalog is configured.
"""

from __future__ import annotations

import pytest

from web_scraper_spark.sources.catalog import ParquetSnapshotCatalog, make_catalog
from web_scraper_spark.sources.iceberg_catalog import IcebergCatalog


@pytest.fixture()
def ice(spark):
    return IcebergCatalog(spark, catalog="crawl", namespace="web")


def test_sql_builders_pinned(ice):
    assert (
        ice.create_table_sql(
            "frontier", "url string, url_hash bigint", ["bucket_id"]
        )
        == "CREATE TABLE IF NOT EXISTS crawl.web.frontier "
        "(url string, url_hash bigint) USING iceberg "
        "PARTITIONED BY (bucket_id)"
    )
    assert (
        ice.merge_upsert_sql("frontier", "updates", ["url_hash", "url"])
        == "MERGE INTO crawl.web.frontier t USING updates s "
        "ON t.url_hash = s.url_hash AND t.url = s.url "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert (
        ice.read_sql("frontier", version=7)
        == "SELECT * FROM crawl.web.frontier VERSION AS OF 'v7'"
    )
    assert ice.read_sql("frontier") == "SELECT * FROM crawl.web.frontier"
    assert (
        ice.tag_sql("frontier", 7)
        == "ALTER TABLE crawl.web.frontier CREATE OR REPLACE TAG `v7`"
    )
    assert (
        ice.expire_snapshots_sql("frontier", keep_last=3)
        == "CALL crawl.system.expire_snapshots("
        "table => 'web.frontier', retain_last => 3)"
    )
    assert (
        ice.compact_sql("frontier", target_file_size_mb=512)
        == "CALL crawl.system.rewrite_data_files(table => 'web.frontier', "
        "options => map('target-file-size-bytes', '536870912'))"
    )
    assert (
        ice.rollback_sql("frontier", 3)
        == "CALL crawl.system.set_current_snapshot("
        "table => 'web.frontier', ref => 'v3')"
    )
    assert (
        ice.insert_overwrite_sql("fetch_log", "batch")
        == "INSERT OVERWRITE crawl.web.fetch_log SELECT * FROM batch"
    )


def test_unavailable_without_jar(ice, spark, tmp_path):
    """In this sandbox no spark.sql.catalog.crawl is configured: the
    catalog reports unavailable, every execution method raises the
    configuration error (not a confusing analysis error), and
    make_catalog falls back to the parquet implementation."""
    assert ice.available() is False
    df = spark.range(1)
    with pytest.raises(RuntimeError, match="spark.sql.catalog.crawl"):
        ice.write_snapshot("t", df, version=1)
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        ice.read("t")
    with pytest.raises(RuntimeError):
        ice.merge_upsert("t", df, ["id"])

    cat = make_catalog(spark, str(tmp_path))
    assert isinstance(cat, ParquetSnapshotCatalog)


def test_interface_parity_with_parquet_catalog():
    """Every public method of the parquet catalog that is part of the
    engine-facing contract exists on IcebergCatalog — a user switching
    catalogs must not hit AttributeError mid-crawl."""
    contract = [
        "write_snapshot",
        "read",
        "current_version",
        "exists",
        "rollback",
        "expire_snapshots",
        "compact_snapshot",
        "write_round_partition",
        "read_log",
        "drop",
    ]
    for m in contract:
        assert callable(getattr(ParquetSnapshotCatalog, m, None)), m
        assert callable(getattr(IcebergCatalog, m, None)), m


def test_engine_contract_sql_builders(ice):
    """Round-manifest + log-retention surface added for full CrawlEngine
    drop-in (plans/rounds.py calls these six beyond the storage core)."""
    assert (
        ice.log_round_ids_sql("fetch_log")
        == "SELECT DISTINCT round_id FROM crawl.web.fetch_log "
        "ORDER BY round_id"
    )
    assert (
        ice.drop_log_partitions_sql("fetch_log", 4)
        == "DELETE FROM crawl.web.fetch_log WHERE round_id <= 4"
    )
    for m in (
        "versions",
        "commit_round",
        "round_committed",
        "read_round_manifest",
        "last_committed_round",
        "log_round_ids",
        "drop_log_partitions",
        "log_exists",
    ):
        assert callable(getattr(IcebergCatalog, m, None)), m
    # jar-less sandbox: execution wrappers fail loudly, never silently
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        ice.commit_round(1, {"round_id": 1})


def _find_iceberg_jar():
    import glob
    import os

    cand = os.environ.get("ICEBERG_JAR")
    if cand and os.path.exists(cand):
        return cand
    pats = [
        os.path.expanduser("~/.ivy2/jars/*iceberg-spark-runtime*.jar"),
        "/opt/spark/jars/*iceberg-spark-runtime*.jar",
        "/usr/local/lib/*iceberg-spark-runtime*.jar",
    ]
    for p in pats:
        hits = glob.glob(p)
        if hits:
            return hits[0]
    return None


@pytest.mark.skipif(
    _find_iceberg_jar() is None,
    reason="iceberg-spark-runtime jar not obtainable offline in this "
    "sandbox (no ivy cache, no maven access) — see COVERAGE.md",
)
def test_executed_round_with_jar():
    """VERDICT r3 #6: one executed CrawlEngine round against a local
    Iceberg warehouse (MERGE INTO frontier, per-round tags, time-travel
    resume), run in a subprocess so the jar-configured SparkSession does
    not collide with the suite's shared JVM."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, ICEBERG_JAR=_find_iceberg_jar())
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "iceberg_smoke.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=repo,
        timeout=1200,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "ICEBERG_SMOKE_OK" in out.stdout
