"""Mergeable cardinality / frequency sketches for crawl telemetry.

At a 10^10-URL frontier, "how many distinct URLs per host bucket" and
"which hosts dominate the fetch log" cannot be answered with exact
`count(distinct)` / full sorts every round — the standard answers are
HyperLogLog (Flajolet et al. 2007) and Count-Min (Cormode &
Muthukrishnan 2005), both **mergeable**: per-partition sketches combine
by max / sum, so the shuffle carries O(registers) rows per group, never
the element stream. The reference has no corpus-level statistics at all
(one Mongo document per page); these are the web-scale reduction.

Shapes at 100 TB:
- ``hll_registers`` is ONE hash aggregate on (group, register-index):
  map-side combinable max, 2^p rows per group on the wire.
- ``hll_estimate`` is ONE aggregate over those registers per group.
- ``cms_sketch`` is ONE hash aggregate on (row, col) — d*w cells total
  (a few KB), map-side combinable sum; querying candidates is a
  broadcast join against those cells.

Hashing is md5-hex arithmetic built ONLY from engine-portable string
ops (locate / substr / regexp_replace), so every sketch has a
byte-identical ANSI-SQL oracle; the HLL register sum is kept in exact
integer arithmetic (sum of 2^(57-rho) as decimal) so the estimate is a
single deterministic float expression on both engines — no
order-dependent float accumulation anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_registers",
    "hll_estimate",
    "hll_distinct",
    "cms_sketch",
    "cms_estimate",
]

_HEX = "0123456789abcdef"
# 2^57: one register's integer weight is 2^(57 - rho), rho in [1, 57];
# an empty register (rho = 0) weighs the full 2^57.
_POW2_57 = 1 << 57


def _hexv_sql(frag: str) -> Column:
    """Value 0..15 of a single lowercase hex character (portable:
    ``locate(c, '0123456789abcdef') - 1`` evaluates identically to
    DuckDB's ``strpos('0123456789abcdef', c) - 1``)."""
    return F.expr(f"locate({frag}, '{_HEX}') - 1")


def hll_registers(
    df: DataFrame,
    element_col: str,
    group_cols: list[str],
    p: int = 8,
) -> DataFrame:
    """Per-group HLL registers ``(group..., idx, rho)``.

    md5(element) supplies the hash: the first ``p/4`` hex chars pick
    the register index, the next 14 hex chars (56 bits) supply
    rho = 1 + leading-zero-count. p must be a multiple of 4 (hex-char
    aligned) — the portable-SQL constraint.
    """
    if p % 4 != 0:
        raise ValueError("p must be a multiple of 4 (hex-aligned)")
    nidx = p // 4
    h = F.md5(F.col(element_col).cast("string"))
    idx = F.lit(0)
    for i in range(nidx):
        idx = idx * 16 + _hexv_sql(f"substr(md5(cast({element_col} as string)), {i + 1}, 1)")
    tail = F.substring(h, nidx + 1, 14)
    t = F.regexp_replace(tail, "^0+", "")
    first = _hexv_sql(
        f"substr(regexp_replace(substr(md5(cast({element_col} as string)),"
        f" {nidx + 1}, 14), '^0+', ''), 1, 1)"
    )
    nibble_lz = (
        F.when(first >= 8, 0)
        .when(first >= 4, 1)
        .when(first >= 2, 2)
        .otherwise(3)
    )
    rho = F.when(t == "", F.lit(57)).otherwise(
        (14 - F.length(t)) * 4 + nibble_lz + 1
    )
    return (
        df.select(*group_cols, idx.alias("idx"), rho.alias("rho"))
        .groupBy(*group_cols, "idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame, group_cols: list[str], p: int = 8
) -> DataFrame:
    """Group cardinality estimates from HLL registers.

    Exact-integer register sum: each register contributes 2^(57-rho),
    each of the (m - observed) empty registers contributes 2^57; the
    harmonic-mean estimator divides once in float, so the result is a
    deterministic function of integers. Small-range correction
    (linear counting) applies below 2.5*m when empty registers exist.
    """
    m = 1 << p
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    agg = registers.groupBy(*group_cols).agg(
        F.sum(
            # SQL shiftleft accepts a column shift amount (the pyspark
            # wrapper doesn't): one register weighs 2^(57 - rho), exact
            F.expr("cast(shiftleft(1L, 57 - rho) as decimal(38,0))")
        ).alias("s_int"),
        F.count(F.lit(1)).alias("n_reg"),
    )
    zeros = F.lit(m) - F.col("n_reg")
    denom = (
        F.col("s_int").cast("double")
        + zeros.cast("double") * F.lit(float(_POW2_57))
    )
    raw = alpha * F.lit(float(m * m)) * F.lit(float(_POW2_57)) / denom
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols, F.round(est, 4).alias("hll_estimate")
    )


def hll_distinct(
    df: DataFrame,
    element_col: str,
    group_cols: list[str],
    p: int = 8,
) -> DataFrame:
    """(group..., hll_estimate) — registers + estimate in one pipeline."""
    return hll_estimate(
        hll_registers(df, element_col, group_cols, p=p), group_cols, p=p
    )


def cms_sketch(
    df: DataFrame,
    element_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Count-Min sketch cells ``(row, col, cnt)`` for a stream of
    elements (one occurrence per input row).

    Row j's hash is md5(j || '|' || element); the column is the first
    two hex chars' value mod width. depth*width cells total — the
    groupBy is map-side combinable, so the wire carries the sketch,
    not the stream.
    """
    rows = F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("row")
    e = df.select(F.col(element_col).cast("string").alias("elem"), rows)
    # row j's hash: md5(j || '|' || elem); first two hex chars mod width
    col = (
        _hexv_sql("substr(md5(concat(cast(row as string), '|', elem)), 1, 1)")
        * 16
        + _hexv_sql("substr(md5(concat(cast(row as string), '|', elem)), 2, 1)")
    ) % width
    return (
        e.select("row", col.alias("col"))
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    element_col: str = "elem",
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point-query the sketch: est(x) = min over rows of cell(j, h_j(x)).

    ``candidates`` is small (the heavy-hitter shortlist) — it explodes
    to depth rows each and broadcast-joins the d*w-cell sketch.
    """
    rows = F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("row")
    c = candidates.select(
        F.col(element_col).cast("string").alias("elem"), rows
    )
    col = (
        _hexv_sql("substr(md5(concat(cast(row as string), '|', elem)), 1, 1)")
        * 16
        + _hexv_sql("substr(md5(concat(cast(row as string), '|', elem)), 2, 1)")
    ) % width
    return (
        c.select("elem", "row", col.alias("col"))
        .join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy("elem")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("cms_count"))
    )
