"""Round-4 sketch/centrality battery: HyperLogLog cardinality,
Count-Min heavy hitters, HITS hubs/authorities, and BM25 retrieval.

Same contract as battery.py. The sketch oracles recompute the SAME
deterministic md5-register construction in pure SQL — agreement
verifies the register arithmetic, the exact-integer harmonic sum, and
the estimator corrections, not just row counts. The HITS oracle
unrolls the mutual power iteration into CTEs (the pagerank/kmeans
convention); BM25's oracle restates the Robertson scoring formula
over an independently-written SQL tokenizer.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.linkgraph import hits
from ..operators.postings import bm25_topk
from ..operators.sketches import cms_estimate, cms_sketch, hll_distinct
from .battery import T, q

_HEX = "'0123456789abcdef'"


def _hexv(frag: str) -> str:
    return f"(strpos({_HEX}, {frag}) - 1)"


# ---------------------------------------------------------------------------
# HyperLogLog distinct-per-shard (p=8 -> 256 registers)
# ---------------------------------------------------------------------------

_HLL_SQL = f"""
WITH elems AS (
  SELECT CAST(event_id % 4 AS INT) AS shard,
         CAST(user_id AS VARCHAR) AS elem
  FROM events
),
hx AS (SELECT shard, md5(elem) AS h FROM elems),
pre AS (
  SELECT shard, h,
         regexp_replace(substr(h, 3, 14), '^0+', '') AS t
  FROM hx
),
reg AS (
  SELECT shard,
         {_hexv("substr(h, 1, 1)")} * 16 + {_hexv("substr(h, 2, 1)")} AS idx,
         CASE WHEN t = '' THEN 57
              ELSE (14 - length(t)) * 4
                   + CASE WHEN {_hexv("substr(t, 1, 1)")} >= 8 THEN 0
                          WHEN {_hexv("substr(t, 1, 1)")} >= 4 THEN 1
                          WHEN {_hexv("substr(t, 1, 1)")} >= 2 THEN 2
                          ELSE 3 END
                   + 1
         END AS rho
  FROM pre
),
regmax AS (SELECT shard, idx, max(rho) AS rho FROM reg GROUP BY shard, idx),
agg AS (
  SELECT shard,
         sum(1::BIGINT << (57 - rho)) AS s_int,
         count(*) AS n_reg
  FROM regmax GROUP BY shard
),
raws AS (
  SELECT shard, (256 - n_reg) AS zeros,
         (0.7213e0 / (1.0e0 + 1.079e0 / 256.0e0)) * 65536.0e0
           * 144115188075855872.0e0
           / (CAST(s_int AS DOUBLE)
              + CAST(256 - n_reg AS DOUBLE) * 144115188075855872.0e0) AS raw
  FROM agg
),
est AS (
  SELECT shard,
         CASE WHEN raw <= 2.5e0 * 256 AND zeros > 0
              THEN 256.0e0 * ln(256.0e0 / CAST(zeros AS DOUBLE))
              ELSE raw END AS e
  FROM raws
),
exact AS (
  SELECT CAST(event_id % 4 AS INT) AS shard,
         count(DISTINCT user_id)::BIGINT AS n_exact
  FROM events GROUP BY 1
)
SELECT est.shard, exact.n_exact, round(est.e, 4) AS hll_estimate
FROM est JOIN exact USING (shard)
"""


@q("hll_distinct", _HLL_SQL)
def q_hll_distinct(spark, sf_dir):
    """Beyond-ref: HyperLogLog distinct-user estimate per frontier
    shard (operators/sketches.py). p=8 / 256 registers, exact-integer
    harmonic sum (sum of 2^(57-rho) as decimal — no order-dependent
    float accumulation), linear-counting small-range correction. The
    oracle rebuilds the identical register table in SQL, so a
    register-index, rho, or estimator bug breaks the hash. Scale: the
    shuffle carries <=256 rows per shard regardless of stream size,
    and registers merge by max — the 100 TB shape."""
    ev = T(spark, sf_dir, "events")
    elems = ev.select(
        (F.col("event_id") % 4).cast("int").alias("shard"),
        F.col("user_id").alias("elem"),
    )
    est = hll_distinct(elems, "elem", ["shard"], p=8)
    exact = elems.groupBy("shard").agg(
        F.count_distinct("elem").cast("long").alias("n_exact")
    )
    return exact.join(est, "shard").select("shard", "n_exact", "hll_estimate")


# ---------------------------------------------------------------------------
# Count-Min heavy hitters (d=4, w=64)
# ---------------------------------------------------------------------------

def _cms_col(row_frag: str) -> str:
    h = f"md5(CAST({row_frag} AS VARCHAR) || '|' || elem)"
    return (
        f"(({_hexv(f'substr({h}, 1, 1)')} * 16"
        f" + {_hexv(f'substr({h}, 2, 1)')}) % 64)"
    )


_CMS_SQL = f"""
WITH elems AS (
  SELECT CAST(CAST(floor(sqrt(event_id % 10000)) AS BIGINT) AS VARCHAR)
           AS elem
  FROM events
),
hashed AS (
  SELECT t.r AS rw, {_cms_col('t.r')} AS cl
  FROM elems, (VALUES (0), (1), (2), (3)) AS t(r)
),
cells AS (
  SELECT rw, cl, count(*)::BIGINT AS cnt FROM hashed GROUP BY rw, cl
),
cand AS (SELECT DISTINCT elem FROM elems),
candhash AS (
  SELECT elem, t.r AS rw, {_cms_col('t.r')} AS cl
  FROM cand, (VALUES (0), (1), (2), (3)) AS t(r)
),
est AS (
  SELECT ch.elem, min(coalesce(c.cnt, 0))::BIGINT AS cms_count
  FROM candhash ch LEFT JOIN cells c USING (rw, cl)
  GROUP BY ch.elem
),
exact AS (SELECT elem, count(*)::BIGINT AS n_exact FROM elems GROUP BY elem)
SELECT elem, cms_count, n_exact FROM (
  SELECT est.elem, est.cms_count, exact.n_exact,
         row_number() OVER (ORDER BY est.cms_count DESC, est.elem) AS rn
  FROM est JOIN exact USING (elem)
) WHERE rn <= 10
"""


@q("cms_heavy_hitters", _CMS_SQL)
def q_cms_heavy_hitters(spark, sf_dir):
    """Beyond-ref: Count-Min heavy hitters (operators/sketches.py).
    The element stream floor(sqrt(event_id % 10000)) has linearly
    skewed frequencies (value k appears 2k+1 times per cycle); the
    engine builds the 4x64 sketch with ONE map-side-combinable
    aggregate and point-queries the distinct candidates via broadcast
    join, returning the top-10 by estimated count. The oracle rebuilds
    the same sketch in SQL — row-hash, cell, or min-query bugs break
    the hash; CMS >= exact always holds within one stream."""
    ev = T(spark, sf_dir, "events")
    elems = ev.select(
        F.floor(F.sqrt(F.col("event_id") % 10000)).cast("bigint").alias("elem")
    )
    sketch = cms_sketch(elems, "elem", depth=4, width=64)
    cand = elems.distinct()
    est = cms_estimate(sketch, cand, "elem", depth=4, width=64)
    exact = elems.select(F.col("elem").cast("string").alias("elem")).groupBy(
        "elem"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    from pyspark.sql import Window

    w = Window.orderBy(F.col("cms_count").desc(), F.col("elem").asc())
    return (
        est.join(exact, "elem")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("elem", "cms_count", "n_exact")
    )


# ---------------------------------------------------------------------------
# HITS hubs/authorities (unrolled-CTE oracle, pagerank convention)
# ---------------------------------------------------------------------------

def _hits_sql(n_iter: int) -> str:
    its = []
    prev_hub = "h0"
    auth = None
    for i in range(n_iter):
        auth = f"a{i + 1}"
        hub = f"h{i + 1}"
        its.append(f"""
    {auth}r AS (
      SELECT n.node, coalesce(s.v, 0.0e0) AS a_raw
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, sum(e.weight * h.hub) AS v
        FROM edges e JOIN {prev_hub} h ON e.src = h.node GROUP BY e.dst
      ) s USING (node)),
    {auth}n AS (SELECT sqrt(sum(a_raw * a_raw)) AS nrm FROM {auth}r),
    {auth} AS (SELECT node, a_raw / (SELECT nrm FROM {auth}n) AS authority
               FROM {auth}r),
    {hub}r AS (
      SELECT n.node, coalesce(s.v, 0.0e0) AS h_raw
      FROM nodes n LEFT JOIN (
        SELECT e.src AS node, sum(e.weight * a.authority) AS v
        FROM edges e JOIN {auth} a ON e.dst = a.node GROUP BY e.src
      ) s USING (node)),
    {hub}n AS (SELECT sqrt(sum(h_raw * h_raw)) AS nrm FROM {hub}r),
    {hub} AS (SELECT node, h_raw / (SELECT nrm FROM {hub}n) AS hub
              FROM {hub}r)""")
        prev_hub = hub
    return f"""
    WITH edges AS (
      SELECT 's' || (l_suppkey % 40) AS src,
             'p' || (l_partkey % 40) AS dst,
             count(*)::DOUBLE AS weight
      FROM lineitem GROUP BY 1, 2
    ),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
    ),
    h0 AS (SELECT node, 1.0e0 AS hub FROM nodes),
    {",".join(its)}
    SELECT n.node, round({auth}.authority, 6) AS authority,
           round({prev_hub}.hub, 6) AS hub
    FROM nodes n JOIN {auth} USING (node) JOIN {prev_hub} USING (node)
    """


@q("hits_scores", _hits_sql(3))
def q_hits_scores(spark, sf_dir):
    """Beyond-ref: HITS hubs/authorities (operators/linkgraph.py:hits)
    over a bipartite supplier->part graph (40+40 nodes) — the
    complementary crawl-priority signal to host_pagerank (authorities
    = content hosts worth fetch budget, hubs = directories worth
    outlink discovery). 3 mutual power iterations, per-iteration L2
    norms as 1-row scalars; the oracle unrolls all 6 half-steps into
    CTEs, so a missed normalization or transposed join breaks the
    hash."""
    li = T(spark, sf_dir, "lineitem")
    edges = (
        li.select(
            F.concat(F.lit("s"), (F.col("l_suppkey") % 40).cast("string"))
            .alias("src"),
            F.concat(F.lit("p"), (F.col("l_partkey") % 40).cast("string"))
            .alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
    )
    return hits(edges, n_iter=3, round_to=6)


# ---------------------------------------------------------------------------
# BM25 retrieval
# ---------------------------------------------------------------------------

_BM25_TERMS = ["join", "vector", "stream"]
_BM25_SQL = f"""
WITH tokens AS (
  SELECT doc, lower(t) AS term FROM (
    SELECT doc_id AS doc,
           unnest(string_split_regex(text, '[^A-Za-z]+')) AS t
    FROM documents
  ) WHERE length(t) >= 2
),
dl AS (SELECT doc, count(*)::BIGINT AS dl FROM tokens GROUP BY doc),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM documents),
ad AS (SELECT sum(dl)::DOUBLE / (SELECT n FROM nd) AS avgdl FROM dl),
tf AS (
  SELECT term, doc, count(*)::BIGINT AS tf FROM tokens
  WHERE term IN ({", ".join(f"'{t}'" for t in _BM25_TERMS)})
  GROUP BY term, doc
),
dft AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
scored AS (
  SELECT doc,
         round(sum(
           ln(1.0e0 + ((SELECT n FROM nd) - df + 0.5e0) / (df + 0.5e0))
           * (tf * 2.2e0)
           / (tf + 1.2e0 * (0.25e0 + 0.75e0 * dl / (SELECT avgdl FROM ad)))
         ), 4) AS score,
         count(*)::BIGINT AS n_terms_hit
  FROM tf JOIN dft USING (term) JOIN dl USING (doc)
  GROUP BY doc
)
SELECT doc, score, n_terms_hit FROM (
  SELECT doc, score, n_terms_hit,
         row_number() OVER (ORDER BY score DESC, doc) AS rn
  FROM scored
) WHERE rn <= 20
"""


@q("bm25_topk", _BM25_SQL)
def q_bm25_topk(spark, sf_dir):
    """Beyond-ref: Okapi BM25 top-20 retrieval over the document
    corpus (operators/postings.py:bm25_topk), Lucene idf variant,
    k1=1.2 b=0.75. The oracle restates the scoring formula over an
    independently written SQL tokenizer; doc-length normalization,
    idf, and the deterministic (score, doc) tiebreak are all under the
    hash. Scale: tf touches only query-term rows, corpus stats are
    scalars, the tokenizer is the same in-row native split as
    term_postings."""
    docs = T(spark, sf_dir, "documents")
    out = bm25_topk(
        docs, _BM25_TERMS, k1=1.2, b=0.75, top_k=20, round_to=4
    )
    return out.select("doc", "score", "n_terms_hit")
