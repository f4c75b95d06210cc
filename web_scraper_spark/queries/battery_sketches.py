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


# ---------------------------------------------------------------------------
# TrustRank / spam mass / OPIC (unrolled-CTE oracles, pagerank convention)
# ---------------------------------------------------------------------------

_TR_SEEDS = ("h3", "h17", "h29")


def _host_graph_prefix() -> str:
    """Shared host-graph CTEs — identical to _pagerank_sql's prefix in
    battery.py (events-derived 50->60 host graph, 10 dangling hosts)."""
    return """
    e0 AS (
      SELECT 'h' || (user_id % 50) AS src, 'h' || (event_id % 60) AS dst
      FROM events
    ),
    edges AS (
      SELECT src, dst, count(*)::BIGINT AS weight
      FROM e0 WHERE src <> dst GROUP BY src, dst
    ),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
    ),
    nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
    outw AS (SELECT src, sum(weight)::DOUBLE AS out_w
             FROM edges GROUP BY src),
    trans AS (SELECT e.src, e.dst, e.weight / o.out_w AS p
              FROM edges e JOIN outw o USING (src)),
    dang AS (SELECT node FROM nodes
             WHERE node NOT IN (SELECT src FROM edges))"""


def _pr_chain(n_iter: int) -> str:
    """Uniform-teleport PageRank iterations r0..r{n} (same arithmetic
    as battery._pagerank_sql; e0-suffixed literals keep DuckDB in
    DOUBLE so both engines run identical IEEE ops)."""
    its = ["r0 AS (SELECT node, 1.0e0 / (SELECT n FROM nn) AS rank FROM nodes)"]
    for i in range(n_iter):
        its.append(f"""
    d{i} AS (SELECT coalesce(sum(r.rank), 0.0e0) AS mass
             FROM dang JOIN r{i} r USING (node)),
    c{i} AS (SELECT t.dst, sum(t.p * r.rank) AS contrib
             FROM trans t JOIN r{i} r ON t.src = r.node GROUP BY t.dst),
    r{i + 1} AS (
      SELECT n.node,
             (1.0e0 - 0.85e0) / (SELECT n FROM nn)
             + 0.85e0 * (coalesce(c.contrib, 0.0e0)
                         + (SELECT mass FROM d{i}) / (SELECT n FROM nn))
             AS rank
      FROM nodes n LEFT JOIN c{i} c ON n.node = c.dst)""")
    return ",".join(its)


def _tr_chain(n_iter: int) -> str:
    """TrustRank iterations g0..g{n}: same power iteration, teleport
    vector concentrated on the seed set (operators/linkgraph.py:
    trustrank) — dangling mass flows to the SEEDS, not uniformly."""
    seeds = ", ".join(f"'{s}'" for s in _TR_SEEDS)
    its = [
        f"""ns AS (SELECT count(*)::DOUBLE AS k FROM nodes
             WHERE node IN ({seeds})),
    tele AS (SELECT node,
                    CASE WHEN node IN ({seeds})
                         THEN 1.0e0 / (SELECT k FROM ns)
                         ELSE 0.0e0 END AS t
             FROM nodes),
    g0 AS (SELECT node, t AS rank FROM tele)"""
    ]
    for i in range(n_iter):
        its.append(f"""
    gd{i} AS (SELECT coalesce(sum(r.rank), 0.0e0) AS mass
              FROM dang JOIN g{i} r USING (node)),
    gc{i} AS (SELECT t.dst, sum(t.p * r.rank) AS contrib
              FROM trans t JOIN g{i} r ON t.src = r.node GROUP BY t.dst),
    g{i + 1} AS (
      SELECT n.node,
             (1.0e0 - 0.85e0) * te.t
             + 0.85e0 * (coalesce(c.contrib, 0.0e0)
                         + (SELECT mass FROM gd{i}) * te.t)
             AS rank
      FROM nodes n JOIN tele te USING (node)
      LEFT JOIN gc{i} c ON n.node = c.dst)""")
    return ",".join(its)


def _battery_linkgraph_edges(spark, sf_dir):
    from .battery import _battery_host_edges

    return _battery_host_edges(spark, sf_dir)


_TRUSTRANK_SQL = f"""
WITH {_host_graph_prefix()},
    {_tr_chain(2)}
SELECT node, round(rank, 6) AS trust FROM g2
"""


@q("trustrank_scores", _TRUSTRANK_SQL)
def q_trustrank_scores(spark, sf_dir):
    """Beyond-ref: TrustRank (Gyöngyi, Garcia-Molina & Pedersen,
    VLDB'04) over the same 60-host graph as host_pagerank with 3
    trusted seeds — trust teleports to the seed set only, so hosts
    unreachable from the good core score ~0 regardless of in-degree.
    2 power iterations; the oracle unrolls both with the seed-weighted
    teleport, so a uniform-teleport slip or mis-routed dangling mass
    breaks the hash."""
    from ..operators.linkgraph import trustrank

    return trustrank(
        _battery_linkgraph_edges(spark, sf_dir),
        list(_TR_SEEDS),
        n_iter=2,
        damping=0.85,
        round_to=6,
    )


_SPAM_MASS_SQL = f"""
WITH {_host_graph_prefix()},
    {_pr_chain(2)},
    {_tr_chain(2)}
SELECT n.node,
       round(p.rank, 6) AS pr,
       round(g.rank, 6) AS trust,
       round((round(p.rank, 6) - round(g.rank, 6)) / round(p.rank, 6), 6)
         AS spam_mass
FROM nodes n JOIN r2 p USING (node) JOIN g2 g USING (node)
"""


@q("spam_mass_hosts", _SPAM_MASS_SQL)
def q_spam_mass_hosts(spark, sf_dir):
    """Beyond-ref: relative spam mass (Gyöngyi et al. VLDB'06) — the
    PageRank fraction NOT explained by trust from the seed core; the
    frontier demotion signal for manufactured-rank hosts. Runs BOTH
    2-iteration chains (uniform + seed teleport) and joins them; the
    oracle unrolls all four iterations in one WITH."""
    from ..operators.linkgraph import pagerank, spam_mass, trustrank

    edges = _battery_linkgraph_edges(spark, sf_dir)
    pr = pagerank(edges, n_iter=2, damping=0.85)
    tr = trustrank(edges, list(_TR_SEEDS), n_iter=2, damping=0.85)
    return spam_mass(pr, tr)


def _opic_chain(n_iter: int) -> str:
    its = [
        """ch0 AS (SELECT node, 1.0e0 / (SELECT n FROM nn) AS cash,
                         0.0e0 AS hist FROM nodes)"""
    ]
    for i in range(n_iter):
        its.append(f"""
    od{i} AS (SELECT coalesce(sum(c.cash), 0.0e0) AS mass
              FROM dang JOIN ch{i} c USING (node)),
    oc{i} AS (SELECT t.dst, sum(t.p * c.cash) AS contrib
              FROM trans t JOIN ch{i} c ON t.src = c.node GROUP BY t.dst),
    ch{i + 1} AS (
      SELECT n.node,
             coalesce(o.contrib, 0.0e0)
               + (SELECT mass FROM od{i}) / (SELECT n FROM nn) AS cash,
             c.hist + c.cash AS hist
      FROM nodes n JOIN ch{i} c USING (node)
      LEFT JOIN oc{i} o ON n.node = o.dst)""")
    return ",".join(its)


_OPIC_SQL = f"""
WITH {_host_graph_prefix()},
    {_opic_chain(3)}
SELECT node, round((hist + cash) / 4.0e0, 6) AS importance FROM ch3
"""


@q("opic_scores", _OPIC_SQL)
def q_opic_scores(spark, sf_dir):
    """Beyond-ref: OPIC (Abiteboul, Preda & Cobéna, WWW'03) — the
    cash/history frontier-importance estimate, unbiased at any
    stopping point (no convergence wait between crawl rounds). 3
    batch-synchronous supersteps over the 60-host graph; total
    history+cash is conserved at supersteps+1 exactly, and the oracle
    replays every cash transfer, so a lost dangling coin or an
    off-by-one history bank breaks the hash."""
    from ..operators.linkgraph import opic

    return opic(_battery_linkgraph_edges(spark, sf_dir), n_iter=3, round_to=6)
