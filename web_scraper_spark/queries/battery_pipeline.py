"""Round-4 pipeline battery: sessionization, word-bigram LM scoring,
link reciprocity, and SemDeDup semantic pruning.

Same contract as battery.py: each entry pairs the engine query with a
DuckDB oracle that computes the same answer by an INDEPENDENT method —
sessions by lag/island instead of ``session_window``, reciprocity by
EXISTS-self-join instead of the unordered-pair-key agg, SemDeDup
assignment by CROSS JOIN + row_number instead of the broadcast-array
fold — so agreement verifies the algorithm, not a shared
implementation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.chunking import chunk_documents
from ..operators.linkspam import reciprocity_stats
from ..operators.lm_words import score_bigram_lm, train_bigram_lm
from ..operators.semdedup import semdedup_prune
from ..operators.sessions import sessionize
from ..operators.soft404 import detect_soft404
from .battery import T, q

# ---------------------------------------------------------------------------
# sessionization — native session_window vs lag/island oracle
# ---------------------------------------------------------------------------


@q(
    "session_windows",
    """
    WITH o AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*)::BIGINT AS n_events,
           round(sum(value), 4) AS sum_value
    FROM s GROUP BY user_id, sid
    """,
)
def q_session_windows(spark, sf_dir):
    """Gap-based sessionization (operators/sessions.py) via Spark's
    NATIVE ``session_window`` — one shuffle on the key, map-side
    session merge, streaming-compatible. The oracle computes sessions
    by the independent lag > gap island method, so the touching-window
    boundary semantics (exactly-gap events merge) and the
    ``last_ts + gap`` window end are both pinned."""
    ev = T(spark, sf_dir, "events")
    return sessionize(ev, gap="30 minutes")


# ---------------------------------------------------------------------------
# word-bigram LM — train two hash aggs, score one equi-join
# ---------------------------------------------------------------------------


@q(
    "bigram_lm_score",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(
               regexp_split_to_array(
                 lower(regexp_replace(text, '[^A-Za-z0-9]+', ' ', 'g')), ' '),
               t -> t <> '') AS tk
      FROM documents
    ), bg AS (
      SELECT doc_id,
             unnest(list_slice(tk, 1, len(tk) - 1)) AS w1,
             unnest(list_slice(tk, 2, len(tk))) AS w2
      FROM toks WHERE len(tk) >= 2
    ), bc AS (SELECT w1, w2, count(*)::DOUBLE AS cb FROM bg GROUP BY 1, 2),
       hist AS (SELECT w1, count(*)::DOUBLE AS ch FROM bg GROUP BY 1),
       v AS (SELECT count(DISTINCT t)::DOUBLE AS vs
             FROM (SELECT unnest(tk) AS t FROM toks)),
       scored AS (
         SELECT g.doc_id,
                log10((bc.cb + 0.5) / (hist.ch + 0.5 * v.vs)) AS logp
         FROM bg g
         JOIN bc USING (w1, w2)
         JOIN hist USING (w1)
         CROSS JOIN v
       )
    SELECT doc_id, count(*)::BIGINT AS n_bigrams, round(avg(logp), 6) AS lp_avg
    FROM scored GROUP BY doc_id
    """,
)
def q_bigram_lm_score(spark, sf_dir):
    """Word-level bigram LM (operators/lm_words.py): train add-0.5-
    smoothed bigram log-probs on the corpus (two map-side-combinable
    hash aggs — the shuffle is vocabulary-proportional, not token-
    proportional), then score every document with ONE (w1,w2)
    equi-join. The CCNet-style word-LM fluency signal next to the char
    LM in lmscore.py."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    model = train_bigram_lm(docs, alpha=0.5)
    return score_bigram_lm(docs, model)


# ---------------------------------------------------------------------------
# link reciprocity — unordered-pair-key agg vs EXISTS self-join oracle
# ---------------------------------------------------------------------------

_EDGE_SRC = "'h' || (user_id % 50)"
_EDGE_DST = "'h' || (event_id % 60)"


@q(
    "link_reciprocity",
    f"""
    WITH e AS (
      SELECT DISTINCT {_EDGE_SRC} AS src, {_EDGE_DST} AS dst
      FROM events
      WHERE (event_id + user_id) % 11 < 2 AND {_EDGE_SRC} <> {_EDGE_DST}
    ), od AS (SELECT src AS host, count(*)::BIGINT AS out_degree FROM e GROUP BY 1),
       idg AS (SELECT dst AS host, count(*)::BIGINT AS in_degree FROM e GROUP BY 1),
       rc AS (
         SELECT e1.src AS host, count(*)::BIGINT AS n_reciprocal
         FROM e e1
         WHERE EXISTS (SELECT 1 FROM e e2
                       WHERE e2.src = e1.dst AND e2.dst = e1.src)
         GROUP BY 1
       )
    SELECT h.host,
           coalesce(od.out_degree, 0) AS out_degree,
           coalesce(idg.in_degree, 0) AS in_degree,
           coalesce(rc.n_reciprocal, 0) AS n_reciprocal,
           CASE WHEN coalesce(od.out_degree, 0) > 0
                THEN round(coalesce(rc.n_reciprocal, 0)
                           / od.out_degree::DOUBLE, 6) END AS reciprocity,
           CASE WHEN coalesce(od.out_degree, 0) > 0
                THEN round(coalesce(idg.in_degree, 0)
                           / od.out_degree::DOUBLE, 6) END AS in_out_ratio
    FROM (SELECT host FROM od UNION SELECT host FROM idg) h
    LEFT JOIN od USING (host)
    LEFT JOIN idg USING (host)
    LEFT JOIN rc USING (host)
    """,
)
def q_link_reciprocity(spark, sf_dir):
    """Link-farm reciprocity signal (operators/linkspam.py): detects
    reciprocal edges WITHOUT a self-join — unordered pair key + one
    direction-count agg — on a sparse asymmetric synthetic host graph
    (~18% of events contribute an edge, so some edges reciprocate and
    some don't). Oracle recomputes via EXISTS self-join."""
    ev = T(spark, sf_dir, "events")
    edges = ev.filter((F.col("event_id") + F.col("user_id")) % 11 < 2).select(
        F.concat(F.lit("h"), (F.col("user_id") % 50).cast("string")).alias("src"),
        F.concat(F.lit("h"), (F.col("event_id") % 60).cast("string")).alias("dst"),
    )
    return reciprocity_stats(edges)


# ---------------------------------------------------------------------------
# SemDeDup — cluster-bounded semantic pruning (arXiv:2303.09540)
# ---------------------------------------------------------------------------

_SD_COS = (
    "round(list_dot_product({a}, {b}) / greatest("
    "sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})),"
    " 1e-12), 4)"
)


@q(
    "semdedup_prune",
    f"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
      UNION ALL
      SELECT vec_id + 100000, embedding::DOUBLE[] FROM embeddings
      WHERE vec_id % 25 = 0
    ), c AS (SELECT vec_id AS cell_id, ev AS cv FROM base WHERE vec_id < 8),
       asg AS (
         SELECT vec_id, ev, cell_id FROM (
           SELECT b.vec_id, b.ev, c.cell_id,
                  row_number() OVER (
                    PARTITION BY b.vec_id
                    ORDER BY {_SD_COS.format(a='b.ev', b='c.cv')} DESC, c.cell_id
                  ) AS r
           FROM base b CROSS JOIN c
         ) WHERE r = 1
       ),
       pm AS (
         SELECT a.vec_id,
                max({_SD_COS.format(a='a.ev', b='o.ev')}) AS max_cos_lower
         FROM asg a JOIN asg o
           ON a.cell_id = o.cell_id AND o.vec_id < a.vec_id
         GROUP BY 1
       )
    SELECT a.vec_id, a.cell_id, pm.max_cos_lower,
           coalesce(pm.max_cos_lower < 0.9, TRUE) AS keep
    FROM asg a LEFT JOIN pm USING (vec_id)
    """,
)
def q_semdedup_prune(spark, sf_dir):
    """SemDeDup pruning (operators/semdedup.py, arXiv:2303.09540):
    broadcast-fold cluster assignment + cluster-bounded pair join;
    exact duplicates injected (every 25th vector copied under a high
    id) so the tau=0.9 drop rule provably fires. Oracle recomputes
    assignment by CROSS JOIN + row_number — an independent method."""
    emb = T(spark, sf_dir, "embeddings")
    dups = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    corpus = emb.unionByName(dups)
    return semdedup_prune(corpus, tau=0.9, n_cells=8)


# ---------------------------------------------------------------------------
# token-window chunking — in-row sequence/posexplode vs range/unnest oracle
# ---------------------------------------------------------------------------


@q(
    "doc_chunk",
    r"""
    WITH d AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents
      WHERE trim(text) <> ''
    ), s AS (
      SELECT doc_id, toks, len(toks) AS n,
             unnest(range(0, len(toks), 24)) AS start
      FROM d
    )
    SELECT doc_id,
           CAST(start / 24 AS INT) AS chunk_id,
           CAST(start AS INT) AS chunk_start,
           CAST(least(32, n - start) AS INT) AS chunk_len,
           array_to_string(toks[start + 1:start + 32], ' ') AS chunk_text
    FROM s
    """,
)
def q_doc_chunk(spark, sf_dir):
    """Token-window chunking (operators/chunking.py): 32-token windows
    with 8-token overlap (stride 24) over the documents table — the
    shard-preparation step between corpus cleaning and sequence
    packing. Engine does split -> sequence(0, n-1, 24) -> posexplode
    in-row (zero shuffles); the oracle regenerates window starts with
    DuckDB's range()/unnest and slices the token list independently,
    so an off-by-one in start/stride/clamping breaks the hash."""
    docs = T(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=32, overlap_tokens=8)


# ---------------------------------------------------------------------------
# soft-404 detection — window template-count vs OVER-partition oracle
# ---------------------------------------------------------------------------

_S404_HOST = "'h' || CAST(doc_id % 20 AS VARCHAR) || '.example.com'"
_S404_BODY = """CASE WHEN doc_id % 7 = 0
        THEN 'Sorry, this page could not be found. Error 404.'
        WHEN doc_id % 11 = 3 THEN 'gone away'
        WHEN doc_id % 11 = 5 THEN 'error 404'
        ELSE text END"""


@q(
    "soft404_detect",
    rf"""
    WITH p AS (
      SELECT {_S404_HOST} AS host,
             'https://' || {_S404_HOST} || '/p/' || CAST(doc_id AS VARCHAR) AS url,
             {_S404_BODY} AS text
      FROM documents
    ), s AS (
      SELECT host, url,
             regexp_matches(lower(trim(text)),
               '(page not found|404|not be found|no longer available|does not exist|been removed|been deleted)')
               AS has_phrase,
             (CASE WHEN trim(text) = '' THEN 0
                   ELSE len(regexp_split_to_array(lower(trim(text)), '\s+')) END) < 15
               AS tiny,
             count(*) OVER (PARTITION BY host, lower(trim(text))) AS tc
      FROM p
    )
    SELECT host, url,
           has_phrase AS has_error_phrase,
           tiny AS is_tiny,
           (tc >= 4 AND has_phrase) AS is_error_template,
           CAST(CASE WHEN has_phrase THEN 2 ELSE 0 END
              + CASE WHEN tiny THEN 1 ELSE 0 END
              + CASE WHEN tc >= 4 AND has_phrase THEN 2 ELSE 0 END AS INT)
             AS soft404_score,
           (CASE WHEN has_phrase THEN 2 ELSE 0 END
              + CASE WHEN tiny THEN 1 ELSE 0 END
              + CASE WHEN tc >= 4 AND has_phrase THEN 2 ELSE 0 END) >= 3
             AS is_soft404
    FROM s
    """,
)
def q_soft404_detect(spark, sf_dir):
    """Soft-404 detection (operators/soft404.py, Bar-Yossef WWW'04
    signals): documents become pages on 20 synthetic hosts; every
    doc_id % 7 == 0 page serves the host's catch-all error body
    (template counts land on 3 or 4 per host, straddling the
    min_template_pages=4 boundary), % 11 == 3 is tiny-but-clean
    (score 1, must NOT flag), % 11 == 5 is tiny+phrase (score 3,
    must flag without the template signal). Oracle recomputes the
    template count by OVER (PARTITION BY host, body) on raw text —
    the engine windows on xxhash64(body) — so they agree only if the
    hash-keyed shuffle preserves exact body identity."""
    docs = T(spark, sf_dir, "documents")
    host = F.concat(
        F.lit("h"), (F.col("doc_id") % 20).cast("string"), F.lit(".example.com")
    )
    pages = docs.select(
        host.alias("host"),
        F.concat(
            F.lit("https://"), host, F.lit("/p/"), F.col("doc_id").cast("string")
        ).alias("url"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.lit("Sorry, this page could not be found. Error 404."),
        )
        .when(F.col("doc_id") % 11 == 3, F.lit("gone away"))
        .when(F.col("doc_id") % 11 == 5, F.lit("error 404"))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return detect_soft404(pages, min_template_pages=4).drop("text")
