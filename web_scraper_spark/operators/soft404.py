"""Soft-404 detection: error pages served with HTTP 200.

Hosts commonly return a friendly "page not found" page with status 200,
which poisons both the crawl frontier (dead URLs look alive, get
re-crawled on schedule) and the training corpus (thousands of identical
"sorry" pages per host). The reference scraper never detects these — it
trusts status codes (src/core/tracker/nausys_tracker.py fetch loop) —
so this is a beyond-reference crawl-quality operator, following the
signal taxonomy of Bar-Yossef et al., "Sic Transit Gloria Telae" (WWW
2004): content signals (error phrasing, near-empty body) plus the
host-template signal (many URLs on one host sharing one body is the
signature of a catch-all error page).

Scale shape: two pure-Column signals plus ONE window count over
(host, body-fingerprint) — a single shuffle keyed by host+fp, which is
well-distributed (each host contributes as many groups as distinct
bodies). No Python, no collect; at 100 TB the template count is a
standard partial-aggregating window.

Scoring (deterministic, twin-checkable):
- phrase (weight 2): body matches an error-phrase pattern;
- tiny (weight 1): fewer than ``tiny_tokens`` whitespace tokens;
- template (weight 2): >= ``min_template_pages`` URLs on the host share
  this exact body AND that body carries the error phrase (repetition
  alone is not an error signal — sparse sites legitimately mirror
  pages; an error phrase alone on a unique page may be prose ABOUT
  404s).
A page is soft-404 when score >= 3: phrase+tiny, phrase+template, or
template alone (which implies phrase) — but never tiny alone or a
single unique page merely mentioning 404.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ERROR_PHRASE = (
    r"(page not found|404|not be found|no longer available|"
    r"does not exist|been removed|been deleted)"
)


def detect_soft404(
    pages: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    tiny_tokens: int = 15,
    min_template_pages: int = 3,
) -> DataFrame:
    """Flag probable soft-404 pages.

    Input: one row per fetched URL with its host and extracted body
    text. Output adds (has_error_phrase, is_tiny, is_error_template,
    soft404_score, is_soft404) to every input row.
    """
    body = F.lower(F.trim(F.col(text_col)))
    has_phrase = body.rlike(ERROR_PHRASE)
    n_tokens = F.when(body == "", F.lit(0)).otherwise(
        F.size(F.split(body, r"\s+"))
    )
    is_tiny = n_tokens < tiny_tokens

    # template signal: count URLs on this host sharing this exact body.
    # The window keys on xxhash64(body) so the shuffle moves an 8-byte
    # key, not page bodies; the count is exact for our purposes (a
    # cross-body hash collision within one host is ~2^-64).
    w = Window.partitionBy(host_col, F.xxhash64(body))
    template_count = F.count(F.lit(1)).over(w)
    is_template = (template_count >= min_template_pages) & has_phrase

    score = (
        F.when(has_phrase, 2).otherwise(0)
        + F.when(is_tiny, 1).otherwise(0)
        + F.when(is_template, 2).otherwise(0)
    )
    return pages.select(
        "*",
        has_phrase.alias("has_error_phrase"),
        is_tiny.alias("is_tiny"),
        is_template.alias("is_error_template"),
        score.cast("int").alias("soft404_score"),
        (score >= 3).alias("is_soft404"),
    )
