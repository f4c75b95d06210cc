"""Text-analysis functions for web-scale corpus curation — pure Columns.

Beyond the reference's operator set: the standard text-quality toolkit a
training-data pipeline runs over a Common-Crawl-style ``documents`` /
``pages.text`` column. Everything is native Spark SQL expressions
(codegen'd, no Python), designed so an equivalent ANSI-SQL oracle exists
for the driver's DuckDB cross-check.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "token_count",
    "bpe_ish_token_count",
    "stopword_count",
    "lang_id",
    "quality_features",
    "quality_score",
    "ngram_dup_fraction",
    "line_noise_features",
    "fingerprint",
    "pii_counts",
    "scrub_pii",
    "PII_EMAIL_RE",
    "PII_IPV4_RE",
    "PII_PHONE_RE",
    "EN_STOPWORDS",
    "TR_STOPWORDS",
]

# tiny deterministic stopword inventories for the n-gram/stopword
# language heuristic (public-knowledge lists)
EN_STOPWORDS = ["the", "and", "of", "to", "in", "is", "that", "for", "with", "as"]
TR_STOPWORDS = ["ve", "bir", "bu", "da", "de", "için", "ile", "olarak", "en", "çok"]


def tokens(text: Column) -> Column:
    """Whitespace tokens, empties dropped (portable to DuckDB
    ``regexp_split_to_array`` + ``list_filter``)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: runs of letters, runs of digits, or a
    single non-space symbol each count as one token (a BPE-flavored
    regex segmentation, deterministic and SQL-portable)."""
    stripped = F.regexp_replace(text, r"[A-Za-z]+|[0-9]+", "x")
    # every letter-run/digit-run collapsed to one char; remaining
    # non-space chars are symbol tokens
    return F.length(F.regexp_replace(stripped, r"\s+", ""))


def stopword_count(text: Column, stopwords: list[str]) -> Column:
    lowered = F.lower(text)
    toks = tokens(lowered)
    sw = F.array(*[F.lit(w) for w in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def lang_id(text: Column) -> Column:
    """Stopword-vote language guess: 'en' vs 'tr' vs 'und'."""
    en = stopword_count(text, EN_STOPWORDS)
    tr = stopword_count(text, TR_STOPWORDS)
    return (
        F.when((en == 0) & (tr == 0), F.lit("und"))
        .when(en >= tr, F.lit("en"))
        .otherwise(F.lit("tr"))
    )


def quality_features(text: Column) -> dict[str, Column]:
    """The classic quality-scoring feature set (length / punctuation /
    stopword / alpha ratios)."""
    n_chars = F.length(text)
    n_tokens = token_count(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    n_stop = stopword_count(text, EN_STOPWORDS)
    safe_chars = F.greatest(n_chars, F.lit(1))
    safe_toks = F.greatest(n_tokens, F.lit(1))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": F.round(n_chars / safe_toks.cast("double"), 4),
        "alpha_ratio": F.round(n_alpha / safe_chars.cast("double"), 4),
        "punct_ratio": F.round(n_punct / safe_chars.cast("double"), 4),
        "stopword_ratio": F.round(n_stop / safe_toks.cast("double"), 4),
    }


def ngram_dup_fraction(text: Column, n: int = 3) -> Column:
    """Within-document repetition signal: the fraction of a document's
    token ``n``-grams that are repeats of an earlier one —
    ``1 - distinct_ngrams / total_ngrams`` (the Gopher-family duplicate
    n-gram filter). Pure array Columns: tokens → sliding n-grams via
    ``transform(sequence(...))`` → ``array_distinct`` — zero shuffle,
    zero Python, and a direct DuckDB twin (``list_transform`` +
    ``list_distinct``). Documents with fewer than ``n`` tokens score 0.
    """
    lowered = F.lower(text)
    toks = tokens(lowered)
    k = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(0))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    return F.when(k <= 0, F.lit(0.0)).otherwise(
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(grams)).cast("double") / F.size(grams),
            4,
        )
    )


def line_noise_features(text: Column) -> dict[str, Column]:
    """Line-structure noise signals for extracted page text (the
    RefinedWeb-style boilerplate heuristics): short-line and bullet-line
    fractions flag navigation/menu residue, mean line length flags
    fragmented extraction. Pure array Columns over ``split('\\n')`` —
    no shuffle, no Python; DuckDB twin via ``string_split`` +
    ``list_filter``. Empty input → one empty line (split semantics),
    fractions 0 or 1 accordingly; callers gate on ``n_lines``.
    """
    lines = F.split(text, r"\n")
    n_lines = F.size(lines)
    denom = F.greatest(n_lines, F.lit(1)).cast("double")

    def line_tokens(l: Column) -> Column:
        return F.size(F.filter(F.split(l, r"\s+"), lambda t: t != ""))

    short = F.size(F.filter(lines, lambda l: line_tokens(l) < 5))
    bullet = F.size(
        F.filter(lines, lambda l: F.ltrim(l).rlike(r"^[-*•]"))
    )
    total_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda acc, l: acc + F.length(l)
    )
    return {
        "n_lines": n_lines,
        "short_line_fraction": F.round(short / denom, 4),
        "bullet_line_fraction": F.round(bullet / denom, 4),
        "mean_line_chars": F.round(total_chars / denom, 4),
    }


def quality_score(text: Column) -> Column:
    """Scalar quality score in [0,1]: rewards alpha-heavy, stopword-
    bearing prose of reasonable length; penalizes punctuation soup.
    Deterministic linear blend — the thresholds are the operator, not
    the tuning."""
    f = quality_features(text)
    length_term = F.least(f["n_tokens"] / F.lit(100.0), F.lit(1.0))
    score = (
        F.lit(0.3) * length_term
        + F.lit(0.3) * f["alpha_ratio"]
        + F.lit(0.3) * F.least(f["stopword_ratio"] * 3, F.lit(1.0))
        + F.lit(0.1) * (F.lit(1.0) - F.least(f["punct_ratio"] * 5, F.lit(1.0)))
    )
    return F.round(score, 4)


# PII patterns for training-data scrubbing. Deliberately RE2-compatible
# (no lookaround, no backreferences) so the DuckDB oracle runs the SAME
# pattern text: \b is the ASCII word boundary in both engines, \d / {m,n}
# quantifiers and character classes agree, and greedy semantics match.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE_RE = r"\+[0-9]{1,3}[ -][0-9]{2,4}[ -][0-9]{5,9}\b"


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-document PII hit counts (emails, IPv4 addresses, intl-format
    phone numbers) — ``regexp_extract_all`` sizes, no Python."""
    return {
        "n_emails": F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL_RE), 0)),
        "n_ips": F.size(F.regexp_extract_all(text, F.lit(PII_IPV4_RE), 0)),
        "n_phones": F.size(F.regexp_extract_all(text, F.lit(PII_PHONE_RE), 0)),
    }


def scrub_pii(text: Column) -> Column:
    """Replace PII spans with typed placeholder tokens. Order matters
    and is part of the contract: emails first (so the host part of an
    address can no longer feed the IP pattern), then phones (the ``+``
    prefix keeps them disjoint from IPs), then IPv4. Placeholders
    contain no digits, so later passes never re-match earlier
    replacements."""
    out = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")
    return F.regexp_replace(out, PII_IPV4_RE, "<IP>")


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 over case- and whitespace-normalized
    text (md5 hex is byte-identical across Spark and DuckDB, making the
    fingerprint engine-portable)."""
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(norm)
