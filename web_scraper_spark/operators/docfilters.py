"""Published-pipeline document filters: C4 and Gopher rule sets.

Two filter batteries every large LLM-pretraining corpus pipeline runs,
implemented rule-for-rule from the papers so corpus builds are
comparable with the published datasets:

- **C4** (Raffel et al. 2020, "Exploring the Limits of Transfer
  Learning…", §2.2): line-level — keep only lines ending in terminal
  punctuation AND with ≥ `min_line_words` words; doc-level — drop docs
  with "lorem ipsum", with a ``{`` (code), with any bad-word hit, or
  with fewer than `min_sentences` sentences after line cleaning.
- **Gopher** (Rae et al. 2021, "Scaling Language Models…", App. A1.1):
  doc-level quality heuristics — word count bounds, mean word length
  bounds, symbol-to-word ratio (``#``/``…``), fraction of words with
  an alphabetic character, bullet-start / ellipsis-end line fractions,
  and a minimum stop-word hit count.

Repetition thresholds from Gopher A1.1 (duplicate line / n-gram
fractions) live in functions/textstats.py:ngram_dup_fraction and
operators/linededup.py — composed by the corpus_clean pipeline, not
duplicated here.

Spark shapes: everything is built-in Columns over ``split`` /
``filter`` / ``transform`` / ``aggregate`` higher-order functions —
whole-stage codegen, zero UDFs, zero shuffles (pure per-row maps; the
only shuffle in a filter pass is whatever the caller's write needs).
At 100 TB these run as width-preserving projections inside the same
stage as the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["c4_clean", "gopher_stats", "GOPHER_STOPWORDS"]

# the paper's stop set ("the, be, to, of, and, that, have, with")
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

_TERMINAL = r'[.!?"”]$'


def _lines(text: Column) -> Column:
    return F.filter(
        F.split(text, r"\n"), lambda l: F.trim(l) != ""
    )


def _words(s: Column) -> Column:
    return F.filter(F.split(s, r"\s+"), lambda w: w != "")


def c4_clean(
    docs: DataFrame,
    text_col: str = "text",
    badwords: list[str] | None = None,
    min_line_words: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """Apply the C4 cleaning rules. Adds:

    - ``clean_text``  — surviving lines rejoined with ``\\n``
    - ``n_lines_kept`` / ``n_lines_dropped``
    - ``c4_keep``     — doc-level verdict

    Line rule (paper §2.2): retained only when it ends in a terminal
    punctuation mark and has ≥ ``min_line_words`` words. Doc rules:
    ≥ ``min_sentences`` sentences in the cleaned text (sentence ≈
    terminal-punctuation occurrence), no ``lorem ipsum`` (case
    insensitive), no ``{``, no bad-word token (``badwords`` is the
    deployment's list — the paper uses the "List of Dirty, Naughty …"
    list, not shipped here).
    """
    text = F.col(text_col)
    kept = F.filter(
        _lines(text),
        lambda l: F.trim(l).rlike(_TERMINAL)
        & (F.size(_words(F.trim(l))) >= min_line_words),
    )
    n_all = F.size(_lines(text))
    out = docs.withColumn("clean_text", F.array_join(kept, "\n")).withColumn(
        "n_lines_kept", F.size(kept).cast("long")
    )
    out = out.withColumn(
        "n_lines_dropped", (n_all - F.col("n_lines_kept")).cast("long")
    )
    clean = F.col("clean_text")
    n_sentences = F.size(
        F.filter(
            F.split(clean, r"(?<=[.!?])"),
            lambda s: F.trim(s) != "",
        )
    )
    bad = F.lit(False)
    for w in badwords or []:
        bad = bad | F.array_contains(
            F.transform(_words(clean), F.lower), w.lower()
        )
    keep = (
        (n_sentences >= min_sentences)
        & ~F.lower(clean).contains("lorem ipsum")
        & ~clean.contains("{")
        & ~bad
    )
    return out.withColumn("c4_keep", keep)


def gopher_stats(
    docs: DataFrame,
    text_col: str = "text",
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Gopher A1.1 quality signals + verdict. Adds the measured
    quantities (so downstream mixture policies can re-threshold
    without a rescan) and ``gopher_keep``:

    - ``n_words`` in [50, 100_000]
    - ``mean_word_len`` in [3, 10]
    - ``symbol_ratio`` (``#`` or ``…``/``...`` per word) ≤ 0.1
    - ``alpha_word_frac`` (words containing ≥1 alphabetic char) ≥ 0.8
    - ``bullet_line_frac`` (lines starting with a bullet) ≤ 0.9
    - ``ellipsis_line_frac`` (lines ending with an ellipsis) ≤ 0.3
    - ``stopword_hits`` (distinct stop-set words present) ≥ 2
    """
    text = F.col(text_col)
    words = _words(text)
    n_words = F.size(words).cast("long")
    mean_wl = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.length(w),
        lambda acc: F.when(n_words > 0, acc / n_words).otherwise(F.lit(0.0)),
    )
    n_sym = (
        F.size(F.split(text, r"#", -1))
        - 1
        + F.size(F.split(text, r"\.\.\.|…", -1))
        - 1
    )
    symbol_ratio = F.when(n_words > 0, n_sym / n_words).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / n_words,
    ).otherwise(F.lit(0.0))
    lines = _lines(text)
    n_lines = F.size(lines)
    bullet_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                lines, lambda l: F.trim(l).rlike(r"^[-*•‣◦]")
            )
        )
        / n_lines,
    ).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                lines, lambda l: F.trim(l).rlike(r"(\.\.\.|…)$")
            )
        )
        / n_lines,
    ).otherwise(F.lit(0.0))
    stop = [s.lower() for s in (stopwords or GOPHER_STOPWORDS)]
    lowered = F.transform(words, F.lower)
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in stop]),
            lambda s: F.array_contains(lowered, s),
        )
    ).cast("long")

    out = (
        docs.withColumn("n_words", n_words)
        .withColumn("mean_word_len", F.round(mean_wl, 9))
        .withColumn("symbol_ratio", F.round(symbol_ratio, 9))
        .withColumn("alpha_word_frac", F.round(alpha_frac, 9))
        .withColumn("bullet_line_frac", F.round(bullet_frac, 9))
        .withColumn("ellipsis_line_frac", F.round(ellipsis_frac, 9))
        .withColumn("stopword_hits", stop_hits)
    )
    keep = (
        F.col("n_words").between(50, 100_000)
        & F.col("mean_word_len").between(3.0, 10.0)
        & (F.col("symbol_ratio") <= 0.1)
        & (F.col("alpha_word_frac") >= 0.8)
        & (F.col("bullet_line_frac") <= 0.9)
        & (F.col("ellipsis_line_frac") <= 0.3)
        & (F.col("stopword_hits") >= 2)
    )
    return out.withColumn("gopher_keep", keep)
