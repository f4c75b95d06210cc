"""Registrable-domain (eTLD+1) extraction — the grouping key real
crawl politeness and ownership analysis use instead of the raw host.

``blog.shop.example.co.uk`` and ``www.example.co.uk`` are the same
registrant; per-host budgets treat them as unrelated, letting a
wildcard-subdomain site (or a crawler trap fanning out hostnames)
multiply its share of the fetch budget. Grouping by eTLD+1 closes
that hole. The real-world rule set is Mozilla's Public Suffix List
(publicsuffix.org); this module implements the PSL *algorithm*
(longest matching suffix wins; wildcard ``*.`` rules; ``!`` exception
rules) against a caller-supplied rule table, with a small built-in
default covering the common simple/two-level suffixes so the engine
works out of the box. Swap in the full PSL file on a real cluster —
the rule table is a plain DataFrame column of strings.

Plan shape: rules become ONE literal array column (the full PSL is
~10k rules ≈ 200 KB — well inside literal/broadcast bounds); matching
is an in-row fold over candidate suffixes of the host (a host has
< 10 labels, so candidates are bounded), no join, no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["registrable_domain", "DEFAULT_SUFFIXES"]

# Simple default rule set (PSL grammar: leading '*.' = wildcard rule,
# leading '!' = exception). Enough for tests/fixtures; production
# passes the full publicsuffix.org list.
DEFAULT_SUFFIXES = [
    "com", "org", "net", "edu", "gov", "io", "dev", "app", "info",
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.tr", "com.cn",
    "de", "fr", "nl", "it", "es", "tr", "ru", "cn", "jp", "uk", "au", "br",
    "*.ck",      # PSL wildcard example: everything under .ck is a suffix
    "!www.ck",   # ...except www.ck, which is registrable
]


def registrable_domain(
    host: Column, suffixes: list[str] | None = None
) -> Column:
    """eTLD+1 of a lowercase hostname under the PSL algorithm:

    1. among rules matching a suffix of the host, the longest (most
       labels) wins; exception rules beat wildcard rules;
    2. the registrable domain is the matched suffix plus one more
       label to its left (for an exception rule, the exception value
       itself — PSL: the exception's public suffix drops its leftmost
       label);
    3. a host that IS a public suffix (nothing to its left) or has a
       single label yields NULL; an unmatched multi-label host gets
       the PSL implicit ``*`` default (last label is the suffix →
       registrable = last two labels).

    Pure Column fold over the host's own suffix candidates — no join,
    no UDF; the rule set rides inside the plan as one literal array.
    """
    rules = F.lit(list(suffixes if suffixes is not None else DEFAULT_SUFFIXES))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # candidate suffixes of host, longest first: labels[i:] for i in 0..n-1
    cand = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.struct(
            F.array_join(F.slice(labels, i, n), ".").alias("suf"),
            (n - i + 1).alias("n_labels"),
            i.alias("start"),
        ),
    )

    def rule_hit(c: Column) -> Column:
        # exact rule, wildcard rule ('*.' + suffix-without-first-label),
        # exception rule ('!' + suffix)
        first_stripped = F.regexp_replace(c["suf"], r"^[^.]+\.", "")
        return F.struct(
            F.array_contains(rules, F.concat(F.lit("!"), c["suf"])).alias("exc"),
            (
                F.array_contains(rules, c["suf"])
                | (
                    c["suf"].contains(".")
                    & F.array_contains(
                        rules, F.concat(F.lit("*."), first_stripped)
                    )
                )
            ).alias("hit"),
            c["n_labels"].alias("n_labels"),
            c["start"].alias("start"),
        )

    hits = F.filter(
        F.transform(cand, rule_hit), lambda h: h["hit"] | h["exc"]
    )
    # PSL precedence: an exception rule prevails over ANY other match;
    # otherwise the rule with the most labels wins
    best = F.aggregate(
        hits,
        F.struct(
            F.lit(-1).alias("n_labels"),
            F.lit(0).alias("start"),
            F.lit(False).alias("exc"),
        ),
        lambda acc, h: F.when(
            (h["exc"] & ~acc["exc"])
            | ((h["exc"] == acc["exc"]) & (h["n_labels"] > acc["n_labels"])),
            F.struct(
                h["n_labels"].alias("n_labels"),
                h["start"].alias("start"),
                h["exc"].alias("exc"),
            ),
        ).otherwise(acc),
    )
    # exception rule: the matched suffix ITSELF is registrable
    reg_start = F.when(best["exc"], best["start"]).otherwise(best["start"] - 1)
    fallback_start = n - 1  # last two labels
    chosen = F.when(best["n_labels"] >= 0, reg_start).otherwise(fallback_start)
    return F.when(
        host.isNull() | (n < 2) | (chosen < 1),
        F.lit(None).cast("string"),
    ).otherwise(F.array_join(F.slice(labels, chosen, n), "."))
