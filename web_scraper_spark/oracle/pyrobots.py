"""Pure-Python twin of ``operators/robots_txt.parse_robots_txt``.

Same group-scoping semantics (RFC 9309 subset), independently
implemented over plain string ops so hypothesis can cross-check the
Column-expression parser on arbitrary robots.txt files
(tests/test_robots_property.py). Mirrors the engine's exact lexical
choices: lines split on ``\\r?\\n``, inline ``#`` comments stripped,
SPACE-only trim (Spark ``F.trim``), case-insensitive directive
prefixes, a ``Crawl-delay`` line with any value opens/continues a group
but only digit-valued ones yield a delay, last in-scope delay wins.
"""

from __future__ import annotations

import re

__all__ = ["parse_robots", "robots_blocked", "match_target"]


def match_target(url: str) -> str:
    """Twin of ``operators/robots_txt.robots_match_target``: the RFC
    9309 match target — path plus ``?query`` when a query is present,
    the empty path of a bare ``scheme://host`` normalized to ``/``.
    Fragments never reach the matcher."""
    rest = url.split("://", 1)[1] if "://" in url else url
    rest = rest.split("#", 1)[0]
    path_q = ""
    for sep in ("/", "?"):
        idx = rest.find(sep)
        if idx != -1:
            path_q = rest[idx:]
            break
    if path_q.startswith("?"):
        path_q = "/" + path_q
    return path_q or "/"

_AGENT = re.compile(r"^user-agent\s*:", re.I)
_DISALLOW = re.compile(r"^disallow\s*:", re.I)
_ALLOW = re.compile(r"^allow\s*:", re.I)
_DELAY_DIR = re.compile(r"^crawl-delay\s*:", re.I)
_DELAY_VAL = re.compile(r"^crawl-delay\s*:\s*(\d+)", re.I)


def parse_robots(
    txt: str, user_agent: str = "*", default_crawl_delay: int = 30
) -> tuple[list[str], list[str], int]:
    """(disallow paths, allow paths — each in file order — and
    crawl_delay_s) for ``user_agent``."""
    lines = [
        re.sub(r"#.*$", "", l).strip(" ")
        for l in re.split(r"\r?\n", txt)
    ]
    agents = [
        (i + 1, _AGENT.sub("", l).strip(" ").lower())
        for i, l in enumerate(lines)
        if _AGENT.match(l)
    ]
    dirs = [
        i + 1
        for i, l in enumerate(lines)
        if _DISALLOW.match(l) or _ALLOW.match(l) or _DELAY_DIR.match(l)
    ]
    named = [a for a in agents if a[1] == user_agent.lower()]
    chosen = named if named else [a for a in agents if a[1] == "*"]

    def in_scope(i: int) -> bool:
        return any(
            ai < i
            and not any(
                ai < bi < i and any(ai < d < bi for d in dirs)
                for bi, _ in agents
            )
            for ai, _ in chosen
        )

    disallow = [
        _DISALLOW.sub("", l).strip(" ")
        for i, l in enumerate(lines)
        if _DISALLOW.match(l) and in_scope(i + 1)
    ]
    disallow = [p for p in disallow if p != ""]
    allow = [
        _ALLOW.sub("", l).strip(" ")
        for i, l in enumerate(lines)
        if _ALLOW.match(l) and in_scope(i + 1)
    ]
    allow = [p for p in allow if p != ""]

    delays = [
        int(_DELAY_VAL.match(l).group(1))
        for i, l in enumerate(lines)
        if _DELAY_VAL.match(l) and in_scope(i + 1)
    ]
    return disallow, allow, (delays[-1] if delays else default_crawl_delay)


def _rule_regex(rule: str) -> re.Pattern:
    anchored = rule.endswith("$")
    body = rule[:-1] if anchored else rule
    pat = "^" + re.escape(body).replace(r"\*", ".*") + ("$" if anchored else "")
    return re.compile(pat)


def robots_blocked(path: str, disallow: list[str], allow: list[str]) -> bool:
    """Twin of ``operators/robots_txt.robots_blocked_expr``: RFC 9309
    §2.2.2 longest-match over Allow + Disallow with ``*`` / trailing
    ``$`` wildcards; specificity = octet length of the raw rule; ties
    favor Allow; no match → allowed."""
    best: tuple[int, int] = (-1, 1)  # (spec, is_allow)
    for rules, is_allow in ((disallow, 0), (allow, 1)):
        for r in rules:
            if _rule_regex(r).match(path) is not None:
                cand = (len(r.encode("utf-8")), is_allow)
                if cand[0] > best[0] or (cand[0] == best[0] and cand[1] > best[1]):
                    best = cand
    return best[0] >= 0 and best[1] == 0
