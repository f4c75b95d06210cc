"""Pure-Python twin of ``functions/domains.registrable_domain`` —
independent PSL-algorithm implementation for hypothesis cross-checks
(tests/test_domains.py)."""

from __future__ import annotations

__all__ = ["registrable_domain_py"]


def registrable_domain_py(host: str | None, rules: list[str]) -> str | None:
    if not host:
        return None
    labels = host.split(".")
    n = len(labels)
    if n < 2:
        return None
    rule_set = set(rules)
    best: tuple[int, int, bool] | None = None  # (n_labels, start, exc)
    for i in range(n):
        suf = ".".join(labels[i:])
        n_labels = n - i
        exc = ("!" + suf) in rule_set
        hit = suf in rule_set or (
            n_labels >= 2 and ("*." + ".".join(labels[i + 1 :])) in rule_set
        )
        if not (exc or hit):
            continue
        cand = (n_labels, i, exc)
        if best is None:
            best = cand
        elif (cand[2], cand[0]) > (best[2], best[0]):
            best = cand
    if best is None:
        start = n - 2  # implicit * default: last two labels
    elif best[2]:
        start = best[1]  # exception: the suffix itself is registrable
    else:
        start = best[1] - 1
    if start < 0:
        return None
    return ".".join(labels[start:])
