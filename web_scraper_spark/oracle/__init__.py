"""Pure-Python sequential reference oracle (the parity spec).

The reference repo ships no tests (SURVEY.md §5.1), so the oracle *is*
the executable specification: a faithful, sequential, virtual-clock
re-statement of the reference's crawl-loop semantics
(/root/reference/src/core/tracker/nausys_tracker.py:340-441 and
mmk_tracker.py:112-342) against which the distributed engine is asserted
equal — per-host fetch order, URL-seen set, byte-identical extracted text.
"""
