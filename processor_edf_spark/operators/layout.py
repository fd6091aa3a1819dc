"""Multi-dimensional data layout: Morton (z-order) interleaving.

A z-ordered layout clusters rows so that RANGES of the interleaved key
cover bounded rectangles in the original (x, y) space — parquet
min/max footer stats on both source columns then prune files for
predicates on EITHER column, where a single-column sort only ever prunes
its own column.  Used by the ``zorder_layout`` driver query
(plans/corpus_extra.py) and the ``write_zordered`` sink.
"""

from __future__ import annotations

Z_BITS = 16


def morton_sql(x: str, y: str, bits: int = Z_BITS) -> str:
    """Bit-interleave two ``bits``-wide non-negative integer expressions
    into a ``2*bits``-wide z-value.  Pure integer ``<< >> & +``
    arithmetic, valid VERBATIM in both Spark SQL and DuckDB — callers
    (the Spark plan and its oracle) share the exact string, so the two
    engines cannot diverge."""
    terms = [
        f"(((({x}) >> {i}) & 1) << {2 * i}) + (((({y}) >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def field16_sql(expr: str) -> str:
    """Sign-safe 16-bit field extraction (``((e % 65536) + 65536) %
    65536`` — Spark's ``%`` and DuckDB's ``%`` both take the dividend's
    sign, so the double-mod form is portable)."""
    return f"((({expr}) % 65536) + 65536) % 65536"
