"""Shared argument guards for the stateful streaming operators.

One interaction deserves a loud signal at construction time rather than
a silent wrong answer at runtime: ``emit_late=True`` promises the W2
quarantine contract (out-of-order rows are EMITTED with ``late=true``
so a consumer can count/repair them), but ``ttl_usec`` attaches a
watermark to the stream and Spark pre-filters rows at-or-below the
watermark BEFORE the stateful fold ever sees them.  With the default
``watermark="0 seconds"`` allowance, any cross-micro-batch late row is
exactly such a row — it vanishes upstream of the fold, so the promised
``late=true`` output is silently lost.  Rows that are late only
WITHIN a micro-batch (or within the allowance) still surface.

The combination is still legitimate when the caller sets a real
out-of-orderness allowance sized to the expected lateness — then rows
inside the allowance get their ``late=true`` emission and only
older-than-allowance stragglers are dropped (the documented watermark
trade).  Hence: warn on the default 0-second allowance, stay quiet
when an explicit non-zero allowance was chosen.
"""

from __future__ import annotations

import warnings


def check_emit_late_ttl(
    emit_late: bool, ttl_usec: int | None, watermark: str
) -> None:
    """Warn when ``emit_late=True`` + ``ttl_usec`` ride the default
    0-second watermark allowance — Spark's watermark pre-filter will
    drop cross-batch late rows before the fold, defeating the
    ``late=true`` quarantine contract.  Callers who want both must
    pass an explicit allowance sized to their expected lateness."""
    if (
        emit_late
        and ttl_usec is not None
        and watermark.strip().lower() in ("0 seconds", "0 second")
    ):
        warnings.warn(
            "emit_late=True with ttl_usec attaches a watermark, and "
            "Spark drops rows at-or-below the watermark BEFORE the "
            "stateful fold: with the default watermark='0 seconds' "
            "allowance, cross-batch late rows will NOT be emitted as "
            "late=true — they are silently pre-filtered. Pass an "
            "explicit out-of-orderness allowance (e.g. watermark='1 "
            "hour') sized to your expected lateness, or drop ttl_usec.",
            stacklevel=3,
        )
