"""Round-11 analytics plans.

``edf_range_decode`` puts the record-aligned byte-range EDF decode path
(sources/edf_ranges.py — the r11 intra-file parallelism source) under
the driver's value oracle: per distinct user a complete single-signal
EDF file is synthesized from deterministic field values, the PRODUCTION
``parse_edf_header`` → ``ranges_from_header`` → ``decode_range_bytes``
chain splits it into 2-record ranges and decodes every range, and the
oracle reproduces sample count, value sum, timestamp bounds, and range
count arithmetically.  Any drift in the range math (overlapping or
skipped records shift ``sum_value``/``n_samples``), the global-index
timestamp formula (shifts ``t_max_usec``), or the calibration constants
reds the row.  The filesystem half of the path (pyarrow.fs range reads,
task spread) is pinned by tests/test_edf_ranges.py.
"""

from __future__ import annotations

from processor_edf_spark.plans.registry import load, register

# datetime(2011, 1, 2, 12, 30, 0, UTC) — the fixture start instant.
_START_USEC = 1_293_971_400_000_000

# samples/record alternatives: every one divides 1e6 exactly, so the
# contiguous timestamp step (1e6/rate µs) is integral and the oracle
# needs no float rounding model.
_NR0 = (100, 125, 160, 200, 250)


@register(
    "edf_range_decode",
    f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    p AS (
        SELECT user_id,
               CASE user_id % 5
                    WHEN 0 THEN 100 WHEN 1 THEN 125 WHEN 2 THEN 160
                    WHEN 3 THEN 200 ELSE 250 END AS nr0,
               6 + user_id % 10 AS nb_rec
        FROM u
    )
    SELECT p.user_id,
           CAST((p.nb_rec + 1) // 2 AS BIGINT) AS n_ranges,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM((p.user_id * 7 + r.j * 13) % 4096 - 2048) AS BIGINT)
               AS sum_value,
           CAST({_START_USEC} AS BIGINT) AS t_min_usec,
           CAST({_START_USEC}
                + (p.nr0 * p.nb_rec - 1) * (1000000 // p.nr0) AS BIGINT)
               AS t_max_usec
    FROM p, range(0, 3750) r(j)
    WHERE r.j < p.nr0 * p.nb_rec
    GROUP BY p.user_id, p.nr0, p.nb_rec
    """,
)
def edf_range_decode(spark, sf_dir):
    """Range-planned EDF decode under the value oracle (S4 via
    sources/edf_ranges.py; reference whole-file semantics
    processor/edf_processor/edf.py:56-76).  Calibration is fixed at
    gain=1/bias=0 (phy==dig range) so decoded values equal the written
    digital samples exactly, and the sample pattern
    ``(u·7 + j·13) mod 4096 − 2048`` over the GLOBAL sample index j
    makes any record mis-placement arithmetically visible.  Scale:
    one distinct-shuffle over user_id; synthesis+decode is per-row CPU
    with no data movement — the same decode-heavy/emit-light shape as
    the codec rows."""
    import numpy as np
    import pandas as pd

    (events,) = load(spark, sf_dir, "events")
    users = events.select("user_id").distinct()

    def gen(batches):
        from processor_edf_spark.sources.edf import parse_edf_header
        from processor_edf_spark.sources.edf_ranges import (
            decode_range_bytes,
            ranges_from_header,
        )

        def field(v, w):
            return str(v).ljust(w)[:w].encode()

        for pdf in batches:
            rows = []
            for uid in pdf["user_id"]:
                u = int(uid)
                nr0 = _NR0[u % 5]
                nb_rec = 6 + u % 10
                g = b"".join(
                    [
                        field(0, 8),
                        field(f"P{u}", 80),
                        field(f"R{u}", 80),
                        field("02.01.11", 8),
                        field("12.30.00", 8),
                        field(256 + 256, 8),
                        field("", 44),
                        field(nb_rec, 8),
                        field(1, 8),
                        field(1, 4),
                    ]
                )
                sig = b"".join(
                    [
                        field("sig", 16),
                        field("", 80),
                        field("uV", 8),
                        field(-2048, 8),   # phy_min == dig_min
                        field(2047, 8),    # phy_max == dig_max
                        field(-2048, 8),   # → gain 1.0, bias 0.0
                        field(2047, 8),
                        field("", 80),
                        field(nr0, 8),
                        field("", 32),
                    ]
                )
                n = nr0 * nb_rec
                digital = (
                    (u * 7 + np.arange(n, dtype=np.int64) * 13) % 4096 - 2048
                ).astype("<i2")
                content = g + sig + digital.tobytes()

                h = parse_edf_header(content)  # the REAL parser
                ranges = ranges_from_header(
                    h, len(content), target_bytes=4 * nr0  # 2 records/range
                )
                parts = []
                for rec0, _n_rec, start_byte, n_bytes, rec_bytes, hj in ranges:
                    parts.extend(
                        decode_range_bytes(  # the REAL range kernel
                            hj,
                            content[start_byte : start_byte + n_bytes],
                            rec_bytes,
                            rec0,
                            f"u{u}.edf",
                        )
                    )
                dec = pd.concat(parts, ignore_index=True)
                rows.append(
                    (
                        u,
                        len(ranges),
                        len(dec),
                        int(dec["value"].sum()),
                        int(dec["t_usec"].min()),
                        int(dec["t_usec"].max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "user_id",
                    "n_ranges",
                    "n_samples",
                    "sum_value",
                    "t_min_usec",
                    "t_max_usec",
                ],
            )

    return users.mapInPandas(
        gen,
        schema=(
            "user_id long, n_ranges long, n_samples long, "
            "sum_value long, t_min_usec long, t_max_usec long"
        ),
    )
