"""The z-ordered sink must produce files whose parquet footer min/max
stats are narrow on BOTH layout columns — the property multi-column data
skipping depends on — with disjoint per-file z-ranges (the range
partitioner contract)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from processor_edf_spark.sinks.writers import write_zordered

N_SIDE = 200  # x and y each cover 0..199 → 40k-cell grid
N_FILES = 16


def _file_stats(out_dir: str) -> list[dict]:
    stats = []
    for path in glob.glob(f"{out_dir}/*.parquet"):
        md = pq.ParquetFile(path).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        lo = {n: None for n in names}
        hi = {n: None for n in names}
        for rg in range(md.num_row_groups):
            for ci, n in enumerate(names):
                s = md.row_group(rg).column(ci).statistics
                lo[n] = s.min if lo[n] is None else min(lo[n], s.min)
                hi[n] = s.max if hi[n] is None else max(hi[n], s.max)
        if md.num_rows:
            stats.append({"lo": lo, "hi": hi, "rows": md.num_rows})
    return stats


def test_zorder_layout_bounds_both_columns(spark, tmp_path):
    out = str(tmp_path / "z")
    grid = spark.range(N_SIDE * N_SIDE).select(
        (F.col("id") % N_SIDE).alias("x"),
        ((F.col("id") / N_SIDE).cast("long") % N_SIDE).alias("y"),
    )
    write_zordered(grid, out, "x", "y", n_files=N_FILES)

    stats = _file_stats(out)
    assert len(stats) > 4  # range partitioner actually spread the data

    # 1. per-file z-ranges are disjoint (contiguous range partition)
    zr = sorted((s["lo"]["_z"], s["hi"]["_z"]) for s in stats)
    for (_, hi_prev), (lo_next, _) in zip(zr, zr[1:]):
        assert hi_prev < lo_next

    # 2. per-file rectangles are small: mean covered area well under the
    # full grid (a random layout gives every file the FULL grid area)
    areas = [
        (s["hi"]["x"] - s["lo"]["x"] + 1) * (s["hi"]["y"] - s["lo"]["y"] + 1)
        for s in stats
    ]
    full = N_SIDE * N_SIDE
    assert sum(areas) / len(areas) < full / 2

    # 3. BOTH single-column point predicates prune files
    for col in ("x", "y"):
        probe = 7
        touched = sum(1 for s in stats if s["lo"][col] <= probe <= s["hi"][col])
        assert touched < len(stats), f"no files pruned on {col}"


def test_zorder_drop_key_and_row_preservation(spark, tmp_path):
    out = str(tmp_path / "z2")
    df = spark.range(1000).select(
        (F.col("id") % 50).alias("x"), (F.col("id") % 37).alias("y")
    )
    write_zordered(df, out, "x", "y", n_files=4, keep_z=False)
    back = spark.read.parquet(out)
    assert back.columns == ["x", "y"]
    assert back.count() == 1000
    # exact multiset of rows survives the layout
    assert (
        back.groupBy("x", "y").count().exceptAll(
            df.groupBy("x", "y").count()
        ).count()
        == 0
    )
