"""Z-order clustering: per-file min/max stats must be tight on BOTH
z-ordered dimensions (that's the whole point — multi-column skipping),
where a single-column sort leaves the second dimension full-width."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from dbt_slabbing_spark.operators.layout import write_zordered, zorder_key


def _per_file_widths(path: str, cols: list[str]) -> dict[str, float]:
    """Mean (max-min) per parquet file for each column, from footers."""
    widths = {c: [] for c in cols}
    for f in glob.glob(f"{path}/*.parquet"):
        meta = pq.read_metadata(f)
        mins = {c: None for c in cols}
        maxs = {c: None for c in cols}
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            for i in range(g.num_columns):
                col = g.column(i)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    s = col.statistics
                    mins[name] = s.min if mins[name] is None else min(mins[name], s.min)
                    maxs[name] = s.max if maxs[name] is None else max(maxs[name], s.max)
        for c in cols:
            if mins[c] is not None:
                widths[c].append(maxs[c] - mins[c])
    return {c: sum(v) / len(v) for c, v in widths.items()}


def test_zorder_key_interleaves_bits(spark):
    rows = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 3)], "x int, y int")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in rows.select(
            "x", "y", zorder_key([F.col("x"), F.col("y")], bits=2).alias("z")
        ).collect()
    }
    # bit layout: x gets even bit positions, y odd → (x,y)=(1,0)→1,
    # (0,1)→2, (3,3)→15
    assert got == {(0, 0): 0, (1, 0): 1, (0, 1): 2, (3, 3): 15}


def test_zorder_layout_tightens_both_dims(spark, tmp_path):
    n = 1 << 14
    df = spark.range(n).select(
        (F.col("id") * 2654435761 % 1024).cast("int").alias("a"),
        (F.col("id") * 40503 % 1024).cast("int").alias("b"),
        F.col("id").alias("payload"),
    )
    z_path = str(tmp_path / "zordered")
    s_path = str(tmp_path / "asorted")
    write_zordered(df, z_path, ["a", "b"], bits=10, target_files=16)
    # baseline: same data clustered on a ONLY
    (
        df.repartitionByRange(16, "a")
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(s_path)
    )

    zw = _per_file_widths(z_path, ["a", "b"])
    sw = _per_file_widths(s_path, ["a", "b"])
    # single-column sort: 'a' tight, 'b' ~full-width (1023)
    assert sw["a"] < 150 and sw["b"] > 900, sw
    # z-order: BOTH dims a fraction of full width → conjunctive filters
    # on either column skip most files
    assert zw["a"] < 600 and zw["b"] < 600, zw
    assert zw["a"] + zw["b"] < sw["a"] + sw["b"], (zw, sw)

    # layout changes bytes, never rows
    back = spark.read.parquet(z_path)
    assert back.count() == n
    assert back.agg(F.sum("payload")).collect()[0][0] == n * (n - 1) // 2
