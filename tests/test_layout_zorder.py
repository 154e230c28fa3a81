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


def test_hilbert_key_adjacency_property(spark):
    """The defining Hilbert property — consecutive key values are
    Manhattan-adjacent cells (Z-order provably fails this at quadrant
    boundaries): verified exhaustively on the full 16×16 grid, plus
    bijectivity."""
    from dbt_slabbing_spark.operators.layout import with_hilbert_key

    grid = with_hilbert_key(
        spark.createDataFrame(
            [(x, y) for x in range(16) for y in range(16)], "x int, y int"
        ),
        "x", "y", bits=4, out="d",
    )
    cells = sorted((r["d"], r["x"], r["y"]) for r in grid.collect())
    assert len({c[0] for c in cells}) == 256  # bijective on the grid
    assert cells[0][0] == 0 and cells[-1][0] == 255
    for (d0, x0, y0), (d1, x1, y1) in zip(cells, cells[1:]):
        assert d1 == d0 + 1
        assert abs(x1 - x0) + abs(y1 - y0) == 1, (d0, (x0, y0), (x1, y1))


def test_hilbert_layout_tightens_both_dims(spark, tmp_path):
    """Hilbert-clustered files have compact per-file (x, y) bounding
    boxes: both dimensions' per-file ranges are far below full-width,
    and total box area is no worse than the z-order layout's."""
    import itertools

    from dbt_slabbing_spark.operators.layout import write_hilbert_clustered, write_zordered

    n = 64
    df = spark.createDataFrame(
        [(x, y, x * n + y) for x, y in itertools.product(range(n), range(n))],
        "x int, y int, v long",
    )
    write_hilbert_clustered(df, str(tmp_path / "h"), "x", "y", bits=6, target_files=16)
    write_zordered(df, str(tmp_path / "z"), ["x", "y"], bits=6, target_files=16)

    def per_file_area(path):
        got = (
            spark.read.parquet(path)
            .withColumn("_f", F.input_file_name())
            .groupBy("_f")
            .agg(
                (F.max("x") - F.min("x") + 1).alias("w"),
                (F.max("y") - F.min("y") + 1).alias("h"),
            )
            .collect()
        )
        return sum(r["w"] * r["h"] for r in got), max(max(r["w"], r["h"]) for r in got)

    h_area, h_widest = per_file_area(str(tmp_path / "h"))
    z_area, _ = per_file_area(str(tmp_path / "z"))
    # 16 perfect tiles of a 64×64 grid would cover 16×(16×16)=4096 cells;
    # Hilbert segments are compact blobs — well under half-width per dim
    # and no worse than Z overall.
    assert h_widest <= n // 2, h_widest
    assert h_area <= z_area, (h_area, z_area)


def test_hilbert_key_matches_reference_implementation(spark):
    """The projection-unrolled Column form equals an independent pure-
    Python xy2d at order 10 (the 16×16 test is exhaustive but tiny;
    this pins higher-order carry/rotation behavior on a spread of
    deterministic pseudo-random points)."""
    from dbt_slabbing_spark.operators.layout import with_hilbert_key

    def xy2d(n, x, y):
        d = 0
        s = n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    bits = 10
    n = 1 << bits
    # deterministic spread incl. the corners and both diagonals
    pts = {((i * 2654435761) % n, (i * 40503) % n) for i in range(500)}
    pts |= {(0, 0), (n - 1, 0), (0, n - 1), (n - 1, n - 1)}
    df = with_hilbert_key(
        spark.createDataFrame(sorted(pts), "x int, y int"), "x", "y", bits=bits, out="d"
    )
    got = {(r["x"], r["y"]): r["d"] for r in df.collect()}
    want = {(x, y): xy2d(n, x, y) for x, y in pts}
    assert got == want
