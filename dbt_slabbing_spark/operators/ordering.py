"""Global ordering without a global window.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY collapses the
whole table into ONE task — the classic scale killer. This module
computes the identical global row number with every stage parallel:

1. range-partition on the sort key (contiguous key ranges per
   partition, ascending partition ids);
2. count rows per partition (a partitions-sized table);
3. prefix-sum those counts (single-partition window over ~#partitions
   rows — the only non-parallel step, and it is O(partitions));
4. broadcast the offsets back and add the intra-partition row_number.

Same two-pass shape as ``operators/packing.py::concat_chunk_spans``;
correct for ANY contiguous range partitioning, so AQE coalescing can't
break it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame, order_exprs: list[Column], out_col: str = "rn"
) -> DataFrame:
    """Add ``out_col`` = 1-based global row number by ``order_exprs``.

    The sort key should be total (append a unique tiebreaker column):
    ties across a partition boundary would otherwise get range-split
    arbitrarily — same contract as SQL's ROW_NUMBER determinism.
    """
    # uuid-suffixed temp names: a caller column named "_pid"/"_offset"
    # must survive untouched (this is a reusable operator)
    import uuid

    sfx = uuid.uuid4().hex[:8]
    pid, off = f"_pid_{sfx}", f"_offset_{sfx}"
    parted = df.repartitionByRange(*order_exprs).withColumn(pid, F.spark_partition_id())
    psizes = parted.groupBy(pid).agg(F.count(F.lit(1)).alias("_n"))
    w_tiny = Window.orderBy(pid).rowsBetween(Window.unboundedPreceding, -1)
    offsets = psizes.withColumn(
        off, F.coalesce(F.sum("_n").over(w_tiny), F.lit(0)).cast("long")
    ).select(pid, off)
    w_intra = Window.partitionBy(pid).orderBy(*order_exprs)
    return (
        parted.join(F.broadcast(offsets), pid)
        .withColumn(out_col, (F.col(off) + F.row_number().over(w_intra)).cast("long"))
        .drop(pid, off)
    )
