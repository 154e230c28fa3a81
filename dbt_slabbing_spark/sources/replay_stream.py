"""Custom Python STREAMING data source (Spark 4
``pyspark.sql.datasource`` API): deterministic micro-batch replay of a
parquet table — the streaming sibling of ``zip_datasource.py``.

    register_replay_source(spark)   # pickle-by-value: see its docstring
    spark.readStream.format("parquet_replay")
         .option("path", ".../events.parquet")
         .option("rows_per_batch", "1000").load()

Why it exists: the engine's streaming gates replay ``events`` through
file streams; THIS source shows the other integration point — a
checkpointable custom source with explicit offset management, the shape
any queue/CDC-feed connector takes (Kafka-like: offsets are row
positions, commits advance a watermark the source can trim to).

Semantics and scale:
- offsets are logical ROW INDEXES into the parquet file's row order
  ({"row": N} JSON) — deterministic, so recovery from a checkpoint
  re-reads exactly the uncommitted range (replayability is what makes
  the source exactly-once-capable downstream);
- ``latestOffset`` advances by ``rows_per_batch`` per micro-batch —
  rate limiting at the source, the same role as Kafka's
  ``maxOffsetsPerTrigger``;
- ``partitions(start, end)`` splits each batch range into
  ``parallelism`` slices, so executors read disjoint row ranges
  (pyarrow reads the file per executor and slices — fine for the
  dimension-to-moderate sizes a replay source targets; a production
  queue connector fetches only its slice from the broker);
- ``commit(offset)`` is the trim hook (no-op here: the parquet file is
  immutable history).

Known limitation: ``Trigger.AvailableNow`` latches the FIRST
``latestOffset`` as its end-of-input snapshot, so a rate-limited run
under it stops after one batch. Drive bounded replays with the default
trigger + ``processAllAvailable()`` (as ``streaming_band_dedup`` and
the tests do), or set ``rows_per_batch`` ≥ the file size for a
single-batch availableNow pass.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition


class _RangePartition(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class ParquetReplayStreamSource(DataSource):
    """``readStream.format("parquet_replay")``: replay a parquet file's
    rows in order as rate-limited micro-batches.

    Options:
      path            (required) — parquet file/dir path
      rows_per_batch  (default 1000) — max rows per micro-batch
      parallelism     (default 4) — partitions per micro-batch
    """

    @classmethod
    def name(cls) -> str:
        return "parquet_replay"

    def schema(self) -> str:
        import pyarrow.parquet as pq

        path = self.options.get("path")
        if not path:
            raise ValueError("parquet_replay requires .option('path', ...)")
        schema = pq.read_schema(path)
        # minimal arrow->DDL mapping for the types TESTDATA uses
        m = {
            "int64": "bigint",
            "int32": "int",
            "double": "double",
            "float": "float",
            "string": "string",
            "large_string": "string",
            "bool": "boolean",
        }
        parts = []
        for f in schema:
            t = str(f.type)
            if t.startswith("timestamp"):
                ddl = "timestamp"
            elif t in m:
                ddl = m[t]
            else:
                raise ValueError(f"parquet_replay: unmapped arrow type {t} for {f.name}")
            parts.append(f"{f.name} {ddl}")
        return ", ".join(parts)

    def streamReader(self, schema) -> "ParquetReplayStreamReader":
        return ParquetReplayStreamReader(self.options)


class ParquetReplayStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("parquet_replay requires .option('path', ...)")
        self.rows_per_batch = int(options.get("rows_per_batch", "1000"))
        self.parallelism = max(1, int(options.get("parallelism", "4")))
        import pyarrow.parquet as pq

        self.n_rows = pq.ParquetFile(self.path).metadata.num_rows
        self._pos = 0  # driver-side rate-limit cursor (see latestOffset)

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        # The END offset Spark checkpoints for the batch — so the rate
        # limit MUST live here, not in partitions(): clamping there
        # would mark rows committed that were never read. After a
        # restart the cursor re-advances from 0 and yields empty
        # batches until it passes the checkpointed start — lag, never
        # loss (partitions() always reads the full [start, end) range).
        self._pos = min(self._pos + self.rows_per_batch, self.n_rows)
        return {"row": self._pos}

    def reportLatestOffset(self) -> dict:
        return {"row": self.n_rows}

    def partitions(self, start: dict, end: dict) -> list[_RangePartition]:
        lo, hi = start["row"], end["row"]
        # sync the rate cursor to the real (checkpointed) start: after
        # a restart the first batch may be empty (end < start), but the
        # next latestOffset then advances FROM the checkpoint instead
        # of replaying the file from zero
        self._pos = max(self._pos, lo)
        if hi <= lo:
            return []
        step = max(1, (hi - lo + self.parallelism - 1) // self.parallelism)
        return [
            _RangePartition(self.path, s, min(s + step, hi))
            for s in range(lo, hi, step)
        ]

    def read(self, partition: _RangePartition):
        import pyarrow.parquet as pq

        table = pq.read_table(partition.path)
        chunk = table.slice(partition.start, partition.end - partition.start)
        for batch in chunk.to_batches():
            yield from zip(*[batch.column(i).to_pylist() for i in range(batch.num_columns)])

    def commit(self, end: dict) -> None:
        pass  # immutable history: nothing to trim


def register_replay_source(spark) -> None:
    """Register the source so it works from ANY consumer session.

    The streaming-source runner is a DRIVER-side helper process that
    — unlike executor Python workers — does NOT receive ``addPyFile``
    includes (verified empirically: ``setup_spark_files`` runs but the
    dynamic include list never contains the shipped package zip), so a
    by-reference pickle dies with ModuleNotFoundError whenever the
    consumer's cwd is outside the repo. Registering the MODULE for
    pickle-BY-VALUE embeds the class bodies in the payload instead;
    this module deliberately imports only stdlib + pyspark + pyarrow
    so the embedded code resolves anywhere.
    """
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(ParquetReplayStreamSource)
