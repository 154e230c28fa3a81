"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API):
zip-archived CSV members as a first-class ``spark.read.format(...)``.

The reference ships its clinical tables inside a zip archive
(`EA1141-Reviewed-Clinical-Data-and-Data-Dictionaries.zip`; readers at
reference `src/generate_mapping.py:6-13`). `sources/clinical.py` reads
members driver-side because the tables are dimension-sized; THIS module
is the engine-grade version of the same capability: a registered data
source, so any zip of text members scans like a normal table —

    spark.dataSource.register(ZipCsvDataSource)
    spark.read.format("zip_csv").option("path", z).load()

Scale design: a zip member is not splittable (DEFLATE), so the natural
parallel grain is one partition per member — ``partitions()`` lists
members driver-side (metadata only, no content read), and each executor
opens only its member. Line numbers are per-member 0-based data-row
indices (header excluded), which is exactly the `_line_no` the
ordered-fold join semantics need (SURVEY.md §2.3 note (a)). For a
many-GB single member this source is the wrong tool — unpack to a
splittable format first.
"""

from __future__ import annotations

import io
import zipfile

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _MemberPartition(InputPartition):
    def __init__(self, member: str):
        self.member = member


class ZipCsvDataSource(DataSource):
    """``format("zip_csv")``: one row per data line of each CSV member.

    Options:
      path    (required) — zip archive path, visible to every executor
      suffix  (default ".csv") — member filter
    """

    @classmethod
    def name(cls) -> str:
        return "zip_csv"

    def schema(self) -> str:
        return "member string, _line_no bigint, line string"

    def reader(self, schema) -> "ZipCsvReader":
        return ZipCsvReader(self.options)


class ZipCsvReader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("zip_csv requires .option('path', <zip file>)")
        self._path = path
        self._suffix = options.get("suffix", ".csv")

    def partitions(self):
        # Driver-side member listing reads the central directory only.
        with zipfile.ZipFile(self._path) as zf:
            return [
                _MemberPartition(n)
                for n in sorted(zf.namelist())
                if n.endswith(self._suffix)
            ]

    def read(self, partition: _MemberPartition):
        with zipfile.ZipFile(self._path) as zf:
            with zf.open(partition.member) as f:
                text = io.TextIOWrapper(f, encoding="utf-8", errors="replace").read()
        for i, line in enumerate(text.splitlines()[1:]):  # header excluded
            yield (partition.member, i, line)
