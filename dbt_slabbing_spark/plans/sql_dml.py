"""SQL DML front-end over manifest tables: ``INSERT INTO`` /
``DELETE FROM`` / ``UPDATE`` / ``MERGE INTO`` routed through the
manifest layer, plus snapshot-pinned ``SELECT`` passthrough.

Spark SQL itself can only run DML against catalog formats that
implement it (Delta, Iceberg); over plain parquet views every write
statement is rejected at analysis. This module closes the "dbt SQL →
Spark SQL" story end-to-end over governed tables: a
:class:`ManifestSession` registers manifest tables by name, parses the
DML HEAD with a deliberately thin, documented grammar (this is a
dispatcher, not a SQL parser — everything inside predicates,
assignments, VALUES and subqueries is handed to Spark SQL verbatim),
and routes:

- ``INSERT INTO t [(cols)] VALUES ... | SELECT ...`` → ``append_files``
  (one atomic manifest commit; CHECK constraints gate the batch),
- ``DELETE FROM t [WHERE pred]``                    → ``delete_rows``,
- ``UPDATE t SET c = expr, ... [WHERE pred]``       → ``update_rows``,
- ``MERGE INTO t USING src ON k [AND k2 ...]
  WHEN MATCHED THEN UPDATE SET *
  WHEN NOT MATCHED THEN INSERT *``                  → ``merge_rows``
  (the record-key upsert form — Delta's most common MERGE; richer
  WHEN clauses take the DataFrame API),
- anything else (``SELECT``/``WITH``/``VALUES``)    → ``spark.sql``
  over freshly re-pinned snapshot views.

Every mutation is the manifest layer's own atomic OCC commit, so the
SQL surface inherits snapshot isolation, deletion vectors, column
mapping, CHECK constraints, CDF and time travel for free. The
session's ``mode`` picks copy-on-write or merge-on-read (deletion
vectors) for DELETE/UPDATE/MERGE — the same knob a Delta table's
``delta.enableDeletionVectors`` sets table-wide.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.layout import (
    append_files,
    delete_rows,
    merge_rows,
    read_table,
    register_table,
    update_rows,
)


class SqlDmlError(ValueError):
    """Statement outside the documented DML grammar."""


_INSERT_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+(?P<table>[A-Za-z_][A-Za-z0-9_]*)\s*"
    r"(?:\((?P<cols>[^)]*)\)\s*)?(?P<rest>(?:VALUES|SELECT|WITH)\b.*)$",
    re.I | re.S,
)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<table>[A-Za-z_][A-Za-z0-9_]*)\s*"
    r"(?:WHERE\s+(?P<pred>.*))?$",
    re.I | re.S,
)
_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+(?P<table>[A-Za-z_][A-Za-z0-9_]*)\s+SET\s+"
    r"(?P<sets>.*?)(?:\s+WHERE\s+(?P<pred>.*))?$",
    re.I | re.S,
)
_MERGE_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+(?P<table>[A-Za-z_][A-Za-z0-9_]*)"
    r"(?:\s+(?:AS\s+)?(?P<talias>[A-Za-z_][A-Za-z0-9_]*))?\s+"
    r"USING\s+(?P<src>\([^;]*?\)|[A-Za-z_][A-Za-z0-9_]*)"
    r"(?:\s+(?:AS\s+)?(?P<salias>[A-Za-z_][A-Za-z0-9_]*))?\s+"
    r"ON\s+(?P<on>.*?)\s+"
    r"WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s+"
    r"WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*$",
    re.I | re.S,
)


def _split_top_level(text: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` outside parens/quotes (assignments and VALUES
    tuples carry commas inside function calls and literals)."""
    parts, depth, buf, quote = [], 0, [], None
    for ch in text:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in ("'", '"'):
            quote = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == sep and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        parts.append(tail)
    return parts


def _merge_keys(on_clause: str, table: str, aliases: tuple) -> list[str]:
    """Equi-key list from ``ON a.k = b.k AND ...`` (or bare ``k = k``).
    Both sides must name the SAME column after stripping qualifiers —
    the record-key form merge_rows implements."""
    keys = []
    for term in re.split(r"\s+AND\s+", on_clause.strip(), flags=re.I):
        m = re.match(
            r"^\s*(?:[A-Za-z_][A-Za-z0-9_]*\.)?([A-Za-z_][A-Za-z0-9_]*)\s*=\s*"
            r"(?:[A-Za-z_][A-Za-z0-9_]*\.)?([A-Za-z_][A-Za-z0-9_]*)\s*$",
            term,
        )
        if not m or m.group(1) != m.group(2):
            raise SqlDmlError(
                f"MERGE ON must be equi-joins on identical column names; "
                f"got {term!r}"
            )
        keys.append(m.group(1))
    return keys


class ManifestSession:
    """Named manifest tables + the ``sql()`` dispatcher. Views are
    re-pinned to the CURRENT snapshot before every statement, so a
    SELECT after a DML sees the mutation (per-statement snapshot
    isolation — each statement reads one consistent version)."""

    def __init__(self, spark: SparkSession, mode: str = "cow"):
        if mode not in ("cow", "dv"):
            raise SqlDmlError(f"unknown DML mode {mode!r} (cow|dv)")
        self.spark = spark
        self.mode = mode
        self.tables: dict[str, str] = {}

    def register(self, name: str, path: str) -> "ManifestSession":
        self.tables[name] = str(path)
        register_table(self.spark, name, path)
        return self

    def _refresh(self) -> None:
        for name, path in self.tables.items():
            register_table(self.spark, name, path)

    def _path(self, name: str) -> str:
        if name not in self.tables:
            raise SqlDmlError(f"unknown manifest table {name!r}")
        return self.tables[name]

    def sql(self, statement: str):
        """DML → mutation stats dict; everything else → DataFrame."""
        stmt = statement.strip().rstrip(";")
        head = stmt.split(None, 1)[0].upper() if stmt else ""
        self._refresh()
        if head == "INSERT":
            return self._insert(stmt)
        if head == "DELETE":
            return self._delete(stmt)
        if head == "UPDATE":
            return self._update(stmt)
        if head == "MERGE":
            return self._merge(stmt)
        return self.spark.sql(stmt)

    def _insert(self, stmt: str) -> dict:
        m = _INSERT_RE.match(stmt)
        if not m:
            raise SqlDmlError(f"unsupported INSERT form: {stmt!r}")
        path = self._path(m.group("table"))
        rest = m.group("rest").strip()
        cols = (
            [c.strip() for c in m.group("cols").split(",")]
            if m.group("cols")
            else list(read_table(self.spark, path).columns)
        )
        if rest.upper().startswith("VALUES"):
            df = self.spark.sql(
                f"SELECT * FROM {rest} AS _ins({', '.join(cols)})"
            )
        else:
            df = self.spark.sql(rest).toDF(*cols)
        # SQL INSERT's implicit cast to the target column types (a bare
        # `40.0` literal parses as DECIMAL(3,1), which parquet schema
        # merge rejects against DOUBLE); columns the target doesn't
        # have yet pass through untouched (add-column evolution)
        target_types = {
            f.name: f.dataType
            for f in read_table(self.spark, path).schema.fields
        }
        df = df.select(
            *[
                F.col(c).cast(target_types[c]).alias(c)
                if c in target_types
                else F.col(c)
                for c in cols
            ]
        )
        st = append_files(self.spark, path, df)
        self._refresh()
        return st

    def _delete(self, stmt: str) -> dict:
        m = _DELETE_RE.match(stmt)
        if not m:
            raise SqlDmlError(f"unsupported DELETE form: {stmt!r}")
        st = delete_rows(
            self.spark,
            self._path(m.group("table")),
            m.group("pred") or "true",
            mode=self.mode,
        )
        self._refresh()
        return st

    def _update(self, stmt: str) -> dict:
        m = _UPDATE_RE.match(stmt)
        if not m:
            raise SqlDmlError(f"unsupported UPDATE form: {stmt!r}")
        sets = {}
        for assign in _split_top_level(m.group("sets")):
            am = re.match(r"^([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(.+)$", assign, re.S)
            if not am:
                raise SqlDmlError(f"bad SET assignment: {assign!r}")
            sets[am.group(1)] = am.group(2).strip()
        st = update_rows(
            self.spark,
            self._path(m.group("table")),
            m.group("pred") or "true",
            sets,
            mode=self.mode,
        )
        self._refresh()
        return st

    def _merge(self, stmt: str) -> dict:
        m = _MERGE_RE.match(stmt)
        if not m:
            raise SqlDmlError(
                "unsupported MERGE form (need: MERGE INTO t USING src ON "
                "keys WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED "
                f"THEN INSERT *): {stmt!r}"
            )
        path = self._path(m.group("table"))
        keys = _merge_keys(
            m.group("on"), m.group("table"), (m.group("talias"), m.group("salias"))
        )
        src_sql = m.group("src")
        src: DataFrame = self.spark.sql(
            f"SELECT * FROM {src_sql} AS _merge_src"
            if src_sql.startswith("(")
            else f"SELECT * FROM {src_sql}"
        )
        st = merge_rows(self.spark, path, src, on=keys, mode=self.mode)
        self._refresh()
        return st
