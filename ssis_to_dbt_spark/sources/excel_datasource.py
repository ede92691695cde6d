"""Spark 4 custom Python DataSource for Excel (S5 as a first-class reader).

``read_excel`` (sources/readers.py) parses driver-side — right for one
small dimension sheet.  This wraps the same dependency-free parsers
(`read_xlsx_rows` zip+XML, `sources/xls.py` MS-CFB+BIFF8) in the
``pyspark.sql.datasource`` API, so a DIRECTORY of workbooks reads as one
DataFrame with one input partition per file — the files parse on
EXECUTORS in parallel, which is the scale path when "Excel source" means
a landing zone of hundreds of uploaded sheets rather than one file.

Usage::

    from ssis_to_dbt_spark.sources.excel_datasource import register
    register(spark)
    df = (spark.read.format("excel").schema("a int, b string")
          .option("sheet", "Sheet1").load("/landing/sheets/"))

Options: ``path`` (file or directory of .xlsx/.xls), ``sheet`` (optional
sheet name, default first), ``header`` ('true' default: row 1 maps columns
by name to the declared schema).
"""

from __future__ import annotations

import os
from datetime import date, datetime
from decimal import Decimal

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


def _convert(value, dtype: T.DataType):
    """Cast a raw cell string to the declared Spark type (None passthrough).
    Mirrors read_excel's cast-to-schema contract."""
    if value is None or value == "":
        return None
    s = str(value)
    if isinstance(dtype, T.StringType):
        return s
    if isinstance(dtype, (T.IntegerType, T.LongType, T.ShortType)):
        return int(float(s))
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return float(s)
    if isinstance(dtype, T.DecimalType):
        return Decimal(s)
    if isinstance(dtype, T.BooleanType):
        return s.strip().lower() in ("1", "true", "yes")
    if isinstance(dtype, T.DateType):
        return date.fromisoformat(s[:10])
    if isinstance(dtype, T.TimestampType):
        return datetime.fromisoformat(s)
    return s


class _ExcelFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ExcelReader(DataSourceReader):
    def __init__(self, options: dict, schema: T.StructType):
        self.options = options
        self.schema_ = schema

    def partitions(self):
        path = self.options["path"]
        if os.path.isdir(path):
            files = sorted(
                os.path.join(path, n)
                for n in os.listdir(path)
                if n.endswith((".xlsx", ".xls"))
            )
        else:
            files = [path]
        return [_ExcelFilePartition(f) for f in files]

    def read(self, partition):
        # imports INSIDE read(): this method runs on executors, where the
        # partition object arrives pickled without module globals
        from ssis_to_dbt_spark.sources.readers import read_xlsx_rows

        path = partition.path
        if path.endswith(".xls"):
            from ssis_to_dbt_spark.sources.xls import read_xls_rows

            grid = read_xls_rows(path, self.options.get("sheet"))
        else:
            grid = read_xlsx_rows(path, self.options.get("sheet"))
        if not grid:
            return
        header_on = self.options.get("header", "true").lower() == "true"
        fields = self.schema_.fields
        if header_on:
            header = [str(h) for h in grid[0]]
            idx = {}
            for f in fields:
                if f.name not in header:
                    raise ValueError(
                        f"column {f.name!r} not in sheet header {header} "
                        f"({path})"
                    )
                idx[f.name] = header.index(f.name)
            data = grid[1:]
        else:
            idx = {f.name: i for i, f in enumerate(fields)}
            data = grid
        for row in data:
            padded = list(row) + [None] * (
                max(idx.values()) + 1 - len(row)
            )
            yield tuple(
                _convert(padded[idx[f.name]], f.dataType) for f in fields
            )


class _ExcelCommit(WriterCommitMessage):
    def __init__(self, staged: str | None):
        self.staged = staged


class ExcelWriter(DataSourceWriter):
    """df.write.format("excel").save(dir): each partition writes its own
    ``part-NNNNN.xlsx`` staging file on its executor (embarrassingly
    parallel — the write-side twin of the per-file read partitions), then
    the driver's commit renames the staged parts in; abort removes them.
    Not a transactional table format — the parquet sinks are the engine's
    durable path; this is the bulk report-export surface."""

    def __init__(self, options: dict, schema: T.StructType, overwrite: bool):
        self.options = options
        self.schema_ = schema
        self.overwrite = overwrite
        self.sheet = options.get("sheet", "Sheet1")

    def write(self, iterator):
        import uuid

        from pyspark import TaskContext
        from ssis_to_dbt_spark.sources.writers import write_xlsx

        rows = [list(r) for r in iterator]
        if not rows:
            return _ExcelCommit(None)
        pid = TaskContext.get().partitionId()
        path = self.options["path"]
        os.makedirs(path, exist_ok=True)
        staged = os.path.join(
            path, f"_staged-{uuid.uuid4().hex}-part-{pid:05d}.xlsx"
        )
        write_xlsx([f.name for f in self.schema_.fields], rows, staged,
                   sheet=self.sheet)
        return _ExcelCommit(staged)

    def commit(self, messages):
        path = self.options["path"]
        if self.overwrite:
            for name in os.listdir(path):
                if name.endswith(".xlsx") and not name.startswith("_staged-"):
                    os.remove(os.path.join(path, name))
        for m in messages:
            if m.staged is not None:
                final = os.path.join(
                    path, os.path.basename(m.staged).split("-", 2)[2]
                )
                os.replace(m.staged, final)

    def abort(self, messages):
        for m in messages:
            if m.staged is not None and os.path.exists(m.staged):
                os.remove(m.staged)


class ExcelDataSource(DataSource):
    """spark.read.format("excel") — schema is REQUIRED (Excel carries no
    types; the engine never infers on a correctness path)."""

    @classmethod
    def name(cls) -> str:
        return "excel"

    def schema(self):
        raise ValueError(
            "the excel data source requires an explicit .schema(...) — "
            "sheets carry no types and this engine never infers"
        )

    def reader(self, schema: T.StructType) -> ExcelReader:
        return ExcelReader(self.options, schema)

    def writer(self, schema: T.StructType, overwrite: bool) -> ExcelWriter:
        return ExcelWriter(self.options, schema, overwrite)


def register(spark: SparkSession) -> None:
    """Idempotently register the 'excel' format on this session."""
    spark.dataSource.register(ExcelDataSource)
