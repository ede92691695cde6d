"""Source operators (SURVEY §2.1 S1-S9).

The reference's sources are OLE DB (table scan or embedded SELECT with ?
params, /root/reference/src/parser/ssis_parser.py:306-354), flat files and
Excel (src/parser/constants.py:35-38), dbt ``source()``/``ref()`` bindings
(dbt_project/models/sources/src_datawarehouse.yml), and a manually-flagged
REST API Script Task (samples/ssis_packages/InventorySync.dtsx:67-91).

Spark-first mapping: every scan is a declarative ``spark.read`` with an
EXPLICIT schema (the reference declares every column type,
ssis_parser.py:318-338 — we never infer on a correctness path), so Catalyst
gets column pruning + predicate pushdown into the parquet reader for free.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import TESTDATA_SCHEMAS


def read_parquet(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """S1/S2: OLE DB source analog — full scan or pushdown-filtered scan.

    Embedded-SELECT semantics (S1) are expressed by chaining
    ``.select(...).filter(...)`` on the returned frame; Catalyst pushes both
    into the parquet scan (check ``PushedFilters`` in .explain).
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """S4: FlatFileSource analog (src/parser/constants.py:35)."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON line source (counterpart of the S10 JSON export sink)."""
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (counterpart of ``writers.write_orc``) — ORC files carry
    their own schema and Spark pushes filters/column pruning into the scan
    exactly as with parquet."""
    return spark.read.orc(path)


_XLSX_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_XLSX_REL_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"


def _xlsx_col_index(cell_ref: str) -> int:
    """'A1' -> 0, 'C3' -> 2, 'AA7' -> 26 (letters only matter)."""
    idx = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def read_xlsx_rows(path: str, sheet: str | None = None) -> list[list]:
    """Minimal dependency-free .xlsx reader: an xlsx is a zip of XML parts,
    so stdlib ``zipfile`` + ``ElementTree`` cover the standard layout
    (workbook sheet registry, workbook rels, shared/inline strings, sparse
    cells placed by their ``r`` reference).  Returns the raw cell grid of
    ``sheet`` (default: first sheet) as strings/None."""
    import xml.etree.ElementTree as ET
    import zipfile

    m = lambda tag: f"{{{_XLSX_NS}}}{tag}"  # noqa: E731
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rel_map = {r.get("Id"): r.get("Target") for r in rels}
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            ss = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in ss.findall(m("si")):
                shared.append("".join(t.text or "" for t in si.iter(m("t"))))
        sheets = []
        for sh in wb.find(m("sheets")):
            target = rel_map[sh.get(f"{{{_XLSX_REL_NS}}}id")]
            if not target.startswith("xl/"):
                target = "xl/" + target.lstrip("/")
            sheets.append((sh.get("name"), target))
        if sheet is not None:
            sheets = [s for s in sheets if s[0] == sheet]
            if not sheets:
                raise ValueError(f"sheet {sheet!r} not found in {path}")
        ws = ET.fromstring(z.read(sheets[0][1]))
        rows: list[list] = []
        for row in ws.iter(m("row")):
            cells: list = []
            for c in row:
                t = c.get("t")
                if t == "inlineStr":
                    v = "".join(tt.text or "" for tt in c.iter(m("t")))
                else:
                    ve = c.find(m("v"))
                    v = ve.text if ve is not None else None
                    if t == "s" and v is not None:
                        v = shared[int(v)]
                ref = c.get("r")
                idx = _xlsx_col_index(ref) if ref else len(cells)
                while len(cells) < idx:
                    cells.append(None)
                cells.append(v)
            rows.append(cells)
        return rows


def read_excel(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sheet: str | None = None,
) -> DataFrame:
    """S5: ExcelSource (src/parser/constants.py:37).

    Both ``.xlsx`` (:func:`read_xlsx_rows`, stdlib zip+XML) and legacy
    binary ``.xls`` (:func:`sources.xls.read_xls_rows`, dependency-free
    MS-CFB + BIFF8 parser) are parsed DRIVER-SIDE (row 1 = header,
    remaining rows matched to ``schema`` columns by header name and cast to
    the declared types) — correct for Excel's actual role as a
    small-dimension source; at scale the sheet should be staged to parquet
    out-of-band.  CSV-staged paths keep flowing through the CSV reader.
    """
    if path.endswith((".xls", ".xlsx")):
        if path.endswith(".xls"):
            from .xls import read_xls_rows

            grid = read_xls_rows(path, sheet)
        else:
            grid = read_xlsx_rows(path, sheet)
        if not grid:
            return spark.createDataFrame([], schema)
        header, data = grid[0], grid[1:]
        width = len(header)
        normalized = [
            tuple((row + [None] * width)[:width]) for row in data
        ]
        raw = spark.createDataFrame(
            normalized,
            T.StructType(
                [T.StructField(str(h), T.StringType()) for h in header]
            ),
        )
        return raw.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
        )
    return read_csv(spark, path, schema)


def read_rest_api(spark: SparkSession, url: str, schema: T.StructType) -> DataFrame:
    """S9: REST API source escape hatch.

    The reference never auto-converts this either — its Script Task is
    flagged ``manual_review_required`` (src/parser/models.py:133-142).  The
    contract here: an out-of-band ingestion job lands the API payload as
    JSON/parquet, and this reads the landed path. A bare URL is refused.
    """
    if url.startswith(("http://", "https://")):
        raise NotImplementedError(
            "REST ingestion is an out-of-band job (reference flags it manual); "
            "point read_rest_api at the landed JSON/parquet path instead"
        )
    is_parquet = url.endswith(".parquet") or (
        os.path.isdir(url)
        and any(f.endswith(".parquet") for f in os.listdir(url))
    )
    if is_parquet:
        return read_parquet(spark, url, schema)
    return read_json(spark, url, schema)


@dataclass
class SourceRegistry:
    """dbt ``source()`` / ``ref()`` binding (S6/S7).

    The reference binds model inputs to declared external tables via YAML
    (src_datawarehouse.yml:12-84) and to upstream models via ``ref()``
    (fct_sales.sql:41,50). Here: ``source()`` resolves a (schema, name) pair
    to a parquet path + StructType; ``ref()`` resolves to a registered
    upstream DataFrame (lazy — chaining DataFrames keeps the whole model DAG
    inside one Catalyst plan, the analog of dbt 'ephemeral')."""

    spark: SparkSession
    sources: dict[tuple[str, str], tuple[str, T.StructType | None]] = field(
        default_factory=dict
    )
    models: dict[str, DataFrame] = field(default_factory=dict)

    def declare_source(
        self,
        schema_name: str,
        table: str,
        path: str,
        schema: T.StructType | None = None,
    ) -> None:
        self.sources[(schema_name, table)] = (path, schema)

    def source(self, schema_name: str, table: str) -> DataFrame:
        path, schema = self.sources[(schema_name, table)]
        return read_parquet(self.spark, path, schema)

    def register_model(self, name: str, df: DataFrame) -> None:
        self.models[name] = df

    def ref(self, name: str) -> DataFrame:
        return self.models[name]


_TESTDATA_CACHE: dict[tuple[str, int, str], dict[str, DataFrame]] = {}

# Declared-vs-footer compatibility for the drift guard: the declared read
# schema is valid for a footer type if the footer type is in this set (or
# equals the declared type).  Everything else is a fixture regeneration we
# have not audited -> fail loudly instead of silently mis-reading values.
_FOOTER_COMPAT: dict[str, set[str]] = {
    # TIMESTAMP(MICROS)/TIMESTAMP(NANOS) footers are both handled (nanos via
    # the legacy raw-int64 path); anything else timestampy is unexpected.
    "timestamp": {"timestamp[us]", "timestamp[ns]", "timestamp[ms]"},
    "int": {"int32"},
    "bigint": {"int64"},
    "double": {"double"},
    "string": {"string", "large_string"},
    "date": {"date32[day]"},
    "binary": {"binary", "large_binary"},
    "array<float>": {"list<element: float>", "list<item: float>"},
    "array<double>": {"list<element: double>", "list<item: double>"},
}


def _first_parquet_file(path: str) -> str:
    """Resolve a fixture path (file or directory) to one parquet part file,
    failing with an actionable error — not a bare StopIteration — when a
    directory holds no parquet parts (e.g. only _SUCCESS after a cleanup)."""
    if os.path.isfile(path):
        return path
    parts = sorted(
        n for n in os.listdir(path) if n.endswith(".parquet")
    ) if os.path.isdir(path) else []
    if not parts:
        raise ValueError(
            f"no parquet files under {path} — fixture missing or "
            "partially generated; cannot probe its schema"
        )
    return os.path.join(path, parts[0])


def _events_ts_is_nanos(path: str) -> bool:
    """Probe the parquet footer: True iff ``ts`` is TIMESTAMP(NANOS).

    Current driver fixtures write TIMESTAMP(MICROS) (verified at all scale
    factors), which Spark reads directly as TimestampType.  Older fixture
    generations wrote TIMESTAMP(NANOS), which Spark's vectorized reader can
    only surface as raw int64 under spark.sql.legacy.parquet.nanosAsLong.
    Footer-probing (a metadata read, no data scan) keeps both generations
    correct instead of hard-coding either.
    """
    import pyarrow.parquet as pq

    ts_type = pq.read_schema(_first_parquet_file(path)).field("ts").type
    return str(ts_type).startswith("timestamp[ns")


def _check_schema_drift(path: str, declared: T.StructType, table: str) -> None:
    """V-family guard on our own inputs: fail loudly if a regenerated fixture
    no longer matches the declared read schema (names, order, or an
    incompatible physical type), instead of silently corrupting values the
    way a stale workaround would."""
    import pyarrow.parquet as pq

    footer = pq.read_schema(_first_parquet_file(path))
    declared_names = [fld.name for fld in declared.fields]
    if list(footer.names) != declared_names:
        raise ValueError(
            f"schema drift in {table}: fixture columns {list(footer.names)} "
            f"!= declared {declared_names} ({path})"
        )
    for fld in declared.fields:
        actual = str(footer.field(fld.name).type)
        want = fld.dataType.simpleString()
        ok = _FOOTER_COMPAT.get(want)
        if ok is not None and actual not in ok and actual != want:
            raise ValueError(
                f"schema drift in {table}.{fld.name}: fixture type {actual} "
                f"is not a known encoding of declared {want} ({path}) — "
                "audit the read path before trusting results"
            )


def testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load the driver's test tables with explicit schemas, UTC session tz.

    The session timezone matters: the parquet timestamps are naive; pinning
    UTC makes Spark's instant->date extraction agree with DuckDB's (the
    correctness oracle) naive-timestamp arithmetic.  The tz conf is
    (re-)applied on every call — including cache hits — so a caller that
    reset the session conf can never silently skew date extraction.

    DataFrames are memoized per (applicationId, session id, dir): re-reading
    creates a fresh file index per table per call, which dominates
    small-query latency when many queries run in one session.  The key needs
    BOTH parts: ``applicationId`` alone would conflate sibling sessions of
    one SparkContext (``spark.newSession()``), handing session B frames
    bound to session A's conf; ``id(spark)`` alone could in principle be
    reused after GC — though the cached frames pin their session alive, the
    applicationId component makes the key robust to that too.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    cache_key = (spark.sparkContext.applicationId, id(spark), sf_dir)
    cached = _TESTDATA_CACHE.get(cache_key)
    if cached is not None:
        return dict(cached)
    events_path = f"{sf_dir}/events.parquet"
    events_nanos = _events_ts_is_nanos(events_path)
    schemas = dict(TESTDATA_SCHEMAS)
    if events_nanos:
        # Legacy fixture generation: surface raw nanos as int64, convert below.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        legacy_fields = [
            T.StructField(f.name, T.LongType() if f.name == "ts" else f.dataType)
            for f in schemas["events"].fields
        ]
        schemas["events"] = T.StructType(legacy_fields)
    for name, schema in TESTDATA_SCHEMAS.items():
        _check_schema_drift(f"{sf_dir}/{name}.parquet", schema, name)
    out = {
        name: read_parquet(spark, f"{sf_dir}/{name}.parquet", schema)
        for name, schema in schemas.items()
    }
    if events_nanos:
        out["events"] = out["events"].withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
        )
    _TESTDATA_CACHE[cache_key] = out
    return dict(out)
