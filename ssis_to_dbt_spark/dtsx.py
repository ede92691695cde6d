"""SSIS ``.dtsx`` package ingestion: parse + bind to the Spark engine.

The reference is a dtsx -> dbt *compiler*; this module is the engine-side
counterpart: it parses an actual SSIS package XML (the same surface the
reference parses — connection managers, typed variables, ExecuteSQL /
DataFlow / Script / SendMail tasks, data-flow components, precedence
constraints; reference semantics at
/root/reference/src/parser/ssis_parser.py:112-151 package walk, :265-304
data-flow components, :507-530 precedence constraints) and *executes* it
directly on Spark through :mod:`ssis_to_dbt_spark.pipeline`.

Binding contract (what replaces SSIS connection managers): the caller maps
each table name referenced by the package's embedded SQL (``sales.
Transactions``, ``dim.Customer``, ...) to a DataFrame.  The binder registers
them as temp views under mangled names, rewrites the embedded T-SQL subset
(bracket quoting, dotted names, ``TOP n``, ``?`` parameters, ``@Var``
references) into Spark SQL, and runs it via ``spark.sql`` — so Catalyst sees
one declarative plan per data flow and pushes filters/pruning into the
source scans.

Task classification mirrors the reference's honesty contract:

- DataFlow tasks bind fully (source -> lookups -> derived columns ->
  destination, all engine operators).
- ExecuteSQL tasks whose statement is a single SELECT run through
  ``spark.sql``; statements with T-SQL control flow / DML (DECLARE,
  RAISERROR, MERGE, TRUNCATE, INSERT/UPDATE/DELETE) are marked
  ``manual_review_required`` unless the caller supplies a handler —
  exactly how the reference flags them for human conversion
  (src/parser/models.py:122-142).
- Script tasks are ``manual_review_required``; SendMail tasks are
  ``documented_only`` (never converted, src/parser/models.py:145-155).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from datetime import datetime
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .expressions import SSISExpressionCompiler
from .operators.lookup import LookupNoMatch, lookup
from .pipeline import Model, Pipeline
from .schema import ssis_to_spark_type

_DTS = "www.microsoft.com/SqlServer/Dts"
_SQLTASK = "www.microsoft.com/sqlserver/dts/tasks/sqltask"


def _d(tag: str) -> str:
    return f"{{{_DTS}}}{tag}"


# ---------------------------------------------------------------------------
# IR
# ---------------------------------------------------------------------------

@dataclass
class DtsxVariable:
    """Typed package variable; type codes per the SSIS variable vocabulary
    ("3" int, "7" datetime, "8" string — reference constants.py:42-51)."""

    namespace: str
    name: str
    type_code: str
    raw_value: str

    @property
    def qualified(self) -> str:
        return f"{self.namespace}::{self.name}"

    def python_value(self):
        v = self.raw_value
        if self.type_code == "3":
            return int(v) if v.strip() else 0
        if self.type_code == "7":
            return datetime.fromisoformat(v) if v.strip() else None
        return v


@dataclass
class DtsxConnectionManager:
    ref_id: str
    name: str
    connection_string: str | None


@dataclass
class DtsxOutputColumn:
    """Declared component output column; for DerivedColumn components it
    carries the SSIS expression to compute."""

    name: str
    data_type: str | None = None
    length: int | None = None
    precision: int | None = None
    scale: int | None = None
    expression: str | None = None

    def spark_type(self):
        return ssis_to_spark_type(
            self.data_type or "wstr", self.length, self.precision, self.scale
        )


@dataclass
class DtsxComponent:
    ref_id: str
    class_id: str        # e.g. Microsoft.OLEDBSource
    name: str
    properties: dict = field(default_factory=dict)
    connection_ref: str | None = None
    input_columns: list[str] = field(default_factory=list)   # cachedName order
    output_columns: list[DtsxOutputColumn] = field(default_factory=list)


@dataclass
class DtsxTask:
    ref_id: str
    task_type: str       # Microsoft.Pipeline | Microsoft.ExecuteSQLTask | ...
    name: str
    description: str | None = None
    sql: str | None = None
    result_type: str | None = None
    components: list[DtsxComponent] = field(default_factory=list)


@dataclass
class DtsxPackage:
    name: str
    description: str | None
    connection_managers: list[DtsxConnectionManager]
    variables: list[DtsxVariable]
    tasks: list[DtsxTask]
    constraints: list[tuple[str, str]]   # (from_refid, to_refid)

    def variable_values(self) -> dict[str, object]:
        return {v.qualified: v.python_value() for v in self.variables}


# ---------------------------------------------------------------------------
# Parser (stdlib ElementTree; the inner <pipeline> XML is namespace-free)
# ---------------------------------------------------------------------------

def parse_dtsx(path: str) -> DtsxPackage:
    """Parse one ``.dtsx`` file into the IR above."""
    root = ET.parse(path).getroot()

    cms = []
    for cm in root.iter(_d("ConnectionManager")):
        ref = cm.get(_d("refId"))
        if ref is None:  # inner ObjectData <ConnectionManager> carrier
            continue
        inner = cm.find(f"{_d('ObjectData')}/{_d('ConnectionManager')}")
        cms.append(
            DtsxConnectionManager(
                ref_id=ref,
                name=cm.get(_d("ObjectName"), ""),
                connection_string=(
                    inner.get(_d("ConnectionString")) if inner is not None else None
                ),
            )
        )

    variables = []
    for var in root.iter(_d("Variable")):
        val = var.find(_d("VariableValue"))
        variables.append(
            DtsxVariable(
                namespace=var.get(_d("Namespace"), "User"),
                name=var.get(_d("ObjectName"), ""),
                type_code=val.get(_d("DataType"), "8") if val is not None else "8",
                raw_value=(val.text or "") if val is not None else "",
            )
        )

    tasks = []
    execs = root.find(_d("Executables"))
    for ex in (execs.findall(_d("Executable")) if execs is not None else []):
        task = DtsxTask(
            ref_id=ex.get(_d("refId"), ""),
            task_type=ex.get(_d("ExecutableType"), ""),
            name=ex.get(_d("ObjectName"), ""),
            description=ex.get(_d("Description")),
        )
        od = ex.find(_d("ObjectData"))
        if od is not None:
            sql_data = od.find(f"{{{_SQLTASK}}}SqlTaskData")
            if sql_data is not None:
                task.sql = sql_data.get(f"{{{_SQLTASK}}}SqlStatementSource")
                task.result_type = sql_data.get(f"{{{_SQLTASK}}}ResultType")
            pipe = od.find("pipeline")
            if pipe is not None:
                comps = pipe.find("components")
                for c in (comps.findall("component") if comps is not None else []):
                    task.components.append(_parse_component(c))
        tasks.append(task)

    constraints = []
    pcs = root.find(_d("PrecedenceConstraints"))
    for pc in (pcs.findall(_d("PrecedenceConstraint")) if pcs is not None else []):
        constraints.append((pc.get(_d("From"), ""), pc.get(_d("To"), "")))

    return DtsxPackage(
        name=root.get(_d("ObjectName"), path),
        description=root.get(_d("Description")),
        connection_managers=cms,
        variables=variables,
        tasks=tasks,
        constraints=constraints,
    )


def _parse_component(c: ET.Element) -> DtsxComponent:
    comp = DtsxComponent(
        ref_id=c.get("refId", ""),
        class_id=c.get("componentClassID", ""),
        name=c.get("name", ""),
    )
    props = c.find("properties")
    for p in (props.findall("property") if props is not None else []):
        comp.properties[p.get("name", "")] = p.text or ""
    conns = c.find("connections")
    if conns is not None:
        conn = conns.find("connection")
        if conn is not None:
            comp.connection_ref = conn.get("connectionManagerRefId")
    for ic in c.iter("inputColumn"):
        cached = ic.get("cachedName")
        if cached:
            comp.input_columns.append(cached)
    for oc in c.iter("outputColumn"):
        col = DtsxOutputColumn(
            name=oc.get("name", ""),
            data_type=oc.get("dataType"),
            length=int(oc.get("length")) if oc.get("length") else None,
            precision=int(oc.get("precision")) if oc.get("precision") else None,
            scale=int(oc.get("scale")) if oc.get("scale") else None,
        )
        p = oc.find("properties")
        if p is not None:
            for prop in p.findall("property"):
                if prop.get("name") == "Expression":
                    col.expression = prop.text or ""
        comp.output_columns.append(col)
    return comp


# ---------------------------------------------------------------------------
# T-SQL subset rewrite (embedded SqlCommand / SqlStatementSource -> Spark SQL)
# ---------------------------------------------------------------------------

def _sql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, datetime):
        return f"TIMESTAMP '{v.strftime('%Y-%m-%d %H:%M:%S')}'"
    if isinstance(v, (int, float)):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def rewrite_tsql(
    sql: str,
    table_views: dict[str, str],
    params: list | None = None,
    variables: dict[str, object] | None = None,
) -> str:
    """Rewrite the embedded T-SQL subset into Spark-SQL-runnable text:
    strip ``[...]`` quoting, map bound dotted table names to their temp-view
    names, substitute ``?`` placeholders positionally from ``params`` and
    ``@Var`` references from ``variables``, and turn ``TOP n`` into a
    trailing ``LIMIT n``.  Raises if a ``?`` remains unbound."""
    s = sql.replace("[", "").replace("]", "").rstrip().rstrip(";")
    for t in sorted(table_views, key=len, reverse=True):
        s = re.sub(re.escape(t), table_views[t], s, flags=re.IGNORECASE)
    for qual, val in (variables or {}).items():
        bare = qual.split("::")[-1]
        s = re.sub(rf"@{re.escape(bare)}\b", _sql_literal(val), s)
    if params:
        it = iter(params)
        s = re.sub(r"\?", lambda _m: _sql_literal(next(it)), s)
    if "?" in s:
        raise ValueError(f"unbound ? parameter in SQL: {sql[:80]}...")
    m = re.search(r"(?i)\bTOP\s+(\d+)\b", s)
    if m:
        s = s[: m.start()] + s[m.end():].lstrip()
        s = s + f" LIMIT {m.group(1)}"
    return s


_RUNNABLE_RE = re.compile(r"(?is)^\s*(?:--[^\n]*\n\s*)*SELECT\b")
_MANUAL_KEYWORDS = re.compile(
    r"(?i)\b(DECLARE|RAISERROR|MERGE|TRUNCATE|INSERT|UPDATE|DELETE|EXEC)\b"
)


def classify_sql(sql: str) -> str:
    """'runnable' for a single SELECT statement; 'manual' for T-SQL control
    flow / DML the engine will not guess at (the reference's
    manual_review_required contract)."""
    if _RUNNABLE_RE.match(sql or "") and not _MANUAL_KEYWORDS.search(sql or ""):
        return "runnable"
    return "manual"


# ---------------------------------------------------------------------------
# Binder
# ---------------------------------------------------------------------------

@dataclass
class BoundTask:
    name: str
    task_type: str
    status: str       # bound | manual_review_required | documented_only
    detail: str = ""


def _mangle(pkg: DtsxPackage, table: str) -> str:
    return (
        re.sub(r"[^A-Za-z0-9_]", "_", pkg.name).lower()
        + "__"
        + table.replace(".", "_").lower()
    )


def bind_package(
    spark: SparkSession,
    pkg: DtsxPackage,
    tables: dict[str, DataFrame],
    variables: dict[str, object] | None = None,
    param_bindings: dict[str, list[str]] | None = None,
    sql_handlers: dict[str, Callable] | None = None,
) -> tuple[Pipeline, list[BoundTask]]:
    """Bind a parsed package to the engine.

    ``tables``: referenced table name (as written in the package SQL, e.g.
    ``"dim.Customer"``) -> DataFrame.  ``variables`` override the package's
    declared variable values (the C3 contract).  ``param_bindings``: component
    or task NAME -> ordered variable names feeding its ``?`` placeholders.
    ``sql_handlers``: task name -> ``(frames, vars) -> DataFrame`` for
    ExecuteSQL tasks the subset rewriter cannot run (MERGE, DELETE+INSERT...).

    Returns (pipeline, report).  Each task becomes one :class:`Model` named
    by its ObjectName; precedence constraints become ``deps``; a data-flow
    model's DataFrame is its destination input, also registered as a temp
    view named after the destination table so downstream SQL tasks can read
    it.
    """
    vars_all = pkg.variable_values()
    vars_all.update(variables or {})
    views = {t: _mangle(pkg, t) for t in tables}
    for t, df in tables.items():
        df.createOrReplaceTempView(views[t])

    ref_to_name = {t.ref_id: t.name for t in pkg.tasks}
    deps: dict[str, list[str]] = {t.name: [] for t in pkg.tasks}
    for frm, to in pkg.constraints:
        if frm in ref_to_name and to in ref_to_name:
            deps[ref_to_name[to]].append(ref_to_name[frm])

    pipe = Pipeline(spark=spark, vars=vars_all)
    report: list[BoundTask] = []
    for task in pkg.tasks:
        model, bound = _bind_task(
            spark, pkg, task, views, param_bindings or {}, sql_handlers or {}
        )
        model.deps = deps[task.name]
        pipe.add(model)
        report.append(bound)
    return pipe, report


def _noop_model(spark: SparkSession, task: DtsxTask, status: str) -> Model:
    def build(frames, vars_):
        return spark.createDataFrame(
            [(task.name, task.task_type, status)],
            "task string, task_type string, status string",
        )

    return Model(name=task.name, build=build)


def _bind_task(spark, pkg, task, views, param_bindings, sql_handlers):
    if task.task_type == "Microsoft.Pipeline":
        def build(frames, vars_, _task=task):
            return _run_dataflow(spark, pkg, _task, views, vars_, param_bindings)

        return Model(name=task.name, build=build), BoundTask(
            task.name, task.task_type, "bound", "data flow"
        )
    if task.task_type == "Microsoft.ExecuteSQLTask":
        if task.name in sql_handlers:
            handler = sql_handlers[task.name]

            def build(frames, vars_, _h=handler):
                return _h(frames, vars_)

            return Model(name=task.name, build=build), BoundTask(
                task.name, task.task_type, "bound", "caller handler"
            )
        if task.sql and classify_sql(task.sql) == "runnable":
            def build(frames, vars_, _task=task):
                sql = rewrite_tsql(
                    _task.sql,
                    views,
                    params=[
                        vars_[v] for v in param_bindings.get(_task.name, [])
                    ],
                    variables=vars_,
                )
                return spark.sql(sql)

            return Model(name=task.name, build=build), BoundTask(
                task.name, task.task_type, "bound",
                f"spark.sql ({task.result_type or 'no result set'})",
            )
        return _noop_model(spark, task, "manual_review_required"), BoundTask(
            task.name, task.task_type, "manual_review_required",
            "T-SQL control flow / DML — supply sql_handlers entry",
        )
    if task.task_type == "Microsoft.ScriptTask":
        return _noop_model(spark, task, "manual_review_required"), BoundTask(
            task.name, task.task_type, "manual_review_required",
            "script task (reference flags these for manual conversion)",
        )
    return _noop_model(spark, task, "documented_only"), BoundTask(
        task.name, task.task_type, "documented_only", ""
    )


# ---------------------------------------------------------------------------
# Data-flow execution (components chain in document order, as in the samples)
# ---------------------------------------------------------------------------

def _run_dataflow(spark, pkg, task, views, vars_, param_bindings) -> DataFrame:
    df: DataFrame | None = None
    for comp in task.components:
        cls = comp.class_id.rsplit(".", 1)[-1]
        if cls == "OLEDBSource":
            df = _bind_source(spark, comp, views, vars_, param_bindings)
        elif cls == "Lookup":
            df = _bind_lookup(spark, df, comp, views, vars_)
        elif cls == "DerivedColumn":
            df = _bind_derived(df, comp, vars_)
        elif cls == "OLEDBDestination":
            df = _bind_destination(spark, pkg, df, comp)
        else:
            raise ValueError(
                f"unsupported data-flow component {comp.class_id} "
                f"({comp.name}) — not in the reference sample vocabulary"
            )
    if df is None:
        raise ValueError(f"data flow {task.name} has no source component")
    return df


def _bind_source(spark, comp, views, vars_, param_bindings) -> DataFrame:
    sql = comp.properties.get("SqlCommand")
    if sql:
        params = [vars_[v] for v in param_bindings.get(comp.name, [])]
        df = spark.sql(rewrite_tsql(sql, views, params=params, variables=vars_))
    else:
        table = comp.properties.get("OpenRowset", "").replace("[", "").replace("]", "")
        view = views.get(table)
        if view is None:
            raise ValueError(f"source table {table!r} not bound")
        df = spark.table(view)
    # enforce the declared output schema: explicit cast per column, never
    # inference (the engine contract from SURVEY §1.2)
    if comp.output_columns:
        df = df.select(
            *[
                F.col(c.name).cast(c.spark_type()).alias(c.name)
                for c in comp.output_columns
            ]
        )
    return df


def _bind_lookup(spark, df, comp, views, vars_) -> DataFrame:
    if df is None:
        raise ValueError(f"lookup {comp.name} has no upstream source")
    dim = spark.sql(rewrite_tsql(comp.properties["SqlCommand"], views, variables=vars_))
    out_names = [c.name for c in comp.output_columns]
    # dim columns not in the declared output are the reference (join) side,
    # matched positionally with the input columns' cachedNames — the sample
    # packages' implicit lineage mapping (SalesFactETL.dtsx:140-227)
    join_dim = [c for c in dim.columns if c not in out_names]
    input_cols = list(comp.input_columns)
    if not input_cols:
        # InventorySync.dtsx's lookups declare no <inputs>: recover the
        # mapping by name — exact match first, else the unique upstream
        # column whose name ends with the dim column's (ProductSKU ~ SKU)
        for dcol in join_dim:
            if dcol in df.columns:
                input_cols.append(dcol)
                continue
            suffix = [c for c in df.columns if c.lower().endswith(dcol.lower())]
            if len(suffix) != 1:
                raise ValueError(
                    f"lookup {comp.name}: no <inputs> and dim join column "
                    f"{dcol!r} matches {suffix or 'nothing'} upstream"
                )
            input_cols.append(suffix[0])
    if len(join_dim) != len(input_cols):
        raise ValueError(
            f"lookup {comp.name}: cannot match input columns "
            f"{input_cols} to dim join columns {join_dim}"
        )
    for dcol, fcol in zip(join_dim, input_cols):
        if dcol != fcol:
            dim = dim.withColumnRenamed(dcol, fcol)
    no_match = (
        LookupNoMatch.FAIL
        if comp.properties.get("NoMatchBehavior", "1").strip() == "0"
        else LookupNoMatch.IGNORE
    )
    out = lookup(
        df,
        dim,
        on=input_cols,
        select={n: n for n in out_names},
        no_match=no_match,
    )
    for c in comp.output_columns:
        out = out.withColumn(c.name, F.col(c.name).cast(c.spark_type()))
    return out


def _bind_derived(df, comp, vars_) -> DataFrame:
    if df is None:
        raise ValueError(f"derived column {comp.name} has no upstream source")
    schema_map = {f.name: f.dataType for f in df.schema.fields}
    for c in comp.output_columns:
        compiler = SSISExpressionCompiler(columns=schema_map, variables=vars_)
        col = compiler.compile(c.expression or "")
        df = df.withColumn(c.name, col.cast(c.spark_type()))
        schema_map[c.name] = c.spark_type()
    return df


def _bind_destination(spark, pkg, df, comp) -> DataFrame:
    if df is None:
        raise ValueError(f"destination {comp.name} has no upstream source")
    table = comp.properties.get("OpenRowset", "").replace("[", "").replace("]", "")
    if table:
        df.createOrReplaceTempView(_mangle(pkg, table))
    return df


def run_package(
    spark: SparkSession,
    path: str,
    tables: dict[str, DataFrame],
    variables: dict[str, object] | None = None,
    param_bindings: dict[str, list[str]] | None = None,
    sql_handlers: dict[str, Callable] | None = None,
) -> tuple[dict[str, DataFrame], list[BoundTask]]:
    """Parse + bind + execute a package; returns ({task name -> DataFrame},
    report).  Data-flow tasks yield their destination input; runnable SQL
    tasks yield their result set; manual/documented tasks yield a 1-row
    status frame."""
    pkg = parse_dtsx(path)
    pipe, report = bind_package(
        spark, pkg, tables, variables, param_bindings, sql_handlers
    )
    frames = pipe.run({})
    return frames, report
