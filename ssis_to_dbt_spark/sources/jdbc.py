"""JDBC source — the production scan path of SURVEY §2.1 S1/S2.

The reference's deployed pipeline reads SQL Server through a connection
handler (``reference/src/connections/sql_server.py:22-130``: config with a
secret-typed password and a redacting repr, identifier validation before
any interpolation, query- and table-backed reads).  The Spark-native
equivalent is the built-in ``jdbc`` data source: a table scan is
``option("dbtable", ...)`` and the reference's embedded-SELECT form is
``option("query", ...)`` — Catalyst pushes filters/projections into the
remote SQL for either, and partitioned reads split the scan into
``numPartitions`` range-parallel queries (the 100 TB ingest shape: without
``partition_column`` a JDBC read is ONE executor task no matter the
cluster size).

Everything up to ``.load()``/``.save()`` is a pure, unit-tested plan
(URL/option assembly, identifier quoting, credential redaction).  r9: the
execution halves are ALSO e2e-exercised in this sandbox against an
embedded Apache Derby database (its driver jar ships with Spark) —
``tests/test_sources.py::TestJdbcEndToEnd`` runs sink-append,
truncate-overwrite, table/query reads, and a range-partitioned parallel
read through the real ``jdbc`` data source.  Only a LIVE SQL Server
endpoint remains deployment-only.

Security contract (mirrors ``reference/src/parser/utils.py:49-101`` and
its tests ``reference/tests/test_utils.py``):

- every identifier that reaches SQL text is validated
  (:func:`..naming.validate_identifier`) then bracket/quote-escaped for
  the dialect — nothing user-supplied is interpolated raw;
- passwords never appear in the URL (always connection properties) and
  :func:`redact_credentials` scrubs Password/PWD/token/api-key values
  from any string destined for logs; reprs redact by construction.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..naming import validate_identifier

_DIALECT_QUOTES = {
    # open, close, doubled-close escape
    "sqlserver": ("[", "]"),
    "postgres": ('"', '"'),
    "mysql": ("`", "`"),
    "generic": ('"', '"'),
}

# key=value credential forms in connection strings / URLs; values may be
# quoted (allowing embedded semicolons) or run to the next ';'
_CRED_KEYS = r"(password|pwd|passwd|secret|token|api[_-]?key|accesskey)"
_CRED_PATTERN = re.compile(
    _CRED_KEYS + r"(\s*=\s*)('[^']*'|\"[^\"]*\"|[^;&\s]*)",
    re.IGNORECASE,
)
_BEARER_PATTERN = re.compile(r"(bearer\s+)(\S+)", re.IGNORECASE)
# option NAMES that carry secrets as bare values (sslpassword, accessToken,
# sslkeypassword, ...): substring match of the credential stems above
_CRED_KEY_NAME = re.compile(_CRED_KEYS, re.IGNORECASE)

REDACTED = "***REDACTED***"


def redact_credentials(text: str) -> str:
    """Scrub credential values from a connection string / URL / log line:
    ``Password=``/``PWD=``/``token=``/``ApiKey=`` values (case-insensitive,
    quoted values with embedded semicolons included) and ``Bearer`` tokens
    become ``***REDACTED***``; everything non-sensitive is preserved
    verbatim.  Same observable contract as the reference's
    ``redact_connection_string`` (``reference/tests/test_utils.py``)."""
    if not text:
        return text
    out = _CRED_PATTERN.sub(lambda m: m.group(1) + m.group(2) + REDACTED, text)
    return _BEARER_PATTERN.sub(lambda m: m.group(1) + REDACTED, out)


def quote_qualified(
    table: str, schema: str | None = None, dialect: str = "sqlserver"
) -> str:
    """Dialect-quoted, validation-gated table reference: ``[dbo].[Orders]``
    (sqlserver), ``"public"."orders"`` (postgres).  Raises ``ValueError``
    on any part that is not a plain identifier — the injection gate the
    reference applies before interpolating names into SQL."""
    try:
        o, c = _DIALECT_QUOTES[dialect]
    except KeyError:
        raise ValueError(
            f"unknown dialect {dialect!r}; one of {sorted(_DIALECT_QUOTES)}"
        ) from None
    parts = ([schema] if schema else []) + [table]
    return ".".join(f"{o}{validate_identifier(p)}{c}" for p in parts)


def sqlserver_url(
    server: str, database: str, port: int = 1433, encrypt: bool = True
) -> str:
    """``jdbc:sqlserver://host:port;databaseName=db`` — credentials are
    NEVER part of the URL (they travel as connection properties, so a
    logged URL is safe by construction).  The database name is
    identifier-validated; the server part allows host/IP characters."""
    if not re.match(r"^[A-Za-z0-9_.\-]+$", server):
        raise ValueError(f"invalid server name: {server!r}")
    validate_identifier(database)
    enc = "true" if encrypt else "false"
    return (
        f"jdbc:sqlserver://{server}:{int(port)};databaseName={database};"
        f"encrypt={enc}"
    )


@dataclass
class JdbcSource:
    """A fully-assembled JDBC read plan (everything but the ``.load()``).

    Exactly one of ``table`` (S2 table scan; optionally ``schema_name``)
    or ``query`` (S1 embedded SELECT — the reference's SQL-command source,
    ``reference/src/parser/ssis_parser.py:306-354``) must be set.

    ``partition_column``/``lower_bound``/``upper_bound``/``num_partitions``
    configure Spark's range-partitioned parallel read; all four are
    required together (a partial spec silently degrades to a single-task
    scan, so it raises here instead).  ``fetchsize`` is the per-roundtrip
    row batch (default 10k — the JDBC default of ~10 rows is a scale
    trap).  ``user``/``password`` go into properties, never the URL, and
    ``describe()``/``repr()`` redact."""

    url: str
    table: str | None = None
    schema_name: str | None = None
    query: str | None = None
    dialect: str = "sqlserver"
    user: str | None = None
    password: str | None = None
    driver: str | None = None
    fetchsize: int = 10_000
    partition_column: str | None = None
    lower_bound: int | str | None = None
    upper_bound: int | str | None = None
    num_partitions: int | None = None
    extra_options: dict[str, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if (self.table is None) == (self.query is None):
            raise ValueError("exactly one of table/query must be set")
        if self.table is not None:
            # validates + quotes now, so a bad name fails at construction
            self._dbtable = quote_qualified(
                self.table, self.schema_name, self.dialect
            )
        part_spec = [
            self.partition_column,
            self.lower_bound,
            self.upper_bound,
            self.num_partitions,
        ]
        given = [p is not None for p in part_spec]
        if any(given) and not all(given):
            raise ValueError(
                "partitioned read requires ALL of partition_column, "
                "lower_bound, upper_bound, num_partitions — a partial spec "
                "would silently fall back to a single-task scan"
            )
        if self.partition_column is not None:
            validate_identifier(self.partition_column)

    def options(self) -> dict[str, str]:
        """The exact option dict handed to ``spark.read.format('jdbc')`` —
        pure and unit-testable without a database."""
        opts: dict[str, str] = {"url": self.url}
        if self.query is not None:
            opts["query"] = self.query
        else:
            opts["dbtable"] = self._dbtable
        if self.user is not None:
            opts["user"] = self.user
        if self.password is not None:
            opts["password"] = self.password
        if self.driver is not None:
            opts["driver"] = self.driver
        opts["fetchsize"] = str(self.fetchsize)
        if self.partition_column is not None:
            opts["partitionColumn"] = self.partition_column
            opts["lowerBound"] = str(self.lower_bound)
            opts["upperBound"] = str(self.upper_bound)
            opts["numPartitions"] = str(self.num_partitions)
        opts.update(self.extra_options)
        return opts

    def describe(self) -> str:
        """Loggable one-line description — redacted by construction."""
        # redact by option NAME too: extra_options like sslpassword /
        # accessToken / sslkeypassword carry bare secret values that the
        # key=value pattern inside redact_credentials can't see
        opts = {
            k: (REDACTED if _CRED_KEY_NAME.search(k) else v)
            for k, v in self.options().items()
        }
        body = ", ".join(f"{k}={redact_credentials(str(v))}" for k, v in
                         sorted(opts.items()))
        return f"JdbcSource({body})"

    __repr__ = describe

    def load(self, spark: SparkSession) -> DataFrame:
        """Execute the read.  Requires a JDBC driver jar on the Spark
        classpath and a reachable endpoint — e2e-tested here against
        embedded Derby (``TestJdbcEndToEnd``); SQL Server needs a real
        deployment."""
        return spark.read.format("jdbc").options(**self.options()).load()


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str | None = None,
    query: str | None = None,
    **kwargs,
) -> DataFrame:
    """One-call form: ``read_jdbc(spark, url, table="Orders",
    schema_name="dbo", partition_column="OrderID", lower_bound=0,
    upper_bound=10_000_000, num_partitions=64)``."""
    return JdbcSource(url=url, table=table, query=query, **kwargs).load(spark)


_WRITE_MODES = ("append", "overwrite", "errorifexists", "ignore")
_ISOLATION_LEVELS = (
    "NONE",
    "READ_COMMITTED",
    "READ_UNCOMMITTED",
    "REPEATABLE_READ",
    "SERIALIZABLE",
)


@dataclass
class JdbcSink:
    """A fully-assembled JDBC write plan — the destination half of the
    production path (SURVEY §2.1 S3's OLE DB Destination append/fast-load,
    ``reference/src/parser/ssis_parser.py:356-376``; the reference's
    deployed write side is ``reference/src/connections/sql_server.py``).

    Mapping of the SSIS destination semantics onto Spark's ``jdbc`` sink:

    - *append / fast-load* → ``mode="append"`` with ``batchsize`` sizing
      the executemany batches (the fast-load commit-size analogue; the
      1-row JDBC default is a scale trap exactly like ``fetchsize`` on
      the read side).
    - *truncate-and-load* → ``mode="overwrite"`` + ``truncate=True``:
      Spark issues TRUNCATE TABLE and keeps the existing DDL (indexes,
      grants, types).  Plain ``overwrite`` DROPs and re-CREATEs from the
      DataFrame schema — usually NOT what a warehouse destination wants,
      so truncate-vs-drop is an explicit, validated choice here.
    - ``isolation_level`` → the ``isolationLevel`` option for the write
      transactions (Spark's default READ_UNCOMMITTED is kept — bulk loads
      shouldn't take share locks).
    - ``num_partitions`` → caps write parallelism (Spark coalesces before
      writing): each partition is one connection, and an unbounded
      1000-executor write is a connection storm on the target.

    Same security contract as :class:`JdbcSource`: the table name is
    identifier-validated then dialect-quoted at construction, credentials
    travel as options (never the URL), ``describe()``/``repr()`` redact by
    option name and value."""

    url: str
    table: str
    schema_name: str | None = None
    dialect: str = "sqlserver"
    mode: str = "append"
    truncate: bool = False
    user: str | None = None
    password: str | None = None
    driver: str | None = None
    batchsize: int = 10_000
    isolation_level: str = "READ_UNCOMMITTED"
    num_partitions: int | None = None
    extra_options: dict[str, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        self._dbtable = quote_qualified(
            self.table, self.schema_name, self.dialect
        )
        if self.mode not in _WRITE_MODES:
            raise ValueError(
                f"unknown mode {self.mode!r}; one of {_WRITE_MODES}"
            )
        if self.truncate and self.mode != "overwrite":
            raise ValueError(
                "truncate=True only applies to mode='overwrite' (append "
                "never truncates; a silently-ignored flag would hide a "
                "destructive intent mismatch)"
            )
        if self.isolation_level not in _ISOLATION_LEVELS:
            raise ValueError(
                f"unknown isolation_level {self.isolation_level!r}; "
                f"one of {_ISOLATION_LEVELS}"
            )
        if self.num_partitions is not None and int(self.num_partitions) < 1:
            raise ValueError("num_partitions must be >= 1")

    def options(self) -> dict[str, str]:
        """The exact option dict handed to ``df.write.format('jdbc')`` —
        pure and unit-testable without a database."""
        opts: dict[str, str] = {"url": self.url, "dbtable": self._dbtable}
        if self.user is not None:
            opts["user"] = self.user
        if self.password is not None:
            opts["password"] = self.password
        if self.driver is not None:
            opts["driver"] = self.driver
        opts["batchsize"] = str(self.batchsize)
        opts["isolationLevel"] = self.isolation_level
        if self.mode == "overwrite":
            # explicit either way: the truncate-vs-drop choice must be
            # visible in the option dict, not an implicit default
            opts["truncate"] = "true" if self.truncate else "false"
        if self.num_partitions is not None:
            opts["numPartitions"] = str(self.num_partitions)
        opts.update(self.extra_options)
        return opts

    def describe(self) -> str:
        """Loggable one-line description — redacted by construction."""
        opts = {
            k: (REDACTED if _CRED_KEY_NAME.search(k) else v)
            for k, v in self.options().items()
        }
        body = ", ".join(f"{k}={redact_credentials(str(v))}" for k, v in
                         sorted(opts.items()))
        return f"JdbcSink(mode={self.mode}, {body})"

    __repr__ = describe

    def save(self, df: DataFrame) -> None:
        """Execute the write.  Requires a JDBC driver jar and a reachable
        endpoint — e2e-tested here against embedded Derby
        (``TestJdbcEndToEnd``); SQL Server needs a real deployment."""
        (
            df.write.format("jdbc")
            .options(**self.options())
            .mode(self.mode)
            .save()
        )


def write_jdbc(df: DataFrame, url: str, table: str, **kwargs) -> None:
    """One-call form: ``write_jdbc(df, url, "FactSales", schema_name="dbo",
    mode="overwrite", truncate=True, batchsize=50_000,
    num_partitions=32)``."""
    JdbcSink(url=url, table=table, **kwargs).save(df)
