"""SSIS/SQL-Server type system -> Spark types, plus explicit testdata schemas.

Canonical map mirrors the reference's ``SSIS_TO_SQL_TYPE_MAP``
(/root/reference/src/parser/type_mappings.py:7-99): both the DT_* outer names
and the lowercase component-XML names resolve, parameterized precision/scale
is threaded through, and unknown types fall back to strings (reference
fallback is NVARCHAR(MAX), type_mappings.py:83).

Schema contract: the reference declares every column type explicitly
(ssis_parser.py:318-338); we do the same — explicit StructType on every scan,
never inference on a correctness-checked path.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- SSIS type name -> Spark DataType factory -------------------------------
# Factories take (length, precision, scale) and return a DataType.

def _const(dt: T.DataType):
    return lambda length=None, precision=None, scale=None: dt


def _decimal(default_p=18, default_s=2):
    return lambda length=None, precision=None, scale=None: T.DecimalType(
        precision or default_p, scale if scale is not None else default_s
    )


SSIS_TO_SPARK_TYPE_MAP: dict[str, object] = {
    # strings (DT_STR/DT_WSTR carry a length; Spark strings are unbounded —
    # length is enforced by validation ops, not the type)
    "DT_STR": _const(T.StringType()),
    "DT_WSTR": _const(T.StringType()),
    "DT_TEXT": _const(T.StringType()),
    "DT_NTEXT": _const(T.StringType()),
    "str": _const(T.StringType()),
    "wstr": _const(T.StringType()),
    # signed integers
    "DT_I1": _const(T.ByteType()),
    "DT_I2": _const(T.ShortType()),
    "DT_I4": _const(T.IntegerType()),
    "DT_I8": _const(T.LongType()),
    "i1": _const(T.ByteType()),
    "i2": _const(T.ShortType()),
    "i4": _const(T.IntegerType()),
    "i8": _const(T.LongType()),
    # unsigned -> next wider signed (reference maps DT_UI8 -> NUMERIC(20,0))
    "DT_UI1": _const(T.ShortType()),
    "DT_UI2": _const(T.IntegerType()),
    "DT_UI4": _const(T.LongType()),
    "DT_UI8": lambda length=None, precision=None, scale=None: T.DecimalType(20, 0),
    # decimals
    "DT_DECIMAL": _decimal(),
    "DT_NUMERIC": _decimal(),
    "numeric": _decimal(),
    "decimal": _decimal(),
    "DT_CY": lambda length=None, precision=None, scale=None: T.DecimalType(19, 4),
    # floats
    "DT_R4": _const(T.FloatType()),
    "DT_R8": _const(T.DoubleType()),
    "r4": _const(T.FloatType()),
    "r8": _const(T.DoubleType()),
    # temporal
    "DT_DATE": _const(T.TimestampType()),
    "DT_DBDATE": _const(T.DateType()),
    # TIME: Spark has no TIME type — the contract is canonical
    # 'HH:MM:SS[.ffffff]' strings plus the arithmetic helpers below
    # (time_to_micros / micros_to_time / time_add_seconds /
    # time_diff_seconds), round-trip-pinned in test_schema_naming.py.
    # Reference maps DT_DBTIME(2) -> SQL Server TIME
    # (src/parser/type_mappings.py:31-32); TIME(7)'s 100 ns digit is
    # clamped to Spark-representable microseconds.
    "DT_DBTIME": _const(T.StringType()),
    "DT_DBTIME2": _const(T.StringType()),
    "dbTime": _const(T.StringType()),
    "dbTime2": _const(T.StringType()),
    "DT_DBTIMESTAMP": _const(T.TimestampType()),
    "DT_DBTIMESTAMP2": _const(T.TimestampType()),
    "DT_DBTIMESTAMPOFFSET": _const(T.TimestampType()),  # UTC-normalized
    "DT_FILETIME": _const(T.TimestampType()),
    "dbTimeStamp": _const(T.TimestampType()),
    "dbDate": _const(T.DateType()),
    # boolean / guid / binary
    "DT_BOOL": _const(T.BooleanType()),
    "bool": _const(T.BooleanType()),
    "DT_GUID": _const(T.StringType()),
    "guid": _const(T.StringType()),
    "DT_BYTES": _const(T.BinaryType()),
    "DT_IMAGE": _const(T.BinaryType()),
    "bytes": _const(T.BinaryType()),
}

# SSIS package-variable type codes (reference: src/parser/constants.py:42-51)
VARIABLE_TYPE_CODES: dict[str, str] = {
    "2": "DT_I2",
    "3": "DT_I4",
    "4": "DT_R4",
    "5": "DT_R8",
    "7": "DT_DATE",
    "8": "DT_WSTR",
    "11": "DT_BOOL",
    "20": "DT_I8",
}


def ssis_to_spark_type(
    ssis_type: str,
    length: int | None = None,
    precision: int | None = None,
    scale: int | None = None,
) -> T.DataType:
    """Resolve an SSIS type name to a Spark DataType (string fallback)."""
    factory = SSIS_TO_SPARK_TYPE_MAP.get(ssis_type) or SSIS_TO_SPARK_TYPE_MAP.get(
        ssis_type.upper()
    )
    if factory is None:
        return T.StringType()  # reference falls back to NVARCHAR(MAX)
    return factory(length, precision, scale)


# --- TIME (DT_DBTIME / DT_DBTIME2) value contract ----------------------------
# SQL Server TIME values ride through the engine as canonical
# 'HH:MM:SS[.ffffff]' strings (Spark has no TIME type); these helpers give
# them ARITHMETIC — parse to integer microseconds-since-midnight, format
# back, add/diff — as pure built-in Column expressions (JVM-side, no UDF).
# TIME(7)'s seventh (100 ns) fractional digit exceeds microsecond precision
# and is TRUNCATED on parse; values outside 00:00:00-23:59:59.999999 or
# malformed strings parse to NULL (quarantine-not-crash).

_TIME_RE = r"^(\d{1,2}):(\d{1,2}):(\d{1,2})(?:\.(\d{1,7}))?$"


def time_to_micros(col):
    """Parse a TIME string to LONG microseconds since midnight (NULL for
    malformed values or out-of-range fields)."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    c = col if isinstance(col, Column) else F.col(col)
    hh = F.regexp_extract(c, _TIME_RE, 1).cast("long")
    mm = F.regexp_extract(c, _TIME_RE, 2).cast("long")
    ss = F.regexp_extract(c, _TIME_RE, 3).cast("long")
    frac = F.regexp_extract(c, _TIME_RE, 4)
    us = F.substring(F.rpad(frac, 6, "0"), 1, 6).cast("long")
    valid = (
        c.rlike(_TIME_RE)
        & (hh < 24) & (mm < 60) & (ss < 60)
    )
    total = (
        (hh * 3_600_000_000 + mm * 60_000_000 + ss * 1_000_000)
        + F.coalesce(us, F.lit(0))
    )
    return F.when(valid, total).otherwise(F.lit(None).cast("long"))


def micros_to_time(col, scale: int = 0):
    """Format LONG microseconds-since-midnight back to the canonical TIME
    string — 'HH:MM:SS' at ``scale=0``, plus a ``scale``-digit fraction
    (1-6) otherwise; input is wrapped into one day (mod 86400s), matching
    SQL Server TIME's day-less domain."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    if not 0 <= int(scale) <= 6:
        raise ValueError(f"TIME scale must be 0-6, got {scale}")
    c = col if isinstance(col, Column) else F.col(col)
    day = F.lit(86_400_000_000)
    m = ((c % day) + day) % day  # python-style mod: negatives wrap forward
    two = lambda x: F.lpad(x.cast("string"), 2, "0")  # noqa: E731
    base = F.concat_ws(
        ":",
        two(F.floor(m / 3_600_000_000)),
        two(F.floor(m / 60_000_000) % 60),
        two(F.floor(m / 1_000_000) % 60),
    )
    if scale == 0:
        return base
    frac = F.substring(
        F.lpad((m % 1_000_000).cast("string"), 6, "0"), 1, int(scale)
    )
    return F.concat(base, F.lit("."), frac)


def time_add_seconds(col, seconds, scale: int = 0):
    """TIME + seconds (Column or literal; fractional seconds allowed),
    wrapped mod 24 h — the T-SQL ``DATEADD(second, n, t)`` analogue for
    the string-TIME contract."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    s = seconds if isinstance(seconds, Column) else F.lit(seconds)
    delta = F.round(s.cast("double") * 1_000_000).cast("long")
    return micros_to_time(time_to_micros(col) + delta, scale=scale)


def time_diff_seconds(end, start):
    """Signed seconds from ``start`` to ``end`` (DOUBLE; NULL if either
    side is malformed) — the ``DATEDIFF(second, ...)`` analogue, without
    day wrapping so callers can detect crossings."""
    return (time_to_micros(end) - time_to_micros(start)) / 1_000_000.0


# --- explicit schemas for the driver-generated testdata ---------------------

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    # events.ts is parquet TIMESTAMP(MICROS) in the current fixtures and maps
    # directly to TimestampType.  Older fixture generations wrote
    # TIMESTAMP(NANOS); sources.readers.testdata() probes the parquet footer
    # and, only for a nanos file, reads raw int64 under
    # spark.sql.legacy.parquet.nanosAsLong and truncates to microseconds.
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)
