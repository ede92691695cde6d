"""Property-based tests: the SSIS expression compiler against Python oracles.

Each hypothesis example set is evaluated in ONE Spark job (a single
createDataFrame of all generated rows), keeping runtime bounded.
"""

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ssis_to_dbt_spark.expressions import compile_ssis_expression

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

ints = st.integers(min_value=-10**6, max_value=10**6)
texts = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=127),
    max_size=20,
)


def batch_eval(spark, col, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return [r["v"] for r in df.select(col.alias("v")).collect()]


class TestArithmeticProperties:
    @settings(**SETTINGS)
    @given(st.lists(st.tuples(ints, ints), min_size=1, max_size=50))
    def test_ternary_matches_python(self, spark, pairs):
        col = compile_ssis_expression("[a] > [b] ? [a] : [b]")
        got = batch_eval(spark, col, pairs, "a long, b long")
        assert got == [max(a, b) if a != b else b for a, b in pairs]

    @settings(**SETTINGS)
    @given(st.lists(st.tuples(ints, ints.filter(lambda x: x != 0)), min_size=1, max_size=50))
    def test_modulo_and_arithmetic(self, spark, pairs):
        col = compile_ssis_expression("[a] * 2 - [b]")
        got = batch_eval(spark, col, pairs, "a long, b long")
        assert got == [a * 2 - b for a, b in pairs]


class TestStringProperties:
    @settings(**SETTINGS)
    @given(st.lists(st.tuples(texts, st.integers(min_value=0, max_value=25)), min_size=1, max_size=50))
    def test_left_matches_python_slice(self, spark, pairs):
        rows = [(t, n) for t, n in pairs]
        col = compile_ssis_expression(
            "LEFT([s], [n])", columns={"s": __import__("pyspark").sql.types.StringType()}
        )
        got = batch_eval(spark, col, rows, "s string, n int")
        assert got == [t[:n] for t, n in pairs]

    @settings(**SETTINGS)
    @given(st.lists(texts, min_size=1, max_size=50))
    def test_upper_lower_roundtrip(self, spark, vals):
        rows = [(v,) for v in vals]
        col = compile_ssis_expression("LOWER(UPPER([s]))")
        got = batch_eval(spark, col, rows, "s string")
        assert got == [v.upper().lower() for v in vals]


class TestDateProperties:
    @settings(**SETTINGS)
    @given(
        st.lists(
            st.tuples(
                st.datetimes(
                    min_value=datetime.datetime(1990, 1, 1),
                    max_value=datetime.datetime(2030, 1, 1),
                ).map(lambda d: d.replace(microsecond=0)),
                st.integers(min_value=-1000, max_value=1000),
            ),
            min_size=1,
            max_size=50,
        )
    )
    def test_dateadd_day_matches_timedelta(self, spark, pairs):
        col = compile_ssis_expression("DATEADD(day, [n], [d])")
        got = batch_eval(spark, col, pairs, "d timestamp, n int")
        assert got == [d + datetime.timedelta(days=n) for d, n in pairs]

    @settings(**SETTINGS)
    @given(
        st.lists(
            st.tuples(
                st.dates(datetime.date(1990, 1, 1), datetime.date(2030, 1, 1)),
                st.dates(datetime.date(1990, 1, 1), datetime.date(2030, 1, 1)),
            ),
            min_size=1,
            max_size=50,
        )
    )
    def test_datediff_day_is_boundary_count(self, spark, pairs):
        rows = [
            (datetime.datetime.combine(a, datetime.time(23, 59)),
             datetime.datetime.combine(b, datetime.time(0, 1)))
            for a, b in pairs
        ]
        col = compile_ssis_expression("DATEDIFF(day, [a], [b])")
        got = batch_eval(spark, col, rows, "a timestamp, b timestamp")
        assert got == [(b - a).days for a, b in pairs]
