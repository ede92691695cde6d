"""SSIS expression compiler tests (SURVEY §2.3 E1-E9, F3)."""

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ssis_to_dbt_spark.expressions import (
    compile_ssis_expression,
    email_domain,
    nullif_trim,
    safe_divide,
    stock_status,
    surrogate_key,
    tsql_concat,
)

STR_COLS = {"first": T.StringType(), "last": T.StringType()}


def one(spark, col, **rows):
    """Evaluate a Column against a single-row frame built from kwargs."""
    data = [tuple(rows.values())]
    schema = ", ".join(
        f"{k} {'string' if isinstance(v, (str, type(None))) else 'double' if isinstance(v, float) else 'int'}"
        for k, v in rows.items()
    )
    return spark.createDataFrame(data, schema).select(col.alias("v")).first()["v"]


class TestConcatSemantics:
    def test_plus_propagates_null(self, spark):
        # E1: SSIS/T-SQL `+` concat propagates NULL...
        c = compile_ssis_expression('[first] + " " + [last]', columns=STR_COLS)
        assert one(spark, c, first="Jo", last=None) is None
        assert one(spark, c, first="Jo", last="Ann") == "Jo Ann"

    def test_tsql_concat_treats_null_as_empty(self, spark):
        # ...while CONCAT() treats NULL as '' (stg_crm__customers.sql:60)
        c = tsql_concat(F.col("first"), F.col("last"))
        assert one(spark, c, first="Jo", last=None) == "Jo"


class TestTernaryAndNulls:
    def test_ternary(self, spark):
        c = compile_ssis_expression('[n] > 5 ? "big" : "small"')
        assert one(spark, c, n=9) == "big"
        assert one(spark, c, n=3) == "small"

    def test_nested_ternary(self, spark):
        c = compile_ssis_expression('[n] > 10 ? "hi" : [n] > 5 ? "mid" : "lo"')
        assert one(spark, c, n=11) == "hi"
        assert one(spark, c, n=7) == "mid"
        assert one(spark, c, n=1) == "lo"

    def test_isnull_arity_1_is_boolean_test(self, spark):
        c = compile_ssis_expression("ISNULL([first])", columns=STR_COLS)
        assert one(spark, c, first=None) is True
        assert one(spark, c, first="x") is False

    def test_isnull_arity_2_coalesces(self, spark):
        # reference rewrites ISNULL(x) -> ISNULL(x, '') (builder.py:485-490)
        c = compile_ssis_expression('ISNULL([first], "d")', columns=STR_COLS)
        assert one(spark, c, first=None) == "d"

    def test_typed_null(self, spark):
        c = compile_ssis_expression('ISNULL(NULL(DT_WSTR), "fallback")')
        assert one(spark, c, x=1) == "fallback"


class TestCasts:
    def test_dt_wstr_truncates(self, spark):
        # E8: (DT_WSTR,5) truncates like NVARCHAR(5)
        c = compile_ssis_expression("(DT_WSTR,5)[first]", columns=STR_COLS)
        assert one(spark, c, first="abcdefgh") == "abcde"

    def test_dt_numeric_cast(self, spark):
        c = compile_ssis_expression("(DT_NUMERIC,10,2)[x]")
        import decimal
        assert one(spark, c, x=3.14159) == decimal.Decimal("3.14")

    def test_dt_i4_cast(self, spark):
        c = compile_ssis_expression("(DT_I4)[x]")
        assert one(spark, c, x=7.9) == 7


class TestStringFunctions:
    def test_substring_findstring_len(self, spark):
        # E2: email-domain extraction shape (CustomerDataLoad.dtsx:129)
        c = compile_ssis_expression(
            'SUBSTRING([first], FINDSTRING([first], "@", 1) + 1, LEN([first]))',
            columns=STR_COLS,
        )
        assert one(spark, c, first="a@b.com") == "b.com"

    def test_left_right_upper_lower(self, spark):
        assert one(spark, compile_ssis_expression('UPPER(LEFT([first], 3))', columns=STR_COLS), first="hello") == "HEL"
        assert one(spark, compile_ssis_expression('LOWER(RIGHT([first], 3))', columns=STR_COLS), first="HELLO") == "llo"

    def test_len_ignores_trailing_spaces(self, spark):
        # T-SQL LEN semantics
        assert one(spark, compile_ssis_expression("LEN([first])", columns=STR_COLS), first="ab  ") == 2

    def test_replace_trim(self, spark):
        assert one(spark, compile_ssis_expression('REPLACE([first], "-", "_")', columns=STR_COLS), first="a-b") == "a_b"
        assert one(spark, compile_ssis_expression('LTRIM(RTRIM([first]))', columns=STR_COLS), first="  x ") == "x"


class TestDateFunctions:
    def test_dateadd_day(self, spark):
        c = compile_ssis_expression('DATEADD(day, 3, (DT_DBTIMESTAMP)[d])')
        v = one(spark, c, d="2020-01-30 00:00:00")
        assert v == datetime.datetime(2020, 2, 2, 0, 0)

    def test_dateadd_month_quoted_part(self, spark):
        c = compile_ssis_expression('DATEADD("month", 2, (DT_DBTIMESTAMP)[d])')
        assert one(spark, c, d="2020-01-31 00:00:00") == datetime.datetime(2020, 3, 31)

    def test_datediff_counts_boundaries(self, spark):
        # T-SQL DATEDIFF counts midnight crossings, not elapsed 24h units
        c = compile_ssis_expression(
            "DATEDIFF(day, (DT_DBTIMESTAMP)[a], (DT_DBTIMESTAMP)[b])"
        )
        assert one(spark, c, a="2020-01-01 23:00:00", b="2020-01-02 01:00:00") == 1

    def test_datediff_month(self, spark):
        c = compile_ssis_expression(
            "DATEDIFF(month, (DT_DBTIMESTAMP)[a], (DT_DBTIMESTAMP)[b])"
        )
        assert one(spark, c, a="2020-01-31 00:00:00", b="2020-02-01 00:00:00") == 1

    def test_datepart(self, spark):
        c = compile_ssis_expression("DATEPART(quarter, (DT_DBTIMESTAMP)[d])")
        assert one(spark, c, d="2020-08-15 00:00:00") == 3

    def test_getdate_pinnable(self, spark):
        c = compile_ssis_expression("GETDATE()", now="2026-01-01 00:00:00")
        assert one(spark, c, x=1) == datetime.datetime(2026, 1, 1)

    def test_bad_date_part_rejected(self):
        with pytest.raises(ValueError, match="date-part"):
            compile_ssis_expression("DATEADD(bogus, 1, [d])")


class TestMacroHelpers:
    def test_surrogate_key_is_md5(self, spark):
        import hashlib
        c = surrogate_key(F.col("first"), F.col("last"))
        expected = hashlib.md5(b"a-b").hexdigest()
        assert one(spark, c, first="a", last="b") == expected

    def test_nullif_trim(self, spark):
        c = nullif_trim(F.col("first"))
        assert one(spark, c, first="   ") is None
        assert one(spark, c, first=" x ") == "x"

    def test_safe_divide_guards_zero(self, spark):
        c = safe_divide(F.col("a"), F.col("b"))
        assert one(spark, c, a=10, b=0) == 0
        assert one(spark, c, a=10, b=4) == 2.5

    def test_stock_status_branches(self, spark):
        c = stock_status(F.col("q"), F.col("r"))
        assert one(spark, c, q=0, r=5) == "Out of Stock"
        assert one(spark, c, q=3, r=5) == "Low Stock"
        assert one(spark, c, q=9, r=5) == "In Stock"

    def test_email_domain(self, spark):
        c = email_domain(F.col("first"))
        assert one(spark, c, first="a@b.com") == "b.com"
        assert one(spark, c, first="no-at-sign") is None


class TestVariables:
    def test_variable_binding(self, spark):
        c = compile_ssis_expression(
            "[x] > @[User::Threshold] ? 1 : 0", variables={"Threshold": 5}
        )
        assert one(spark, c, x=9) == 1

    def test_unbound_variable_raises(self):
        with pytest.raises(ValueError, match="unbound variable"):
            compile_ssis_expression("@[User::Missing] + 1")


class TestCiComparisons:
    """r13 (r12 VERDICT #1): ci=True gives string comparisons CI-collation
    semantics — ==/!= and the ordering operators fold both operands with
    lower() when BOTH are string-typed; everything else is untouched and
    the default stays case-sensitive."""

    def test_equality_folds(self, spark):
        c = compile_ssis_expression(
            '[first] == "SUCCESS" ? 1 : 0', columns=STR_COLS, ci=True
        )
        assert one(spark, c, first="Success") == 1
        assert one(spark, c, first="success") == 1
        assert one(spark, c, first="Failed") == 0
        # default: exact match only
        c_cs = compile_ssis_expression(
            '[first] == "SUCCESS" ? 1 : 0', columns=STR_COLS
        )
        assert one(spark, c_cs, first="Success") == 0

    def test_inequality_and_ordering_fold(self, spark):
        c = compile_ssis_expression(
            '[first] != "failed" ? 1 : 0', columns=STR_COLS, ci=True
        )
        assert one(spark, c, first="FAILED") == 0
        # CI collation orders by the fold: "apple" < "BANANA"
        c = compile_ssis_expression(
            '[first] < [last] ? 1 : 0', columns=STR_COLS, ci=True
        )
        assert one(spark, c, first="apple", last="BANANA") == 1
        c_cs = compile_ssis_expression(
            '[first] < [last] ? 1 : 0', columns=STR_COLS
        )
        assert one(spark, c_cs, first="apple", last="BANANA") == 0

    def test_non_string_comparisons_untouched(self, spark):
        cols = {"k": T.IntegerType(), "first": T.StringType()}
        c = compile_ssis_expression("[k] == 5 ? 1 : 0", columns=cols, ci=True)
        assert one(spark, c, k=5) == 1
        # int column vs string literal: not a string-string compare, no fold
        c = compile_ssis_expression(
            '[k] == "5" ? 1 : 0', columns=cols, ci=True
        )
        assert one(spark, c, k=5) == 1

    def test_variable_comparison_folds(self, spark):
        c = compile_ssis_expression(
            '[first] == @[User::Want] ? 1 : 0',
            columns=STR_COLS, variables={"Want": "Gold"}, ci=True,
        )
        assert one(spark, c, first="GOLD") == 1


class TestTsqlScalarNames:
    def test_concat_null_as_empty(self, spark):
        c = compile_ssis_expression('CONCAT([first], "-", [last])', columns=STR_COLS)
        assert one(spark, c, first="a", last=None) == "a-"

    def test_coalesce(self, spark):
        c = compile_ssis_expression('COALESCE([first], [last], "z")', columns=STR_COLS)
        assert one(spark, c, first=None, last=None) == "z"

    def test_nullif(self, spark):
        c = compile_ssis_expression('NULLIF([first], "x")', columns=STR_COLS)
        assert one(spark, c, first="x") is None
        assert one(spark, c, first="y") == "y"

    def test_iif(self, spark):
        c = compile_ssis_expression('IIF([n] > 5, "big", "small")')
        assert one(spark, c, n=9) == "big"

    def test_charindex_arg_order(self, spark):
        # CHARINDEX(find, str) vs FINDSTRING(str, find)
        c = compile_ssis_expression('CHARINDEX("@", [first])', columns=STR_COLS)
        assert one(spark, c, first="a@b") == 2
