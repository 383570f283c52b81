"""Expression DSL for the fluent Table API.

Reference: PyFlink's ``pyflink.table.expressions`` (``col``, ``lit``,
``call``) and the Java ``Expressions.$`` DSL
(flink-table-api-java/.../api/Expressions.java) — typed expression
objects composed with operators instead of SQL text.

Lowering: each Expr renders to the SQL fragment the Table API methods
already accept (``Table.select/where/group_by`` take fragment strings),
so ``t.where(col("a") > 5)`` and ``t.where("a > 5")`` hit the same
translation path. Operator precedence is handled by parenthesizing
every composite node — the rendered SQL is unambiguous by
construction.
"""

from __future__ import annotations


def _render(v) -> str:
    import datetime
    import decimal

    if isinstance(v, Expr):
        return v.sql
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if v is None:
        return "NULL"
    if isinstance(v, datetime.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, datetime.date):
        return f"DATE '{v.isoformat()}'"
    if isinstance(v, datetime.timedelta):
        return f"INTERVAL '{v.total_seconds()}' SECOND"
    if isinstance(v, (int, float, decimal.Decimal)):
        return str(v)
    raise TypeError(f"cannot render {type(v).__name__} as a SQL literal: {v!r}")


class Expr:
    """A SQL expression fragment with operator composition."""

    def __init__(self, sql: str) -> None:
        self.sql = sql

    def __str__(self) -> str:
        return self.sql

    # -- comparison ----------------------------------------------------------
    def _bin(self, op: str, other) -> "Expr":
        return Expr(f"({self.sql} {op} {_render(other)})")

    def __eq__(self, other) -> "Expr":  # type: ignore[override]
        return self._bin("=", other)

    def __ne__(self, other) -> "Expr":  # type: ignore[override]
        return self._bin("<>", other)

    def __gt__(self, other) -> "Expr":
        return self._bin(">", other)

    def __ge__(self, other) -> "Expr":
        return self._bin(">=", other)

    def __lt__(self, other) -> "Expr":
        return self._bin("<", other)

    def __le__(self, other) -> "Expr":
        return self._bin("<=", other)

    __hash__ = None  # composite expressions are not hashable

    # -- arithmetic ----------------------------------------------------------
    def __add__(self, other) -> "Expr":
        return self._bin("+", other)

    def __radd__(self, other) -> "Expr":
        return Expr(f"({_render(other)} + {self.sql})")

    def __sub__(self, other) -> "Expr":
        return self._bin("-", other)

    def __rsub__(self, other) -> "Expr":
        return Expr(f"({_render(other)} - {self.sql})")

    def __mul__(self, other) -> "Expr":
        return self._bin("*", other)

    def __rmul__(self, other) -> "Expr":
        return Expr(f"({_render(other)} * {self.sql})")

    def __truediv__(self, other) -> "Expr":
        return self._bin("/", other)

    def __rtruediv__(self, other) -> "Expr":
        return Expr(f"({_render(other)} / {self.sql})")

    def __mod__(self, other) -> "Expr":
        return Expr(f"MOD({self.sql}, {_render(other)})")

    def __rmod__(self, other) -> "Expr":
        return Expr(f"MOD({_render(other)}, {self.sql})")

    def __neg__(self) -> "Expr":
        return Expr(f"(- {self.sql})")

    # -- boolean -------------------------------------------------------------
    def __and__(self, other) -> "Expr":
        return self._bin("AND", other)

    def __or__(self, other) -> "Expr":
        return self._bin("OR", other)

    def __invert__(self) -> "Expr":
        return Expr(f"(NOT {self.sql})")

    # -- named methods (the PyFlink Expression surface) -----------------------
    def alias(self, name: str) -> "Expr":
        return Expr(f"{self.sql} AS {name}")

    def cast(self, type_ddl: str) -> "Expr":
        return Expr(f"CAST({self.sql} AS {type_ddl})")

    def is_null(self) -> "Expr":
        return Expr(f"({self.sql} IS NULL)")

    def is_not_null(self) -> "Expr":
        return Expr(f"({self.sql} IS NOT NULL)")

    def in_(self, *values) -> "Expr":
        return Expr(f"({self.sql} IN ({', '.join(_render(v) for v in values)}))")

    def between(self, lo, hi) -> "Expr":
        return Expr(f"({self.sql} BETWEEN {_render(lo)} AND {_render(hi)})")

    def like(self, pattern: str) -> "Expr":
        return Expr(f"({self.sql} LIKE {_render(pattern)})")

    def asc(self) -> "Expr":
        return Expr(f"{self.sql} ASC")

    def desc(self) -> "Expr":
        return Expr(f"{self.sql} DESC")

    # aggregates
    def sum(self) -> "Expr":
        return Expr(f"SUM({self.sql})")

    def avg(self) -> "Expr":
        return Expr(f"AVG({self.sql})")

    def min(self) -> "Expr":
        return Expr(f"MIN({self.sql})")

    def max(self) -> "Expr":
        return Expr(f"MAX({self.sql})")

    def count(self) -> "Expr":
        return Expr(f"COUNT({self.sql})")


def col(name: str) -> Expr:
    """PyFlink ``col`` / Java ``$("name")``."""
    return Expr(name)


def lit(value) -> Expr:
    return Expr(_render(value))


def call(function: str, *args) -> Expr:
    """Invoke any registered/built-in function by name."""
    return Expr(f"{function}({', '.join(_render(a) for a in args)})")
