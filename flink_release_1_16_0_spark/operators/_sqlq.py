"""Identifier quoting for SQL-text plan construction.

The SQL-text builders (asof, dedup shingles, similarity kernels) exist
purely to cut driver-side py4j plan-construction cost; they must accept
the same arbitrary column names the Column-API forms they replaced did.
Spark quoted identifiers escape embedded backticks by doubling them.
"""

from __future__ import annotations


def q_ident(name: str) -> str:
    """Backtick-quote ``name`` for embedding in Spark SQL text."""
    escaped = name.replace("`", "``")
    return f"`{escaped}`"
