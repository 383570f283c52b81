"""MATCH_RECOGNIZE-lite: sequence pattern matching over keyed streams.

Reference: StreamExecMatch.java:59 driving the CEP NFA
(flink-libraries/flink-cep/.../operator/CepOperator.java:82,
nfa/NFA.java — SURVEY.md section 2.9). Two tiers here:

- **fixed-length patterns** (A then B then C on consecutive rows):
  pure window functions — LEAD the symbol k-1 times and filter. This is
  how the batch planner would lower a quantifier-free pattern; stays
  fully in Catalyst/WSCG and scales as one window scan per key.
- **regex patterns with quantifiers** (A+ B? C): per-key symbol string
  + Python regex over match spans inside applyInPandas — the NFA
  equivalent for bounded keys. Partitioned by key: state is one
  document per key, the 100 TB behavior matches CepOperator's keyed
  NFA state.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def classify(symbol_exprs: dict[str, Column], default: str = "-") -> Column:
    """Map each row to a 1-char pattern symbol (first matching wins)."""
    expr = F.lit(default)
    for sym, cond in reversed(list(symbol_exprs.items())):
        if len(sym) != 1:
            raise ValueError("symbols must be single characters")
        expr = F.when(cond, F.lit(sym)).otherwise(expr)
    return expr


def match_fixed_pattern(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    symbol: Column,
    pattern: str,
) -> DataFrame:
    """Rows starting a consecutive-row match of `pattern` (no
    quantifiers). Adds `__sym{i}` symbol lookahead columns and filters;
    returns the first row of each match."""
    if not re.fullmatch(r"[A-Za-z]+", pattern):
        raise ValueError("fixed pattern must be plain symbols")
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    out = df.withColumn("__sym", symbol)
    # project the lookahead symbols first: window functions are not
    # allowed directly inside a filter
    lead_cols = [
        F.lead("__sym", i).over(w).alias(f"__sym{i}")
        for i in range(1, len(pattern))
    ]
    out = out.select("*", *lead_cols)
    cond = F.col("__sym") == pattern[0]
    for i, ch in enumerate(pattern[1:], start=1):
        cond = cond & (F.col(f"__sym{i}") == ch)
    drop = ["__sym"] + [f"__sym{i}" for i in range(1, len(pattern))]
    return out.filter(cond).drop(*drop)


def match_regex_pattern(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    symbol: Column,
    pattern: str,
    id_col: str,
) -> DataFrame:
    """Regex pattern matching per key (the NFA tier).

    Emits one row per match: (keys..., match_no, start_id, end_id,
    n_rows). Rows are ordered by (ts, id) within the key; matches are
    non-overlapping leftmost-greedy (AFTER MATCH SKIP PAST LAST ROW —
    the reference's default).
    """
    tagged = df.select(*keys, F.col(ts_col).alias("__ts"), F.col(id_col).alias("__id"), symbol.alias("__sym"))
    out_fields = ", ".join(f"{k} {dict(tagged.dtypes)[k]}" for k in keys)
    schema = (
        f"{out_fields}, match_no int, start_id long, end_id long, n_rows int"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__ts", "__id"], kind="mergesort")
        sym = "".join(pdf["__sym"].tolist())
        ids = pdf["__id"].tolist()
        rows = []
        keyvals = [pdf.iloc[0][k] for k in keys]
        for m_no, m in enumerate(re.finditer(pattern, sym)):
            if m.end() == m.start():
                continue
            rows.append(
                (*keyvals, m_no, ids[m.start()], ids[m.end() - 1], m.end() - m.start())
            )
        return pd.DataFrame(
            rows, columns=[*keys, "match_no", "start_id", "end_id", "n_rows"]
        )

    return tagged.groupBy(*keys).applyInPandas(fn, schema=schema)
