"""Skew-handling join: explicit key salting.

The reference's answer to skewed aggregation is the split/partial-agg
rewrite (SplitAggregateRule, FlinkStreamRuleSets.scala:351 — covered by
``agg_distinct_split``); for skewed JOINS Spark's first line is AQE's
skew-join splitting (on in session.py). This operator is the explicit
fallback for the case AQE cannot fix: a hot key whose rows exceed one
task even after splitting, joined against a NON-broadcastable build
side. Classic salting:

- the probe (skewed) side gets a uniform salt in [0, factor);
- the build side is replicated ``factor`` times, once per salt value;
- the join key becomes (key, salt) — the hot key's rows now spread
  over ``factor`` tasks, at the cost of a factor-x build-side shuffle.

Results are exactly the plain join's (salting only re-partitions), so
the oracle is the unsalted SQL join. The salt must be DETERMINISTIC
per row (not rand()) or retries/speculative tasks would see different
partitioning — here it hashes a unique row id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_by: str | Column,
    factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with the left (skewed) side salted.

    ``salt_by`` is a unique-ish left column hashed into the salt (row
    determinism). The right side explodes into ``factor`` replicas via
    a literal array — a narrow map-side operation, no extra shuffle
    before the join exchange.
    """
    if factor < 1:
        raise ValueError("factor must be >= 1")
    salt = F.pmod(F.hash(F.col(salt_by) if isinstance(salt_by, str) else salt_by), F.lit(factor))
    l_s = left.withColumn("__salt", salt)
    r_s = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(factor)]))
    )
    out = l_s.join(r_s, [on, "__salt"], how)
    return out.drop("__salt")
