"""Example UDFs for the CREATE FUNCTION DDL path (and its tests).

The reference's CREATE FUNCTION names a Java class
(SqlCreateFunction, Parser.tdd:52); this engine's equivalent names a
dotted Python path to either a plain callable or a pyspark UDF object.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def shout(s: str) -> str:
    return (s or "").upper() + "!"


double_it_udf = F.udf(lambda x: None if x is None else 2 * x, LongType())
