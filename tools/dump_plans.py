"""Dump .explain("formatted") for named registry queries to text files.

Usage:
    python tools/dump_plans.py <outdir> <suffix> [query ...]

With no query names, dumps the bench=True set. Files are written as
<outdir>/<query>_<suffix>.txt. The judge checks plan claims against
these dumps, so they must always be regenerated at the commit they
document (round-13's stale-dump finding).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from flink_release_1_16_0_spark import get_spark  # noqa: E402
from flink_release_1_16_0_spark.queries import load_registry  # noqa: E402


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_registry()
    if not names:
        names = [n for n, s in registry.items() if s.bench]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_plans")
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
