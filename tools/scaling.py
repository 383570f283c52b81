#!/usr/bin/env python3
"""sf0.1 -> sf1 scaling study: measure wall-time ratios.

The correctness gate runs at small SF; this harness provides the
*measured* scale evidence: every bench-headline query plus the heaviest
stateful gates runs at sf0.1 and at the 10x sf1 fixture
(tools/make_sf1.py), and the ratio says whether the plan is linear-ish
(<= ~12x for 10x data is healthy: linear work + log-factors in sort and
shuffle fan-in) or hiding a superlinear term that would bite at 100 TB.

Usage:
  python tools/scaling.py [--small /root/testdata/sf0.1] [--big testdata_sf1]
                          [--runs 3] [--queries name1 name2 ...]

Prints one JSON line per (query, sf) as it goes, then a summary JSON
with per-query {small, big, ratio, load} — min-of-N timing, same noise
protocol as bench.py (min is the noise-floor estimator on this shared
host; loadavg fields let a reader adjudicate contention).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_release_1_16_0_spark import get_spark  # noqa: E402
from flink_release_1_16_0_spark.queries import load_registry  # noqa: E402

# the heaviest stateful/streaming gates beyond the bench set — each one
# drives applyInPandasWithState / CEP / changelog machinery end to end
STATEFUL_GATES = [
    "dsapi_window_cogroup",
    "stream_cep_within",
    "dsapi_cep_pattern",
    "dsapi_cep_timeout",
    "changelog_normalize",
]


def time_query(spark, spec, sf_dir: str, runs: int) -> dict:
    spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    lb = os.getloadavg()
    samples = []
    for _ in range(runs):
        t0 = time.time()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(time.time() - t0)
    la = os.getloadavg()
    samples.sort()
    return {
        "min": round(samples[0], 3),
        "median": round(samples[len(samples) // 2], 3),
        "load1_before": round(lb[0], 2),
        "load1_after": round(la[0], 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--big",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "testdata_sf1",
        ),
    )
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--queries", nargs="*", default=None)
    args = ap.parse_args()

    registry = load_registry()
    names = args.queries or (
        [n for n, s in registry.items() if s.bench] + STATEFUL_GATES
    )
    unknown = [n for n in names if n not in registry]
    if unknown:
        sys.exit(f"unknown queries: {unknown}; valid names: {sorted(registry)}")
    spark = get_spark("scaling")
    spark.read.parquet(f"{args.small}/region.parquet").count()  # JVM warm

    out: dict[str, dict] = {}
    for name in names:
        spec = registry[name]
        row: dict = {}
        for label, sf_dir in (("small", args.small), ("big", args.big)):
            r = time_query(spark, spec, sf_dir, args.runs)
            row[label] = r
            print(
                json.dumps({"query": name, "sf": label, **r}),
                flush=True,
            )
        row["ratio"] = round(row["big"]["min"] / max(row["small"]["min"], 1e-9), 2)
        out[name] = row
    print(
        json.dumps(
            {
                "metric": "sf1_over_sf01_wall_ratio",
                "runs": args.runs,
                "queries": {
                    n: {
                        "small_s": r["small"]["min"],
                        "big_s": r["big"]["min"],
                        "ratio": r["ratio"],
                    }
                    for n, r in out.items()
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
