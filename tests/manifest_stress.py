"""Worker functions for the manifest-log concurrency stress test.

Kept in their own importable module so ``multiprocessing`` spawn/fork
workers never drag the pytest/pyspark test module (or a JVM handle)
into the child — the commit protocol is pure-filesystem and the stress
must exercise REAL process boundaries (the claims are O_EXCL at the fs
level, threads would not prove anything).
"""

from __future__ import annotations

import os
import time


def committer(base: str, idx: int, stop_time: float, ack_path: str) -> None:
    """Loop: create a uniquely-named data file, publish a manifest
    declaring it live, and only then record the commit as acknowledged.
    The acknowledgment file is the ground truth the final assertion
    checks completeness against — exactly the protocol's contract: an
    acknowledged commit must never become invisible."""
    from flink_release_1_16_0_spark.sources import commit_protocol as cp

    i = 0
    with open(ack_path, "w") as ack:
        while time.time() < stop_time:
            fname = f"c{idx}-{i}.parquet"
            with open(os.path.join(base, fname), "wb"):
                pass
            cp._publish_manifest(base, {"files": {"": [fname]}})
            ack.write(fname + "\n")
            ack.flush()
            i += 1


def reader(base: str, stop_time: float, err_path: str) -> None:
    """Loop: resolve the live set and assert CONSISTENT-PREFIX reads —
    append-only commits mean every later read must be a superset of
    every earlier one (a file that vanishes from the live set between
    two reads is a served hole in history). Violations are written to
    ``err_path`` for the parent to assert on."""
    from flink_release_1_16_0_spark.sources import commit_protocol as cp

    seen: set[str] = set()
    reads = 0
    while time.time() < stop_time:
        live = cp._live_map(base).get("", set())
        missing = seen - live
        if missing:
            with open(err_path, "w") as fh:
                fh.write(
                    f"after {reads} reads, {len(missing)} previously-live "
                    f"files vanished, e.g. {sorted(missing)[:5]}\n"
                )
            return
        seen = live
        reads += 1
    with open(err_path, "w") as fh:
        fh.write(f"ok {reads} reads, final live {len(seen)}\n")


def vacuumer(base: str, stop_time: float) -> None:
    """Loop: compact (fold the log into a head checkpoint) and vacuum
    (delete folded manifests + over-retention checkpoints) as fast as
    the loop allows — the maintenance daemon the adjudication matrix
    must survive."""
    from flink_release_1_16_0_spark.sources import commit_protocol as cp

    while time.time() < stop_time:
        cp.manifest_compact(base)
        cp.manifest_vacuum(base, keep_checkpoints=2)
        time.sleep(0.02)


def rewriter(base: str, stop_time: float) -> None:
    """Loop: merge the current live set into one placeholder file via a
    delete+add 'replace' manifest — the compaction rewrite's shape. The
    merged file's CONTENT records the member names (transitively), so a
    verifier can prove no acknowledged commit's contribution was lost
    even though the file set shrinks."""
    import json
    import uuid

    from flink_release_1_16_0_spark.sources import commit_protocol as cp

    while time.time() < stop_time:
        live = sorted(cp._live_map(base).get("", set()))
        if len(live) >= 4:
            members = []
            for n in live:
                p = os.path.join(base, n)
                try:
                    with open(p, "rb") as fh:
                        data = fh.read()
                except OSError:
                    members = None  # a member vanished mid-read: skip round
                    break
                if data:
                    members.extend(json.loads(data))
                else:
                    members.append(n)  # original committer file = itself
            if members is None:
                time.sleep(0.02)
                continue
            merged = f"merged-{uuid.uuid4().hex}.json"
            with open(os.path.join(base, merged), "w") as fh:
                json.dump(sorted(members), fh)
            cp._publish_manifest(
                base,
                {"replace": {"": live}, "partitions": [""], "files": {"": [merged]}},
            )
        time.sleep(0.03)


def data_vacuumer(base: str, stop_time: float) -> None:
    """Loop: reclaim unreferenced data files past a short retention —
    replaced generations from the rewriter. Retention (2s) must exceed
    the longest reader resolve-to-open gap (milliseconds here), the
    documented operational rule."""
    from flink_release_1_16_0_spark.sources import commit_protocol as cp

    while time.time() < stop_time:
        cp.manifest_vacuum_data(base, older_than_s=2.0, enforce_retention_floor=False)
        time.sleep(0.1)


def maintenance_reader(base: str, stop_time: float, err_path: str) -> None:
    """Loop: resolve the live set and immediately open every live file —
    the data vacuum must never delete a file a fresh resolution still
    references (within retention)."""
    from flink_release_1_16_0_spark.sources import commit_protocol as cp

    reads = 0
    while time.time() < stop_time:
        live = cp._live_map(base).get("", set())
        for n in live:
            try:
                with open(os.path.join(base, n), "rb"):
                    pass
            except FileNotFoundError:
                with open(err_path, "w") as fh:
                    fh.write(f"live file {n} missing after {reads} reads\n")
                return
        reads += 1
    with open(err_path, "w") as fh:
        fh.write(f"ok {reads} reads\n")
