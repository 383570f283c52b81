"""CI wrapper for tools/fuzz_changelog.py: a reduced seed sweep of every
arm (the 1000-seed runs are the tool's offline gate, recorded in
SCALING.md/COVERAGE.md), plus a mutation check proving the fuzzer can
actually detect a broken operator — it must flag the pre-round-11
retracting-agg behavior (rowkind ignored, every row accumulated +1)."""

from __future__ import annotations

import random
import sys

import pytest

sys.path.insert(0, "/root/repo")

from tools.fuzz_changelog import ARMS  # noqa: E402


@pytest.mark.parametrize("arm", sorted(ARMS))
def test_fuzz_arm_green(spark, arm):
    check = ARMS[arm]
    for seed in range(50):
        rng = random.Random(f"{arm}-{seed}")
        err = check(rng)
        assert err is None, f"{arm} seed={seed}: {err}"


def test_fuzzer_catches_planted_bug(spark, monkeypatch):
    """Mutation test: replace streaming_retracting_agg with the old
    append-only implementation (no accumulate/retract branch). The agg
    arm must report a divergence within a handful of seeds — if it
    stays green against a broken operator, the fuzzer is vacuous."""
    import pandas as pd

    from flink_release_1_16_0_spark.streaming import stateful as S
    from flink_release_1_16_0_spark.streaming.changelog import (
        INSERT,
        ROWKIND,
        UPDATE_AFTER,
        UPDATE_BEFORE,
    )
    from tools.fuzz_changelog import check_agg

    def broken(stream, keys, value_col):
        def fn(key, pdfs, state):
            add_n, add_total = 0, 0.0
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                add_n += len(pdf)  # the planted bug: sign ignored
                add_total += float(pdf[value_col].sum())
            if add_n == 0:
                return
            rows = []
            if state.exists:
                n0, t0 = state.get
                rows.append((UPDATE_BEFORE, *key, n0, t0))
                n1, t1 = n0 + add_n, t0 + add_total
                rows.append((UPDATE_AFTER, *key, n1, t1))
            else:
                n1, t1 = add_n, add_total
                rows.append((INSERT, *key, n1, t1))
            state.update((n1, t1))
            yield pd.DataFrame(rows, columns=[ROWKIND, *keys, "n", "total"])

        return stream.applyInPandasWithState(fn, None, None, None, None)

    monkeypatch.setattr(S, "streaming_retracting_agg", broken)
    caught = sum(
        1
        for seed in range(20)
        if check_agg(random.Random(f"agg-{seed}")) is not None
    )
    assert caught >= 10, f"planted bug caught in only {caught}/20 seeds"


def test_wtvf_fuzzer_catches_planted_bug(spark, monkeypatch):
    """Mutation test for the wtvf differential arm: clip the slicing
    assigner's LAST hop candidate window — the TVF path then never
    fires each slice's final window while the legacy per-window path
    does. The arm must flag the divergence within a handful of seeds."""
    import random

    from flink_release_1_16_0_spark.streaming import window_tvf as WT
    from tools.fuzz_changelog import check_wtvf

    orig = WT._Assigner.candidate_ends

    def clipped(self, slice_end):
        ends = orig(self, slice_end)
        if self.kind == "hop" and len(ends) > 1:
            return ends[:-1]  # planted bug: last window dropped
        return ends

    monkeypatch.setattr(WT._Assigner, "candidate_ends", clipped)
    caught = sum(
        1
        for seed in range(20)
        if check_wtvf(random.Random(f"wtvf-mut-{seed}")) is not None
    )
    assert caught >= 8, f"planted bug caught in only {caught}/20 seeds"
