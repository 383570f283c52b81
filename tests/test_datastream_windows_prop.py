"""Property tests: the facade's arithmetic window assignment must agree
with Spark's native ``F.window`` on tumbling and hopping windows for
arbitrary timestamps, sizes, slides, and offsets — the same invariant
the reference pins between its SliceAssigners and the legacy window
assigners (SliceAssignerTest.java pattern, SURVEY.md section 5).

Pure-Python property sweep (hypothesis) over the shared math, plus one
Spark cross-check pinning the arithmetic columns against F.window's
struct on a sampled grid.
"""

from __future__ import annotations

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _tumble_start(ts_ms: int, size: int, off: int) -> int:
    # the facade's formula (datastream.stream._assign_time_windows)
    return (ts_ms - off) // size * size + off


def _hop_starts(ts_ms: int, size: int, slide: int, off: int) -> list[int]:
    m_last = (ts_ms - off) // slide
    m_first = (ts_ms - off - size) // slide + 1
    return [m * slide + off for m in range(m_first, m_last + 1)]


@given(
    ts=st.integers(min_value=0, max_value=4_000_000_000_000),
    size=st.integers(min_value=1, max_value=86_400_000),
    off=st.integers(min_value=0, max_value=86_400_000),
)
@settings(max_examples=300, deadline=None)
def test_tumble_contains_element(ts, size, off):
    start = _tumble_start(ts, size, off)
    assert start <= ts < start + size
    assert (start - off) % size == 0


@given(
    ts=st.integers(min_value=0, max_value=4_000_000_000_000),
    size=st.integers(min_value=1, max_value=3_600_000),
    slide=st.integers(min_value=1, max_value=3_600_000),
    off=st.integers(min_value=0, max_value=3_600_000),
)
@settings(max_examples=300, deadline=None)
def test_hop_windows_exactly_cover(ts, size, slide, off):
    starts = _hop_starts(ts, size, slide, off)
    # every returned window contains the element, aligned to the slide
    for s in starts:
        assert s <= ts < s + size
        assert (s - off) % slide == 0
    # and they are ALL such windows (count = how many slide-aligned
    # starts fall in (ts-size, ts])
    expected = len(
        [
            m
            for m in range((ts - size - off) // slide, (ts - off) // slide + 2)
            if m * slide + off <= ts < m * slide + off + size
        ]
    )
    assert len(starts) == expected
    # count of slide-aligned starts in a half-open length-`size` span
    assert size // slide <= len(starts) <= -(-size // slide)


def test_assignment_matches_native_window(spark):
    """Cross-engine pin: arithmetic __win_start/__win_end == Spark's
    native F.window struct for a sampled timestamp grid (tumble + hop)."""
    from flink_release_1_16_0_spark.datastream.stream import (
        SlidingEventTimeWindows,
        TumblingEventTimeWindows,
        _assign_time_windows,
    )

    base = datetime.datetime(2024, 3, 1)
    rows = [(base + datetime.timedelta(seconds=17 * i, milliseconds=7 * i),) for i in range(500)]
    df = spark.createDataFrame(rows, "ts TIMESTAMP")

    for assigner, native in (
        (TumblingEventTimeWindows.of("10 minutes"), F.window("ts", "10 minutes")),
        (
            TumblingEventTimeWindows.of("7 minutes", "90 seconds"),
            F.window("ts", "7 minutes", "7 minutes", "90 seconds"),
        ),
        (SlidingEventTimeWindows.of("10 minutes", "3 minutes"), F.window("ts", "10 minutes", "3 minutes")),
    ):
        ours = _assign_time_windows(df, "ts", assigner).select(
            F.concat_ws(
                "/", F.col("ts").cast("long"), "__win_start", "__win_end"
            ).alias("k")
        )
        # native window() compares via an aggregate (the analyzer's
        # supported position for sliding windows)
        theirs = (
            df.groupBy(native.alias("w"), "ts")
            .count()
            .select(
                F.concat_ws(
                    "/",
                    F.col("ts").cast("long"),
                    F.unix_millis(F.col("w.start")),
                    F.unix_millis(F.col("w.end")),
                ).alias("k")
            )
        )
        got = sorted(r.k for r in ours.collect())
        want = sorted(r.k for r in theirs.collect())
        assert got == want, f"assigner {assigner!r} diverges from native window()"
