"""flink-cep Pattern API facade tests (datastream/cep.py).

Mirrors the reference's CEPITCase style: a deterministic keyed event
log, fluent patterns, exact match assertions — strict/relaxed
contiguity, quantifiers, iterative conditions, WITHIN, and both
after-match strategies.
"""

from __future__ import annotations

import datetime
import sys

import pytest
from pyspark import cloudpickle

cloudpickle.register_pickle_by_value(sys.modules[__name__])

from flink_release_1_16_0_spark.datastream import (
    CEP,
    Pattern,
    StreamExecutionEnvironment,
    WatermarkStrategy,
)


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 10, minute)


@pytest.fixture(scope="module")
def env(spark):
    return StreamExecutionEnvironment.get_execution_environment(spark)


@pytest.fixture(scope="module")
def quotes(env):
    rows = [
        # key k1: 1, 9, 2, 12, 3, 8
        {"k": "k1", "ts": _ts(0), "v": 1},
        {"k": "k1", "ts": _ts(1), "v": 9},
        {"k": "k1", "ts": _ts(2), "v": 2},
        {"k": "k1", "ts": _ts(3), "v": 12},
        {"k": "k1", "ts": _ts(4), "v": 3},
        {"k": "k1", "ts": _ts(5), "v": 8},
        # key k2: 4, 5
        {"k": "k2", "ts": _ts(0), "v": 4},
        {"k": "k2", "ts": _ts(1), "v": 5},
    ]
    s = env.from_collection(rows, "k STRING, ts TIMESTAMP, v INT")
    return s.assign_timestamps_and_watermarks(
        WatermarkStrategy.for_monotonous_timestamps().with_timestamp_assigner("ts")
    )


def test_strict_next_no_skip(quotes):
    # low (<5) immediately followed by high (>7): overlapping starts allowed
    pat = (
        Pattern.begin("low")
        .where(lambda r: r["v"] < 5)
        .next("high")
        .where(lambda r: r["v"] > 7)
    )
    out = CEP.pattern(quotes.key_by("k"), pat).select(
        lambda m: {"k": m["low"][0]["k"], "lo": m["low"][0]["v"], "hi": m["high"][0]["v"]},
        "k STRING, lo INT, hi INT",
    )
    got = sorted((r.lo, r.hi) for r in out.to_data_frame().collect())
    assert got == [(1, 9), (2, 12), (3, 8)]


def test_followed_by_relaxed(quotes):
    # 1 ... 12 with events between (relaxed contiguity)
    pat = (
        Pattern.begin("a")
        .where(lambda r: r["v"] == 1)
        .followed_by("b")
        .where(lambda r: r["v"] > 10)
    )
    out = CEP.pattern(quotes.key_by("k"), pat).select(
        lambda m: {"bv": m["b"][0]["v"]}, "bv INT"
    )
    assert [r.bv for r in out.to_data_frame().collect()] == [12]


def test_one_or_more_iterative_condition(quotes):
    # a run of ascending values: each next row must exceed the last bound one
    def ascending(row, ctx):
        run = ctx.get("up", [])
        return not run or row["v"] > run[-1]["v"]

    # default = RELAXED internal contiguity (Pattern.java:437): rows
    # failing the condition sit between repetitions, so k1's run from 1
    # is [1, 9, 12] (2, 3, 8 stepped over)
    pat = Pattern.begin("up").where(ascending).one_or_more()
    out = CEP.pattern(quotes.key_by("k"), pat).select(
        lambda m: {"k": m["up"][0]["k"], "len": len(m["up"]), "first": m["up"][0]["v"]},
        "k STRING, len INT, first INT",
        after_match="skip_past_last_row",
    )
    rows = sorted((r.k, r.first, r.len) for r in out.to_data_frame().collect())
    # k1: [1,9,12] then [3,8]; k2: [4,5]
    assert rows == [("k1", 1, 3), ("k1", 3, 2), ("k2", 4, 2)]

    # consecutive(): strict runs break at the first non-ascending row
    pat_c = Pattern.begin("up").where(ascending).one_or_more().consecutive()
    out_c = CEP.pattern(quotes.key_by("k"), pat_c).select(
        lambda m: {"k": m["up"][0]["k"], "len": len(m["up"]), "first": m["up"][0]["v"]},
        "k STRING, len INT, first INT",
        after_match="skip_past_last_row",
    )
    rows_c = sorted((r.k, r.first, r.len) for r in out_c.to_data_frame().collect())
    # k1: [1,9] then [2,12] then [3,8]; k2: [4,5]
    assert rows_c == [("k1", 1, 2), ("k1", 2, 2), ("k1", 3, 2), ("k2", 4, 2)]


@pytest.fixture(scope="module")
def docs_sequence(env):
    # the reference docs' looping-contiguity corpus: C D A1 A2 A3 D A4 B
    syms = ["c", "d", "a", "a", "a", "d", "a", "b"]
    rows = [
        {"k": "x", "ts": _ts(i), "s": s, "v": i} for i, s in enumerate(syms)
    ]
    s = env.from_collection(rows, "k STRING, ts TIMESTAMP, s STRING, v INT")
    return s.assign_timestamps_and_watermarks(
        WatermarkStrategy.for_monotonous_timestamps().with_timestamp_assigner("ts")
    )


def _contiguity_pattern(consecutive: bool = False):
    p = (
        Pattern.begin("start")
        .where(lambda r: r["s"] == "c")
        .followed_by("middle")
        .where(lambda r: r["s"] == "a")
        .one_or_more()
    )
    if consecutive:
        p = p.consecutive()
    return p.followed_by("end").where(lambda r: r["s"] == "b")


def _middle_lens(stream, pat):
    out = CEP.pattern(stream.key_by("k"), pat).select(
        lambda m: {"n": len(m["middle"])}, "n INT"
    )
    return sorted(r.n for r in out.to_data_frame().collect())


def test_looping_partial_matches_relaxed_default(docs_sequence):
    # Flink docs example (Pattern API "contiguity within looping
    # patterns"): relaxed default emits every prefix of the relaxed run
    # [A1 A2 A3 A4] -> {C A1 B} .. {C A1..A4 B}
    assert _middle_lens(docs_sequence, _contiguity_pattern()) == [1, 2, 3, 4]


def test_looping_partial_matches_consecutive(docs_sequence):
    # consecutive(): the run breaks at D, prefixes of [A1 A2 A3]
    assert _middle_lens(docs_sequence, _contiguity_pattern(consecutive=True)) == [1, 2, 3]


def test_looping_greedy_longest_only(docs_sequence):
    # greedy(): only the longest run per anchor emits
    pat = (
        Pattern.begin("start")
        .where(lambda r: r["s"] == "c")
        .followed_by("middle")
        .where(lambda r: r["s"] == "a")
        .one_or_more()
        .greedy()
        .followed_by("end")
        .where(lambda r: r["s"] == "b")
    )
    assert _middle_lens(docs_sequence, pat) == [4]


def test_times_range(docs_sequence):
    # times(2, 3): each count in [2, 3] emits under noSkip (relaxed run
    # [A1 A2 A3 A4] -> counts 2 and 3 both anchored at A1)
    def build(greedy: bool):
        p = (
            Pattern.begin("start")
            .where(lambda r: r["s"] == "c")
            .followed_by("middle")
            .where(lambda r: r["s"] == "a")
            .times(2, 3)
        )
        if greedy:
            p = p.greedy()
        return p.followed_by("end").where(lambda r: r["s"] == "b")

    assert _middle_lens(docs_sequence, build(False)) == [2, 3]
    assert _middle_lens(docs_sequence, build(True)) == [3]


def test_allow_combinations(docs_sequence):
    # Flink docs: allowCombinations emits every in-order combination
    # keeping the run's first element — 8 subsets of {A2,A3,A4} behind A1
    def build():
        return (
            Pattern.begin("start")
            .where(lambda r: r["s"] == "c")
            .followed_by("middle")
            .where(lambda r: r["s"] == "a")
            .one_or_more()
            .allow_combinations()
            .followed_by("end")
            .where(lambda r: r["s"] == "b")
        )

    out = CEP.pattern(docs_sequence.key_by("k"), build()).select(
        lambda m: {"ids": ",".join(str(r["v"]) for r in m["middle"])}, "ids STRING"
    )
    got = sorted(r.ids for r in out.to_data_frame().collect())
    assert got == sorted(
        ["2", "2,3", "2,4", "2,6", "2,3,4", "2,3,6", "2,4,6", "2,3,4,6"]
    )


def test_one_or_more_optional_is_zero_or_more(docs_sequence):
    # oneOrMore().optional() relaxes the lower bound (Pattern.optional):
    # the no-middle match {C B} joins the four relaxed prefixes
    pat = (
        Pattern.begin("start")
        .where(lambda r: r["s"] == "c")
        .followed_by("middle")
        .where(lambda r: r["s"] == "a")
        .one_or_more()
        .optional()
        .followed_by("end")
        .where(lambda r: r["s"] == "b")
    )
    out = CEP.pattern(docs_sequence.key_by("k"), pat).select(
        lambda m: {"n": len(m["middle"])}, "n INT"
    )
    assert sorted(r.n for r in out.to_data_frame().collect()) == [0, 1, 2, 3, 4]


def test_consecutive_on_non_loop_rejected():
    with pytest.raises(ValueError, match="looping"):
        Pattern.begin("a").consecutive()


def test_times_and_within(quotes):
    # any three consecutive events within 2 minutes — impossible
    # (spacing is 1 minute, 3 rows span 2 minutes; deadline excludes the
    # boundary), but two consecutive within 2 minutes always works
    pat3 = Pattern.begin("t").times(3).within("2 minutes")
    out3 = CEP.pattern(quotes.key_by("k"), pat3).select(
        lambda m: {"n": len(m["t"])}, "n INT"
    )
    assert out3.to_data_frame().count() == 0
    pat2 = Pattern.begin("t").times(2).within("2 minutes")
    out2 = CEP.pattern(quotes.key_by("k"), pat2).select(
        lambda m: {"n": len(m["t"])}, "n INT", after_match="skip_past_last_row"
    )
    # k1: 3 non-overlapping pairs, k2: 1
    assert out2.to_data_frame().count() == 4


def test_or_condition_and_optional(quotes):
    def build():
        return (
            Pattern.begin("x")
            .where(lambda r: r["v"] == 9)
            .or_(lambda r: r["v"] == 12)
            .next("y")
            .where(lambda r: r["v"] < 5)
            .optional()
        )

    out = CEP.pattern(quotes.key_by("k"), build()).select(
        lambda m: {"xv": m["x"][0]["v"], "yv": m["y"][0]["v"] if m["y"] else None},
        "xv INT, yv INT",
    )
    got = sorted(
        ((r.xv, r.yv) for r in out.to_data_frame().collect()),
        # None sorts poorly; normalize
        key=lambda t: (t[0], -1 if t[1] is None else t[1]),
    )
    # under noSkip an optional BRANCHES: both the taken and the skipped
    # continuation emit from the same anchor (the reference's {C B}
    # alongside {C A1 B})
    assert got == [(9, None), (9, 2), (12, None), (12, 3)]
    # greedy(): only the longest (taken) branch
    out_g = CEP.pattern(quotes.key_by("k"), build().greedy()).select(
        lambda m: {"xv": m["x"][0]["v"], "yv": m["y"][0]["v"] if m["y"] else None},
        "xv INT, yv INT",
    )
    got_g = sorted((r.xv, r.yv) for r in out_g.to_data_frame().collect())
    assert got_g == [(9, 2), (12, 3)]


def test_flat_select_multi_rows(quotes):
    """PatternStream.flatSelect: fn returns an iterable — one output
    row per bound event of the match."""
    pat = (
        Pattern.begin("low")
        .where(lambda r: r["v"] < 5)
        .next("high")
        .where(lambda r: r["v"] > 7)
    )

    def explode(m):
        for var in ("low", "high"):
            for row in m[var]:
                yield {"k": row["k"], "var": var, "v": row["v"]}

    out = CEP.pattern(quotes.key_by("k"), pat).flat_select(
        explode, "k STRING, var STRING, v INT"
    )
    got = sorted((r.var, r.v) for r in out.to_data_frame().collect())
    assert got == [("high", 8), ("high", 9), ("high", 12), ("low", 1), ("low", 2), ("low", 3)]


def test_timeout_partial_matches_side_output(env):
    """PatternStream.select's timeout variant / TimedOutPartialMatchHandler:
    an anchor whose WITHIN horizon expires before the pattern completes
    routes its partially-bound rows to the OutputTag."""
    from flink_release_1_16_0_spark.datastream import OutputTag

    rows = [
        # lo at 10:00 -> hi at 10:01: completes inside 2 minutes
        {"k": "k1", "ts": _ts(0), "v": 1},
        {"k": "k1", "ts": _ts(1), "v": 9},
        # lo at 10:10: the next hi is at 10:20, far past the horizon
        {"k": "k1", "ts": _ts(10), "v": 2},
        {"k": "k1", "ts": _ts(20), "v": 8},
    ]
    s = env.from_collection(rows, "k STRING, ts TIMESTAMP, v INT").assign_timestamps_and_watermarks(
        WatermarkStrategy.for_monotonous_timestamps().with_timestamp_assigner("ts")
    )
    pat = (
        Pattern.begin("lo")
        .where(lambda r: r["v"] < 5)
        .next("hi")
        .where(lambda r: r["v"] > 7)
        .within("2 minutes")
    )
    late = OutputTag("cep-timeout", "k STRING, lo INT, t_out BIGINT")
    out = CEP.pattern(s.key_by("k"), pat).select(
        lambda m: {"k": m["lo"][0]["k"], "lo": m["lo"][0]["v"], "hi": m["hi"][0]["v"]},
        "k STRING, lo INT, hi INT",
        timeout_tag=late,
        timeout_fn=lambda m, t: {"k": m["lo"][0]["k"], "lo": m["lo"][0]["v"], "t_out": t},
    )
    main = sorted((r.lo, r.hi) for r in out.to_data_frame().collect())
    assert main == [(1, 9)]
    timed = out.get_side_output(late).to_data_frame().collect()
    assert [(r.k, r.lo) for r in timed] == [("k1", 2)]
    # timeout timestamp = anchor + within
    assert timed[0].t_out == _ts(12).replace(tzinfo=datetime.timezone.utc).timestamp() * 1000


def test_timeout_partial_binds_intermediate_variables(env):
    """A 3-step pattern timing out after binding a AND b must deliver
    BOTH in the partial (review finding: the relaxed-contiguity skip
    edges used to swallow the whole window in the greedy partial walk,
    leaving every variable after the first followed_by unbound)."""
    from flink_release_1_16_0_spark.datastream import OutputTag

    rows = [
        {"k": "k1", "ts": _ts(0), "s": "a", "v": 1},
        {"k": "k1", "ts": _ts(1), "s": "x", "v": 2},  # skipped by relaxed
        {"k": "k1", "ts": _ts(2), "s": "b", "v": 3},
        # no 'c' ever arrives inside the 10-minute horizon
        {"k": "k1", "ts": _ts(30), "s": "x", "v": 4},
    ]
    s = env.from_collection(rows, "k STRING, ts TIMESTAMP, s STRING, v INT").assign_timestamps_and_watermarks(
        WatermarkStrategy.for_monotonous_timestamps().with_timestamp_assigner("ts")
    )
    pat = (
        Pattern.begin("a")
        .where(lambda r: r["s"] == "a")
        .followed_by("b")
        .where(lambda r: r["s"] == "b")
        .followed_by("c")
        .where(lambda r: r["s"] == "c")
        .within("10 minutes")
    )
    tag = OutputTag("t3", "av INT, bv INT, n_c INT")
    out = CEP.pattern(s.key_by("k"), pat).select(
        lambda m: {"av": None, "bv": None, "n_c": 1},
        "av INT, bv INT, n_c INT",
        timeout_tag=tag,
        timeout_fn=lambda m, t: {
            "av": m["a"][0]["v"],
            "bv": m["b"][0]["v"] if m["b"] else None,
            "n_c": len(m["c"]),
        },
    )
    assert out.to_data_frame().count() == 0  # no full match
    timed = out.get_side_output(tag).to_data_frame().collect()
    assert [(r.av, r.bv, r.n_c) for r in timed] == [(1, 3, 0)]


def test_timeout_side_output_requires_within(quotes):
    from flink_release_1_16_0_spark.datastream import OutputTag

    pat = Pattern.begin("lo").where(lambda r: r["v"] < 5).next("hi").where(lambda r: r["v"] > 7)
    tag = OutputTag("t", "k STRING")
    with pytest.raises(ValueError, match="within"):
        CEP.pattern(quotes.key_by("k"), pat).select(
            lambda m: {"k": "x"}, "k STRING",
            timeout_tag=tag, timeout_fn=lambda m, t: {"k": "x"},
        )


def test_non_keyed_single_sequence(env):
    rows = [{"ts": _ts(i), "v": v} for i, v in enumerate([1, 2, 1, 2])]
    s = env.from_collection(rows, "ts TIMESTAMP, v INT").assign_timestamps_and_watermarks(
        WatermarkStrategy.for_monotonous_timestamps().with_timestamp_assigner("ts")
    )
    pat = Pattern.begin("a").where(lambda r: r["v"] == 1).next("b").where(lambda r: r["v"] == 2)
    out = CEP.pattern(s, pat).select(
        lambda m: {"a_min": m["a"][0]["ts"].minute}, "a_min INT"
    )
    assert sorted(r.a_min for r in out.to_data_frame().collect()) == [0, 2]


def test_streaming_pattern_within(spark, env, tmp_path):
    """Unbounded Pattern matching: only anchors whose WITHIN horizon the
    final watermark settles emit — the same cutoff the Table layer's
    streaming CEP applies."""
    import shutil

    from flink_release_1_16_0_spark.streaming.core import run_to_table

    d = str(tmp_path / "cep_stream")
    rows = [
        # k1: (1, 9) matches and finalizes; (2, 8) anchors at 10:40 but
        # its 10-minute horizon passes the final watermark only if
        # 10:50 <= max ts (10:50) — boundary: NOT finalizable
        ("k1", _ts(0), 0, 1),
        ("k1", _ts(1), 1, 9),
        ("k1", _ts(40), 2, 2),
        ("k1", _ts(41), 3, 8),
        ("k1", _ts(50), 4, 5),
    ]
    df = spark.createDataFrame(rows, "k STRING, ts TIMESTAMP, eid INT, v INT")
    df.coalesce(1).write.mode("overwrite").parquet(d)
    sdf = spark.readStream.schema(df.schema).parquet(d)
    s = env.from_data_frame(sdf).assign_timestamps_and_watermarks(
        WatermarkStrategy.for_bounded_out_of_orderness("0 seconds").with_timestamp_assigner("ts")
    )
    pat = (
        Pattern.begin("lo")
        .where(lambda r: r["v"] < 5)
        .next("hi")
        .where(lambda r: r["v"] > 7)
        .within("10 minutes")
    )
    out = CEP.pattern(s.key_by("k"), pat).select(
        lambda m: {"k": m["lo"][0]["k"], "lo": m["lo"][0]["v"], "hi": m["hi"][0]["v"]},
        "k STRING, lo INT, hi INT",
        tiebreaker="eid",
    )
    got = run_to_table(out.to_data_frame(), output_mode="append")
    pairs = sorted((r.lo, r.hi) for r in got.collect())
    # (1,9) anchored 10:00 finalizes (wm 10:50 >= 10:10); (2,8) anchored
    # 10:40 needs wm > 10:49:59.999 -> 10:50 settles it too
    assert pairs == [(1, 9), (2, 8)]
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_timeout_partial_side_output(spark, env, tmp_path):
    """Unbounded Pattern matching with the timeout side output: an
    anchor decided unmatched (watermark past anchor + within) routes its
    partial to the OutputTag exactly once."""
    import shutil

    from flink_release_1_16_0_spark.datastream import OutputTag
    from flink_release_1_16_0_spark.streaming.core import run_to_table

    d = str(tmp_path / "cep_stream_timeout")
    rows = [
        ("k1", _ts(0), 0, 1),   # lo -> completes with 9
        ("k1", _ts(1), 1, 9),
        ("k1", _ts(10), 2, 2),  # lo whose horizon (10:20) expires unmatched
        ("k1", _ts(30), 3, 8),  # hi far outside; also advances the watermark
        ("k1", _ts(50), 4, 4),  # lo at the final watermark: never decided
    ]
    df = spark.createDataFrame(rows, "k STRING, ts TIMESTAMP, eid INT, v INT")
    df.coalesce(1).write.mode("overwrite").parquet(d)
    sdf = spark.readStream.schema(df.schema).parquet(d)
    s = env.from_data_frame(sdf).assign_timestamps_and_watermarks(
        WatermarkStrategy.for_bounded_out_of_orderness("0 seconds").with_timestamp_assigner("ts")
    )
    pat = (
        Pattern.begin("lo")
        .where(lambda r: r["v"] < 5)
        .next("hi")
        .where(lambda r: r["v"] > 7)
        .within("10 minutes")
    )
    late = OutputTag("cep-timeout-s", "k STRING, lo INT")
    out = CEP.pattern(s.key_by("k"), pat).select(
        lambda m: {"k": m["lo"][0]["k"], "lo": m["lo"][0]["v"], "hi": m["hi"][0]["v"]},
        "k STRING, lo INT, hi INT",
        tiebreaker="eid",
        timeout_tag=late,
        timeout_fn=lambda m, t: {"k": m["lo"][0]["k"], "lo": m["lo"][0]["v"]},
    )
    main = run_to_table(out.to_data_frame(), output_mode="append")
    assert sorted((r.lo, r.hi) for r in main.collect()) == [(1, 9)]
    timed = run_to_table(
        out.get_side_output(late).to_data_frame(), output_mode="append"
    )
    # v=2's horizon expired unmatched; the v=4 anchor at 10:50 is never
    # DECIDED (watermark stops at 10:50 < its 11:00 horizon), so it
    # neither matches nor times out — exactly the CepOperator cutoff
    assert sorted(r.lo for r in timed.collect()) == [2]
    shutil.rmtree(d, ignore_errors=True)


def test_all_optional_pattern_emits_no_empty_matches(quotes):
    """An all-optional pattern whose condition never fires must emit
    NOTHING — not one empty-bindings row per input row (the reference
    never emits empty matches). Review finding: the bounded
    non-enumerating path lacked the streaming path's m[0] > start guard."""
    pat = Pattern.begin("a").where(lambda r: r["v"] > 100).optional()
    out = CEP.pattern(quotes.key_by("k"), pat).select(
        lambda m: {"av": m["a"][0]["v"] if m["a"] else None},
        "av INT",
    )
    assert out.to_data_frame().count() == 0


def test_reluctant_optional_still_emits_taken_branch(quotes):
    """The empty-match guard must suppress only EMPTY matches, not the
    whole anchor: a reluctant optional yields the skip branch first, and
    the matcher must advance to the taken (non-empty) branch instead of
    dropping the row (review finding on the m[0] > start guard)."""
    pat = Pattern.begin("a").where(lambda r: r["v"] == 9).optional().reluctant()
    out = CEP.pattern(quotes.key_by("k"), pat).select(
        lambda m: {"av": m["a"][0]["v"] if m["a"] else None},
        "av INT",
    )
    got = [r.av for r in out.to_data_frame().collect()]
    assert got == [9]
