"""flink-cep GROUP pattern conformance, ported from the reference's
GroupITCase (flink-libraries/flink-cep/src/test/java/.../nfa/
GroupITCase.java) — Pattern.begin(Pattern) / followedBy(Pattern)
sub-patterns with quantifiers (Pattern.java:573, GroupPattern.java).

A group repetition matches ALL-OR-NOTHING; counts enumerate under
noSkip (non-greedy group loops emit every viable count); between
repetitions contiguity is relaxed; a followedByAny connection forks
the first repetition's entry position. Nested groups recurse.
"""

from __future__ import annotations

import sys

import pytest
from pyspark import cloudpickle

cloudpickle.register_pickle_by_value(sys.modules[__name__])

from flink_release_1_16_0_spark.datastream import (  # noqa: E402
    CEP,
    Pattern,
    StreamExecutionEnvironment,
    WatermarkStrategy,
)
from tests.test_cep_negative_itcase import _events, name_is  # noqa: E402


@pytest.fixture(scope="module")
def env(spark):
    return StreamExecutionEnvironment.get_execution_environment(spark)


def _m(keyed, pat, vars_):
    out = CEP.pattern(keyed, pat).select(
        lambda m: {
            "m": "|".join(
                f"{r['name']}{int(r['price'])}"
                for v in vars_
                for r in m.get(v, [])
            )
        },
        "m STRING",
    )
    return sorted(r.m for r in out.to_data_frame().collect())


def _ab_group():
    return (
        Pattern.begin("middle1").where(name_is("a"))
        .followed_by("middle2").where(name_is("b"))
    )


def test_group_followed_by_times(env):
    """GroupITCase.testGroupFollowedByTimes (GroupITCase.java:46):
    c (a b){2} d — exactly two all-or-nothing repetitions."""
    keyed = _events(
        env,
        [(1, "c", 1), (2, "a", 2), (3, "b", 3), (4, "a", 4), (5, "b", 5),
         (6, "d", 6)],
    )
    pat = (
        Pattern.begin("start").where(name_is("c"))
        .followed_by(_ab_group()).times(2)
        .followed_by("end").where(name_is("d"))
    )
    got = _m(keyed, pat, ["start", "middle1", "middle2", "end"])
    # measures concatenate per VARIABLE (all middle1 rows then all
    # middle2 rows), so the 2-rep match reads a2,a4,b3,b5
    assert got == ["c1|a2|a4|b3|b5|d6"]


def test_group_followed_by_optional(env):
    """GroupITCase.testGroupFollowedByOptional (GroupITCase.java:124):
    c (a b)? d — BOTH the skipped and the taken branch emit under
    noSkip; the taken branch anchors at the FIRST a."""
    keyed = _events(
        env, [(1, "c", 1), (2, "a", 2), (3, "a", 3), (4, "b", 4), (5, "d", 5)]
    )
    pat = (
        Pattern.begin("start").where(name_is("c"))
        .followed_by(_ab_group()).optional()
        .followed_by("end").where(name_is("d"))
    )
    got = _m(keyed, pat, ["start", "middle1", "middle2", "end"])
    assert got == sorted(["c1|d5", "c1|a2|b4|d5"])


def test_followed_by_group_times_optional(env):
    """GroupITCase.testFollowedByGroupTimesOptional (GroupITCase.java
    :201): c (a b){2}? d with only one a — the zero-count branch
    matches, the 2-rep branch cannot."""
    keyed = _events(env, [(1, "c", 1), (2, "a", 2), (3, "d", 3)])
    pat = (
        Pattern.begin("start").where(name_is("c"))
        .followed_by(_ab_group()).times(2).optional()
        .followed_by("end").where(name_is("d"))
    )
    got = _m(keyed, pat, ["start", "middle1", "middle2", "end"])
    assert got == ["c1|d3"]


GROUP_RUN = [
    (1, "c", 1), (2, "a", 2), (3, "b", 3), (4, "a", 4), (5, "b", 5),
    (6, "d", 6),
]


def test_group_followed_by_one_or_more(env):
    """GroupITCase.testGroupFollowedByOneOrMore (GroupITCase.java:273):
    c (a b)+ d — every count >= 1 emits."""
    keyed = _events(env, GROUP_RUN)
    pat = (
        Pattern.begin("start").where(name_is("c"))
        .followed_by(_ab_group()).one_or_more()
        .followed_by("end").where(name_is("d"))
    )
    got = _m(keyed, pat, ["start", "middle1", "middle2", "end"])
    assert got == sorted(["c1|a2|b3|d6", "c1|a2|a4|b3|b5|d6"])


def test_group_followed_by_zero_or_more(env):
    """GroupITCase.testGroupFollowedByZeroOrMore (GroupITCase.java
    :353): c (a b)* d — the zero-count branch joins the family."""
    keyed = _events(env, GROUP_RUN)
    pat = (
        Pattern.begin("start").where(name_is("c"))
        .followed_by(_ab_group()).one_or_more().optional()
        .followed_by("end").where(name_is("d"))
    )
    got = _m(keyed, pat, ["start", "middle1", "middle2", "end"])
    assert got == sorted(["c1|d6", "c1|a2|b3|d6", "c1|a2|a4|b3|b5|d6"])


def test_group_nest(env):
    """GroupITCase.testGroupNest (GroupITCase.java:963):
    d ( a (b c)* )? e — groups nest; every inner count within every
    outer branch emits."""
    keyed = _events(
        env,
        [(1, "d", 1), (2, "a", 2), (3, "b", 3), (4, "c", 4), (5, "b", 5),
         (6, "c", 6), (7, "e", 7)],
    )
    inner = (
        Pattern.begin("middle2").where(name_is("b"))
        .followed_by("middle3").where(name_is("c"))
    )
    outer = (
        Pattern.begin("middle1").where(name_is("a"))
        .followed_by(inner).one_or_more().optional()
    )
    pat = (
        Pattern.begin("start").where(name_is("d"))
        .followed_by(outer).optional()
        .followed_by("end").where(name_is("e"))
    )
    got = _m(keyed, pat, ["start", "middle1", "middle2", "middle3", "end"])
    assert got == sorted(
        ["d1|e7", "d1|a2|e7", "d1|a2|b3|c4|e7", "d1|a2|b3|b5|c4|c6|e7"]
    )


def test_group_nest_times(env):
    """GroupITCase.testGroupNestTimes (GroupITCase.java:1068):
    d followedByAny( a (b c){3} ){0,2} e — the ANY connection forks the
    first repetition's anchor (a1 and a2 blocks both emit alone), plus
    the zero-count and both-blocks branches."""
    keyed = _events(
        env,
        [(1, "d", 1), (2, "a", 2), (3, "b", 3), (4, "c", 4), (5, "b", 5),
         (6, "c", 6), (7, "b", 7), (8, "c", 8), (9, "a", 9), (10, "b", 10),
         (11, "c", 11), (12, "b", 12), (13, "c", 13), (14, "b", 14),
         (15, "c", 15), (16, "e", 16)],
    )
    inner = (
        Pattern.begin("middle2").where(name_is("b"))
        .followed_by("middle3").where(name_is("c"))
    )
    outer = (
        Pattern.begin("middle1").where(name_is("a"))
        .followed_by(inner).times(3)
    )
    pat = (
        Pattern.begin("start").where(name_is("d"))
        .followed_by_any(outer).times(0, 2)
        .followed_by("end").where(name_is("e"))
    )
    got = _m(keyed, pat, ["start", "middle1", "middle2", "middle3", "end"])
    assert got == sorted(
        [
            "d1|e16",
            "d1|a2|b3|b5|b7|c4|c6|c8|e16",
            "d1|a9|b10|b12|b14|c11|c13|c15|e16",
            "d1|a2|a9|b3|b5|b7|b10|b12|b14|c4|c6|c8|c11|c13|c15|e16",
        ]
    )


def test_group_begin(env):
    """GroupITCase.testGroupBegin (GroupITCase.java:1314):
    (a b){1,2} d — a group as the pattern's FIRST step; every anchor
    and every count emits."""
    keyed = _events(
        env, [(1, "a", 1), (2, "b", 2), (3, "a", 3), (4, "b", 4), (5, "d", 5)]
    )
    pat = (
        Pattern.begin(_ab_group()).times(1, 2)
        .followed_by("end").where(name_is("d"))
    )
    got = _m(keyed, pat, ["middle1", "middle2", "end"])
    assert got == sorted(["a1|b2|d5", "a3|b4|d5", "a1|a3|b2|b4|d5"])


def test_group_not_next(env):
    """GroupITCase.testGroupNotNext (GroupITCase.java:873):
    c followedByAny(a b) notNext(d) e — the a1 block dies on the d
    immediately after it; the a2 block survives."""
    keyed = _events(
        env,
        [(1, "c", 1), (2, "a", 2), (3, "b", 3), (4, "d", 4), (5, "a", 5),
         (6, "b", 6), (7, "e", 7)],
    )
    pat = (
        Pattern.begin("start").where(name_is("c"))
        .followed_by_any(_ab_group())
        .not_next("notPattern").where(name_is("d"))
        .followed_by("end").where(name_is("e"))
    )
    got = _m(keyed, pat, ["start", "middle1", "middle2", "end"])
    assert got == ["c1|a5|b6|e7"]


def test_group_not_followed_by(env):
    """GroupITCase.testGroupNotFollowedBy (GroupITCase.java:783): the
    relaxed absence variant of the same — a d anywhere between the
    block and e kills the branch."""
    keyed = _events(
        env,
        [(1, "c", 1), (2, "a", 2), (3, "b", 3), (4, "d", 4), (5, "a", 5),
         (6, "b", 6), (7, "e", 7)],
    )
    pat = (
        Pattern.begin("start").where(name_is("c"))
        .followed_by_any(_ab_group())
        .not_followed_by("notPattern").where(name_is("d"))
        .followed_by("end").where(name_is("e"))
    )
    got = _m(keyed, pat, ["start", "middle1", "middle2", "end"])
    assert got == ["c1|a5|b6|e7"]
