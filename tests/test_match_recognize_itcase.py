"""MATCH_RECOGNIZE conformance suite, ported from the reference's
stream-SQL ITCase corpus (flink-table-planner/src/test/scala/.../stream/
sql/MatchRecognizeITCase.scala). Each test replays that case's data and
query (adapted where noted) and asserts the reference's expected rows.

Adaptations, each deliberate and pinned:

- proctime ordering becomes an explicit bigint arrival-order column
  (Structured batch replay has no processing-time attribute; the cases
  only use proctime as a total order).
- testAggregates' WeightedAvg UDAF is rewritten as the cross-multiplied
  SUM form it computes (sum(price*weight)/sum(weight) with integer
  division: > 1 <=> sum >= 2*weight_sum), and the wAvg MEASURE is
  dropped — agg-UDFs inside MATCH_RECOGNIZE are a documented gap
  (test_udf_in_match_raises pins the error).
- AVG over an integer column is emitted as DOUBLE (the reference emits
  the integer average); the ported expectations only contain exact
  averages so the values still compare equal.
- Windowed-grouping cases compute the TUMBLE via integer division on a
  bigint timestamp (the reference's TUMBLE_ROWTIME plumbing is covered
  by the window-TVF registry queries).
- Quoted pattern-variable identifiers (`A"`) are renamed — quoted
  identifiers inside PATTERN/DEFINE are unsupported (documented).

Semantics these cases pinned on the implementation (round 11):
SQL ``?`` is never greedy (CommonExecMatch.applyQuantifier drops the
greedy property for optionals -> earliest completion emits, countD=0
in testAggregates); greedy loops are POSSESSIVE (Pattern.greedy() never
backtracks -> the V-shape at rows 1-3 of testLogicalOffsets is NOT a
match); logical-offset navigation FIRST/LAST(col, n) incl. the
universal (unqualified) variable; RUNNING aggregates in DEFINE.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from flink_release_1_16_0_spark.table_env import TableEnvironment  # noqa: E402


@pytest.fixture()
def tenv(spark):
    return TableEnvironment.create(spark)


def _view(spark, name, schema, rows):
    spark.createDataFrame(rows, schema).createOrReplaceTempView(name)


def _rows(df):
    return sorted(tuple(r) for r in df.to_data_frame().collect())


# -- testSimplePattern (MatchRecognizeITCase.scala:50) -----------------------


def test_simple_pattern(tenv, spark):
    _view(
        spark,
        "mr_simple",
        "id BIGINT, name STRING, proctime BIGINT",
        [(i, n, i) for i, n in enumerate(
            ["a", "z", "b", "c", "d", "a", "b", "c", "h"], start=1
        )],
    )
    got = tenv.sql_query(
        """
        SELECT T.aid, T.bid, T.cid
        FROM mr_simple
        MATCH_RECOGNIZE (
          ORDER BY proctime
          MEASURES A.id AS aid, B.id AS bid, C.id AS cid
          PATTERN (A B C)
          DEFINE A AS name = 'a', B AS name = 'b', C AS name = 'c'
        ) AS T
        """
    )
    assert _rows(got) == [(6, 7, 8)]


# -- testSimplePatternWithNulls (MatchRecognizeITCase.scala:96) --------------


def test_simple_pattern_with_nulls(tenv, spark):
    names = ["a", "b", "c", "d", None, "a", "b", "c", None]
    _view(
        spark,
        "mr_nulls",
        "id BIGINT, name STRING, nullField STRING, proctime BIGINT",
        [(i, n, None, i) for i, n in enumerate(names, start=1)],
    )
    got = tenv.sql_query(
        """
        SELECT T.aid, T.bNull, T.cid, T.aNull
        FROM mr_nulls
        MATCH_RECOGNIZE (
          ORDER BY proctime
          MEASURES
            A.id AS aid,
            A.nullField AS aNull,
            LAST(B.nullField) AS bNull,
            C.id AS cid
          PATTERN (A B C)
          DEFINE
            A AS name = 'a' AND nullField IS NULL,
            B AS name = 'b' AND LAST(A.nullField) IS NULL,
            C AS name = 'c'
        ) AS T
        """
    )
    assert _rows(got) == [(1, None, 3, None), (6, None, 8, None)]


# -- testCodeSplitsAreProperlyGenerated (MatchRecognizeITCase.scala:143) -----


def test_multi_key_partition_like_and_offsets(tenv, spark):
    data = [
        (1, "a", "key1", "second_key3"),
        (2, "b", "key1", "second_key3"),
        (3, "c", "key1", "second_key3"),
        (4, "d", "key", "second_key"),
        (5, "e", "key", "second_key"),
        (6, "a", "key2", "second_key4"),
        (7, "b", "key2", "second_key4"),
        (8, "c", "key2", "second_key4"),
        (9, "f", "key", "second_key"),
    ]
    _view(
        spark,
        "mr_codesplit",
        "id BIGINT, name STRING, key1 STRING, key2 STRING, proctime BIGINT",
        [(*r, r[0]) for r in data],
    )
    got = tenv.sql_query(
        """
        SELECT *
        FROM mr_codesplit
        MATCH_RECOGNIZE (
          PARTITION BY key1, key2
          ORDER BY proctime
          MEASURES
            A.id AS aid,
            A.key1 AS akey1,
            LAST(B.id) AS bid,
            C.id AS cid,
            C.key2 AS ckey2
          PATTERN (A B C)
          DEFINE
            A AS name = 'a' AND key1 LIKE '%key%' AND id > 0,
            B AS name = 'b' AND LAST(A.name, 2) IS NULL,
            C AS name = 'c' AND LAST(A.name) = 'a'
        ) AS T
        """
    )
    assert _rows(got) == [
        ("key1", "second_key3", 1, "key1", 2, 3, "second_key3"),
        ("key2", "second_key4", 6, "key2", 7, 8, "second_key4"),
    ]


# -- testEventsAreProperlyOrdered (MatchRecognizeITCase.scala:199) -----------


def test_events_are_properly_ordered(tenv, spark):
    # (rowtime, secondaryOrder, ternaryOrder, name, id): event-time
    # order with DESC secondary and ASC ternary tie-breaks; the first
    # three near-matches are each broken by one ordering level
    data = [
        (2, 12, 1, "a", 1),
        (1, 11, 2, "b", 2),
        (3, 10, 3, "c", 3),
        (4, 8, 4, "a", 4),
        (4, 9, 5, "b", 5),
        (5, 7, 6, "c", 6),
        (6, 6, 8, "a", 7),
        (6, 6, 7, "b", 8),
        (8, 4, 9, "c", 9),
        (9, 3, 10, "a", 10),
        (10, 2, 11, "b", 11),
        (11, 1, 12, "c", 12),
    ]
    _view(
        spark,
        "mr_ordered",
        "rowtime BIGINT, secondaryOrder BIGINT, ternaryOrder BIGINT, "
        "name STRING, id BIGINT",
        data,
    )
    got = tenv.sql_query(
        """
        SELECT T.aid, T.bid, T.cid
        FROM mr_ordered
        MATCH_RECOGNIZE (
          ORDER BY rowtime, secondaryOrder DESC, ternaryOrder ASC
          MEASURES A.id AS aid, B.id AS bid, C.id AS cid
          PATTERN (A B C)
          DEFINE A AS name = 'a', B AS name = 'b', C AS name = 'c'
        ) AS T
        """
    )
    assert _rows(got) == [(10, 11, 12)]


# -- testMatchRecognizeAppliedToWindowedGrouping (:257) ----------------------


def test_match_applied_to_windowed_grouping(tenv, spark):
    data = [
        ("ACME", 1000, 1, 1),
        ("ACME", 2000, 2, 2),
        ("ACME", 4000, 1, 4),
        ("ACME", 5000, 1, 3),
        ("ACME", 7000, 2, 3),
        ("ACME", 8000, 2, 3),
        ("ACME1", 1000, 20, 4),
        ("ACME1", 1000, 24, 4),
        ("ACME1", 1000, 25, 3),
        ("ACME1", 1000, 19, 8),
    ]
    _view(spark, "mr_ticker", "symbol STRING, ts BIGINT, price BIGINT, tax BIGINT", data)
    # TUMBLE(3s) as integer division on the bigint time
    spark.sql(
        """
        SELECT symbol, SUM(price) AS price,
               CAST(FLOOR(ts / 3000) * 3000 AS BIGINT) AS startTime,
               CAST(FLOOR(ts / 3000) * 3000 + 2999 AS BIGINT) AS rowTime
        FROM mr_ticker GROUP BY symbol, FLOOR(ts / 3000)
        """
    ).createOrReplaceTempView("mr_ticker_win")
    got = tenv.sql_query(
        """
        SELECT *
        FROM mr_ticker_win
        MATCH_RECOGNIZE (
          PARTITION BY symbol
          ORDER BY rowTime
          MEASURES B.price AS dPrice, B.startTime AS dTime
          ONE ROW PER MATCH
          PATTERN (A B)
          DEFINE B AS B.price < A.price
        )
        """
    )
    assert _rows(got) == [("ACME", 2, 3000)]


# -- testWindowedGroupingAppliedToMatchRecognize (:318) ----------------------


def test_windowed_grouping_applied_to_match(tenv, spark):
    data = [
        ("ACME", 1000, 1, 1),
        ("ACME", 2000, 2, 2),
        ("ACME", 4000, 1, 4),
        ("ACME", 5000, 1, 3),
    ]
    _view(spark, "mr_ticker2", "symbol STRING, ts BIGINT, price BIGINT, tax BIGINT", data)
    got = tenv.sql_query(
        """
        SELECT symbol, SUM(price) AS price,
               CAST(FLOOR(matchRowtime / 3000) * 3000 AS BIGINT) AS startTime
        FROM mr_ticker2
        MATCH_RECOGNIZE (
          PARTITION BY symbol
          ORDER BY ts
          MEASURES
            A.price AS price,
            A.tax AS tax,
            MATCH_ROWTIME() AS matchRowtime
          ONE ROW PER MATCH
          PATTERN (A)
          DEFINE A AS A.price > 0
        ) AS T
        GROUP BY symbol, FLOOR(matchRowtime / 3000)
        """
    )
    assert _rows(got) == [("ACME", 2, 3000), ("ACME", 3, 0)]


# -- testLogicalOffsets (MatchRecognizeITCase.scala:436) ---------------------


def test_logical_offsets(tenv, spark):
    data = [
        ("ACME", 1, 19, 1),
        ("ACME", 2, 17, 2),
        ("ACME", 3, 13, 3),
        ("ACME", 4, 20, 4),
        ("ACME", 5, 20, 5),
        ("ACME", 6, 26, 6),
        ("ACME", 7, 20, 7),
        ("ACME", 8, 25, 8),
    ]
    _view(
        spark,
        "mr_offsets",
        "symbol STRING, tstamp BIGINT, price BIGINT, tax BIGINT",
        data,
    )
    got = tenv.sql_query(
        """
        SELECT *
        FROM mr_offsets
        MATCH_RECOGNIZE (
          ORDER BY tstamp
          MEASURES
            FIRST(DOWN.tstamp) AS start_tstamp,
            LAST(DOWN.tstamp) AS bottom_tstamp,
            UP.tstamp AS end_tstamp,
            FIRST(DOWN.price + DOWN.tax + 1) AS bottom_total,
            UP.price + UP.tax AS end_total
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (DOWN{2,} UP)
          DEFINE
            DOWN AS price < LAST(DOWN.price, 1) OR LAST(DOWN.price, 1) IS NULL,
            UP AS price < FIRST(DOWN.price)
        ) AS T
        """
    )
    # the reference's greedy loop does NOT backtrack: the textbook
    # V-shape at rows 1-3 dies when row 4 fails UP against FIRST=19
    assert _rows(got) == [(6, 7, 8, 33, 33)]


# -- testPartitionByWithParallelSource (MatchRecognizeITCase.scala:486) ------


def test_partition_by_constants(tenv, spark):
    data = [
        ("ACME", 1, 19, 1),
        ("ACME", 2, 17, 2),
        ("ACME", 3, 13, 3),
        ("ACME", 4, 20, 4),
    ]
    _view(
        spark,
        "mr_parallel",
        "symbol STRING, rowtime BIGINT, price BIGINT, tax BIGINT",
        data,
    )
    got = tenv.sql_query(
        """
        SELECT *
        FROM mr_parallel
        MATCH_RECOGNIZE (
          PARTITION BY symbol
          ORDER BY rowtime
          MEASURES DOWN.tax AS bottom_tax, UP.tax AS end_tax
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (DOWN UP)
          DEFINE DOWN AS DOWN.price = 13, UP AS UP.price = 20
        ) AS T
        """
    )
    assert _rows(got) == [("ACME", 3, 4)]


# -- testLogicalOffsetsWithStarVariable (MatchRecognizeITCase.scala:532) -----


def test_logical_offsets_with_star_variable(tenv, spark):
    prices = [20, 19, 18, 17, 16, 15, 14, 20]
    _view(
        spark,
        "mr_star",
        "id BIGINT, symbol STRING, tstamp BIGINT, price BIGINT",
        [(i, "ACME", i, p) for i, p in enumerate(prices, start=1)],
    )
    got = tenv.sql_query(
        """
        SELECT *
        FROM mr_star
        MATCH_RECOGNIZE (
          ORDER BY tstamp
          MEASURES
            FIRST(id, 0) AS id0, FIRST(id, 1) AS id1, FIRST(id, 2) AS id2,
            FIRST(id, 3) AS id3, FIRST(id, 4) AS id4, FIRST(id, 5) AS id5,
            FIRST(id, 6) AS id6, FIRST(id, 7) AS id7,
            LAST(id, 0) AS id8, LAST(id, 1) AS id9, LAST(id, 2) AS id10,
            LAST(id, 3) AS id11, LAST(id, 4) AS id12, LAST(id, 5) AS id13,
            LAST(id, 6) AS id14, LAST(id, 7) AS id15
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (DOWN{2,} UP)
          DEFINE
            DOWN AS price < LAST(price, 1) OR LAST(price, 1) IS NULL,
            UP AS price = FIRST(price) AND price > FIRST(price, 3)
                  AND price = LAST(price, 7)
        ) AS T
        """
    )
    assert _rows(got) == [(1, 2, 3, 4, 5, 6, 7, 8, 8, 7, 6, 5, 4, 3, 2, 1)]


# -- testLogicalOffsetOutsideOfRangeInMeasures (:593) ------------------------


def test_logical_offset_outside_range_is_null(tenv, spark):
    data = [
        ("ACME", 1, 19, 1),
        ("ACME", 2, 17, 2),
        ("ACME", 3, 13, 3),
        ("ACME", 4, 20, 4),
    ]
    _view(
        spark,
        "mr_oor",
        "symbol STRING, tstamp BIGINT, price BIGINT, tax BIGINT",
        data,
    )
    got = tenv.sql_query(
        """
        SELECT *
        FROM mr_oor
        MATCH_RECOGNIZE (
          ORDER BY tstamp
          MEASURES
            FIRST(DOWN.price) AS firstp,
            LAST(DOWN.price) AS lastp,
            FIRST(DOWN.price, 5) AS nullPrice
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (DOWN{2,} UP)
          DEFINE
            DOWN AS price < LAST(DOWN.price, 1) OR LAST(DOWN.price, 1) IS NULL,
            UP AS price > LAST(DOWN.price)
        ) AS T
        """
    )
    assert _rows(got) == [(19, 13, None)]


# -- testAggregates (MatchRecognizeITCase.scala:644) -------------------------


def test_aggregates(tenv, spark):
    data = [
        (1, "a", 1, 0.8, 1),
        (2, "z", 2, 0.8, 3),
        (3, "b", 1, 0.8, 2),
        (4, "c", 1, 0.8, 5),
        (5, "d", 4, 0.1, 5),
        (6, "a", 2, 1.5, 2),
        (7, "b", 2, 0.8, 3),
        (8, "c", 1, 0.8, 2),
        (9, "h", 4, 0.8, 3),
        (10, "h", 4, 0.8, 3),
        (11, "h", 2, 0.8, 3),
        (12, "h", 2, 0.8, 3),
    ]
    _view(
        spark,
        "mr_aggs",
        "id BIGINT, name STRING, price BIGINT, rate DOUBLE, weight BIGINT, "
        "proctime BIGINT",
        [(*r, r[0]) for r in data],
    )
    # WeightedAvg(price, weight) > 1 with integer division is
    # sum(price*weight) >= 2*sum(weight); the UDAF itself is a
    # documented gap (test_udf_in_match_raises)
    got = tenv.sql_query(
        """
        SELECT *
        FROM mr_aggs
        MATCH_RECOGNIZE (
          ORDER BY proctime
          MEASURES
            FIRST(id) AS startId,
            SUM(A.price) AS sumA,
            COUNT(D.price) AS countD,
            SUM(D.price) AS sumD,
            AVG(B.price) AS avgB,
            SUM(B.price * B.rate) AS sumExprB,
            LAST(id) AS endId
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A+ B+ C D? E)
          DEFINE
            A AS SUM(A.price) < 6,
            B AS SUM(B.price * B.rate) < SUM(A.price) AND
                 SUM(B.price * B.rate) > 0.2 AND
                 SUM(B.price) >= 1 AND
                 AVG(B.price) >= 1 AND
                 SUM(price * weight) >= 2 * SUM(weight)
        ) AS T
        """
    )
    assert _rows(got) == [
        (1, 5, 0, None, 3.0, 3.4, 8),
        (9, 4, 0, None, 4.0, 3.2, 12),
    ]


# -- testAggregatesWithNullInputs (MatchRecognizeITCase.scala:706) -----------


def test_aggregates_with_null_inputs(tenv, spark):
    data = [
        (1, "a", 10),
        (2, "z", 10),
        (3, "b", None),
        (4, "c", None),
        (5, "d", 3),
        (6, "c", 3),
        (7, "c", 3),
        (8, "c", 3),
        (9, "c", 2),
    ]
    _view(
        spark,
        "mr_aggnull",
        "id BIGINT, name STRING, price BIGINT, proctime BIGINT",
        [(*r, r[0]) for r in data],
    )
    got = tenv.sql_query(
        """
        SELECT *
        FROM mr_aggnull
        MATCH_RECOGNIZE (
          ORDER BY proctime
          MEASURES
            SUM(A.price) AS sumA,
            COUNT(A.id) AS countAId,
            COUNT(A.price) AS countAPrice,
            COUNT(*) AS countAll,
            COUNT(price) AS countAllPrice,
            LAST(id) AS endId
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A+ C)
          DEFINE
            A AS SUM(A.price) < 30,
            C AS C.name = 'c'
        ) AS T
        """
    )
    assert _rows(got) == [(29, 7, 5, 8, 6, 8)]


# -- testUserDefinedFunctions (MatchRecognizeITCase.scala:802) ---------------


def test_udf_in_match_raises(tenv, spark):
    """UDFs inside MEASURES/DEFINE are a documented gap: the translator
    rejects the item rather than mis-evaluating it (the reference's
    testUserDefinedFunctions / testAggregates wAvg measure)."""
    _view(
        spark,
        "mr_udf",
        "id BIGINT, name STRING, proctime BIGINT",
        [(1, "a", 1), (2, "a", 2), (3, "f", 3)],
    )
    with pytest.raises(Exception):
        tenv.sql_query(
            """
            SELECT * FROM mr_udf MATCH_RECOGNIZE (
              ORDER BY proctime
              MEASURES prefixFn(A.name) AS prefixedName, LAST(id) AS lastId
              AFTER MATCH SKIP PAST LAST ROW
              PATTERN (A+ C)
              DEFINE A AS prefixFn(A.name) = 'PREF:a'
            ) AS T
            """
        ).to_data_frame().collect()


# -- surface edge pins (beyond the ported cases) -----------------------------


def test_measures_expression_mixing_variables_raises(tenv, spark):
    _view(spark, "mr_mix", "id BIGINT, name STRING, proctime BIGINT",
          [(1, "a", 1), (2, "b", 2)])
    with pytest.raises(ValueError, match="mixes pattern variables"):
        tenv.sql_query(
            """
            SELECT * FROM mr_mix MATCH_RECOGNIZE (
              ORDER BY proctime
              MEASURES SUM(A.id + B.id) AS x
              PATTERN (A B)
              DEFINE A AS name = 'a', B AS name = 'b'
            ) AS T
            """
        )


def test_measures_offset_on_sum_raises(tenv, spark):
    _view(spark, "mr_offsum", "id BIGINT, name STRING, proctime BIGINT",
          [(1, "a", 1), (2, "b", 2)])
    with pytest.raises(ValueError, match="offset"):
        tenv.sql_query(
            """
            SELECT * FROM mr_offsum MATCH_RECOGNIZE (
              ORDER BY proctime
              MEASURES SUM(A.id, 2) AS x
              PATTERN (A B)
              DEFINE A AS name = 'a', B AS name = 'b'
            ) AS T
            """
        )


def test_descending_primary_order_raises(tenv, spark):
    _view(spark, "mr_desc", "id BIGINT, name STRING, proctime BIGINT",
          [(1, "a", 1)])
    with pytest.raises(ValueError, match="ascending"):
        tenv.sql_query(
            """
            SELECT * FROM mr_desc MATCH_RECOGNIZE (
              ORDER BY proctime DESC
              MEASURES A.id AS aid
              PATTERN (A)
              DEFINE A AS name = 'a'
            ) AS T
            """
        )
