"""Hive SQL dialect subset (SET 'table.sql-dialect'='hive').

Mirrors the reference's flink-sql-parser-hive surface: a Hive
warehouse's scripts (CREATE [EXTERNAL] TABLE ... STORED AS, INSERT
OVERWRITE TABLE ... PARTITION, backtick identifiers, per-column
COMMENTs) run unchanged after the dialect switch.
"""

from __future__ import annotations

import pytest

from flink_release_1_16_0_spark.table_env import TableEnvironment


@pytest.fixture()
def tenv(spark):
    return TableEnvironment.create(spark)


def test_hive_script_end_to_end(tenv, spark, tmp_path):
    """A multi-statement Hive-dialect script: partitioned parquet table,
    static-partition INSERT OVERWRITE, text table with a custom field
    delimiter, backticks and column comments throughout."""
    tenv.execute_sql("SET 'table.sql-dialect'='hive'")
    script = [
        f"""
        CREATE TABLE IF NOT EXISTS `hv_sales` (
          `id` INT COMMENT 'row id',
          `amount` DOUBLE
        )
        COMMENT 'sales fact'
        PARTITIONED BY (`region` STRING COMMENT 'partition col')
        STORED AS PARQUET
        LOCATION '{tmp_path}/hv_sales'
        """,
        "INSERT OVERWRITE TABLE hv_sales PARTITION (region='eu') "
        "SELECT 1, 10.0 UNION ALL SELECT 2, 20.0",
        "INSERT OVERWRITE TABLE hv_sales PARTITION (region='us') SELECT 3, 30.0",
        f"""
        CREATE EXTERNAL TABLE `hv_text` (`name` STRING, `qty` INT)
        ROW FORMAT DELIMITED FIELDS TERMINATED BY '|'
        STORED AS TEXTFILE
        LOCATION '{tmp_path}/hv_text'
        """,
        "INSERT INTO TABLE hv_text SELECT 'widget', 4",
    ]
    for stmt in script:
        tenv.execute_sql(stmt)
    got = sorted(
        (r.region, r.id, r.amount)
        for r in tenv.sql_query("SELECT * FROM hv_sales").to_data_frame().collect()
    )
    assert got == [("eu", 1, 10.0), ("eu", 2, 20.0), ("us", 3, 30.0)]
    # the text table wrote with the declared delimiter
    files = list((tmp_path / "hv_text").rglob("*.csv")) or list(
        (tmp_path / "hv_text").rglob("part-*")
    )
    assert any("|" in f.read_text() for f in files if f.is_file())
    row = tenv.sql_query("SELECT * FROM hv_text").to_data_frame().collect()[0]
    assert (row.name, row.qty) == ("widget", 4)
    # overwrite of one static partition leaves the other intact
    tenv.execute_sql(
        "INSERT OVERWRITE TABLE hv_sales PARTITION (region='eu') SELECT 9, 90.0"
    )
    got2 = sorted(
        (r.region, r.id) for r in tenv.sql_query("SELECT * FROM hv_sales").to_data_frame().collect()
    )
    assert got2 == [("eu", 9), ("us", 3)]


def test_hive_dialect_default_location_and_switch_back(tenv, spark):
    import shutil

    tenv.execute_sql("SET 'table.sql-dialect'='hive'")
    tenv.execute_sql("CREATE TABLE hv_managed (x INT) STORED AS PARQUET")
    t = tenv._tables["hv_managed"]
    assert "hive_dialect/hv_managed" in t.options["path"]
    tenv.execute_sql("INSERT INTO TABLE hv_managed SELECT 5")
    assert tenv.sql_query("SELECT * FROM hv_managed").to_data_frame().collect()[0].x == 5
    # switch back: default-dialect DDL parses again
    tenv.execute_sql("SET 'table.sql-dialect'='default'")
    tenv.execute_sql(
        "CREATE TABLE hv_plain (y INT) WITH ('connector'='blackhole')"
    )
    assert "hv_plain" in tenv._tables
    shutil.rmtree(t.options["path"], ignore_errors=True)


def test_hive_dialect_textfile_default_delimiter(tenv, tmp_path):
    tenv.execute_sql("SET 'table.sql-dialect'='hive'")
    # STORED AS omitted -> Hive's TEXTFILE default with the ^A delimiter
    tenv.execute_sql(
        f"CREATE TABLE hv_plain_text (a STRING, b STRING) LOCATION '{tmp_path}/pt'"
    )
    t = tenv._tables["hv_plain_text"]
    assert t.options["format"] == "csv" and t.options["sep"] == "\x01"
    tenv.execute_sql("INSERT INTO TABLE hv_plain_text SELECT 'x', 'y'")
    row = tenv.sql_query("SELECT * FROM hv_plain_text").to_data_frame().collect()[0]
    assert (row.a, row.b) == ("x", "y")


def test_hive_dialect_tblproperties_and_schema_synonym(tenv, tmp_path):
    tenv.execute_sql("SET 'table.sql-dialect'='hive'")
    tenv.execute_sql("CREATE SCHEMA IF NOT EXISTS hvdb LOCATION '/ignored'")
    assert "hvdb" in tenv.execute_sql("SHOW DATABASES").collect()
    tenv.execute_sql(
        f"""CREATE TABLE hv_props (x INT) STORED AS ORC
            LOCATION '{tmp_path}/props' TBLPROPERTIES ('auto.purge'='true')"""
    )
    t = tenv._tables["hv_props"]
    assert t.options["format"] == "orc" and t.options["auto.purge"] == "true"


def test_hive_dialect_alter_table(tenv, tmp_path):
    tenv.execute_sql("SET 'table.sql-dialect'='hive'")
    tenv.execute_sql(
        f"CREATE TABLE hv_alter (x INT) STORED AS PARQUET LOCATION '{tmp_path}/a1'"
    )
    tenv.execute_sql(
        "ALTER TABLE `hv_alter` SET TBLPROPERTIES ('owner'='etl', 'retention'='30d')"
    )
    t = tenv._tables["hv_alter"]
    assert t.options["owner"] == "etl" and t.options["retention"] == "30d"
    tenv.execute_sql(f"ALTER TABLE hv_alter SET LOCATION '{tmp_path}/a2'")
    assert tenv._tables["hv_alter"].options["path"] == f"{tmp_path}/a2"
    tenv.execute_sql("ALTER TABLE hv_alter SET FILEFORMAT ORC")
    assert tenv._tables["hv_alter"].options["format"] == "orc"
    tenv.execute_sql("ALTER TABLE hv_alter RENAME TO hv_alter2")
    assert "hv_alter2" in tenv._tables and "hv_alter" not in tenv._tables
    with pytest.raises(ValueError, match="column surgery"):
        tenv.execute_sql("ALTER TABLE hv_alter2 ADD COLUMNS (y INT)")


def test_hive_dialect_add_drop_partition(tenv, tmp_path):
    """SqlAddPartitions/SqlDropPartitions: a LOCATION'd partition unions
    into the scan with its partition value injected; DROP PARTITION on
    an in-place (managed) partition DELETES its data — so a later INSERT
    recreates the partition fresh, exactly like Hive — while dropping an
    external partition only unregisters it (data kept)."""
    import os

    tenv.execute_sql("SET 'table.sql-dialect'='hive'")
    tenv.execute_sql(
        f"""CREATE TABLE hv_part (x INT) PARTITIONED BY (p STRING)
            STORED AS PARQUET LOCATION '{tmp_path}/main'"""
    )
    tenv.execute_sql("INSERT INTO TABLE hv_part PARTITION (p='a') SELECT 1")
    tenv.execute_sql("INSERT INTO TABLE hv_part PARTITION (p='b') SELECT 2")
    # external partition data living OUTSIDE the table path
    spark = tenv.spark
    spark.range(1).selectExpr("CAST(3 AS INT) AS x").write.parquet(
        f"{tmp_path}/elsewhere"
    )
    tenv.execute_sql(
        f"ALTER TABLE hv_part ADD IF NOT EXISTS PARTITION (p='c') "
        f"LOCATION '{tmp_path}/elsewhere'"
    )
    rows = {
        (r.x, r.p)
        for r in tenv.sql_query("SELECT x, p FROM hv_part").to_data_frame().collect()
    }
    assert rows == {(1, "a"), (2, "b"), (3, "c")}
    # managed drop: data physically removed
    tenv.execute_sql("ALTER TABLE hv_part DROP IF EXISTS PARTITION (p='b')")
    assert not os.path.isdir(f"{tmp_path}/main/p=b")
    rows = {
        (r.x, r.p)
        for r in tenv.sql_query("SELECT x, p FROM hv_part").to_data_frame().collect()
    }
    assert rows == {(1, "a"), (3, "c")}
    # INSERT recreates the dropped partition with ONLY the new rows
    # (the review scenario: rows written after a drop must be visible)
    tenv.execute_sql("INSERT INTO TABLE hv_part PARTITION (p='b') SELECT 9")
    rows = {
        (r.x, r.p)
        for r in tenv.sql_query("SELECT x, p FROM hv_part").to_data_frame().collect()
    }
    assert rows == {(1, "a"), (9, "b"), (3, "c")}
    # external drop: unregistered but data kept on disk
    tenv.execute_sql("ALTER TABLE hv_part DROP PARTITION (p='c')")
    rows = {
        (r.x, r.p)
        for r in tenv.sql_query("SELECT x, p FROM hv_part").to_data_frame().collect()
    }
    assert rows == {(1, "a"), (9, "b")}
    assert os.path.isdir(f"{tmp_path}/elsewhere")


def test_hive_dialect_struct_and_ctas(tenv, tmp_path):
    """STRUCT<a:b> translates to ROW (nested too); Hive CTAS lowers onto
    the default-dialect CTAS."""
    tenv.execute_sql("SET 'table.sql-dialect'='hive'")
    tenv.execute_sql(
        f"""CREATE TABLE hv_struct (
              id INT,
              s STRUCT<a:INT, b:STRING>,
              n STRUCT<inner:STRUCT<c:DOUBLE>, tags:ARRAY<STRING>>
            ) STORED AS PARQUET LOCATION '{tmp_path}/struct'"""
    )
    tenv.execute_sql(
        "INSERT INTO TABLE hv_struct "
        "SELECT 1, named_struct('a', 7, 'b', 'x'), "
        "named_struct('inner', named_struct('c', 1.5), 'tags', array('t'))"
    )
    row = tenv.sql_query(
        "SELECT id, s.a AS sa, s.b AS sb, n.inner.c AS nc, n.tags[0] AS t0 "
        "FROM hv_struct"
    ).to_data_frame().first()
    assert (row.id, row.sa, row.sb, row.nc, row.t0) == (1, 7, "x", 1.5, "t")
    tenv.execute_sql(
        f"""CREATE TABLE hv_ctas STORED AS PARQUET LOCATION '{tmp_path}/ctas'
            TBLPROPERTIES ('made.by'='ct''as')
            AS SELECT id, s.a AS a FROM hv_struct"""
    )
    t = tenv._tables["hv_ctas"]
    assert t.options["format"] == "parquet" and t.options["made.by"] == "ct'as"
    row = tenv.sql_query("SELECT * FROM hv_ctas").to_data_frame().first()
    assert (row.id, row.a) == (1, 7)


def test_hive_dialect_quote_escaping(tenv, tmp_path):
    """A single quote inside LOCATION/TBLPROPERTIES/COMMENT must not
    break (or inject into) the assembled default-dialect DDL."""
    loc = f"{tmp_path}/o'brien"
    tenv.execute_sql("SET 'table.sql-dialect'='hive'")
    tenv.execute_sql(
        f"""CREATE TABLE hv_quote (x INT) COMMENT 'it''s fine'
            STORED AS PARQUET LOCATION '{loc.replace("'", "''")}'
            TBLPROPERTIES ('note'='don''t')"""
    )
    t = tenv._tables["hv_quote"]
    assert t.options["path"] == loc
    assert t.options["note"] == "don't"
    tenv.execute_sql("INSERT INTO TABLE hv_quote SELECT 42")
    assert tenv.sql_query("SELECT x FROM hv_quote").to_data_frame().first().x == 42


def test_hive_dialect_like_word_does_not_skip_translation(tenv, tmp_path):
    """Only a TOP-LEVEL LIKE clause selects the CREATE TABLE LIKE path:
    a column named `like` or a COMMENT containing the word must still
    translate (review finding: the substring check skipped them)."""
    tenv.execute_sql("SET 'table.sql-dialect'='hive'")
    tenv.execute_sql(
        f"""CREATE TABLE hv_likeish (
              x INT COMMENT 'works like a charm',
              y STRING
            ) STORED AS PARQUET LOCATION '{tmp_path}/likeish'"""
    )
    t = tenv._tables["hv_likeish"]
    assert t.options["format"] == "parquet"
    tenv.execute_sql("INSERT INTO TABLE hv_likeish SELECT 1, 'a'")
    assert tenv.sql_query("SELECT * FROM hv_likeish").to_data_frame().count() == 1


def test_hive_dialect_rejects_untranslatable(tenv):
    tenv.execute_sql("SET 'table.sql-dialect'='hive'")
    with pytest.raises(ValueError, match="SERDE"):
        tenv.execute_sql(
            "CREATE TABLE hv_serde (x INT) ROW FORMAT SERDE 'org.acme.SerDe'"
        )
    with pytest.raises(ValueError, match="STORED AS"):
        tenv.execute_sql("CREATE TABLE hv_rc (x INT) STORED AS RCFILE")


def test_hive_dialect_serde_translations(tenv, tmp_path):
    """LazySimpleSerDe (Hive's default text SerDe) and OpenCSVSerde
    translate to the csv reader; other SerDes still raise."""
    tenv.execute_sql("SET 'table.sql-dialect'='hive'")
    tenv.execute_sql(
        f"""CREATE TABLE hv_lazy (a INT, b STRING)
            ROW FORMAT SERDE 'org.apache.hadoop.hive.serde2.lazy.LazySimpleSerDe'
            WITH SERDEPROPERTIES ('field.delim'='\\t')
            STORED AS TEXTFILE LOCATION '{tmp_path}/lazy'"""
    )
    t = tenv._tables["hv_lazy"]
    assert t.options["sep"] == "\t" and t.options["format"] == "csv"
    tenv.execute_sql("INSERT INTO TABLE hv_lazy SELECT 1, 'x'")
    row = tenv.sql_query("SELECT a, b FROM hv_lazy").to_data_frame().first()
    assert (row.a, row.b) == (1, "x")

    tenv.execute_sql(
        f"""CREATE TABLE hv_ocsv (a INT, b STRING)
            ROW FORMAT SERDE 'org.apache.hadoop.hive.serde2.OpenCSVSerde'
            WITH SERDEPROPERTIES ('separatorChar'=';', 'quoteChar'='"')
            STORED AS TEXTFILE LOCATION '{tmp_path}/ocsv'"""
    )
    t = tenv._tables["hv_ocsv"]
    assert t.options["sep"] == ";" and t.options["quote"] == '"'
    tenv.execute_sql("INSERT INTO TABLE hv_ocsv SELECT 2, 'semi;colon'")
    row = tenv.sql_query("SELECT a, b FROM hv_ocsv").to_data_frame().first()
    assert (row.a, row.b) == (2, "semi;colon")

    with pytest.raises(ValueError, match="SERDE"):
        tenv.execute_sql(
            "CREATE TABLE hv_bad (x INT) ROW FORMAT SERDE 'org.acme.BinarySerDe'"
        )
    with pytest.raises(ValueError, match="TEXTFILE"):
        tenv.execute_sql(
            """CREATE TABLE hv_mix (x INT)
               ROW FORMAT SERDE 'org.apache.hadoop.hive.serde2.OpenCSVSerde'
               STORED AS PARQUET"""
        )


def test_hive_dialect_lines_and_misparse_guard(tenv, tmp_path):
    """LINES TERMINATED BY '\\n' is accepted (and a custom separator maps
    to lineSep); COLLECTION ITEMS delimiters and any unrecognizable
    trailing clause fail LOUDLY instead of silently mangling the table."""
    tenv.execute_sql("SET 'table.sql-dialect'='hive'")
    tenv.execute_sql(
        f"""CREATE TABLE hv_lines (a INT, b STRING)
            ROW FORMAT DELIMITED FIELDS TERMINATED BY ','
            LINES TERMINATED BY '\\n'
            STORED AS TEXTFILE LOCATION '{tmp_path}/lines'"""
    )
    t = tenv._tables["hv_lines"]
    assert t.options["sep"] == "," and "lineSep" not in t.options
    tenv.execute_sql("INSERT INTO TABLE hv_lines SELECT 1, 'x'")
    row = tenv.sql_query("SELECT a, b FROM hv_lines").to_data_frame().first()
    assert (row.a, row.b) == (1, "x")
    with pytest.raises(ValueError, match="COLLECTION ITEMS"):
        tenv.execute_sql(
            """CREATE TABLE hv_coll (a INT)
               ROW FORMAT DELIMITED FIELDS TERMINATED BY ','
               COLLECTION ITEMS TERMINATED BY '|'
               STORED AS TEXTFILE"""
        )
    # SKEWED BY graduated from the generic misparse guard to its own
    # documented-gap message (round 10)
    with pytest.raises(ValueError, match="SKEWED BY is not supported"):
        tenv.execute_sql(
            "CREATE TABLE hv_skew (x INT) SKEWED BY (x) ON (1) STORED AS PARQUET"
        )


def test_manifest_streaming_insert_publishes_per_batch(spark, tmp_path):
    """A streaming INSERT INTO a manifest table stages + publishes each
    micro-batch (a direct append would write files the manifest scan can
    never resolve); the native-checkpoint sink combination raises."""
    import pytest as _pytest

    from flink_release_1_16_0_spark.table_env import TableEnvironment

    src = str(tmp_path / "ms_src")
    spark.range(0, 6).selectExpr("id AS k").write.parquet(src)
    out = str(tmp_path / "ms_out")
    tenv = TableEnvironment.create(spark, streaming=True)
    tenv.execute_sql(
        f"""CREATE TABLE ms_src (k BIGINT)
        WITH ('connector'='filesystem','path'='{src}','format'='parquet')"""
    )
    tenv.execute_sql(
        f"""CREATE TABLE ms_snk (k BIGINT)
        WITH ('connector'='filesystem','path'='{out}','format'='parquet',
              'sink.commit-protocol'='manifest')"""
    )
    tenv.execute_sql("INSERT INTO ms_snk SELECT k FROM ms_src")
    # batch read-back resolves ONLY manifest-listed files
    bt = TableEnvironment.create(spark)
    bt.execute_sql(
        f"""CREATE TABLE ms_read (k BIGINT)
        WITH ('connector'='filesystem','path'='{out}','format'='parquet',
              'sink.commit-protocol'='manifest')"""
    )
    got = sorted(r.k for r in bt.sql_query("SELECT k FROM ms_read").to_data_frame().collect())
    assert got == [0, 1, 2, 3, 4, 5]
    tenv.execute_sql(
        f"""CREATE TABLE ms_bad (k BIGINT)
        WITH ('connector'='filesystem','path'='{tmp_path}/bad','format'='parquet',
              'sink.commit-protocol'='manifest','checkpoint'='{tmp_path}/ckpt')"""
    )
    with _pytest.raises(ValueError, match="foreachBatch"):
        tenv.execute_sql("INSERT INTO ms_bad SELECT k FROM ms_src")


def test_lazy_serde_serialization_format_is_byte_code(tenv, tmp_path):
    """SHOW CREATE TABLE emits serialization.format, which Hive parses
    as a BYTE CODE when numeric ('1' -> \\x01), not the literal digit."""
    tenv.execute_sql("SET 'table.sql-dialect'='hive'")
    tenv.execute_sql(
        f"""CREATE TABLE hv_sf (a INT, b STRING)
            ROW FORMAT SERDE 'org.apache.hadoop.hive.serde2.lazy.LazySimpleSerDe'
            WITH SERDEPROPERTIES ('serialization.format'='1')
            STORED AS TEXTFILE LOCATION '{tmp_path}/sf'"""
    )
    assert tenv._tables["hv_sf"].options["sep"] == "\x01"


def test_hive_dialect_quoting_roundtrip_fuzz():
    """Property: any printable TBLPROPERTIES/LOCATION value survives the
    Hive->default-dialect translation exactly (SQL ''-escaping applied
    on input, re-escaped on assembly, decoded by the option parser)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flink_release_1_16_0_spark.hive_dialect import _translate_create_table
    from flink_release_1_16_0_spark.table_env import (
        _parse_option_pair,
        _split_top_level,
    )

    value = st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=0,
        max_size=24,
    )

    def esc(v: str) -> str:
        return v.replace("'", "''")

    @settings(max_examples=150, deadline=None)
    @given(loc=value.filter(bool), pk=value.filter(bool), pv=value)
    def check(loc, pk, pv):
        stmt = (
            "CREATE TABLE fuzz_t (x INT) STORED AS PARQUET "
            f"LOCATION '{esc(loc)}' TBLPROPERTIES ('{esc(pk)}'='{esc(pv)}')"
        )
        out = _translate_create_table(None, stmt)
        # parse the WITH clause back and check exact value round-trip
        import re as _re

        m = _re.search(r"WITH \((.*)\)$", out, _re.DOTALL)
        assert m, out
        opts = {}
        for pair in _split_top_level(m.group(1)):
            km = _parse_option_pair(pair)
            assert km is not None, pair
            opts[km[0]] = km[1]
        assert opts["path"] == loc
        assert opts["connector"] == "filesystem"
        # the user property survives unless it collides with an
        # engine-reserved key the translator itself sets
        if pk not in ("connector", "path", "format"):
            assert opts[pk] == pv

    check()


def test_keyword_named_columns_parse(tenv, tmp_path):
    """`location` / `tblproperties` are legal Hive column names — the
    mis-parse guard must only trip on clause-shaped text (second
    self-review round)."""
    tenv.execute_sql("SET 'table.sql-dialect'='hive'")
    tenv.execute_sql(
        f"""CREATE TABLE hv_kwcols (
              location STRING,
              tblproperties INT,
              stored STRING
            ) STORED AS PARQUET LOCATION '{tmp_path}/kw'"""
    )
    tenv.execute_sql("INSERT INTO TABLE hv_kwcols SELECT 'x', 1, 'y'")
    row = tenv.sql_query(
        "SELECT location, tblproperties, stored FROM hv_kwcols"
    ).to_data_frame().first()
    assert (row.location, row.tblproperties, row.stored) == ("x", 1, "y")
    with pytest.raises(ValueError, match="LINES TERMINATED BY"):
        tenv.execute_sql(
            r"""CREATE TABLE hv_crlf (a INT)
                ROW FORMAT DELIMITED FIELDS TERMINATED BY ','
                LINES TERMINATED BY '\r\n' STORED AS TEXTFILE"""
        )


def test_drop_partition_escaped_values_and_traversal(tenv, tmp_path):
    """DROP PARTITION addresses the ESCAPED on-disk dir Spark writes
    ('a:b' -> 'p=a%3Ab'), and a crafted traversal value cannot delete
    outside the table path (second self-review round)."""
    import os

    tenv.execute_sql("SET 'table.sql-dialect'='hive'")
    tenv.execute_sql(
        f"""CREATE TABLE hv_esc (x INT) PARTITIONED BY (p STRING)
            STORED AS PARQUET LOCATION '{tmp_path}/esc'"""
    )
    tenv.execute_sql("INSERT INTO TABLE hv_esc PARTITION (p='a:b') SELECT 1")
    tenv.execute_sql("INSERT INTO TABLE hv_esc PARTITION (p='plain') SELECT 2")
    assert os.path.isdir(f"{tmp_path}/esc/p=a%3Ab")  # Spark's escaping
    tenv.execute_sql("ALTER TABLE hv_esc DROP PARTITION (p='a:b')")
    assert not os.path.isdir(f"{tmp_path}/esc/p=a%3Ab")
    rows = {r.x for r in tenv.sql_query("SELECT x FROM hv_esc").to_data_frame().collect()}
    assert rows == {2}
    # traversal: the sibling dir must survive ('/' is escaped, plus the
    # realpath containment check)
    sibling = tmp_path / "sibling"
    sibling.mkdir()
    (sibling / "keep.txt").write_text("keep")
    tenv.execute_sql("ALTER TABLE hv_esc DROP IF EXISTS PARTITION (p='a/../../sibling')")
    assert (sibling / "keep.txt").exists()


def test_drop_partition_prefix_covers_external(tenv, tmp_path):
    """A partial-spec DROP covers every matching partition, including
    externally-located ones (Hive's partial-spec semantics)."""
    tenv.execute_sql("SET 'table.sql-dialect'='hive'")
    tenv.execute_sql(
        f"""CREATE TABLE hv_pfx (x INT) PARTITIONED BY (p1 STRING, p2 STRING)
            STORED AS PARQUET LOCATION '{tmp_path}/pfx'"""
    )
    tenv.execute_sql("INSERT INTO TABLE hv_pfx PARTITION (p1='a', p2='x') SELECT 1")
    tenv.spark.range(1).selectExpr("CAST(9 AS INT) AS x").write.parquet(
        f"{tmp_path}/ext"
    )
    tenv.execute_sql(
        f"ALTER TABLE hv_pfx ADD PARTITION (p1='a', p2='y') LOCATION '{tmp_path}/ext'"
    )
    rows = {
        (r.x, r.p1, r.p2)
        for r in tenv.sql_query("SELECT x, p1, p2 FROM hv_pfx").to_data_frame().collect()
    }
    assert rows == {(1, "a", "x"), (9, "a", "y")}
    tenv.execute_sql("ALTER TABLE hv_pfx DROP PARTITION (p1='a')")
    assert tenv.sql_query("SELECT x FROM hv_pfx").to_data_frame().count() == 0


def test_add_partition_conflicting_location_raises(tenv, tmp_path):
    """Re-adding an existing partition spec with a DIFFERENT location
    must not be silently ignored (the scan would keep reading the stale
    location): plain ADD raises like Hive's AlreadyExistsException; ADD
    IF NOT EXISTS keeps the existing entry; same-location re-add is a
    no-op."""
    import pytest

    tenv.execute_sql("SET 'table.sql-dialect'='hive'")
    tenv.execute_sql(
        f"""CREATE TABLE hv_conf (x INT) PARTITIONED BY (p STRING)
            STORED AS PARQUET LOCATION '{tmp_path}/conf'"""
    )
    tenv.execute_sql("INSERT INTO TABLE hv_conf PARTITION (p='z') SELECT 0")
    tenv.spark.range(1).selectExpr("CAST(1 AS INT) AS x").write.parquet(
        f"{tmp_path}/loc1"
    )
    tenv.spark.range(1).selectExpr("CAST(2 AS INT) AS x").write.parquet(
        f"{tmp_path}/loc2"
    )
    tenv.execute_sql(
        f"ALTER TABLE hv_conf ADD PARTITION (p='a') LOCATION '{tmp_path}/loc1'"
    )
    with pytest.raises(ValueError, match="already exists"):
        tenv.execute_sql(
            f"ALTER TABLE hv_conf ADD PARTITION (p='a') LOCATION '{tmp_path}/loc2'"
        )
    # IF NOT EXISTS: keep the existing entry, no error
    tenv.execute_sql(
        f"ALTER TABLE hv_conf ADD IF NOT EXISTS PARTITION (p='a') LOCATION '{tmp_path}/loc2'"
    )
    # same-location re-add: no-op
    tenv.execute_sql(
        f"ALTER TABLE hv_conf ADD PARTITION (p='a') LOCATION '{tmp_path}/loc1'"
    )
    rows = {r.x for r in tenv.sql_query("SELECT x FROM hv_conf").to_data_frame().collect()}
    assert rows == {0, 1}  # in-place p='z' plus loc1 (never loc2)


def test_partition_ddl_pathless_connector_raises(tenv):
    """ADD/DROP PARTITION on a connector without a filesystem path must
    raise a descriptive unsupported-connector error, not a KeyError."""
    import pytest

    tenv.execute_sql(
        "CREATE TABLE v_nopath (x INT, p STRING) WITH ('connector'='values')"
    )
    with pytest.raises(ValueError, match="not supported.*connector"):
        tenv.execute_sql("ALTER TABLE v_nopath ADD PARTITION (p='a') LOCATION '/tmp/x'")
    with pytest.raises(ValueError, match="not supported.*connector"):
        tenv.execute_sql("ALTER TABLE v_nopath DROP PARTITION (p='a')")


def test_hive_comment_doubled_quote_and_colon(tenv, tmp_path):
    """Per-column COMMENT with a doubled-quote escape ('it''s fine') and
    a colon inside the comment must strip cleanly — previously the
    residue leaked into the DDL and the STRUCT ':'-swap mangled it."""
    tenv.execute_sql("SET 'table.sql-dialect'='hive'")
    tenv.execute_sql(
        f"""CREATE TABLE hv_cmt (
              a INT COMMENT 'it''s fine',
              s STRUCT<x:INT, y:STRING> COMMENT 'ratio: a/b'
            ) STORED AS PARQUET LOCATION '{tmp_path}/cmt'"""
    )
    tenv.execute_sql(
        "INSERT INTO TABLE hv_cmt SELECT 1, NAMED_STRUCT('x', 2, 'y', 'z')"
    )
    rows = [
        (r.a, r.sx, r.sy)
        for r in tenv.sql_query(
            "SELECT a, s.x AS sx, s.y AS sy FROM hv_cmt"
        ).to_data_frame().collect()
    ]
    assert rows == [(1, 2, "z")]


def test_hive_clustered_by_buckets_native(tenv, tmp_path):
    """CLUSTERED BY (k) SORTED BY (k) INTO n BUCKETS (parserImpls.ftl
    TableCreationPart) lowers onto Spark-native bucketing through the
    catalog-managed path: data round-trips, the catalog records the
    bucket spec, and a join of two tables bucketed on the key runs
    EXCHANGE-FREE — the co-location contract bucketing exists for."""
    import shutil

    spark = tenv.spark
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for prefix in ("file://", "file:"):
        if wh.startswith(prefix):
            wh = wh[len(prefix):]
    for t in ("hb_left", "hb_right"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # the session catalog is in-memory, so a dir orphaned by a
        # previous crashed run would trip LOCATION_ALREADY_EXISTS
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    tenv.execute_sql("SET 'table.sql-dialect'='hive'")
    tenv.execute_sql(
        "CREATE TABLE hb_left (k INT, v STRING) "
        "CLUSTERED BY (k) SORTED BY (k) INTO 4 BUCKETS STORED AS PARQUET"
    )
    tenv.execute_sql(
        "CREATE TABLE hb_right (k INT, w STRING) "
        "CLUSTERED BY (k) INTO 4 BUCKETS STORED AS PARQUET"
    )
    tenv.execute_sql(
        "INSERT INTO TABLE hb_left SELECT CAST(id AS INT), CAST(id AS STRING) FROM range(100)"
    )
    tenv.execute_sql(
        "INSERT INTO TABLE hb_right SELECT CAST(id AS INT), 'x' FROM range(50)"
    )
    # catalog carries the bucket spec
    # the engine registers a same-named temp view over the scan, so
    # DESCRIBE must address the catalog table explicitly
    desc = {
        r.col_name: r.data_type
        for r in spark.sql(
            "DESCRIBE EXTENDED spark_catalog.default.hb_left"
        ).collect()
    }
    assert desc.get("Num Buckets") == "4"
    assert "k" in desc.get("Bucket Columns", "")
    # read-back through the engine
    n = tenv.sql_query("SELECT COUNT(*) AS n FROM hb_left").to_data_frame().collect()[0].n
    assert n == 100
    # bucketed join: zero Exchange operators without broadcast
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            spark.table("spark_catalog.default.hb_left")
            .join(spark.table("spark_catalog.default.hb_right"), "k")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Exchange" not in plan
    spark.sql("DROP TABLE IF EXISTS hb_left")
    spark.sql("DROP TABLE IF EXISTS hb_right")


def test_hive_clustered_by_unsupported_combos_raise(tenv):
    """The documented scope edges stay loud: text SerDes + buckets and
    non-columnar STORED AS + buckets raise with pointers (never silently
    accepted)."""
    tenv.execute_sql("SET 'table.sql-dialect'='hive'")
    with pytest.raises(ValueError, match="CLUSTERED BY"):
        tenv.execute_sql(
            "CREATE TABLE hb_bad1 (k INT) "
            "CLUSTERED BY (k) INTO 4 BUCKETS "
            "ROW FORMAT DELIMITED FIELDS TERMINATED BY ','"
        )
    with pytest.raises(ValueError, match="TEXTFILE"):
        tenv.execute_sql(
            "CREATE TABLE hb_bad2 (k INT) "
            "CLUSTERED BY (k) INTO 4 BUCKETS STORED AS TEXTFILE"
        )


def test_partition_ddl_on_hive_connector_lowers_native(spark):
    """ADD/DROP PARTITION on a 'hive'-connector table lowers onto
    Spark's native catalog partition DDL (the reference's
    HiveCatalog.createPartition/dropPartition) instead of the
    filesystem-table bookkeeping — review found the blanket
    filesystem-only check rejected hive tables entirely."""
    from flink_release_1_16_0_spark.table_env import TableEnvironment

    spark.sql("DROP TABLE IF EXISTS hv_natp")
    import shutil

    shutil.rmtree("spark-warehouse/hv_natp", ignore_errors=True)
    tenv = TableEnvironment.create(spark)
    tenv.execute_sql(
        "CREATE TABLE hv_natp (k BIGINT, p STRING) PARTITIONED BY (p) "
        "WITH ('connector'='hive')"
    )
    try:
        tenv.execute_sql("INSERT INTO hv_natp SELECT 1, 'a' UNION ALL SELECT 2, 'b'")
        tenv.execute_sql("ALTER TABLE hv_natp ADD IF NOT EXISTS PARTITION (p='c')")
        parts = {
            r[0] for r in spark.sql("SHOW PARTITIONS spark_catalog.default.hv_natp").collect()
        }
        assert "p=c" in parts
        tenv.execute_sql("ALTER TABLE hv_natp DROP IF EXISTS PARTITION (p='b')")
        parts = {r[0] for r in spark.sql("SHOW PARTITIONS spark_catalog.default.hv_natp").collect()}
        assert "p=b" not in parts and "p=a" in parts
        got = {
            (r["k"], r["p"])
            for r in tenv.sql_query("SELECT * FROM hv_natp").to_data_frame().collect()
        }
        assert got == {(1, "a")}
    finally:
        spark.sql("DROP TABLE IF EXISTS hv_natp")
        shutil.rmtree("spark-warehouse/hv_natp", ignore_errors=True)


def test_hive_skewed_by_raises_documented_gap(tenv):
    """SKEWED BY is a documented permanent divergence: Spark has no
    skewed-table DDL slot; the intent is covered by AQE skew-join
    splitting and the explicit salted-join operator. The dialect must
    say exactly that, not emit a generic parse error."""
    tenv.execute_sql("SET 'table.sql-dialect' = 'hive'")
    try:
        with pytest.raises(ValueError, match="SKEWED BY.*AQE"):
            tenv.execute_sql(
                "CREATE TABLE hv_skew (k INT, v STRING) "
                "SKEWED BY (k) ON (1, 5) STORED AS PARQUET"
            )
    finally:
        tenv.execute_sql("SET 'table.sql-dialect' = 'default'")
