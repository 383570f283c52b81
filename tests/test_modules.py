"""Module system: LOAD/UNLOAD MODULE, USE MODULES, SHOW [FULL] MODULES
(ModuleManager; Parser.tdd:88,103). Function-namespace scoping: a
module's functions resolve only while the module is loaded AND used."""

import pytest

from flink_release_1_16_0_spark.table_env import TableEnvironment


@pytest.fixture()
def tenv(spark):
    env = TableEnvironment.create(spark)
    yield env
    # restore the default module state for the shared session
    try:
        env.execute_sql("UNLOAD MODULE hive")
    except ValueError:
        pass
    if not env._modules.get("core"):
        env.execute_sql("USE MODULES core")


def test_default_state(tenv):
    assert tenv.execute_sql("SHOW MODULES").collect() == ["core"]
    assert tenv.execute_sql("SHOW FULL MODULES").collect() == [("core", True)]


def test_load_use_unload_hive(tenv, spark):
    # hive masking functions do not resolve before LOAD
    with pytest.raises(Exception):
        spark.sql("SELECT MASK_SHOW_FIRST_N('Abc123xy', 4)").collect()
    tenv.execute_sql("LOAD MODULE hive")
    assert tenv.execute_sql("SHOW MODULES").collect() == ["core", "hive"]
    got = spark.sql(
        "SELECT MASK_SHOW_FIRST_N('Abc123xy', 4) AS a,"
        "       MASK_FIRST_N('Abc123xy', 4) AS b,"
        "       MASK_LAST_N('Abc123xy', 2) AS c,"
        "       MASK_SHOW_LAST_N('Abc123xy', 2) AS d,"
        "       MASK_HASH('abc') AS e"
    ).collect()[0]
    # Hive masking rules: upper->X, lower->x, digit->n
    assert got.a == "Abc1nnxx"
    assert got.b == "Xxxn23xy"
    assert got.c == "Abc123xx"
    assert got.d == "Xxxnnnxy"
    assert got.e == "900150983cd24fb0d6963f7d28e17f72"  # md5('abc')
    tenv.execute_sql("UNLOAD MODULE hive")
    assert tenv.execute_sql("SHOW MODULES").collect() == ["core"]
    with pytest.raises(Exception):
        spark.sql("SELECT MASK_SHOW_FIRST_N('Abc123xy', 4)").collect()


def test_use_modules_scopes_and_orders(tenv, spark):
    tenv.execute_sql("LOAD MODULE hive")
    # deactivate core: its Flink-spelled UDFs stop resolving
    tenv.execute_sql("USE MODULES hive")
    assert tenv.execute_sql("SHOW MODULES").collect() == ["hive"]
    assert tenv.execute_sql("SHOW FULL MODULES").collect() == [
        ("hive", True),
        ("core", False),
    ]
    with pytest.raises(Exception):
        spark.sql("SELECT SPLIT_INDEX('a,b,c', ',', 1)").collect()
    # hive still resolves
    assert (
        spark.sql("SELECT MASK_HASH('x') AS h").collect()[0].h is not None
    )
    # reactivate both, core first
    tenv.execute_sql("USE MODULES core, hive")
    assert tenv.execute_sql("SHOW MODULES").collect() == ["core", "hive"]
    assert (
        spark.sql("SELECT SPLIT_INDEX('a,b,c', ',', 1) AS s").collect()[0].s
        == "b"
    )


def test_errors(tenv):
    with pytest.raises(ValueError, match="unknown module"):
        tenv.execute_sql("LOAD MODULE nope")
    with pytest.raises(ValueError, match="already loaded"):
        tenv.execute_sql("LOAD MODULE core")
    with pytest.raises(ValueError, match="not loaded"):
        tenv.execute_sql("UNLOAD MODULE hive")
    with pytest.raises(ValueError, match="not loaded"):
        tenv.execute_sql("USE MODULES core, hive")
    with pytest.raises(ValueError, match="duplicate"):
        tenv.execute_sql("USE MODULES core, core")
