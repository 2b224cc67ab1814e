"""Source/sink format coverage: the engine's tables must survive CSV, ORC,
and JSON round-trips with schema intact — the formats a migrating user's
existing data arrives in."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _sample(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderkey", "o_orderpriority", "o_totalprice", "o_orderdate")
        .limit(500)
    )


def _normalized(df):
    return sorted(map(tuple, df.collect()))


def test_orc_roundtrip(spark, tmp_path):
    df = _sample(spark)
    path = str(tmp_path / "orders_orc")
    df.write.format("orc").option("compression", "zstd").save(path)
    back = spark.read.orc(path)
    assert back.schema == df.schema
    assert _normalized(back) == _normalized(df)


def test_csv_roundtrip_with_schema(spark, tmp_path):
    df = _sample(spark)
    path = str(tmp_path / "orders_csv")
    df.write.option("header", True).option("timestampFormat", "yyyy-MM-dd HH:mm:ss").csv(path)
    back = spark.read.schema(df.schema).option("header", True).option(
        "timestampFormat", "yyyy-MM-dd HH:mm:ss"
    ).csv(path)
    assert back.schema == df.schema
    assert _normalized(back) == _normalized(df)


def test_json_lines_roundtrip_with_schema(spark, tmp_path):
    df = _sample(spark)
    path = str(tmp_path / "orders_json")
    df.write.option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSS").json(path)
    back = spark.read.schema(df.schema).option(
        "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSS"
    ).json(path)
    assert back.schema == df.schema
    assert _normalized(back) == _normalized(df)
