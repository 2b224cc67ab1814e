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


# --- footer-based row-count probe (r10: limit-probe dispatches) ---------------


def test_table_row_count_matches_count_no_jobs(spark):
    """table_row_count must return exactly df.count() for every base table
    while launching ZERO Spark jobs (the point of the footer probe: the
    dispatch queries pay no driver-blocking job for their threshold
    check)."""
    from hive_json_spark.sources import TABLES, load_table, table_row_count

    tracker = spark.sparkContext.statusTracker()
    for name in TABLES:
        before = set(tracker.getJobIdsForGroup(None) or [])
        n_footer = table_row_count(spark, SF_DIR, name)
        after = set(tracker.getJobIdsForGroup(None) or [])
        assert after == before, f"{name}: footer probe launched a Spark job"
        assert n_footer == load_table(spark, SF_DIR, name).count(), name


def test_table_row_count_directory_layout(spark, tmp_path):
    """Multi-file parquet directories (the layout Spark writes) sum
    row counts across part files."""
    from hive_json_spark.sources import table_row_count

    df = spark.range(0, 1000).repartition(4)
    df.write.parquet(str(tmp_path / "t.parquet"))
    assert table_row_count(spark, str(tmp_path), "t") == 1000


def test_table_row_count_partitioned_layout_exact(spark, tmp_path):
    """A hive-partitioned directory (nested bucket=N subdirs) must return
    the EXACT count — the flat top-level footer walk sees zero files
    there and would silently return 0 (ADVICE r10); the probe detects the
    nested layout and takes the count() fallback instead."""
    from hive_json_spark.sources import table_row_count

    df = spark.range(0, 500).withColumn("bucket", (F.col("id") % 4).cast("int"))
    df.write.partitionBy("bucket").parquet(str(tmp_path / "t.parquet"))
    assert table_row_count(spark, str(tmp_path), "t") == 500


def test_table_row_count_fallback_non_parquet(spark, tmp_path):
    """A layout the footer walk cannot read falls back to a real count
    instead of raising (the non-local-filesystem / non-parquet path)."""
    from unittest import mock

    from hive_json_spark.sources import load_table, table_row_count

    src = load_table(spark, SF_DIR, "region")
    src.write.parquet(str(tmp_path / "region.parquet"))
    with mock.patch("pyarrow.parquet.ParquetFile", side_effect=OSError("remote fs")):
        assert table_row_count(spark, str(tmp_path), "region") == src.count()
