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


def test_parquet_footer_schema_matches_inference(spark):
    """parquet_schema must equal Spark's own inference — field names, types
    AND nullability — for every base table at every shipped SF, under this
    engine's session config (UTC tz, nanosAsLong, NTZ inference). A wrong
    mapping would silently change query results; any mismatch must fail
    here, not in an oracle diff."""
    import os

    from hive_json_spark.sources import TABLES, parquet_schema

    sf_dirs = [
        d
        for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
        if os.path.isdir(d)
    ] or [SF_DIR]
    for sf_dir in sf_dirs:
        for name in TABLES:
            path = f"{sf_dir}/{name}.parquet"
            footer = parquet_schema(path)
            assert footer is not None, f"{path}: footer schema unexpectedly fell back"
            inferred = spark.read.parquet(path).schema
            assert footer == inferred, f"{path}: {footer} != {inferred}"


def test_load_table_launches_no_schema_inference_job(spark):
    """With the footer schema supplied, building a base-table DataFrame is
    fully lazy: ZERO Spark jobs (previously every spark.read.parquet call
    paid a 1-task schema-inference job — q5 alone paid 6 per execution)."""
    from hive_json_spark.sources import TABLES, load_table

    tracker = spark.sparkContext.statusTracker()
    for name in TABLES:
        before = set(tracker.getJobIdsForGroup(None) or [])
        load_table(spark, SF_DIR, name)
        after = set(tracker.getJobIdsForGroup(None) or [])
        assert after == before, f"{name}: load_table launched a Spark job"


def test_parquet_footer_schema_matches_inference_engine_written(spark, tmp_path):
    """Engine-written parquet (the streaming staged dirs) carries Spark's
    schema JSON in the footer; parquet_schema must reproduce inference
    exactly for the shapes the engine writes — INT96 timestamps (which
    pyarrow reports as the same timestamp[ns] as TIMESTAMP(NANOS)),
    non-null arrays/structs/maps (inference forces nullability), NTZ."""
    from hive_json_spark.sources import parquet_schema

    df = spark.range(3).select(
        F.current_timestamp().alias("ts"),
        F.array(F.lit("a"), F.lit("b")).alias("arr"),
        F.struct(F.lit(1).alias("x"), F.lit("y").alias("s")).alias("st"),
        F.create_map(F.lit("k"), F.lit(2)).alias("mp"),
        F.localtimestamp().alias("ntz"),
        F.col("id"),
    )
    path = str(tmp_path / "t.parquet")
    df.write.parquet(path)
    footer = parquet_schema(path)
    assert footer is not None
    assert footer == spark.read.parquet(path).schema


def test_parquet_footer_schema_falls_back_on_partitioned_layout(spark, tmp_path):
    """Nested (hive-partitioned) layouts return None so the caller uses
    Spark's inference — the footer walk cannot see partition columns."""
    from hive_json_spark.sources.tables import parquet_schema

    df = spark.range(0, 100).withColumn("bucket", (F.col("id") % 4).cast("int"))
    df.write.partitionBy("bucket").parquet(str(tmp_path / "t.parquet"))
    assert parquet_schema(str(tmp_path / "t.parquet")) is None


def test_table_row_count_fallback_non_parquet(spark, tmp_path):
    """A layout the footer walk cannot read falls back to a real count
    instead of raising (the non-local-filesystem / non-parquet path)."""
    from unittest import mock

    from hive_json_spark.sources import load_table, table_row_count

    src = load_table(spark, SF_DIR, "region")
    src.write.parquet(str(tmp_path / "region.parquet"))
    with mock.patch("pyarrow.parquet.ParquetFile", side_effect=OSError("remote fs")):
        assert table_row_count(spark, str(tmp_path), "region") == src.count()
