"""Table catalog for the benchmark corpus (TESTDATA.md).

One quirk: ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS),
which Spark's vectorized reader rejects outright. With
``spark.sql.legacy.parquet.nanosAsLong=true`` (set in session.py) it reads
as nanosecond longs; the loader converts to a microsecond timestamp —
the same truncation DuckDB applies — so both engines see identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every corpus table as a temp view; returns the DataFrames."""
    out = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
