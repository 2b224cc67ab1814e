"""Table catalog for the benchmark corpus (TESTDATA.md).

One quirk: ``events.parquet`` has shipped with two physical types for
``ts`` across testdata generations — TIMESTAMP(NANOS) (which Spark's
vectorized reader rejects; ``spark.sql.legacy.parquet.nanosAsLong=true``
in session.py reads it as nanosecond longs) and plain ``timestamp[us]``
without UTC adjustment (which Spark reads as TIMESTAMP_NTZ). The loader
normalizes both to a session-UTC TIMESTAMP so every query sees one type
and values match DuckDB's naive-TIMESTAMP view of the same file.
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
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":  # TIMESTAMP(NANOS) via nanosAsLong
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":  # parquet timestamp[us], not UTC-adjusted
            # session tz is pinned to UTC, so this cast is wall-clock-exact and
            # matches DuckDB's naive-TIMESTAMP view of the same file
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def table_row_count(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Exact row count of a base table for dispatch probes.

    Reads the parquet footer metadata on the driver (no Spark job) — the
    same number ``df.count()`` returns via aggregate pushdown, minus the
    ~0.25 s fixed job cost, which is pure overhead for limit-probe
    dispatches that only compare the count to a threshold. Recomputed
    from the input files on every call (nothing is memoized). Falls back
    to a real count for layouts the footer walk cannot see (non-local
    filesystems, non-parquet sources)."""
    import os

    path = f"{sf_dir}/{name}.parquet"
    try:
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            parts = []
            for f in os.listdir(path):
                if f.startswith(("_", ".")):
                    continue  # _SUCCESS / .crc sidecars, ignored by readers
                full = os.path.join(path, f)
                if os.path.isdir(full) or not f.endswith(".parquet"):
                    # nested (partitioned) or mixed layout: the flat walk
                    # would silently undercount — take the exact count()
                    return load_table(spark, sf_dir, name).count()
                parts.append(full)
            if not parts:
                raise FileNotFoundError(path)
            return sum(pq.ParquetFile(p).metadata.num_rows for p in parts)
        return pq.ParquetFile(path).metadata.num_rows
    except (ImportError, OSError, ValueError):
        # ImportError: no pyarrow; OSError: remote/odd filesystems;
        # ValueError covers pyarrow's ArrowInvalid on non-parquet bytes.
        # Anything else (a real bug) propagates instead of hiding behind
        # the slow count() fallback.
        return load_table(spark, sf_dir, name).count()


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every corpus table as a temp view; returns the DataFrames."""
    out = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def write_table(
    df: DataFrame,
    path: str,
    *,
    format: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
    sort_by: list[str] | None = None,
    table_name: str | None = None,
    compression: str | None = "zstd",
) -> None:
    """Materialize a DataFrame as an analytics-ready table.

    - ``partition_by``: hive-style directory partitioning — partition
      pruning makes per-key reads O(selected partitions), and writers
      should pick low-cardinality keys (date, source) so file counts stay
      sane at 100 TB.
    - ``bucket_by=(n, cols)``: pre-shuffles into n buckets on the join key
      so later joins/aggs on those columns skip their exchange entirely
      (bucketed scan-join). Requires ``table_name`` (``saveAsTable`` —
      bucketing metadata lives in the catalog).
    - zstd compression default: ~parquet-snappy decode speed at a better
      ratio — 100 TB stored is real money.
    """
    writer = df.write.format(format).mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        writer = writer.bucketBy(n, *cols)
        if sort_by:
            writer = writer.sortBy(*sort_by)
        if not table_name:
            raise ValueError("bucketed writes need table_name (saveAsTable)")
        writer.option("path", path).saveAsTable(table_name)
        return
    writer.save(path)


def read_json_corpus(
    spark: SparkSession,
    paths: str | list[str],
    *,
    schema=None,
    multiline: bool = False,
) -> DataFrame:
    """NDJSON / JSON corpus reader (.gz transparent, splittable when
    uncompressed line-delimited). ``schema=None`` uses Spark's native
    inference (documented parity gaps vs the lattice: integrals→long, no
    byte/short/binary/union); pass ``to_spark_type(infer_schema(...))`` for
    lattice-faithful loading."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.option("multiLine", multiline).json(paths)
