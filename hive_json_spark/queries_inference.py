"""Schema-inference + shredding as graded queries: the reference's own
surface (pickType/mergeType/shred) exercised end-to-end on the events
table's JSON column, each with a data-driven DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hive_json_spark.infer import infer_schema_by_group, infer_schema_of_column
from hive_json_spark.shred import shred_column
from hive_json_spark.sources import load_table
from hive_json_spark.types import NullT, to_spark_type

QUERIES = {}
ORACLES = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The oracle re-derives the numeric-sizing lattice for the single-key
# ``{"k": int}`` corpus: byte/short/int/long thresholds off the value range
# (JsonSchemaFinder.java:67-78) — so both engines *compute* the schema.
@query(
    "q_infer_props_schema",
    """
    SELECT 'struct<k:' || CASE
             WHEN min_k >= -128 AND max_k < 128 THEN 'tinyint'
             WHEN min_k >= -32768 AND max_k < 32768 THEN 'smallint'
             WHEN min_k >= -2147483648 AND max_k < 2147483648 THEN 'int'
             ELSE 'bigint' END || '>' AS hive_type,
           CAST(n AS BIGINT) AS records
    FROM (SELECT MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
                 MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
                 COUNT(*) AS n
          FROM events WHERE props IS NOT NULL)
    """,
)
def q_infer_props_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    result = infer_schema_of_column(events, "props")
    # literal projection over range(1) stays a JVM LocalTableScan;
    # createDataFrame([...]) would detour through the Python-RDD pickle path
    return spark.range(1).select(
        F.lit(str(result.htype)).alias("hive_type"),
        F.lit(result.records).cast("bigint").alias("records"),
    )


@query(
    "q_from_json_agg",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events WHERE props IS NOT NULL
    GROUP BY event_type
    """,
)
def q_from_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The minimum end-to-end slice (SURVEY §7.0): infer the JSON column's
    schema with our lattice, load it with from_json, aggregate on the
    extracted field — inference → load → query in one plan."""
    events = load_table(spark, sf_dir, "events")
    htype = infer_schema_of_column(events, "props").htype
    if htype is None or isinstance(htype, NullT):
        # void schema (zero documents, or only JSON nulls): from_json
        # rejects VOID, and there is no field k — aggregate with a null
        # sum_k so the all-nulls corpus still reports its group counts
        return (
            events.filter(F.col("props").isNotNull())
            .groupBy("event_type")
            .agg(
                F.lit(None).cast("bigint").alias("sum_k"),
                F.count("*").alias("n"),
            )
        )
    schema = to_spark_type(htype)
    return (
        events.filter(F.col("props").isNotNull())
        .withColumn("parsed", F.from_json("props", schema))
        .groupBy("event_type")
        .agg(
            F.sum(F.col("parsed.k").cast("bigint")).alias("sum_k"),
            F.count("*").alias("n"),
        )
    )


@query(
    "q_shred_props",
    """
    SELECT 'root.' || k AS path,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           MIN(json_extract_string(props, '$.' || k)) AS min_value,
           MAX(json_extract_string(props, '$.' || k)) AS max_value
    FROM (SELECT props, UNNEST(json_keys(props)) AS k
          FROM events WHERE props IS NOT NULL)
    GROUP BY path
    """,
)
def q_shred_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed shred (JsonShredder semantics) summarized per leaf path;
    min/max compare the *lexical* value strings, same as the shred files."""
    events = load_table(spark, sf_dir, "events")
    shredded = shred_column(events, "props")
    return shredded.groupBy("path").agg(
        F.count("*").alias("n_values"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@query(
    "q_infer_schema_by_group",
    """
    SELECT event_type,
           'struct<k:' || CASE
             WHEN min_k >= -128 AND max_k < 128 THEN 'tinyint'
             WHEN min_k >= -32768 AND max_k < 32768 THEN 'smallint'
             WHEN min_k >= -2147483648 AND max_k < 2147483648 THEN 'int'
             ELSE 'bigint' END || '>' AS hive_type,
           CAST(n AS BIGINT) AS records
    FROM (SELECT event_type,
                 MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
                 MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
                 COUNT(*) AS n
          FROM events WHERE props IS NOT NULL
          GROUP BY event_type)
    """,
)
def q_infer_schema_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type schema inference — the lattice fold as a grouped
    aggregate (`infer.infer_schema_by_group`, two-level partial+final; see
    its docstring for the scale shape). The oracle re-derives the numeric
    sizing rules per group from the raw JSON, so the lattice's value-range
    typing (`JsonSchemaFinder.java:67-85`) is checked group-by-group."""
    events = load_table(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    out = infer_schema_by_group(events, "event_type", "props")
    return out.select("event_type", "hive_type", "records")
