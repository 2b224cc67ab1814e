from hive_json_spark.sources.tables import (  # noqa: F401
    TABLES,
    load_table,
    parquet_schema,
    register_all,
    table_row_count,
)
