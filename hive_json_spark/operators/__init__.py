from hive_json_spark.operators import relational  # noqa: F401
