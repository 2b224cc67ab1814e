from hive_json_spark.streaming.infer_stream import (  # noqa: F401
    infer_schema_streaming,
    session_window_counts,
    windowed_event_counts,
    stateful_user_totals,
    stream_stream_join,
    streaming_dedup,
)
from hive_json_spark.streaming.rollup import continuous_rollup  # noqa: F401
from hive_json_spark.streaming.merge import streaming_merge_upsert  # noqa: F401
from hive_json_spark.streaming.drift import streaming_psi  # noqa: F401
from hive_json_spark.streaming.topk import streaming_topk  # noqa: F401
from hive_json_spark.streaming.cms import streaming_cms  # noqa: F401
from hive_json_spark.streaming.neardup import streaming_near_dup_flags  # noqa: F401
