"""Central query registry: every declared operator's query + oracle pair.

``QUERIES[name](spark, sf_dir) -> DataFrame`` and ``ORACLES[name]`` is the
equivalent DuckDB SQL (absent for non-SQL-expressible ops, which the driver
checks rows-only).
"""

from __future__ import annotations

from hive_json_spark import (
    queries_analytics,
    queries_inference,
    queries_quality,
    queries_relational,
    queries_scale,
    queries_streaming,
    queries_training,
)

_MODULES = [
    queries_relational,
    queries_inference,
    queries_analytics,
    queries_training,
    queries_quality,
    queries_scale,
    queries_streaming,
]

try:  # pipeline queries land in a later milestone; registry tolerates absence
    from hive_json_spark import queries_pipeline

    _MODULES.append(queries_pipeline)
except ImportError:
    pass

QUERIES = {}
ORACLES = {}
for _m in _MODULES:
    QUERIES.update(_m.QUERIES)
    ORACLES.update(_m.ORACLES)
