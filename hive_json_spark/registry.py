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

def _scoped(fn):
    """Release the PREVIOUS query's scoped persists when the next graded
    query starts (functions/caching.py lifecycle): every harness that
    consumes this registry materializes each result before invoking the
    next entry, so release-on-next-entry bounds resident caches to one
    query's worth without the producer ever blocking on its caller."""
    import functools

    from hive_json_spark.functions.caching import release_scoped

    @functools.wraps(fn)
    def wrapped(spark, sf_dir):
        release_scoped()
        return fn(spark, sf_dir)

    return wrapped


QUERIES = {}
ORACLES = {}
for _m in _MODULES:
    QUERIES.update({_n: _scoped(_f) for _n, _f in _m.QUERIES.items()})
    ORACLES.update(_m.ORACLES)
