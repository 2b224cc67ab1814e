"""Versioned parquet state for foreachBatch sinks.

The r5/r6 generation of these sinks kept ONE live state directory and
overwrote it in place each batch, which forced an awkward choice between
two evils: route the merged state through the driver (``collect`` —
unbounded for high-cardinality keys) or truncate lineage executor-side
(``localCheckpoint`` — non-replicated blocks, so an executor loss after the
overwrite starts deleting the old files destroys the only state copy). It
was also slow: a driver-built LocalTableScan written with ``coalesce(1)``
takes seconds per batch on the local scheduler.

This module replaces in-place overwrite with WRITE-NEW-THEN-PRUNE:

- each applied batch writes the full merged state to ``<base>/v=<batch_id>``;
- the old version dirs are deleted only AFTER the new version's ``_SUCCESS``
  marker exists, so a crash at any point leaves at least one committed
  version on stable storage (the reader picks the highest committed one);
- the merge plan reads the previous version's files, which still exist
  while the new version is being written — no read-then-overwrite race, so
  no collect and no checkpoint of any kind is needed;
- the batch id is carried by the DIRECTORY NAME, which doubles as the
  replay guard (a re-delivered batch's id <= the committed version id).

The layout is hive-partition-shaped (``v=N``), so a plain
``spark.read.parquet(base)`` of the root also works once exactly one
version exists — partition discovery surfaces the version as a ``v``
column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.utils import AnalysisException


def _fs(spark: SparkSession, base: str):
    jvm = spark.sparkContext._jvm
    path = jvm.org.apache.hadoop.fs.Path(base)
    fs = path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return jvm, fs, path


def latest_version(spark: SparkSession, base: str) -> int | None:
    """Highest COMMITTED (``_SUCCESS``-marked) version under ``base``, or
    None. An uncommitted ``v=K`` dir (crash mid-write) is ignored — the
    retry's mode("overwrite") replaces it."""
    jvm, fs, path = _fs(spark, base)
    if not fs.exists(path):
        return None
    best = None
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("v=")):
            continue
        try:
            n = int(name[2:])
        except ValueError:
            continue
        if fs.exists(jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")):
            best = n if best is None else max(best, n)
    return best


def read_version(spark: SparkSession, base: str, version: int) -> DataFrame:
    return spark.read.parquet(f"{base}/v={version}")


def read_state(spark: SparkSession, base: str) -> DataFrame | None:
    """Current committed state, or the pre-protocol flat layout (loose
    ``part-*`` files written by the r5/r6 in-place sinks) as a migration
    path, or None if no state exists. A lingering ``_batch_id`` column
    from the old protocol is dropped — the version dir carries the id
    now."""
    last = latest_version(spark, base)
    if last is not None:
        return read_version(spark, base, last)
    try:
        df = spark.read.parquet(f"{base}/part-*")
    except AnalysisException:
        return None
    return df.drop("_batch_id") if "_batch_id" in df.columns else df


def commit_version(df: DataFrame, base: str, batch_id: int) -> None:
    """Write ``df`` as version ``batch_id`` and prune every other version
    (and any pre-protocol loose file). ``df``'s lineage may freely read
    the previous version — those files outlive the write. Pruning runs
    only after the new version is fully committed, so the worst crash
    leaves an extra stale version, never zero."""
    df.write.mode("overwrite").parquet(f"{base}/v={batch_id}")
    jvm, fs, path = _fs(df.sparkSession, base)
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if name == f"v={batch_id}":
            continue
        if name.startswith("v=") or name.startswith("part-") or name == "_SUCCESS":
            fs.delete(st.getPath(), True)
