"""Streaming tests: file-source micro-batches with availableNow triggers,
compared against the equivalent batch computation."""

import json

import pytest

from pyspark.sql import Window, functions as F


def test_streaming_inference_matches_batch(spark, tmp_path):
    from hive_json_spark.infer import infer_files_local
    from hive_json_spark.streaming import infer_schema_streaming
    from hive_json_spark.types import canonicalize

    d = tmp_path / "stream_in"
    d.mkdir()
    docs1 = [{"a": 1, "b": "x"}, {"a": 300, "c": [1, 2]}]
    docs2 = [{"a": 1.5, "b": "2016-01-05T12:34:56Z"}, {"d": {"e": True}}]
    (d / "f1.json").write_text("\n".join(json.dumps(x) for x in docs1))
    (d / "f2.json").write_text("\n".join(json.dumps(x) for x in docs2))

    r = infer_schema_streaming(spark, str(d), checkpoint_dir=str(tmp_path / "ckpt"))
    batch = infer_files_local([str(d / "f1.json"), str(d / "f2.json")])
    assert r.records == 4
    assert str(r.htype) == str(canonicalize(batch.htype))


def test_windowed_event_counts(spark, sf_dir, tmp_path):
    from hive_json_spark.sources import load_table
    from hive_json_spark.streaming import windowed_event_counts

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_parquet")
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = windowed_event_counts(stream, window="1 day", watermark="1 day")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("select * from win_counts").collect()
    }
    expected = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in events.groupBy(
            F.window("ts", "1 day").alias("win"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n", "total_value")
        .collect()
    }
    assert got == expected and len(got) > 0


def test_stateful_user_totals(spark, sf_dir, tmp_path):
    from hive_json_spark.sources import load_table
    from hive_json_spark.streaming import stateful_user_totals

    events = load_table(spark, sf_dir, "events").limit(200)
    src = str(tmp_path / "events_state")
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = stateful_user_totals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last emitted row per user == batch totals
    got_rows = spark.sql(
        "select user_id, max_by(n_events, n_events) n_events,"
        " max_by(total_value, n_events) total_value from user_totals group by user_id"
    ).collect()
    got = {r["user_id"]: (r["n_events"], round(r["total_value"], 3)) for r in got_rows}
    exp_df = (
        spark.read.parquet(src)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
    )
    expected = {r["user_id"]: (r["n"], round(r["t"], 3)) for r in exp_df.collect()}
    assert got == expected and len(got) > 0


def test_continuous_rollup_incremental_matches_batch(spark, sf_dir, tmp_path):
    from hive_json_spark.sources import load_table
    from hive_json_spark.streaming import continuous_rollup

    events = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    src = str(tmp_path / "src")
    # two separate file drops → two micro-batches via maxFilesPerTrigger
    events.filter(F.dayofmonth("ts") <= 15).coalesce(1).write.parquet(src)
    events.filter(F.dayofmonth("ts") > 15).coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "rollup")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = continuous_rollup(stream, "ts", ["user_id"], "value", out, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    expected = (
        events.groupBy(F.col("ts").cast("date").alias("day"), "user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
    )
    g = {(str(r.day), r.user_id): (r.n, round(r.total, 4)) for r in got.collect()}
    e = {(str(r.day), r.user_id): (r.n, round(r.total, 4)) for r in expected.collect()}
    assert g == e


def test_continuous_rollup_backfill_batch(spark, sf_dir, tmp_path):
    """Backfill-shaped batch (ONE micro-batch spanning the whole month):
    (a) with a cap large enough it folds correctly in one pass; (b) with
    a cap smaller than the touched-day count the sink refuses loudly
    instead of materializing an unbounded day list on the driver (the
    r4-escalated collect shape, now limit()-capped in-plan)."""
    import pyspark.sql.utils as U

    from hive_json_spark.sources import load_table
    from hive_json_spark.streaming import continuous_rollup

    events = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    src = str(tmp_path / "src")
    events.coalesce(1).write.parquet(src)  # single drop → single batch
    stream = spark.readStream.schema(events.schema).parquet(src)

    out = str(tmp_path / "rollup")
    q = continuous_rollup(
        stream, "ts", ["user_id"], "value", out, str(tmp_path / "ck1"),
        max_partitions_per_batch=100,
    )
    q.awaitTermination(120)
    expected = events.groupBy(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).agg(F.count("*").alias("n"), F.sum("value").alias("total"))
    got = spark.read.parquet(out)
    g = {(str(r.day), r.user_id): (r.n, round(r.total, 4)) for r in got.collect()}
    e = {(str(r.day), r.user_id): (r.n, round(r.total, 4)) for r in expected.collect()}
    assert g == e

    n_days = expected.select("day").distinct().count()
    assert n_days > 3
    q2 = continuous_rollup(
        stream, "ts", ["user_id"], "value", str(tmp_path / "rollup2"),
        str(tmp_path / "ck2"), max_partitions_per_batch=3,
    )
    try:
        q2.awaitTermination(120)
        raised = False
    except U.StreamingQueryException as exc:
        raised = True
        assert "max_partitions_per_batch" in str(exc)
    assert raised


def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    from hive_json_spark.sources import load_table
    from hive_json_spark.streaming import stream_stream_join

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "ev")
    events.write.parquet(src)

    def views(df):
        clicks = df.filter(F.col("event_type") == "click").select(
            "user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
        )
        buys = df.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("buy_ts"),
            F.col("event_id").alias("buy_id"),
        )
        return clicks, buys

    sc_, sb = views(spark.readStream.schema(events.schema).parquet(src))
    joined = stream_stream_join(sc_, sb, "user_id", "click_ts", "buy_ts", within="30 minutes")
    q = (
        joined.writeStream.format("memory").queryName("ssj")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r.click_id, r.buy_id) for r in spark.table("ssj").collect()}

    bc, bb = views(events)
    batch = bc.join(
        bb,
        (bc.user_id == bb.user_id)
        & (bb.buy_ts >= bc.click_ts)
        & (bb.buy_ts <= bc.click_ts + F.expr("INTERVAL 30 minutes")),
    )
    expected = {(r.click_id, r.buy_id) for r in batch.collect()}
    assert got == expected and len(expected) > 0


def test_streaming_dedup_drops_repeats(spark, tmp_path):
    from hive_json_spark.streaming import streaming_dedup

    src = str(tmp_path / "dd")
    df1 = spark.createDataFrame(
        [("a", "2024-01-01 10:00:00"), ("b", "2024-01-01 10:01:00")], "k string, ts string"
    ).select("k", F.col("ts").cast("timestamp"))
    df1.write.parquet(src)
    # second file repeats 'a' and adds 'c'
    spark.createDataFrame(
        [("a", "2024-01-01 10:05:00"), ("c", "2024-01-01 10:06:00")], "k string, ts string"
    ).select("k", F.col("ts").cast("timestamp")).write.mode("append").parquet(src)

    stream = spark.readStream.schema("k string, ts timestamp").option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    out = streaming_dedup(stream, ["k"], "ts", watermark="1 hour")
    q = (
        out.writeStream.format("memory").queryName("sdd")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.table("sdd").collect()
    assert sorted(r.k for r in rows) == ["a", "b", "c"]  # duplicate 'a' dropped


def test_session_window_counts_match_batch(spark, sf_dir, tmp_path):
    from hive_json_spark.sources import load_table
    from hive_json_spark.streaming import session_window_counts

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_sess")
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = session_window_counts(stream, gap="30 minutes", watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["session_start"], r["session_end"]): (r["n_events"], r["total_value"])
        for r in spark.sql("select * from sess_counts").collect()
    }
    expected = {
        (r["user_id"], r["session_start"], r["session_end"]): (r["n_events"], r["total_value"])
        for r in events.groupBy(
            F.session_window("ts", "30 minutes").alias("sess"), "user_id"
        )
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "total_value",
        )
        .collect()
    }
    assert got == expected and len(got) > 0


def test_streaming_funnel_matches_batch(spark, sf_dir, tmp_path):
    """The per-user funnel state machine must land every user on the same
    final stage as the batch funnel derivation (first signup, first click
    after it, first purchase after that)."""
    from hive_json_spark.sources import load_table
    from hive_json_spark.streaming.infer_stream import streaming_funnel_stages

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_parquet")
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = streaming_funnel_stages(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_stages")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # keep the latest emission per user (one batch here, but be robust)
    got = {
        r.user_id: r.stage
        for r in spark.sql("select * from funnel_stages").collect()
    }

    s = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    s_users = {r.user_id for r in s.collect()}
    c_users = {r.user_id for r in c.collect()}
    p_users = {r.user_id for r in p.collect()}
    all_users = {r.user_id for r in events.select("user_id").distinct().collect()}
    expected = {
        u: (3 if u in p_users else 2 if u in c_users else 1 if u in s_users else 0)
        for u in all_users
    }
    assert got == expected and len(got) > 0


def test_streaming_merge_upsert_matches_batch_fold(spark, sf_dir, tmp_path):
    """Incremental CDC apply == one-shot fold: stream a changelog in two
    micro-batches through streaming_merge_upsert, then replay the same
    changelog as a single batch fold (last-op-per-key wins) and compare
    snapshots. Also pins delete semantics and within-batch seq ordering."""
    from hive_json_spark.sources import load_table
    from hive_json_spark.streaming import streaming_merge_upsert

    orders = load_table(spark, sf_dir, "orders").limit(500)
    # synthesize a deterministic changelog: two "days" of changes; some
    # keys upserted twice (seq decides), some deleted after insert
    chg = orders.select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_orderkey") % 97).alias("seq"),
        F.when(F.col("o_orderkey") % 7 == 0, "D").otherwise("U").alias("op"),
        F.round(F.col("o_totalprice"), 2).alias("price"),
    )
    # second wave revisits a third of the keys with a higher sequence:
    # some overwritten with a new price, some deleted after insert — the
    # cross-batch and within-batch last-op-wins paths both get exercised
    wave2 = chg.filter(F.col("k") % 3 == 0).select(
        "k",
        (F.col("seq") + 1000).alias("seq"),
        F.when(F.col("k") % 5 == 0, "D").otherwise("U").alias("op"),
        F.round(F.col("price") * 2, 2).alias("price"),
    )
    chg = chg.unionByName(wave2)
    src = str(tmp_path / "chg")
    chg.filter(F.col("seq") < 1000).coalesce(1).write.parquet(src)
    wave2.coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "snap")
    stream = (
        spark.readStream.schema(chg.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = streaming_merge_upsert(
        stream, "k", "op", "seq", ["price"], out, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    w = Window.partitionBy("k").orderBy(F.col("seq").desc())
    expected = (
        chg.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") == "U"))
        .select("k", "price")
    )
    got = spark.read.parquet(out).select("k", "price")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))


def test_streaming_psi_matches_batch_psi(spark, sf_dir, tmp_path):
    """Incremental PSI == one-shot PSI: stream the 'current' window in two
    micro-batches against a fixed reference distribution; the final psi
    table must equal the PSI computed in one batch pass over the same
    data (the q_distribution_drift formula)."""
    from hive_json_spark.sources import load_table
    from hive_json_spark.streaming import streaming_psi

    ev = load_table(spark, sf_dir, "events")
    ref = ev.filter(F.dayofmonth("ts") <= 15).select("event_type")
    cur = ev.filter(F.dayofmonth("ts") > 15).select("event_type")

    src = str(tmp_path / "cur")
    cur.filter(F.crc32(F.col("event_type")) % 2 == 0).coalesce(1).write.parquet(src)
    cur.filter(F.crc32(F.col("event_type")) % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    out = str(tmp_path / "drift")
    stream = (
        spark.readStream.schema(cur.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = streaming_psi(stream, "event_type", ref, out, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = {
        r["category"]: (r["p_ref"], r["p_cur"], r["psi_term"])
        for r in spark.read.parquet(f"{out}/psi").collect()
    }

    rc = ref.groupBy("event_type").count().collect()
    cc = cur.groupBy("event_type").count().collect()
    rtot = sum(r["count"] for r in rc)
    ctot = sum(r["count"] for r in cc)
    import math

    expected = {}
    cats = {r["event_type"] for r in rc} | {r["event_type"] for r in cc}
    rmap = {r["event_type"]: r["count"] for r in rc}
    cmap = {r["event_type"]: r["count"] for r in cc}
    for cat in cats:
        pr = rmap.get(cat, 0) / rtot
        pc = cmap.get(cat, 0) / ctot
        term = (
            round((pc - pr) * math.log(pc / pr), 6) if pr > 0 and pc > 0 else None
        )
        expected[cat] = (round(pr, 6) if cat in rmap else None,
                         round(pc, 6) if cat in cmap else None,
                         term)
    assert got == expected


def test_streaming_merge_delete_empties_bucket(spark, tmp_path):
    """Deleting every remaining row of a bucket must truncate that bucket's
    partition: dynamic partition overwrite only rewrites partitions present
    in the written frame, so without explicit truncation the stale files
    survive and deleted rows resurrect on the next read."""
    from hive_json_spark.streaming import streaming_merge_upsert

    n_buckets = 2
    keys = list(range(1, 21))
    kdf = spark.createDataFrame([(k,) for k in keys], "k bigint").withColumn(
        "bucket", F.pmod(F.hash("k"), F.lit(n_buckets))
    )
    by_bucket = {r["k"]: r["bucket"] for r in kdf.collect()}
    doomed = [k for k in keys if by_bucket[k] == 0]
    assert doomed, "need at least one key hashing to bucket 0"

    src = str(tmp_path / "chg")
    spark.createDataFrame(
        [(k, 1, "U", float(k)) for k in keys], "k bigint, seq int, op string, price double"
    ).coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [(k, 2, "D", None) for k in doomed], "k bigint, seq int, op string, price double"
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("k bigint, seq int, op string, price double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = str(tmp_path / "snap")
    q = streaming_merge_upsert(
        stream, "k", "op", "seq", ["price"], out, str(tmp_path / "ckpt"),
        n_buckets=n_buckets,
    )
    q.awaitTermination(120)

    got = sorted(r["k"] for r in spark.read.parquet(out).collect())
    assert got == sorted(k for k in keys if by_bucket[k] != 0)


def test_streaming_psi_replay_is_idempotent(spark, sf_dir, tmp_path):
    """foreachBatch is at-least-once: re-delivering already-applied batches
    (here: a full rerun with a FRESH checkpoint, the lost-offsets crash
    case) must not re-add their counts — the counts table carries the
    applied batch id and skips duplicates."""
    from hive_json_spark.sources import load_table
    from hive_json_spark.streaming import streaming_psi

    ev = load_table(spark, sf_dir, "events")
    ref = ev.filter(F.dayofmonth("ts") <= 15).select("event_type")
    cur = ev.filter(F.dayofmonth("ts") > 15).select("event_type").limit(500)

    src = str(tmp_path / "cur")
    cur.coalesce(1).write.parquet(src)
    out = str(tmp_path / "drift")

    def run(ckpt):
        stream = spark.readStream.schema(cur.schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(src)
        q = streaming_psi(stream, "event_type", ref, out, str(tmp_path / ckpt))
        q.awaitTermination(120)

    run("ckpt1")
    first = sorted(
        (r["category"], r["n"]) for r in spark.read.parquet(f"{out}/counts").collect()
    )
    run("ckpt2")  # same data re-delivered as the same batch ids
    second = sorted(
        (r["category"], r["n"]) for r in spark.read.parquet(f"{out}/counts").collect()
    )
    assert first == second


def test_streaming_psi_integer_categories(spark, sf_dir, tmp_path):
    """category_col need not be a string: the counts write derives its
    schema from the frame instead of hardcoding 'category string'."""
    from hive_json_spark.sources import load_table
    from hive_json_spark.streaming import streaming_psi

    ev = load_table(spark, sf_dir, "events").withColumn(
        "code", (F.col("user_id") % 3).cast("int")
    )
    ref = ev.filter(F.dayofmonth("ts") <= 15).select("code")
    cur = ev.filter(F.dayofmonth("ts") > 15).select("code").limit(300)

    src = str(tmp_path / "cur")
    cur.coalesce(1).write.parquet(src)
    out = str(tmp_path / "drift")
    stream = spark.readStream.schema(cur.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = streaming_psi(stream, "code", ref, out, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    counts = spark.read.parquet(f"{out}/counts")
    assert dict(counts.dtypes)["category"] == "int"
    got = {r["category"]: r["n"] for r in counts.collect()}
    expected = {r["code"]: r["count"] for r in cur.groupBy("code").count().collect()}
    assert got == expected


def test_continuous_rollup_replay_is_idempotent(spark, sf_dir, tmp_path):
    """foreachBatch is at-least-once: re-running the same source with a
    FRESH checkpoint (the lost-offsets crash case) re-delivers the same
    batch ids — the rollup's partition-carried _batch_id must make the
    re-adds no-ops, not double the counts."""
    from hive_json_spark.sources import load_table
    from hive_json_spark.streaming import continuous_rollup

    events = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    src = str(tmp_path / "src")
    events.filter(F.dayofmonth("ts") <= 15).coalesce(1).write.parquet(src)
    events.filter(F.dayofmonth("ts") > 15).coalesce(1).write.mode("append").parquet(src)
    out = str(tmp_path / "rollup")

    def run(ckpt):
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = continuous_rollup(stream, "ts", ["user_id"], "value", out, str(tmp_path / ckpt))
        q.awaitTermination(120)

    run("ckpt1")
    first = sorted(
        (str(r.day), r.user_id, r.n, round(r.total, 4))
        for r in spark.read.parquet(out).collect()
    )
    import glob

    files_before = sorted(glob.glob(f"{out}/day=*/part-*"))
    run("ckpt2")  # same batches re-delivered with the same ids
    second = sorted(
        (str(r.day), r.user_id, r.n, round(r.total, 4))
        for r in spark.read.parquet(out).collect()
    )
    assert first == second
    # already-applied days must not be rewritten on replay: dynamic
    # overwrite's delete-then-replace is non-atomic, so re-exposing a
    # committed day to it risks destroying the day on a crash. A rewrite
    # would mint fresh part-file UUIDs — identical listings prove the
    # replay never touched the committed partitions.
    files_after = sorted(glob.glob(f"{out}/day=*/part-*"))
    assert files_before == files_after


def test_streaming_topk_matches_batch_and_replay(spark, sf_dir, tmp_path):
    """Incremental top-k over two micro-batches must equal the batch
    top-k over all data; a full re-delivery (fresh checkpoint) must not
    change it."""
    from hive_json_spark.sources import load_table
    from hive_json_spark.streaming import streaming_topk

    events = load_table(spark, sf_dir, "events").select("user_id", "ts")
    src = str(tmp_path / "src")
    events.filter(F.dayofmonth("ts") <= 15).coalesce(1).write.parquet(src)
    events.filter(F.dayofmonth("ts") > 15).coalesce(1).write.mode("append").parquet(src)
    out = str(tmp_path / "topk")

    def run(ckpt):
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = streaming_topk(stream, "user_id", out, str(tmp_path / ckpt), k=5)
        q.awaitTermination(120)

    run("ckpt1")
    got = [(r.key, r.n) for r in spark.read.parquet(f"{out}/topk")
           .orderBy(F.col("n").desc(), F.col("key").asc()).collect()]
    expected = [
        (r.key, r.n)
        for r in events.groupBy(F.col("user_id").alias("key"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("key").asc())
        .limit(5)
        .collect()
    ]
    assert got == expected

    run("ckpt2")  # replay with same batch ids
    again = [(r.key, r.n) for r in spark.read.parquet(f"{out}/topk")
             .orderBy(F.col("n").desc(), F.col("key").asc()).collect()]
    assert again == expected


def test_streaming_topk_high_cardinality_key(spark, tmp_path):
    """Top-k over a near-unique key: the per-key state is as large as the
    stream itself, so the state maintenance must stay distributed (the
    merged counts are localCheckpointed, never collected to the driver).
    20k distinct keys across two batches; counts table must hold every
    key, top-k must pick the planted heavy keys."""
    from hive_json_spark.streaming import streaming_topk

    # batch 1: keys 0..9999 once each; batch 2: keys 10000..19999 once
    # each, plus key 42 ten more times (the planted heavy hitter).
    b1 = spark.range(0, 10_000).select(F.col("id").alias("k"))
    b2 = spark.range(10_000, 20_000).select(F.col("id").alias("k")).unionAll(
        spark.range(10).select(F.lit(42).alias("k"))
    )
    src = str(tmp_path / "src")
    b1.coalesce(1).write.parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "topk")
    stream = (
        spark.readStream.schema("k bigint")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = streaming_topk(stream, "k", out, str(tmp_path / "ckpt"), k=3)
    q.awaitTermination(120)

    counts = spark.read.parquet(f"{out}/counts")
    assert counts.count() == 20_000  # full key cardinality retained
    top = [(r.key, r.n) for r in spark.read.parquet(f"{out}/topk")
           .orderBy(F.col("n").desc(), F.col("key").asc()).collect()]
    assert top[0] == (42, 11)
    assert [n for _, n in top[1:]] == [1, 1]


def test_streaming_psi_migrates_pre_protocol_state(spark, sf_dir, tmp_path):
    """A counts table written before the batch-id protocol (no _batch_id
    column) must be treated as valid accumulated state, not reset."""
    from hive_json_spark.sources import load_table
    from hive_json_spark.streaming import streaming_psi

    ev = load_table(spark, sf_dir, "events")
    ref = ev.filter(F.dayofmonth("ts") <= 15).select("event_type")
    cur = ev.filter(F.dayofmonth("ts") > 15).select("event_type").limit(300)

    out = str(tmp_path / "drift")
    legacy = spark.createDataFrame([("click", 1000)], "category string, n bigint")
    legacy.coalesce(1).write.parquet(f"{out}/counts")

    src = str(tmp_path / "cur")
    cur.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(cur.schema).parquet(src)
    q = streaming_psi(stream, "event_type", ref, out, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = {r["category"]: r["n"] for r in spark.read.parquet(f"{out}/counts").collect()}
    batch_clicks = cur.filter(F.col("event_type") == "click").count()
    assert got["click"] == 1000 + batch_clicks  # accumulated, not reset


def test_streaming_cms_matches_batch_sketch_and_replay(spark, sf_dir, tmp_path):
    """The streamed CMS cell table over two micro-batches must equal the
    batch count_min_sketch over all data cell-for-cell (mergeability is
    the whole point), and a full re-delivery (fresh checkpoint, same
    batch ids) must not double-count."""
    from hive_json_spark.operators.sketch import count_min_sketch
    from hive_json_spark.sources import load_table
    from hive_json_spark.streaming import streaming_cms

    events = load_table(spark, sf_dir, "events").select("user_id", "ts")
    src = str(tmp_path / "src")
    events.filter(F.dayofmonth("ts") <= 15).coalesce(1).write.parquet(src)
    events.filter(F.dayofmonth("ts") > 15).coalesce(1).write.mode("append").parquet(src)
    out = str(tmp_path / "cms")

    def run(ckpt):
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = streaming_cms(stream, "user_id", out, str(tmp_path / ckpt), depth=4, width=64)
        q.awaitTermination(120)

    expected = sorted(
        (r.j, r.bucket, r.n)
        for r in count_min_sketch(events, "user_id", depth=4, width=64).collect()
    )

    run("ckpt1")
    got = sorted(
        (r.j, r.bucket, r.n)
        for r in spark.read.parquet(out).select("j", "bucket", "n").collect()
    )
    assert got == expected

    run("ckpt2")  # replay with same batch ids must be a no-op
    again = sorted(
        (r.j, r.bucket, r.n)
        for r in spark.read.parquet(out).select("j", "bucket", "n").collect()
    )
    assert again == expected


def test_streaming_near_dup_gate_matches_batch(spark, sf_dir, tmp_path):
    """The stream-static near-dup gate must flag exactly the pairs the
    BATCH LSH+verify pipeline finds between the same two frames: stream
    docs near-duplicating the static corpus get (stream_id, corpus_id,
    jaccard) rows; novel docs pass silently."""
    from hive_json_spark.operators.dedup import banded_minhash
    from hive_json_spark.sources import load_table
    from hive_json_spark.streaming import streaming_near_dup_flags

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)      # historical half
    incoming = docs.filter(F.col("doc_id") % 2 == 1)    # arriving half
    src = str(tmp_path / "incoming")
    incoming.write.parquet(src)

    stream = spark.readStream.schema(incoming.schema).parquet(src)
    out = streaming_near_dup_flags(stream, corpus, threshold=0.5)
    q = (
        out.writeStream.format("memory").queryName("ndg")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {
        (r.stream_id, r.corpus_id): r.jaccard
        for r in spark.table("ndg").collect()
    }

    # batch twin: identical banding on both frames, candidates by band
    # collision, exact Jaccard verify
    bi = banded_minhash(corpus, "doc_id", "text").select(
        F.col("doc_id").alias("corpus_id"), "band", "band_hash"
    )
    bs = banded_minhash(incoming, "doc_id", "text").select(
        F.col("doc_id").alias("stream_id"), "band", "band_hash"
    )
    cand = bs.join(bi, ["band", "band_hash"]).dropDuplicates(
        ["stream_id", "corpus_id"]
    )
    st = incoming.select(F.col("doc_id").alias("stream_id"), F.col("text").alias("_s"))
    ct = corpus.select(F.col("doc_id").alias("corpus_id"), F.col("text").alias("_c"))
    from hive_json_spark.functions.text import tokens

    ta = F.array_distinct(tokens(F.col("_s")))
    tb = F.array_distinct(tokens(F.col("_c")))
    jac = F.round(
        F.size(F.array_intersect(ta, tb)).cast("double")
        / F.greatest(F.size(F.array_union(ta, tb)).cast("double"), F.lit(1.0)),
        4,
    )
    expected = {
        (r.stream_id, r.corpus_id): r.jaccard
        for r in cand.join(st, "stream_id").join(ct, "corpus_id")
        .withColumn("jaccard", jac).filter(F.col("jaccard") >= 0.5)
        .select("stream_id", "corpus_id", "jaccard").collect()
    }
    assert got == expected and len(got) > 0


def test_streaming_near_dup_gate_token_semantics(spark, tmp_path):
    """Leading whitespace must not mint an empty-string 'token': the gate
    tokenizes with functions.text.tokens (empty strings filtered), so a
    stream doc that differs from a corpus doc only by leading whitespace
    scores jaccard 1.0 — raw split(text, '\\s+') would score 0.75."""
    from hive_json_spark.streaming import streaming_near_dup_flags

    corpus = spark.createDataFrame(
        [(0, "spark scan filter join agg sort")], "doc_id bigint, text string"
    )
    incoming = spark.createDataFrame(
        [(1, "   spark scan filter join agg sort")], "doc_id bigint, text string"
    )
    src = str(tmp_path / "incoming_tok")
    incoming.write.parquet(src)
    stream = spark.readStream.schema(incoming.schema).parquet(src)
    out = streaming_near_dup_flags(stream, corpus, threshold=0.5)
    q = (
        out.writeStream.format("memory").queryName("ndg_tok")
        .option("checkpointLocation", str(tmp_path / "ck_tok"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    rows = spark.table("ndg_tok").collect()
    assert [(r.stream_id, r.corpus_id, r.jaccard) for r in rows] == [(1, 0, 1.0)]


def test_streaming_near_dup_gate_watermarked_state(spark, sf_dir, tmp_path):
    """With an event-time column the gate's candidate dedup must run as
    dropDuplicatesWithinWatermark (bounded state) and flag the same
    pairs as the unwatermarked run on a bounded replay."""
    from hive_json_spark.sources import load_table
    from hive_json_spark.streaming import streaming_near_dup_flags

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "ts", F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    )
    corpus = docs.filter(F.col("doc_id") % 2 == 0).drop("ts")
    incoming = docs.filter(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "incoming_wm")
    incoming.write.parquet(src)

    stream = spark.readStream.schema(incoming.schema).parquet(src)
    out = streaming_near_dup_flags(
        stream, corpus, threshold=0.5, ts_col="ts", watermark="10 minutes"
    )
    q = (
        out.writeStream.format("memory").queryName("ndg_wm")
        .option("checkpointLocation", str(tmp_path / "ck_wm"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {
        (r.stream_id, r.corpus_id) for r in spark.table("ndg_wm").collect()
    }

    out2 = streaming_near_dup_flags(
        spark.readStream.schema(incoming.schema).parquet(src).drop("ts"),
        corpus,
        threshold=0.5,
    )
    q2 = (
        out2.writeStream.format("memory").queryName("ndg_nowm")
        .option("checkpointLocation", str(tmp_path / "ck_nowm"))
        .trigger(availableNow=True).start()
    )
    q2.awaitTermination(180)
    expected = {
        (r.stream_id, r.corpus_id) for r in spark.table("ndg_nowm").collect()
    }
    assert got == expected and len(got) > 0


def test_session_windows_under_rocksdb_state_store(spark, sf_dir, tmp_path):
    """The 100 TB state-store escape hatch, pinned: the r8 state census
    measured the DEFAULT (HDFS-backed) provider holding ~160 MB of
    session state in executor HEAP at sf1 — heap-resident state is the
    OOM hazard at real stream volumes. Spark ships the RocksDB provider
    (native memory + local disk, same API) for exactly this; the session
    operator must produce identical results under it, so switching
    providers is a pure config decision (documented in SCALE.md's
    streaming section), never a semantics change."""
    from hive_json_spark.sources import load_table
    from hive_json_spark.streaming import session_window_counts

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_rocks")
    events.write.parquet(src)

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(events.schema).parquet(src)
        out = session_window_counts(stream, gap="30 minutes", watermark="1 hour")
        q = (
            out.writeStream.format("memory")
            .queryName("sess_rocksdb")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # the engine must actually have used RocksDB state stores
        import json as _json

        progresses = [_json.loads(p.json) for p in q.recentProgress]
        providers = {
            op.get("customMetrics") is not None and "rocksdb" in str(op).lower()
            for d in progresses
            for op in d.get("stateOperators", [])
        }
        assert True in providers, "no RocksDB state-operator metrics in progress"
        got = {
            (r["user_id"], r["session_start"], r["session_end"]): (
                r["n_events"],
                r["total_value"],
            )
            for r in spark.sql("select * from sess_rocksdb").collect()
        }
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        spark.catalog.dropTempView("sess_rocksdb")
    expected = {
        (r["user_id"], r["session_start"], r["session_end"]): (
            r["n_events"],
            r["total_value"],
        )
        for r in events.groupBy(
            F.session_window("ts", "30 minutes").alias("sess"), "user_id"
        )
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "total_value",
        )
        .collect()
    }
    assert got == expected and len(got) > 0
