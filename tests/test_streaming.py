"""Streaming operator tests: batch/stream parity and a real micro-batch run
through parquet-source → watermarked window agg → memory sink."""

import pytest
from pyspark.sql import functions as F

from sql_to_ibis_spark.streaming import (
    sessionize,
    stream_from_table,
    tumbling_counts,
)
from sql_to_ibis_spark.streaming.ops import run_stream_to_memory


@pytest.fixture(scope="module")
def events(engine):
    return engine.catalog.get("events").df


def test_tumbling_counts_batch_vs_oracle(events, ddb):
    actual = {(r["window_start"], r["event_type"]): r["n"]
              for r in tumbling_counts(events).collect()}
    expected = ddb.execute("""
        SELECT date_trunc('hour', ts) AS ws, event_type, count(*) AS n
        FROM events GROUP BY 1, 2""").fetchall()
    assert len(actual) == len(expected)
    for ws, et, n in expected:
        assert actual[(ws, et)] == n


def test_tumbling_counts_streaming_equals_batch(spark, events):
    batch = {(r["window_start"], r["event_type"]): r["n"]
             for r in tumbling_counts(events).collect()}
    stream = stream_from_table(spark, events.repartition(4))
    assert stream.isStreaming
    # complete mode: the final trigger emits full aggregation state, which
    # must equal the batch result exactly (replay order is event-time
    # unordered, so append mode would drop late rows by design)
    result = run_stream_to_memory(
        spark, tumbling_counts(stream), "t_tumbling", output_mode="complete")
    got = {(r["window_start"], r["event_type"]): r["n"] for r in result.collect()}
    assert got == batch


def test_sessionize_batch(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0), (1, t0 + dt.timedelta(minutes=5)),          # session 1
        (1, t0 + dt.timedelta(hours=2)),                      # session 2
        (2, t0 + dt.timedelta(minutes=1)),                    # session 1
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = sessionize(df, gap="30 minutes")
    per_user = {(r["user_id"], r["session_id"]): r["n_events"]
                for r in out.collect()}
    assert per_user == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


def test_sessionize_streaming_runs(spark, events):
    stream = stream_from_table(spark, events.limit(200))
    result = run_stream_to_memory(
        spark, sessionize(stream, gap="30 minutes"), "t_sessions",
        output_mode="append")
    # bounded stream + availableNow → emitted sessions are closed ones;
    # the pipeline itself must run and produce the right schema
    assert [f.name for f in result.schema.fields] == \
        ["session_start", "session_end", "user_id", "n_events"]


def test_sliding_counts_overlap(events):
    from sql_to_ibis_spark.streaming import sliding_counts

    out = sliding_counts(events, window_duration="2 hours", slide="1 hour")
    one = out.filter(F.col("event_type") == "click").collect()
    total_in_windows = sum(r["n"] for r in one)
    clicks = events.filter(F.col("event_type") == "click").count()
    # every event is counted in exactly 2 overlapping windows
    assert total_in_windows == 2 * clicks


def test_stateful_dedup_stream(spark, events):
    from sql_to_ibis_spark.streaming import stateful_dedup_stream

    base = events.limit(200).coalesce(1)
    doubled = base.union(base).coalesce(2)
    stream = stream_from_table(spark, doubled)
    result = run_stream_to_memory(
        spark, stateful_dedup_stream(stream), "t_stateful_dedup")
    n_distinct = base.select("event_id").distinct().count()
    # every key emitted exactly once across micro-batches
    assert result.count() == n_distinct
    assert result.select("event_id").distinct().count() == n_distinct


def test_stateful_dedup_batch_fallback(events):
    from sql_to_ibis_spark.streaming import stateful_dedup_stream

    doubled = events.limit(100).union(events.limit(100))
    out = stateful_dedup_stream(doubled)
    assert out.count() == 100


def test_sql_over_streaming_relation(spark, engine, events):
    """The SQL compiler emits only declarative ops, so a query over a
    registered readStream table IS a streaming DataFrame — batch/stream is
    an input property, not a dialect."""
    from sql_to_ibis_spark import SqlEngine

    eng = SqlEngine(spark)
    stream = stream_from_table(spark, events.limit(300).coalesce(2))
    eng.register_temp_table(stream, "live_events")
    sdf = eng.query(
        "SELECT event_type, count(*) AS n FROM live_events GROUP BY event_type")
    assert sdf.isStreaming
    q = (sdf.writeStream.format("memory").queryName("t_sql_stream")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["event_type"]: r["n"]
           for r in spark.table("t_sql_stream").collect()}
    expected = {r["event_type"]: r["n"] for r in events.limit(300).groupBy(
        "event_type").count().withColumnRenamed("count", "n").collect()}
    assert got == expected


def test_engine_explain_helper(engine):
    plan = engine.explain(
        "SELECT l_orderkey FROM lineitem WHERE l_quantity > 40")
    assert "PushedFilters" in plan


# ---- real availableNow replay with a PLANTED LATE EVENT: the late row
# arrives a micro-batch after newer events but within the watermark, so the
# stream must still fold it into its (already-open) window — stream output
# must equal batch output exactly


def _write_ordered_batches(spark, tmpdir, batches, schema_df):
    """Write each batch as its own parquet file with strictly increasing
    mtimes so the file source replays them in order (oldest first)."""
    import os
    import time

    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, schema_df.schema)
        df.coalesce(1).write.mode("append").parquet(tmpdir)
        # force deterministic replay order via mtime
        t = time.time() + i * 10
        for f in os.listdir(tmpdir):
            if f.endswith(".parquet"):
                p = os.path.join(tmpdir, f)
                if os.path.getmtime(p) > t - 5:
                    os.utime(p, (t, t))
    return (spark.readStream.schema(schema_df.schema)
            .option("maxFilesPerTrigger", 1).parquet(tmpdir))


def test_tumbling_availablenow_with_late_event(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(minutes, user=1, etype="click", value=1.0, eid=0):
        return (eid, user, etype, t0 + dt.timedelta(minutes=minutes), value,
                "{}")
    batch_a = [ev(5, eid=1), ev(20, eid=2), ev(70, eid=3)]
    # late event (00:40) arrives AFTER the 02:15 event but within the
    # 2-hour watermark relative to batch A's max (01:10) → must count
    batch_b = [ev(135, eid=4), ev(40, eid=5)]
    # future sentinel pushes the final watermark past every real window so
    # append mode emits them all
    sentinel_min = 36 * 60
    batch_c = [ev(sentinel_min, eid=6)]

    cols = ["event_id", "user_id", "event_type", "ts", "value", "props"]
    all_rows = batch_a + batch_b + batch_c
    batch_df = spark.createDataFrame(all_rows, cols)

    stream = _write_ordered_batches(
        spark, str(tmp_path / "src"), [batch_a, batch_b, batch_c], batch_df)
    result = run_stream_to_memory(
        spark, tumbling_counts(stream), "t_late_tumbling",
        output_mode="append")

    sentinel_ts = t0 + dt.timedelta(minutes=sentinel_min)
    got = {(r["window_start"], r["event_type"]): (r["n"], r["total_value"])
           for r in result.collect()
           if r["window_start"] <= sentinel_ts - dt.timedelta(hours=1)}
    expected = {(r["window_start"], r["event_type"]): (r["n"], r["total_value"])
                for r in tumbling_counts(batch_df).collect()
                if r["window_start"] <= sentinel_ts - dt.timedelta(hours=1)}
    assert got == expected
    # the late event landed in its hour-0 window: 3 events there, not 2
    assert got[(t0, "click")][0] == 3


def test_sessionize_availablenow_with_late_event(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(minutes, user=1, eid=0):
        return (eid, user, "click", t0 + dt.timedelta(minutes=minutes), 1.0,
                "{}")
    # user 1: events at 00:00 and 00:10; a LATE event at 00:25 arrives in
    # batch B (after 03:00) and must EXTEND the same session (gap 30m)
    batch_a = [ev(0, eid=1), ev(10, eid=2), ev(180, user=2, eid=3)]
    batch_b = [ev(25, eid=4)]
    batch_c = [ev(36 * 60, user=9, eid=5)]  # watermark sentinel

    cols = ["event_id", "user_id", "event_type", "ts", "value", "props"]
    batch_df = spark.createDataFrame(batch_a + batch_b + batch_c, cols)

    stream = _write_ordered_batches(
        spark, str(tmp_path / "src"), [batch_a, batch_b, batch_c], batch_df)
    result = run_stream_to_memory(
        spark, sessionize(stream, gap="30 minutes"), "t_late_sessions",
        output_mode="append")

    got = {(r["user_id"], r["session_start"], r["session_end"], r["n_events"])
           for r in result.collect() if r["user_id"] != 9}
    expected = {(r["user_id"], r["session_start"],
                 r["session_end"] + dt.timedelta(minutes=30), r["n_events"])
                for r in sessionize(batch_df, gap="30 minutes").collect()
                if r["user_id"] != 9}
    # session_window's end = last_event + gap; the batch lag-cumsum path
    # reports end = last event ts — align before comparing
    assert got == expected
    # the late 00:25 event extended user 1's first session to 3 events
    assert (1, t0, t0 + dt.timedelta(minutes=55), 3) in got


def test_stream_to_parquet_checkpoint_no_duplicates(spark, events, tmp_path):
    from sql_to_ibis_spark.streaming import stream_to_parquet

    src_rows = events.limit(200)
    stream = stream_from_table(spark, src_rows.repartition(3))
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    q = stream_to_parquet(stream, sink, ckpt, query_name="t_sink")
    q.awaitTermination()
    n1 = spark.read.parquet(sink).count()
    assert n1 == src_rows.count()

    # restart against the SAME checkpoint: all offsets committed → the
    # resumed query must add ZERO duplicate rows (exactly-once file sink)
    q2 = stream_to_parquet(stream, sink, ckpt, query_name="t_sink2")
    q2.awaitTermination()
    assert spark.read.parquet(sink).count() == n1


def test_interval_join_batch_vs_oracle(events, ddb):
    from sql_to_ibis_spark.streaming import interval_join

    purchases = events.filter(F.col("event_type") == "purchase") \
        .select("event_id", "ts", "user_id")
    clicks = events.filter(F.col("event_type") == "click") \
        .select("event_id", "ts", "user_id")
    out = interval_join(purchases, clicks, by="user_id",
                        lower_offset="-30 minutes",
                        upper_offset="0 seconds")
    actual = {(r["event_id"], r["r_event_id"]) for r in out.collect()}
    expected = {(p, c) for p, c in ddb.execute("""
        SELECT p.event_id, c.event_id
        FROM events p JOIN events c
          ON p.event_type = 'purchase' AND c.event_type = 'click'
         AND p.user_id = c.user_id
         AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
    """).fetchall()}
    assert actual == expected


def test_interval_join_streaming_equals_batch(spark, events):
    from sql_to_ibis_spark.streaming import interval_join

    purchases = events.filter(F.col("event_type") == "purchase") \
        .select("event_id", "ts", "user_id")
    clicks = events.filter(F.col("event_type") == "click") \
        .select("event_id", "ts", "user_id")
    batch = {(r["event_id"], r["r_event_id"]) for r in interval_join(
        purchases, clicks, by="user_id",
        lower_offset="-30 minutes", upper_offset="0 seconds").collect()}

    sp = stream_from_table(spark, purchases)
    sc = stream_from_table(spark, clicks)
    result = run_stream_to_memory(
        spark,
        interval_join(sp, sc, by="user_id", lower_offset="-30 minutes",
                      upper_offset="0 seconds", watermark="30 days"),
        "t_interval_join")
    stream = {(r["event_id"], r["r_event_id"]) for r in result.collect()}
    # generous watermark → no row is late during the unordered replay, so
    # the stream must reproduce the batch join exactly
    assert stream == batch


def test_dedup_within_watermark_stream(spark, events):
    from sql_to_ibis_spark.streaming import dedup_within_watermark

    doubled = events.select("event_id", "ts", "user_id").union(
        events.select("event_id", "ts", "user_id"))
    stream = stream_from_table(spark, doubled)
    result = run_stream_to_memory(
        spark, dedup_within_watermark(stream, ["event_id"],
                                      watermark="30 days"),
        "t_dedup_wm")
    ids = [r["event_id"] for r in result.select("event_id").collect()]
    assert len(ids) == len(set(ids)) == events.count()


def test_dedup_within_watermark_batch_fallback(events):
    from sql_to_ibis_spark.streaming import dedup_within_watermark

    doubled = events.select("event_id", "ts").union(
        events.select("event_id", "ts"))
    out = dedup_within_watermark(doubled, ["event_id"])
    assert out.count() == events.count()


def test_ingest_dedup_stream_equals_batch(spark, engine, tmp_path):
    """Streaming ingestion dedup against a frozen index == the batch
    operator replayed over the same rows: survivors are exactly the
    shard docs with no qualifying index candidate, and planted copies
    of frozen docs are dropped."""
    from sql_to_ibis_spark.operators import dedup as _dedup
    from sql_to_ibis_spark.streaming import ingest_dedup_stream

    docs = engine.catalog.get("documents").df.select(
        "doc_id", "text")
    frozen = docs.filter(F.col("doc_id") % 7 != 0)
    shard = docs.filter(F.col("doc_id") % 7 == 0).unionByName(
        # exact copies of frozen docs under fresh ids: guaranteed hits
        frozen.limit(5).select(
            (F.col("doc_id") + F.lit(100000)).alias("doc_id"), "text"))
    index = _dedup.build_minhash_index(frozen).localCheckpoint()

    matched = (_dedup.against_index(shard, index)
               .select("id_a").distinct())
    expected = sorted(r["doc_id"] for r in
                      shard.join(matched,
                                 shard["doc_id"] == matched["id_a"],
                                 "left_anti").collect())
    # the planted copies must actually exercise the drop path
    n_shard = shard.count()
    assert len(expected) <= n_shard - 5

    out = str(tmp_path / "survivors")
    ckpt = str(tmp_path / "ckpt")
    q = ingest_dedup_stream(
        stream_from_table(spark, shard.repartition(3)), index, out, ckpt)
    q.awaitTermination()
    got = sorted(r["doc_id"]
                 for r in spark.read.parquet(out).collect())
    assert got == expected


def test_ingest_dedup_stream_verified_mode(spark, engine, tmp_path):
    """verify_threshold mode drops only exact-Jaccard-verified near-dups:
    survivors equal the batch composition the pipeline_dedup_ingest_filter
    oracle entry pins (candidates -> verify -> anti join)."""
    from sql_to_ibis_spark.operators import dedup as _dedup
    from sql_to_ibis_spark.streaming import ingest_dedup_stream

    docs = engine.catalog.get("documents").df.select("doc_id", "text")
    frozen = docs.filter(F.col("doc_id") % 7 != 0)
    shard = docs.filter(F.col("doc_id") % 7 == 0)
    index = _dedup.build_minhash_index(frozen).localCheckpoint()

    cands = _dedup.against_index(shard, index).select("id_a", "id_b")
    matched = (_dedup.ngram_jaccard_verify(docs, cands, threshold=0.5)
               .select(F.col("id_a").alias("doc_id")).distinct())
    expected = sorted(
        r["doc_id"]
        for r in shard.join(matched, on="doc_id", how="left_anti").collect())

    out = str(tmp_path / "survivors")
    q = ingest_dedup_stream(
        stream_from_table(spark, shard.repartition(2)), index, out,
        str(tmp_path / "ckpt"), verify_threshold=0.5, index_docs=frozen)
    q.awaitTermination()
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == expected


def test_ingest_dedup_stream_verify_needs_texts(spark, engine, tmp_path):
    from sql_to_ibis_spark.streaming import ingest_dedup_stream

    docs = engine.catalog.get("documents").df.select("doc_id", "text")
    with pytest.raises(ValueError, match="index_docs"):
        ingest_dedup_stream(
            stream_from_table(spark, docs), docs.limit(0), str(tmp_path),
            str(tmp_path / "ck"), verify_threshold=0.5)
