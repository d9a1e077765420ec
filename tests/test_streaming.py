"""Streaming tests: batch/stream equivalence for windowed aggregation and
the applyInPandasWithState sessionizer, driven with a real file-source
stream + availableNow trigger (drains the events parquet exactly once)."""

import tempfile

import pytest
from pyspark.sql import functions as F

from g4s_spark.sources import load_table
from g4s_spark.streaming import (
    read_events_stream,
    session_counts,
    sessionize,
    sessionize_stream,
    windowed_counts,
    windowed_counts_stream,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF, "events").cache()


def test_windowed_counts_batch(events):
    out = windowed_counts(events)
    total = out.agg(F.sum("n")).collect()[0][0]
    assert total == events.count()


def test_stream_batch_equivalence(spark, events):
    stream = read_events_stream(spark, SF)
    agg = windowed_counts_stream(stream)
    with tempfile.TemporaryDirectory() as d:
        q = (
            agg.writeStream.format("memory")
            .queryName("win_agg")
            .outputMode("complete")
            .option("checkpointLocation", d)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in spark.sql("SELECT * FROM win_agg").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in windowed_counts(events).collect()
    }
    assert got == want


def test_sessionize_batch_consistency(events):
    sess = sessionize(events)
    per_user = session_counts(events)
    # every event lands in exactly one session
    assert sess.agg(F.sum("n_events")).collect()[0][0] == events.count()
    # session ids are 1..n per user
    mx = sess.groupBy("user_id").agg(F.max("session_id").alias("m"), F.count(F.lit(1)).alias("c"))
    assert mx.filter(F.col("m") != F.col("c")).count() == 0
    assert per_user.agg(F.sum("n_events")).collect()[0][0] == events.count()


def test_sessionize_stream_state(spark, events):
    """applyInPandasWithState: with availableNow all data arrives in one
    batch; closed sessions (all but each user's last) are emitted."""
    stream = read_events_stream(spark, SF)
    sess = sessionize_stream(stream)
    with tempfile.TemporaryDirectory() as d:
        q = (
            sess.writeStream.format("memory")
            .queryName("sess_stream")
            .outputMode("append")
            .option("checkpointLocation", d)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    got = spark.sql("SELECT * FROM sess_stream").collect()
    batch = sessionize(events).collect()
    batch_keys = {(r.user_id, r.session_id, r.n_events) for r in batch}
    # streamed closed sessions must be a subset of batch sessions, one
    # open session per user withheld in state
    assert len(got) > 0
    for r in got:
        assert (r.user_id, r.session_id, r.n_events) in batch_keys
    users = {r.user_id for r in got}
    per_user_batch = {}
    for r in batch:
        per_user_batch[r.user_id] = per_user_batch.get(r.user_id, 0) + 1
    per_user_stream = {}
    for r in got:
        per_user_stream[r.user_id] = per_user_stream.get(r.user_id, 0) + 1
    for u in users:
        assert per_user_stream[u] == per_user_batch[u] - 1  # last session still open
