"""Streaming windowed aggregation: stream (watermark + availableNow)
must equal the batch window aggregation over the same events."""

from pyspark.sql import functions as F

from html_to_document_spark.streaming.windows import windowed_event_counts

SF_DIR = "/root/testdata/sf0.001"


def test_stream_window_matches_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    batch = windowed_event_counts(events)

    # file-stream sources require a directory
    in_dir = str(tmp_path / "events")
    events.write.parquet(in_dir)
    stream = spark.readStream.schema(events.schema).parquet(in_dir)
    out = windowed_event_counts(stream, streaming=True)
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # streaming path casts ts to TIMESTAMP (session tz) for the
    # watermark; normalize window_start to naive for comparison
    def key(r):
        ws = r.window_start.replace(tzinfo=None)
        return (ws, r.event_type)

    got = {
        key(r): (r.n_events, round(r.sum_value, 6))
        for r in spark.sql("select * from win_counts").collect()
    }
    want = {
        key(r): (r.n_events, round(r.sum_value, 6))
        for r in batch.collect()
    }
    assert got == want
    assert len(want) > 10
