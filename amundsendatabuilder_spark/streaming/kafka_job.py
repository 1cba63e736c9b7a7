"""Kafka micro-batch ingestion (reference:
extractor/kafka_source_extractor.py:53-169).

The reference polls with total/poll timeouts, deserializes values through a
transformer, disables auto-commit, and commits offsets only in the
publisher's on-success callback (:116-130, publisher/base_publisher.py:35-41)
— i.e. at-least-once with downstream-gated commit.

Structured Streaming gives that contract natively: offsets are written to
the checkpoint only after the sink epoch is durable. ``Trigger.AvailableNow``
is the bounded-drain equivalent of the reference's poll-until-timeout loop.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def read_kafka_stream(spark: SparkSession, *, bootstrap_servers: str,
                      topic: str, value_schema: str,
                      starting_offsets: str = "earliest") -> DataFrame:
    """Kafka topic -> typed DataFrame (value deserialized with from_json —
    the reference's value transformer, kafka_source_extractor.py:147-153)."""
    raw = (spark.readStream.format("kafka")
           .option("kafka.bootstrap.servers", bootstrap_servers)
           .option("subscribe", topic)
           .option("startingOffsets", starting_offsets)
           .load())
    return raw.select(
        F.col("key").cast("string").alias("key"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("v"),
        "topic", "partition", "offset", "timestamp",
    ).select("key", "v.*", "topic", "partition", "offset", "timestamp")


def run_available_now(df: DataFrame, checkpoint_dir: str,
                      sink: Callable[[DataFrame, int], None]) -> StreamingQuery:
    """Drain whatever is available then stop — the reference's
    consumer_total_timeout bounded poll (:63-67,136-169) without the
    hand-rolled offset bookkeeping: the checkpoint commits offsets only
    after ``sink`` returns for the epoch (commit-on-success)."""
    return (df.writeStream
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
