"""Change-data source (SURVEY.md §2.A1/A2/A9).

The engine's CDC source is a Debezium-JSON event log read either as a
batch DataFrame or a Structured Stream.  A directory of JSON-lines files
stands in for the broker (file source ≙ Kafka/NATS source — swap
``format("json")`` for ``format("kafka")`` + the same ``from_json`` parse;
nothing downstream changes).  Offset persistence = Structured Streaming
checkpointing (reference: Debezium offset file,
config/debezium/application.properties:5-6).

Scale note: one directory per source table keeps per-table schemas typed
end-to-end (no runtime schema sniffing), and lets the scheduler scale
file listing per table.  maxFilesPerTrigger bounds micro-batch size
(reference "Batch Processing" backpressure knob, docs/design.md:898).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schemas import ENVELOPE_SCHEMAS
from .fixtures import DB, TOPIC_PREFIX


def _with_subject_and_time(df: DataFrame) -> DataFrame:
    """Derive the NATS-style subject + event-time columns (A4, G3)."""
    return (
        df.withColumn(
            "subject",
            F.concat_ws(
                ".",
                F.lit(TOPIC_PREFIX),
                F.col("payload.source.db"),
                F.col("payload.source.table"),
            ),
        )
        .withColumn("ts_ms", F.col("payload.ts_ms"))
        .withColumn("event_time", F.timestamp_millis(F.col("payload.ts_ms")))
    )


def read_change_log(spark: SparkSession, path: str, table: str) -> DataFrame:
    """Batch read of a Debezium-JSON event log for one table."""
    df = spark.read.schema(ENVELOPE_SCHEMAS[table]).json(path)
    return _with_subject_and_time(df.filter(F.col("payload.source.table") == table))


def read_change_stream(
    spark: SparkSession,
    path: str,
    table: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming read of the same log (readStream; checkpoint at the sink)."""
    reader = spark.readStream.schema(ENVELOPE_SCHEMAS[table])
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.json(path)
    return _with_subject_and_time(df.filter(F.col("payload.source.table") == table))
