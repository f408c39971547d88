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
from .fixtures import DB, TOPIC_PREFIX, subject_for


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


# ------------------------------------------------- broker-record source --

# The exact column set Spark's Kafka source yields (and the shape the
# reference's Debezium server publishes to NATS: per-table topic, record
# key = serialized PK, record value = the JSON envelope —
# config/debezium/application.properties:20-27).  A directory of parquet
# files with this schema is the container stand-in for the broker; against
# a real deployment only the reader line changes:
#   spark.readStream.format("kafka")
#        .option("subscribe", subject_for(table)).load()
# and parse_broker_records consumes it unchanged.
BROKER_RECORD_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp, timestampType int"
)


def parse_broker_records(records: DataFrame, table: str) -> DataFrame:
    """Kafka-record rows -> typed change envelopes for one table.

    Dispatch is broker-native: filter on the per-table TOPIC first (the
    reference's one-topic-per-table routing) so other tables' records are
    dropped on a cheap string equality BEFORE any JSON parsing, then
    deserialize the value bytes against the table's envelope schema.
    """
    env = (
        records.filter(F.col("topic") == subject_for(table))
        .select(
            F.from_json(
                F.col("value").cast("string"), ENVELOPE_SCHEMAS[table]
            ).alias("e")
        )
        .select("e.*")
    )
    return _with_subject_and_time(env)


def read_broker_log(spark: SparkSession, path: str, table: str) -> DataFrame:
    """Batch read of a broker-record directory for one table."""
    return parse_broker_records(
        spark.read.schema(BROKER_RECORD_SCHEMA).parquet(path), table
    )


def read_broker_stream(
    spark: SparkSession,
    path: str,
    table: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming read of a broker-record directory (A1 adapter path)."""
    reader = spark.readStream.schema(BROKER_RECORD_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return parse_broker_records(reader.parquet(path), table)
