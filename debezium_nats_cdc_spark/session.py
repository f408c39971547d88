"""SparkSession factory.

Scale stance: these configs are chosen so the same code runs on local[32]
for tests and on a 1000-executor cluster unchanged — AQE handles runtime
re-planning (partition coalescing, skew joins, broadcast demotion), and
shuffle partition count is the only knob that should differ per deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime SQL confs we need even when the caller (e.g. the driver) owns the
# session.  All of these are settable post-creation via spark.conf.set.
RUNTIME_CONFS: dict[str, str] = {
    # driver testdata events.parquet uses TIMESTAMP(NANOS) which Spark's
    # parquet reader rejects; read as long and convert (io.load_table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # event-time correctness vs the DuckDB oracle (SURVEY.md §4 knobs)
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # TIMESTAMP_MICROS (not the INT96 legacy default): INT96 carries NO
    # parquet min/max statistics, which silently disables the footer-
    # based file skipping the clustered store layout exists for
    # (store.optimize_zorder / sortWithinPartitions row-group pruning)
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    # event store writes: zstd ≙ reference's s2/ClickHouse compression
    # (config/nats/stream.json:15) at much better ratios than snappy.
    "spark.sql.parquet.compression.codec": "zstd",
    # keep event_month='202601' a STRING on read-back (directory partition
    # values would otherwise be inferred as int)
    "spark.sql.sources.partitionColumnTypeInference.enabled": "false",
    # State-store partitions for stateful streaming ops (pinned into each
    # checkpoint at first start), decoupled from batch shuffle parallelism.
    # The HDFS-backed store pays a fixed per-partition commit cost every
    # micro-batch — at 32 partitions that was 14 s per 500k-event batch vs
    # 0.4 s at 8 (measured; see streaming/bench.py).  Default is 4: the
    # r6 interleaved A/B (tools/ab_streaming.py, BENCHLOG) measured
    # median micro-batch P50 1.256 s / P95 1.588 s at 4 vs 1.388/1.645
    # at 8 — the commit tail is pure per-partition overhead at
    # single-node key volumes.  A real cluster sizes this ≈ total cores
    # before the FIRST run against a fresh checkpoint.
    "spark.sql.streaming.internal.stateStore.partitions": os.environ.get(
        "SPARK_GRAFT_STATE_PARTITIONS", "4"
    ),
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply engine-required runtime confs to an externally-owned session.

    Memoized per session object: ``load_table`` calls this on EVERY
    table load (the driver owns the session, so the engine cannot
    assume the confs were ever set), and the ~11 ``conf.set`` py4j
    round trips cost ~10 ms per load — a measurable tax across a
    100-query bench for confs that never change (r16).  Engine code
    that flips a conf mid-session (``_overwrite_mode``) restores it and
    touches keys outside this static set, so a one-shot apply is safe.
    """
    if getattr(spark, "_graft_runtime_confs_applied", False):
        return spark
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in this build — rely on session defaults
    spark._graft_runtime_confs_applied = True
    return spark


def get_session(app_name: str = "debezium-nats-cdc-spark",
                shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) a session tuned for this engine.

    local[N]: one JVM; shuffle partitions default to the core count so tiny
    scale factors don't over-parallelize.  On a real cluster, set
    spark.sql.shuffle.partitions ≈ 2-3× total cores externally; AQE coalesces
    down after each shuffle so over-provisioning is safe.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # ContextCleaner frees localCheckpoint blocks, shuffle files, and
        # terminated queries' state-store providers only after a JVM GC;
        # Spark's periodic-GC default is 30 MINUTES, so a long-lived
        # session accumulates until streaming throughput collapses
        # (measured here: 30k -> 5k events/s over two bench runs; with a
        # 30 s interval the same pipeline holds 75-100k events/s flat).
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "30s"),
        )
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return apply_runtime_confs(spark)
