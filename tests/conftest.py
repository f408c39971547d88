from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    from debezium_nats_cdc_spark.session import get_session

    s = get_session("tests", shuffle_partitions=4)
    yield s


@pytest.fixture()
def tmp_root(tmp_path):
    return str(tmp_path)


def load_envelopes(spark, events, table):
    """Events (python dicts) -> typed envelope DataFrame via the JSON path
    (same parse as production readStream)."""
    import json

    from debezium_nats_cdc_spark.schemas import ENVELOPE_SCHEMAS
    from debezium_nats_cdc_spark.sources.cdc import _with_subject_and_time
    from pyspark.sql import functions as F

    raw = spark.createDataFrame(
        [(json.dumps(e),) for e in events], "value string"
    )
    parsed = raw.select(
        F.from_json("value", ENVELOPE_SCHEMAS[table]).alias("env")
    ).select("env.*")
    return _with_subject_and_time(
        parsed.filter(F.col("payload.source.table") == table)
    )
