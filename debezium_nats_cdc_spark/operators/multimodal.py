"""Multimodal column plumbing (SURVEY.md §2.K4 — driver mandate).

Pattern: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct alongside.  The Spark-side plumbing — schema,
partition-friendly layout, Arrow-batched UDF signature — is real and
tested; the actual media decode is stubbed (codec libs are not in this
container) behind a clearly-marked deterministic fake.

The container has no testdata with real binary media, so the catalog
entry manufactures the binary column from ``documents.text`` (UTF-8
encode) — which exercises exactly the same engine surface: binary
ingestion, length/digest metadata, batched Python feature extraction.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..catalog import register
from ..io import load_table

# typed metadata carried next to every media payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("digest", T.StringType(), False),
    ]
)


def decode_media(payload: bytes, modality: str) -> dict:
    """Decode a media payload into features.

    STUB — real decoders (PIL/ffmpeg/soundfile) are not in this container.
    Deterministic fake: derives pseudo-features from the byte content so
    the distributed plumbing (batching, schema, partitioning) is fully
    exercised and reproducible.  Swap the body for a real decoder on a
    cluster with codec libraries installed.
    """
    if modality not in ("text", "image", "audio", "video"):
        raise NotImplementedError(f"unknown modality: {modality}")
    n = len(payload)
    checksum = sum(payload[:256]) if n else 0
    return {"frames": n // 1024 + 1, "mean_intensity": float(checksum % 256)}


@register(
    "mm_binary_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           md5(text) AS digest,
           'text' AS modality
    FROM documents
    """,
    survey_ids=["K4"],
    doc="Binary-column metadata extraction: payload length + content "
        "digest + modality tag — the typed-metadata half of the "
        "multimodal column pattern, all JVM-side.",
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.md5("text").alias("digest"),
        F.lit("text").alias("modality"),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("frames", T.LongType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


@register(
    "mm_feature_extract",
    oracle=None,  # Python decode stage: rows-only check
    survey_ids=["K4"],
    doc="Arrow-batched feature extraction over binary payloads via "
        "mapInPandas: the decode stage runs per Arrow batch (not per row), "
        "the only Python hop in the multimodal path. Decode itself is a "
        "deterministic stub (see decode_media).",
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_media(p, "text") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "frames": [f["frames"] for f in feats],
                    "mean_intensity": [f["mean_intensity"] for f in feats],
                }
            )

    return with_payload.mapInPandas(extract, _FEATURE_SCHEMA).orderBy("doc_id")
