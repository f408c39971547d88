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
    # The decode stub's arithmetic is fully SQL-expressible: the byte sum
    # of payload[:256] is recovered from the hex encoding of the blob
    # (one 2-hex-digit pair per byte), so the driver gets a full
    # rows+schema+hash three-way check instead of rows-only.
    oracle="""
    WITH p AS (
      SELECT doc_id,
             CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
             hex(CAST(text AS BLOB)) AS h
      FROM documents
    ),
    b AS (
      -- TRY_CAST, not CAST: an EMPTY/NULL payload leaves the LEFT JOIN
      -- unmatched, substr() yields NULL, and DuckDB's concat DROPS the
      -- NULL leaving a bare '0x' that a plain CAST raises on (fuzz seed
      -- find, r6).  TRY_CAST folds it to NULL -> SUM NULL -> COALESCE 0,
      -- matching the engine's checksum=0 for empty payloads.
      SELECT p.doc_id, p.n_bytes,
             COALESCE(SUM(TRY_CAST(concat('0x',
                 substr(p.h, CAST(t.i*2+1 AS INT), 2)) AS BIGINT)), 0)
               AS checksum
      FROM p LEFT JOIN (SELECT unnest(range(0, 256)) AS i) t
        ON t.i*2+1 <= length(p.h)
      GROUP BY p.doc_id, p.n_bytes
    )
    SELECT doc_id, n_bytes, n_bytes // 1024 + 1 AS frames,
           CASE WHEN n_bytes IS NULL THEN NULL
                ELSE CAST(checksum % 256 AS DOUBLE) END AS mean_intensity
    FROM b
    """,
    survey_ids=["K4"],
    doc="Arrow-batched feature extraction over binary payloads via "
        "mapInPandas: the decode stage runs per Arrow batch (not per row), "
        "the only Python hop in the multimodal path. Decode itself is a "
        "deterministic stub (see decode_media) whose arithmetic the DuckDB "
        "oracle replays from the blob's hex encoding (full three-way check).",
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payload (NULL source text) -> NULL features, matching
            # the oracle's NULL fold — one corrupt row at 100 TB must
            # not fail the stage (same contract as functions/vectors.py)
            n_bytes, frames, mean = [], [], []
            for p in pdf["payload"]:
                if p is None:
                    n_bytes.append(None)
                    frames.append(None)
                    mean.append(None)
                else:
                    f = decode_media(p, "text")
                    n_bytes.append(len(p))
                    frames.append(f["frames"])
                    mean.append(f["mean_intensity"])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": pd.array(n_bytes, dtype="Int64"),
                    "frames": pd.array(frames, dtype="Int64"),
                    "mean_intensity": pd.array(mean, dtype="Float64"),
                }
            )

    return with_payload.mapInPandas(extract, _FEATURE_SCHEMA).orderBy("doc_id")


_N_SAMPLES = 8
_FPS = 25


@register(
    "mm_frame_sample",
    oracle=f"""
    WITH v AS (
      SELECT doc_id,
             CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS duration_ms,
             octet_length(CAST(text AS BLOB)) * {_FPS} // 1000 AS n_frames
      FROM documents
    ),
    s AS (
      SELECT doc_id, n_frames, i AS sample_ord,
             i * (n_frames - 1) // {_N_SAMPLES - 1} AS frame_idx
      FROM v CROSS JOIN (SELECT unnest(range(0, {_N_SAMPLES})) AS i) t
      WHERE n_frames >= {_N_SAMPLES}
    )
    SELECT doc_id, n_frames, CAST(sample_ord AS INT) AS sample_ord, frame_idx,
           frame_idx * 1000 // {_FPS} AS ts_ms
    FROM s
    """,
    survey_ids=["K4"],
    doc=f"Video frame-sampling PLAN: uniform {_N_SAMPLES}-frame schedule "
        "per clip (frame indices + timestamps from the typed metadata — "
        "duration is derived deterministically from payload length here, "
        "since the container has no real media). All integer arithmetic, "
        "one generator — no Python. The schedule rows are what the "
        "decode stage (mapInPandas, see mm_feature_extract) consumes to "
        "extract exactly those frames instead of decoding whole clips: "
        "at 100 TB of video, sampling before decode is the difference "
        "between reading 8 frames and reading every frame.",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    v = d.select(
        "doc_id",
        F.octet_length(payload).cast("bigint").alias("duration_ms"),
        (F.octet_length(payload).cast("bigint") * _FPS / 1000)
        .cast("bigint").alias("n_frames"),
    ).filter(F.col("n_frames") >= _N_SAMPLES)
    s = v.select(
        "doc_id",
        "n_frames",
        F.explode(F.sequence(F.lit(0), F.lit(_N_SAMPLES - 1))).alias("sample_ord"),
    )
    frame_idx = (
        F.col("sample_ord").cast("bigint") * (F.col("n_frames") - 1)
        / (_N_SAMPLES - 1)
    ).cast("bigint")
    return s.select(
        "doc_id",
        "n_frames",
        F.col("sample_ord").cast("int").alias("sample_ord"),
        frame_idx.alias("frame_idx"),
        (frame_idx * 1000 / _FPS).cast("bigint").alias("ts_ms"),
    )


_MAX_SIDE = 512


@register(
    "mm_resize_plan",
    oracle=f"""
    WITH dims AS (
      -- TRY_CAST, not CAST: md5(NULL) is NULL, DuckDB's concat drops the
      -- NULL substr leaving a bare '0x' that a plain CAST raises on
      -- (fuzz seed find, r6).  TRY_CAST folds to NULL width/height,
      -- matching the engine's conv(substring(NULL)) null-propagation.
      SELECT doc_id,
             32 + TRY_CAST(concat('0x', substr(md5(text), 1, 4)) AS BIGINT) % 2048
               AS width,
             32 + TRY_CAST(concat('0x', substr(md5(text), 5, 4)) AS BIGINT) % 2048
               AS height
      FROM documents
    )
    SELECT doc_id, width, height,
           CASE WHEN greatest(width, height) <= {_MAX_SIDE} THEN width
                ELSE width * {_MAX_SIDE} // greatest(width, height) END
             AS out_width,
           CASE WHEN greatest(width, height) <= {_MAX_SIDE} THEN height
                ELSE height * {_MAX_SIDE} // greatest(width, height) END
             AS out_height,
           greatest(width, height) > {_MAX_SIDE} AS needs_resize
    FROM dims
    """,
    survey_ids=["K4"],
    doc=f"Image resize PLAN: cap the longest side at {_MAX_SIDE}px "
        "preserving aspect ratio, in pure integer arithmetic (w*cap/max "
        "— no float rounding to disagree across engines). Source dims "
        "are derived deterministically from the content digest (no real "
        "images in the container); on a real cluster they come from the "
        "typed metadata struct and the pixel work runs in the decode "
        "stage (mapInPandas), touching only rows with needs_resize.",
)
def mm_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    m = F.md5("text")
    w = F.lit(32) + F.conv(F.substring(m, 1, 4), 16, 10).cast("bigint") % 2048
    h = F.lit(32) + F.conv(F.substring(m, 5, 4), 16, 10).cast("bigint") % 2048
    dims = d.select("doc_id", w.alias("width"), h.alias("height"))
    mx = F.greatest("width", "height")
    out_w = F.when(mx <= _MAX_SIDE, F.col("width")).otherwise(
        (F.col("width") * _MAX_SIDE / mx).cast("bigint")
    )
    out_h = F.when(mx <= _MAX_SIDE, F.col("height")).otherwise(
        (F.col("height") * _MAX_SIDE / mx).cast("bigint")
    )
    return dims.select(
        "doc_id", "width", "height",
        out_w.alias("out_width"),
        out_h.alias("out_height"),
        (mx > _MAX_SIDE).alias("needs_resize"),
    )


_CHUNK_MS = 30_000   # Whisper-style window
_OVERLAP_MS = 1_000
_STRIDE_MS = _CHUNK_MS - _OVERLAP_MS
_MS_PER_BYTE = 200   # deterministic fake duration, scaled so the
                     # sf corpus actually exercises multi-chunk docs


@register(
    "mm_audio_chunk_plan",
    oracle=f"""
    WITH a AS (
      SELECT doc_id,
             CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) * {_MS_PER_BYTE}
               AS duration_ms
      FROM documents
    ),
    k AS (
      SELECT doc_id, duration_ms,
             (greatest(duration_ms - {_CHUNK_MS}, 0) + {_STRIDE_MS} - 1)
               // {_STRIDE_MS} AS n_extra
      FROM a
    )
    SELECT doc_id, duration_ms,
           CAST(i AS INT) AS chunk_ord,
           i * {_STRIDE_MS} AS start_ms,
           least(i * {_STRIDE_MS} + {_CHUNK_MS}, duration_ms) AS end_ms,
           CAST(n_extra + 1 AS BIGINT) AS n_chunks
    -- ordinal ceiling derived from the DATA (max n_extra), matching the
    -- engine's unbounded sequence(0, n_extra): a fixed literal range
    -- would silently truncate any doc whose chunk count outgrew it,
    -- turning a payload-size change into a spurious oracle mismatch
    FROM k CROSS JOIN (
      SELECT unnest(range(0, (SELECT COALESCE(MAX(n_extra), 0) + 1 FROM k)))
        AS i) t
    WHERE i <= n_extra
    """,
    survey_ids=["K4"],
    doc=f"Audio chunking PLAN: {_CHUNK_MS / 1000:.0f}s windows with "
        f"{_OVERLAP_MS / 1000:.0f}s overlap (the ASR/Whisper transcription "
        "schedule). Like mm_frame_sample, the schedule is computed BEFORE "
        "any decode — at 100 TB of audio the decode stage (mapInPandas) "
        "seeks exactly these byte ranges instead of materializing whole "
        "files. Duration derives deterministically from payload length "
        "(no real audio in the container); all integer arithmetic, one "
        "generator, no Python, no shuffle.",
)
def mm_audio_chunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    duration = (F.octet_length(F.encode("text", "UTF-8")).cast("bigint")
                * _MS_PER_BYTE)
    a = d.select("doc_id", duration.alias("duration_ms"))
    # integer `div`, never `/`: double division truncated through a cast
    # can mis-round at exact multiples, and the oracle uses `//`
    n_extra = F.expr(
        f"(greatest(duration_ms - {_CHUNK_MS}, 0L) + {_STRIDE_MS - 1}) "
        f"div {_STRIDE_MS}"
    )
    k = a.select("doc_id", "duration_ms", n_extra.alias("n_extra"))
    s = k.select(
        "doc_id", "duration_ms", "n_extra",
        F.explode(F.sequence(F.lit(0), F.col("n_extra"))).alias("i"),
    )
    return s.select(
        "doc_id",
        "duration_ms",
        F.col("i").cast("int").alias("chunk_ord"),
        (F.col("i") * _STRIDE_MS).alias("start_ms"),
        F.least(F.col("i") * _STRIDE_MS + _CHUNK_MS,
                F.col("duration_ms")).alias("end_ms"),
        (F.col("n_extra") + 1).cast("bigint").alias("n_chunks"),
    )
