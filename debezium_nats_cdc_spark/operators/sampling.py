"""Deterministic sampling / splitting operators (SURVEY.md §2.K —
driver-mandate training-data pipeline).

Train/val splits and stratified samples for corpus building.  Both are
pure column expressions over content hashes — deterministic under any
partitioning, cluster size, or row order (no rand(), no TABLESAMPLE,
which is partition-dependent), and therefore reproducible between the
Spark plan and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..catalog import register
from ..io import load_table

# first two hex chars of md5 < 'f3' => 243/256 ≈ 94.9% train fraction.
# THE canonical split: corpus_decontaminate and text_unigram_logprob
# import this so their notion of "train" can never drift from the
# splitter's.
TRAIN_HEX_CUTOFF = "f3"
_TRAIN_HEX_CUTOFF = TRAIN_HEX_CUTOFF  # internal alias


def is_train_expr(doc_id_col: str = "doc_id"):
    """Column: True iff the doc falls in the train split."""
    return (
        F.substring(F.md5(F.col(doc_id_col).cast("string")), 1, 2)
        < TRAIN_HEX_CUTOFF
    )
_STRATUM_CAP = 50


@register(
    "corpus_train_split",
    oracle=f"""
    SELECT split, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (
      SELECT lang, n_chars,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_TRAIN_HEX_CUTOFF}'
                  THEN 'train' ELSE 'val' END AS split
      FROM documents)
    GROUP BY split, lang
    """,
    survey_ids=["K1", "K3"],
    doc="Deterministic ~95/5 train/val split: membership = md5(doc_id) "
        "prefix below a hex cutoff. Hash-based (not rand/TABLESAMPLE) so "
        "assignment is stable across runs, partitionings, and engines — "
        "a doc never migrates between splits when the corpus is rebuilt.",
)
def corpus_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    split = F.when(is_train_expr(), "train").otherwise("val")
    return d.groupBy(split.alias("split"), "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "corpus_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY lang
        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= {_STRATUM_CAP}
    """,
    survey_ids=["K1", "K3"],
    doc=f"Stratified sample: {_STRATUM_CAP} docs per language, selected "
        "by content-hash order (deterministic 'random'). Salted two-phase "
        "top-k: phase 1 ranks within (lang, salt-of-doc_id) — 32 balanced "
        "buckets per stratum, so no single task ever sorts a whole "
        "language (at 100 TB one language can be half the corpus) — and "
        "phase 2 re-ranks the surviving <= 32*cap rows per stratum. "
        "Identical rows to a single global rank: any global top-cap row "
        "has < cap same-language predecessors overall, hence < cap in "
        "its own salt bucket, so phase 1 never drops it.",
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    salt = F.pmod(F.xxhash64("doc_id"), F.lit(32))
    local = W.partitionBy("lang", salt).orderBy(h, "doc_id")
    merged = W.partitionBy("lang").orderBy(h, "doc_id")
    return (
        d.withColumn("_lrn", F.row_number().over(local))
        .filter(F.col("_lrn") <= _STRATUM_CAP)  # state O(cap) per bucket
        .withColumn("_rn", F.row_number().over(merged))
        .filter(F.col("_rn") <= _STRATUM_CAP)
        .select("doc_id", "lang", "n_chars")
    )


_PACK_MAX_TOKENS = 2048
_PACK_BUCKETS = 64


@register(
    "corpus_pack_sequences",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             len(string_split(coalesce(text, ''), ' ')) AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS h,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % {_PACK_BUCKETS} AS bucket
      FROM documents
    ),
    run AS (
      SELECT bucket, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY h, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS running
      FROM base
    ),
    assigned AS (
      SELECT bucket,
             CAST(floor((running - n_tokens) / {_PACK_MAX_TOKENS}.0) AS BIGINT)
               AS seq_id,
             n_tokens
      FROM run
    )
    SELECT bucket, seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens
    FROM assigned GROUP BY bucket, seq_id
    """,
    survey_ids=["K1", "K3"],
    doc=f"Sequence packing for training batches: docs are hash-routed to "
        f"{_PACK_BUCKETS} independent buckets (so packing parallelizes — "
        "a single global concat order would serialize the corpus through "
        "one task at 100 TB), ordered deterministically by content hash "
        "within each bucket, and streamed into "
        f"{_PACK_MAX_TOKENS}-token "
        "sequences by running-total binning (a doc starts the sequence "
        "its start offset falls in). Output: per-sequence fill stats. "
        "One window shuffle on the bucket key; everything else is "
        "map-side.",
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    g60 = F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")
    base = d.select(
        "doc_id",
        F.size(F.split(F.coalesce(F.col("text"), F.lit("")), " "))
        .alias("n_tokens"),
        h.alias("_h"),
        (g60 % _PACK_BUCKETS).alias("bucket"),
    )
    w = (
        W.partitionBy("bucket")
        .orderBy("_h", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    running = F.sum("n_tokens").over(w)
    assigned = base.select(
        "bucket",
        F.floor((running - F.col("n_tokens")) / F.lit(float(_PACK_MAX_TOKENS)))
        .cast("bigint").alias("seq_id"),
        "n_tokens",
    )
    return assigned.groupBy("bucket", "seq_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("seq_tokens"),
    )


@register(
    "corpus_lang_mix",
    oracle="""
    WITH docs AS (
      SELECT coalesce(lang, 'und') AS lang FROM documents
    ),
    counts AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM docs
      GROUP BY lang
    ),
    tot AS (
      SELECT CAST(SUM(n_docs) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_langs
      FROM counts
    )
    SELECT lang, n_docs,
           CAST(CAST(ROUND(CAST(n_docs AS DOUBLE) / total, 6)
                AS DECIMAL(10,6)) AS DOUBLE) AS share,
           CAST(CAST(ROUND(
                least(1.0, (CAST(total AS DOUBLE) / n_langs) / n_docs), 6)
                AS DECIMAL(10,6)) AS DOUBLE) AS sample_weight
    FROM counts CROSS JOIN tot
    """,
    survey_ids=["K1", "K3"],
    doc="Training-mixture reweighting: per-language corpus share and the "
        "downsampling weight that flattens the mixture to uniform "
        "(weight = min(1, target_count/actual_count) — overrepresented "
        "languages get weight < 1, the rest keep everything; a Bernoulli "
        "sample at these weights yields the target mix in expectation, "
        "the standard pre-training data-mixture knob). NULL lang — a "
        "failed language-ID, a real population at crawl scale — is its "
        "own stratum 'und' (ISO 639 undetermined), not a silent hole. "
        "Cross-engine determinism: ratios of integers are "
        "IEEE-correctly-rounded double divisions, identical everywhere. "
        "Scale: one tiny groupBy(lang) agg + a broadcast of two scalars "
        "— the corpus is touched once.",
)
def corpus_lang_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").withColumn(
        "lang", F.coalesce("lang", F.lit("und"))
    )
    counts = d.groupBy("lang").agg(F.count("*").cast("bigint").alias("n_docs"))
    tot = counts.agg(
        F.sum("n_docs").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("n_langs"),
    )
    share = F.round(F.col("n_docs").cast("double") / F.col("total"), 6)
    weight = F.round(
        F.least(
            F.lit(1.0),
            (F.col("total").cast("double") / F.col("n_langs")) / F.col("n_docs"),
        ),
        6,
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        share.cast("decimal(10,6)").cast("double").alias("share"),
        weight.cast("decimal(10,6)").cast("double").alias("sample_weight"),
    )


_QWS_LOW_QUALITY_FACTOR = 0.25
_HASH_DENOM = float(1 << 60)  # md5-prefix fraction denominator


@register(
    "corpus_quality_weighted_sample",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, coalesce(lang, 'und') AS lang, n_chars, text
      FROM documents
    ),
    counts AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM docs
      GROUP BY lang
    ),
    tot AS (
      SELECT CAST(SUM(n_docs) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_langs
      FROM counts
    ),
    w AS (
      SELECT d.doc_id, d.lang,
             least(1.0, (CAST(t.total AS DOUBLE) / t.n_langs) / c.n_docs)
               * (CASE WHEN d.n_chars >= 100
                        AND len(string_split(d.text, ' ')) >= 20
                       THEN 1.0 ELSE {_QWS_LOW_QUALITY_FACTOR} END) AS w,
             CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) / {_HASH_DENOM} AS u
      FROM docs d
      JOIN counts c ON d.lang = c.lang
      CROSS JOIN tot t
    )
    SELECT doc_id, lang,
           CAST(CAST(ROUND(w, 6) AS DECIMAL(10,6)) AS DOUBLE) AS keep_weight
    FROM w WHERE u < w
    """,
    survey_ids=["K1", "K3"],
    doc="Quality-weighted mixture sampling (the DCLM/C4-style op that "
        "actually MATERIALIZES a training subset): per-doc keep "
        "probability = language downsampling weight (corpus_lang_mix's "
        "uniform-mixture target) x a quality factor (full weight past "
        "the length gates, 0.25 below), decided by a deterministic "
        "md5-fraction coin per doc — reproducible on any cluster, any "
        "partitioning, both engines (hex-parsed 60-bit integer over "
        "2^60; every arithmetic step is an IEEE-correctly-rounded "
        "double op in the same order). NULL lang coalesces to the 'und' "
        "stratum BEFORE the weight join (same policy as "
        "corpus_lang_mix): lang-ID failures are sampled at the 'und' "
        "weight, never silently excluded from the materialized mixture "
        "— at 100 TB that population is real, and dropping it would be "
        "a data-loss policy nobody chose. Scale: one tiny groupBy(lang) "
        "broadcast against a map-only scan; the filter prunes at the "
        "scan, no extra shuffle.",
)
def corpus_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").withColumn(
        "lang", F.coalesce("lang", F.lit("und"))
    )
    counts = d.groupBy("lang").agg(F.count("*").cast("bigint").alias("n_docs"))
    tot = counts.agg(
        F.sum("n_docs").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("n_langs"),
    )
    lang_w = F.least(
        F.lit(1.0),
        (F.col("total").cast("double") / F.col("n_langs")) / F.col("n_docs"),
    )
    quality = F.when(
        (F.col("n_chars") >= 100) & (F.size(F.split("text", " ")) >= 20),
        F.lit(1.0),
    ).otherwise(F.lit(_QWS_LOW_QUALITY_FACTOR))
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint") / F.lit(_HASH_DENOM)
    )
    w = lang_w * quality
    return (
        d.join(F.broadcast(counts), "lang")
        .crossJoin(F.broadcast(tot))
        .withColumn("_w", w)
        .filter(u < F.col("_w"))
        .select(
            "doc_id", "lang",
            F.round("_w", 6).cast("decimal(10,6)").cast("double")
            .alias("keep_weight"),
        )
    )


# ------------------------------------------------- global shuffle ------

# 2 hex chars = 256 shards.  At 100 TB raise to 3-4 chars (4096-65536
# shards) so each shard's within-shard sort fits one task comfortably;
# the technique is unchanged.
_SHUFFLE_SALT = ":shuffle:42"


@register(
    "corpus_global_shuffle",
    oracle=f"""
    SELECT doc_id, shard, CAST(pos AS INT) AS pos
    FROM (
      SELECT doc_id, substr(h, 1, 2) AS shard,
             ROW_NUMBER() OVER (PARTITION BY substr(h, 1, 2)
                                ORDER BY h, doc_id) AS pos
      FROM (SELECT doc_id,
                   md5(CAST(doc_id AS VARCHAR) || '{_SHUFFLE_SALT}') AS h
            FROM documents))
    """,
    survey_ids=["K1", "K3"],
    doc="Deterministic global corpus shuffle for training-order "
        "randomization: shard = md5(doc_id || salt) hex prefix (256 "
        "shards), position = rank of the full md5 within the shard. "
        "Epoch reshuffles change only the salt. No global sort anywhere "
        "— the plan is one hash shuffle on the shard key plus a "
        "per-shard (per-partition) sort, so it scales linearly where a "
        "naive ORDER BY rand() needs a full range-partitioned sort and "
        "a non-reproducible rand(). Reading shards in (shard, pos) "
        "order replays the exact same epoch order on any cluster size.",
)
def corpus_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_SHUFFLE_SALT)))
    shard = F.substring(F.col("h"), 1, 2)
    w = W.partitionBy("shard").orderBy("h", "doc_id")
    return (
        d.select("doc_id", h.alias("h"))
        .select("doc_id", shard.alias("shard"), F.col("h"))
        .select("doc_id", "shard",
                F.row_number().over(w).alias("pos"))
    )
