"""Text-analysis operators (SURVEY.md §2.K3 — driver mandate).

Language-ID, quality scoring, token counting, and document fingerprinting
over the ``documents`` table.  All pure Catalyst column expressions —
no Python in the hot path; at 100 TB these are embarrassingly parallel
scan-projections (no shuffle except the final aggregations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import register
from ..io import load_table
from ._common import dec2

# small closed-class word lists for heuristic language ID
_EN_STOPWORDS = [
    "the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
    "on", "with", "as", "was", "at", "by", "an", "be", "this", "are",
]


def _tokens(col):
    return F.split(F.lower(col), " ")


@register(
    "text_token_stats",
    oracle="""
    SELECT doc_id, lang,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           n_chars,
           CAST(CAST(ROUND(CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')), 4)
                AS DECIMAL(18,4)) AS DOUBLE) AS chars_per_token
    FROM documents
    """,
    survey_ids=["K3"],
    doc="Whitespace token counting + length stats per document.",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " "))
    return d.select(
        "doc_id",
        "lang",
        n_tokens.cast("int").alias("n_tokens"),
        "n_chars",
        F.round(F.col("n_chars").cast("double") / n_tokens, 4)
        .cast("decimal(18,4)")
        .cast("double")
        .alias("chars_per_token"),
    )


@register(
    "text_quality_score",
    oracle="""
    SELECT doc_id,
           CAST(CAST(ROUND(CAST(len(list_intersect(string_split(lower(text), ' '),
                ['the','and','of','to','a','in','is','it','that','for',
                 'on','with','as','was','at','by','an','be','this','are'])) AS DOUBLE)
                / 20, 4) AS DECIMAL(10,4)) AS DOUBLE) AS stopword_coverage,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           (n_chars >= 100 AND len(string_split(text, ' ')) >= 20) AS passes_length_gate
    FROM documents
    """,
    survey_ids=["K3"],
    doc="Quality scoring: stopword coverage + length gates — the classic "
        "pretraining-corpus filter (C4-style heuristics) as one projection.",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    coverage = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in _EN_STOPWORDS])))
    n_tokens = F.size(F.split("text", " "))
    return d.select(
        "doc_id",
        F.round(coverage.cast("double") / len(_EN_STOPWORDS), 4)
        .cast("decimal(10,4)")
        .cast("double")
        .alias("stopword_coverage"),
        n_tokens.cast("int").alias("n_tokens"),
        ((F.col("n_chars") >= 100) & (n_tokens >= 20)).alias("passes_length_gate"),
    )


@register(
    "text_lang_distribution",
    oracle="""
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents GROUP BY lang, source
    """,
    survey_ids=["K3"],
    doc="Corpus composition rollup by language and source.",
)
def text_lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fingerprint,
           substr(md5(regexp_replace(lower(text), '\\s+', ' ', 'g')), 1, 8) AS shard_key
    FROM documents
    """,
    survey_ids=["K3", "K1"],
    doc="Document fingerprint: content digest of whitespace-normalized "
        "lowercased text; shard_key prefix for downstream bucketing.",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.regexp_replace(F.lower("text"), r"\s+", " "))
    return d.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.substring(fp, 1, 8).alias("shard_key"),
    )


@register(
    "text_token_frequencies",
    oracle="""
    SELECT token, CAST(COUNT(*) AS BIGINT) AS freq,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
    FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
          FROM documents)
    GROUP BY token
    ORDER BY freq DESC, token
    LIMIT 50
    """,
    survey_ids=["K3"],
    doc="Corpus token frequency (explode + two-level count) — vocabulary "
        "building shape; partial aggregation keeps the shuffle narrow.",
)
def text_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(
            F.count("*").alias("freq"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(50)
    )


@register(
    "text_language_id",
    oracle="""
    SELECT doc_id, lang AS labeled_lang,
           (len(list_intersect(string_split(lower(text), ' '),
                ['the','and','of','to','a','in','is','it','that','for',
                 'on','with','as','was','at','by','an','be','this','are'])) >= 3)
             AS looks_english
    FROM documents
    """,
    survey_ids=["K3"],
    doc="Heuristic language ID: closed-class word-hit threshold (n-gram "
        "heuristic per driver mandate); compared against the provided label.",
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in _EN_STOPWORDS])))
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        (hits >= 3).alias("looks_english"),
    )


@register(
    "text_bpe_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT)
             AS n_bpe_tokens,
           CAST(len(list_distinct(regexp_extract_all(lower(text),
                '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS INT) AS n_unique_tokens,
           CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens
    FROM documents
    """,
    survey_ids=["K3"],
    doc="BPE-ish regex tokenization (driver mandate: 'whitespace + a "
        "BPE-ish regex'): letter-runs / digit-runs / single punctuation, "
        "the GPT-2 pre-tokenizer shape. Counted vs whitespace tokens for "
        "a per-doc tokens-per-word signal. Pure codegen'd projection — "
        "a 100 TB scan-only op.",
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(
        F.lower("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9 ]"), F.lit(0)
    )
    return d.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).cast("int").alias("n_unique_tokens"),
        F.size(F.split("text", " ")).cast("int").alias("n_ws_tokens"),
    )


@register(
    "text_repetition_filter",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, string_split(lower(coalesce(text, '')), ' ') AS toks
      FROM documents
    ),
    grams AS (
      SELECT doc_id, lang,
             CASE WHEN len(toks) >= 3 THEN
               [toks[i] || '_' || toks[i+1] || '_' || toks[i+2]
                for i in range(1, len(toks) - 2 + 1)]
             ELSE [] END AS gs
      FROM tok
    )
    SELECT doc_id, lang,
           CAST(len(gs) AS INT) AS n_grams,
           CAST(len(list_distinct(gs)) AS INT) AS n_distinct,
           CAST(CAST(ROUND(CASE WHEN len(gs) > 0 THEN
                  1.0 - CAST(len(list_distinct(gs)) AS DOUBLE) / len(gs)
                  ELSE 0.0 END, 6) AS DECIMAL(10,6)) AS DOUBLE) AS rep_ratio,
           (CASE WHEN len(gs) > 0 THEN
              1.0 - CAST(len(list_distinct(gs)) AS DOUBLE) / len(gs)
              ELSE 0.0 END) > 0.2 AS is_repetitive
    FROM grams
    """,
    survey_ids=["K3"],
    doc="Repetition quality filter (Gopher/C4-style): fraction of "
        "duplicated word-3-grams within each doc — boilerplate and "
        "looping text score high and get flagged (> 0.2). Pure per-doc "
        "projection: no shuffle, no join; fuses into the corpus scan "
        "alongside the other quality gates.",
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # tokenize into a PROJECTED attribute first — element_at over an
    # inline split() inside the transform lambda re-evaluates the split
    # per element (no CSE across lambda boundaries, see _shingle_expr's
    # note): O(tokens²) per doc, measured ~4.7 s -> 0.85 s warm at sf0.1
    d = d.withColumn(
        "_toks", F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), " ")
    )
    toks = F.col("_toks")
    n = F.size(toks)
    gs = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - 2),
            lambda i: F.concat_ws("_", F.element_at(toks, i),
                                  F.element_at(toks, i + 1),
                                  F.element_at(toks, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    d = d.select("doc_id", "lang", gs.alias("_gs"))
    n_grams = F.size("_gs")
    n_distinct = F.size(F.array_distinct("_gs"))
    ratio = F.when(
        n_grams > 0,
        F.lit(1.0) - n_distinct.cast("double") / n_grams,
    ).otherwise(F.lit(0.0))
    return d.select(
        "doc_id", "lang",
        n_grams.cast("int").alias("n_grams"),
        n_distinct.cast("int").alias("n_distinct"),
        F.round(ratio, 6).cast("decimal(10,6)").cast("double").alias("rep_ratio"),
        (ratio > 0.2).alias("is_repetitive"),
    )


# the canonical train/val split (import, never re-declare: drift here
# would score docs against a model fit on a different split)
from .sampling import TRAIN_HEX_CUTOFF as _LM_CUTOFF
from .sampling import is_train_expr as _lm_is_train


@register(
    "text_unigram_logprob",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_LM_CUTOFF}'
               AS is_train,
             unnest(string_split(lower(coalesce(text, '')), ' ')) AS tok
      FROM documents
    ),
    model AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM tok WHERE is_train
      GROUP BY tok
    ),
    consts AS (
      SELECT CAST(SUM(c) AS BIGINT) AS t_total,
             CAST(COUNT(*) AS BIGINT) AS v_size
      FROM model
    ),
    scored AS (
      SELECT d.doc_id,
             CAST(ROUND(ln((COALESCE(m.c, 0) + 1.0) / (c0.t_total + c0.v_size)), 9)
                  AS DECIMAL(18,9)) AS lp,
             (m.tok IS NULL) AS oov
      FROM tok d CROSS JOIN consts c0 LEFT JOIN model m ON d.tok = m.tok
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(CAST(ROUND(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6)
                AS DECIMAL(12,6)) AS DOUBLE) AS avg_logprob,
           CAST(CAST(ROUND(CAST(SUM(CASE WHEN oov THEN 1 ELSE 0 END) AS DOUBLE)
                           / COUNT(*), 6) AS DECIMAL(10,6)) AS DOUBLE) AS oov_rate
    FROM scored GROUP BY doc_id
    """,
    survey_ids=["K3"],
    doc="Unigram-LM quality score (perplexity proxy): add-one-smoothed "
        "token logprobs under a model fit on the TRAIN split (same "
        "md5-prefix split as corpus_train_split), averaged per doc, plus "
        "the OOV rate — gibberish and wrong-language docs score low. "
        "Cross-engine float discipline: each token's ln() rounds to "
        "DECIMAL(18,9) BEFORE the per-doc sum, so the aggregation is "
        "exact-decimal (associative — float sums would differ with "
        "partial-agg order), and the mean is decimal-sum/count. The ln "
        "input (c+1)/(T+V) is an IEEE-exact integer division, and "
        "tests/test_logprob_margin.py proves every distinct ln value "
        "sits >3 ulps from its 9dp rounding boundary — so any faithful "
        "(<1 ulp) libm rounds identically; the contract no longer "
        "ASSUMES identical libm rounding. Scale shape: the model is one "
        "vocab-sized groupBy; scoring is one equi-join on token; the "
        "two model scalars broadcast.",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        _lm_is_train().alias("is_train"),
        F.explode(F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), " "))
        .alias("tok"),
    )
    model = toks.filter("is_train").groupBy("tok").agg(F.count("*").alias("c"))
    consts = model.agg(
        F.sum("c").cast("bigint").alias("t_total"),
        F.count("*").cast("bigint").alias("v_size"),
    )
    lp = F.round(
        F.log((F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0))
              / (F.col("t_total") + F.col("v_size"))),
        9,
    ).cast("decimal(18,9)")
    scored = (
        toks.crossJoin(F.broadcast(consts))
        .join(model, "tok", "left")
        .select("doc_id", lp.alias("lp"), F.col("c").isNull().alias("oov"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.round(F.sum("lp").cast("double") / F.count("*"), 6)
        .cast("decimal(12,6)").cast("double").alias("avg_logprob"),
        F.round(
            F.sum(F.when(F.col("oov"), 1).otherwise(0)).cast("double")
            / F.count("*"), 6
        ).cast("decimal(10,6)").cast("double").alias("oov_rate"),
    )
