"""Term ranking over the document corpus (TF-IDF).

The reference's analytics story stops at per-event metrics; a training
-data pipeline additionally needs per-document TERM salience — the
input to keyword extraction, topic sampling, and quality heuristics
("is this page about one thing or boilerplate about everything").
TF-IDF with smoothed IDF (``ln((N+1)/(df+1)) + 1`` — the scikit-learn
smoothing, never log-of-zero even when df == N) is the standard
weight.

Scale shape (the part that matters at 100 TB): the token explode is a
pure map; term frequencies are ONE map-side-combined groupBy on
(doc_id, term); document frequencies reuse that output (already unique
per doc-term, so ``groupBy(term).count`` IS the df — no second pass
over the corpus); the corpus size N is a 1-row broadcast; the final
top-k is a per-document window over each doc's own terms only.  Two
shuffles total on hashed keys, no global sort, no vocabulary collected
to the driver.

Determinism contract: ranking orders by the 6-decimal ROUNDED score
(then term ASC) — the exact value the driver hash-compares anyway — so
cross-engine ordering can only diverge where the reported value would
already mismatch; sub-ulp ln() differences between the JVM and DuckDB
cannot reorder ties that the rounding collapses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..catalog import register
from ..io import load_table
from .text import _tokens

TOP_K = 3

# Tokenizer contract: TF-IDF shares text.py's `_tokens` (lowercase,
# split on ONE literal space) so term statistics agree with every other
# text operator's token definition.  The delimiter is deliberately a
# regex-neutral literal: Spark's F.split treats the pattern as a REGEX
# while the DuckDB oracle's string_split is LITERAL — they coincide for
# " " but a future "\\s+"-style change would silently diverge in only
# one engine.  Change the delimiter in BOTH `text._tokens` and every
# oracle's string_split together, and only to regex-neutral literals.


@register(
    "text_tfidf_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split(lower(coalesce(text, '')), ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok WHERE term <> '' GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS doc_freq FROM tf GROUP BY term
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.doc_freq,
             CAST(ROUND(tf.tf * (ln((n.n_docs + 1.0) / (df.doc_freq + 1.0))
                                 + 1.0), 6) AS DECIMAL(18,6)) AS s6
      FROM tf JOIN df USING (term) CROSS JOIN n
    ),
    ranked AS (
      SELECT doc_id, term, tf, doc_freq, s6,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY s6 DESC, term ASC) AS rnk
      FROM scored
    )
    SELECT doc_id, term, CAST(rnk AS INT) AS rnk, tf, doc_freq,
           CAST(s6 AS DOUBLE) AS tfidf
    FROM ranked WHERE rnk <= {TOP_K}
    """,
    survey_ids=["K3"],
    doc=f"Top-{TOP_K} TF-IDF terms per document (smoothed IDF "
        "ln((N+1)/(df+1))+1): the keyword-extraction/topic-salience "
        "primitive of a corpus pipeline. Two hashed shuffles — "
        "(doc,term) counts, then term doc-frequencies REUSING that "
        "aggregate — a 1-row broadcast for N, and a per-document "
        "window over only that doc's terms. Ranking orders by the "
        "6-decimal rounded score (the hash-compared value itself), "
        "term-ASC tiebreak, so ordering is engine-stable by "
        "construction.",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(_tokens(F.coalesce("text", F.lit(""))))
         .alias("term"),
    ).filter(F.col("term") != "")
    tf = tok.groupBy("doc_id", "term").agg(
        F.count("*").cast("bigint").alias("tf"))
    # tf is unique per (doc, term): counting rows per term IS the doc
    # frequency — df never rescans the corpus
    df = tf.groupBy("term").agg(
        F.count("*").cast("bigint").alias("doc_freq"))
    n = d.agg(F.count("*").cast("bigint").alias("n_docs"))
    scored = (
        tf.join(df, "term")
          .crossJoin(F.broadcast(n))
          .withColumn(
              "s6",
              F.round(
                  F.col("tf") * (
                      F.log((F.col("n_docs") + F.lit(1.0))
                            / (F.col("doc_freq") + F.lit(1.0)))
                      + F.lit(1.0)),
                  6,
              ).cast("decimal(18,6)"),
          )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("s6"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
              .filter(F.col("rnk") <= TOP_K)
              .select("doc_id", "term", "rnk", "tf", "doc_freq",
                      F.col("s6").cast("double").alias("tfidf"))
    )


# --- BM25 retrieval scoring ------------------------------------------
#
# Okapi BM25 parameters (the Robertson/Lucene defaults) and a fixed
# 3-term query drawn from the corpus vocabulary.  The query list is a
# module constant so the Spark plan and the oracle share it verbatim.
BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ["hash", "join", "vector"]
BM25_TOP_K = 10

_Q_SQL = ", ".join(f"'{t}'" for t in BM25_QUERY)


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH dl AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(lower(coalesce(text, '')), ' '),
                                  t -> t <> '')) AS BIGINT) AS dl
      FROM documents
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    tok AS (
      SELECT doc_id,
             unnest(string_split(lower(coalesce(text, '')), ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok WHERE term IN ({_Q_SQL}) GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS doc_freq FROM tf GROUP BY term
    ),
    scored AS (
      SELECT tf.doc_id,
             ln((stats.n_docs - df.doc_freq + 0.5)
                / (df.doc_freq + 0.5) + 1.0)
             * tf.tf * ({BM25_K1} + 1.0)
             / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                                     + {BM25_B} * dl.dl / stats.avgdl))
               AS s,
             tf.term
      FROM tf
      JOIN df USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN stats
    ),
    agg AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_terms_matched,
             CAST(ROUND(SUM(CAST(ROUND(s, 8) AS DECIMAL(18,8))), 6)
                  AS DECIMAL(18,6)) AS s6
      FROM scored GROUP BY doc_id
    ),
    ranked AS (
      SELECT doc_id, n_terms_matched, s6,
             ROW_NUMBER() OVER (ORDER BY s6 DESC, doc_id ASC) AS rnk
      FROM agg
    )
    SELECT doc_id, n_terms_matched, CAST(rnk AS INT) AS rnk,
           CAST(s6 AS DOUBLE) AS bm25
    FROM ranked WHERE rnk <= {BM25_TOP_K}
    """,
    survey_ids=["K3"],
    doc=f"Okapi BM25 top-{BM25_TOP_K} document retrieval for the fixed "
        f"query {BM25_QUERY} (k1={BM25_K1}, b={BM25_B}, the "
        "Robertson/Lucene defaults with the +1 idf smoothing that keeps "
        "common-term idf positive) — the length-normalized upgrade to "
        "TF-IDF and the lexical half of any retrieval/dedup-by-query "
        "pipeline. Scale shape: doc length is a PURE PROJECTION "
        "(size of the filtered token array — no explode, no shuffle); "
        "the explode is filtered to the |Q|=3 query terms before "
        "aggregating, so the tf shuffle carries only matching terms; "
        "df is a |Q|-row aggregate of tf (broadcast); corpus stats are "
        "a 1-row broadcast; the final ranking is TakeOrdered over "
        "per-doc scores. Cross-engine determinism: each per-term score "
        "is rounded to 8dp DECIMAL BEFORE the per-doc sum (decimal "
        "accumulation is order-independent where double summation is "
        "not), then the total rounds to the 6dp hash-compared value; "
        "ranking tiebreaks on doc_id.",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.coalesce("text", F.lit("")))
    dl = d.select(
        "doc_id",
        F.size(F.filter(toks, lambda t: t != F.lit("")))
         .cast("bigint").alias("dl"),
    )
    stats = dl.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    tok = d.select(
        "doc_id", F.explode(toks).alias("term"),
    ).filter(F.col("term").isin(BM25_QUERY))
    tf = tok.groupBy("doc_id", "term").agg(
        F.count("*").cast("bigint").alias("tf"))
    df = tf.groupBy("term").agg(
        F.count("*").cast("bigint").alias("doc_freq"))
    s = (
        F.log((F.col("n_docs") - F.col("doc_freq") + F.lit(0.5))
              / (F.col("doc_freq") + F.lit(0.5)) + F.lit(1.0))
        * F.col("tf") * F.lit(BM25_K1 + 1.0)
        / (F.col("tf") + F.lit(BM25_K1) * (F.lit(1.0 - BM25_B)
           + F.lit(BM25_B) * F.col("dl") / F.col("avgdl")))
    )
    agg = (
        tf.join(F.broadcast(df), "term")
          .join(dl, "doc_id")
          .crossJoin(F.broadcast(stats))
          .select("doc_id",
                  F.round(s, 8).cast("decimal(18,8)").alias("s8"))
          .groupBy("doc_id")
          .agg(F.count("*").cast("bigint").alias("n_terms_matched"),
               F.round(F.sum("s8"), 6).cast("decimal(18,6)").alias("s6"))
    )
    w = W.orderBy(F.desc("s6"), F.asc("doc_id"))
    return (
        agg.orderBy(F.desc("s6"), F.asc("doc_id")).limit(BM25_TOP_K)
           .withColumn("rnk", F.row_number().over(w).cast("int"))
           .select("doc_id", "n_terms_matched", "rnk",
                   F.col("s6").cast("double").alias("bm25"))
    )
