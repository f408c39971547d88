"""Hand-computed fixtures for the r8 operators (VERDICT r8 item 6) and
the r9 join-strategy advisor.

* text_tfidf_topk — 3-doc fixture with known scores, including the
  df==N smoothing edge (idf collapses to exactly 1.0) and NULL/empty
  documents that count in N but emit no terms.
* stats_join_cardinality — a skewed fixture whose exact predicted join
  row-count is asserted against an ACTUALLY-EXECUTED join.
* advise_join — picks salted on the hot-key fixture, broadcast under
  the size threshold, plain shuffle otherwise.

The catalog queries' value parity vs DuckDB is covered by the driver
oracle + strict sweep; these pin the semantics to numbers computed by
hand, independent of any engine.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from debezium_nats_cdc_spark.operators.ranking import text_tfidf_topk
from debezium_nats_cdc_spark.operators.stats import (
    advise_join,
    stats_join_cardinality,
)


def _write_docs(spark, tmp_path, rows):
    (spark.createDataFrame(rows, "doc_id bigint, text string")
          .write.mode("overwrite")
          .parquet(f"{tmp_path}/documents.parquet"))
    return str(tmp_path)


def test_tfidf_hand_computed_with_df_equals_n_edge(spark, tmp_path):
    # N=3; 'apple' appears in ALL docs -> df==N -> smoothed idf is
    # EXACTLY ln((3+1)/(3+1)) + 1 = 1.0 (the edge the smoothing exists
    # for: unsmoothed ln(N/df) would zero the term out entirely).
    sf = _write_docs(spark, tmp_path, [
        (1, "apple banana apple"),
        (2, "apple cherry"),
        (3, "apple date date date date"),
    ])
    got = {(r.doc_id, r.term): r
           for r in text_tfidf_topk(spark, sf).collect()}

    ln2 = round(1.0 + math.log(2.0), 6)          # 1.693147
    expect = {
        (1, "apple"):  (1, 2, 3, 2.0),           # tf=2 * idf=1.0
        (1, "banana"): (2, 1, 1, ln2),
        (2, "cherry"): (1, 1, 1, ln2),
        (2, "apple"):  (2, 1, 3, 1.0),
        (3, "date"):   (1, 4, 1, round(4 * (1.0 + math.log(2.0)), 6)),
        (3, "apple"):  (2, 1, 3, 1.0),
    }
    assert set(got) == set(expect)
    for k, (rnk, tf, doc_freq, score) in expect.items():
        r = got[k]
        assert (r.rnk, r.tf, r.doc_freq) == (rnk, tf, doc_freq), k
        assert r.tfidf == score, (k, r.tfidf, score)


def test_tfidf_null_and_empty_docs_count_in_n_only(spark, tmp_path):
    # NULL/empty text contribute no terms but DO count in N (they are
    # corpus documents); idf shifts from ln(4/df+1) to ln(6/df+1).
    sf = _write_docs(spark, tmp_path, [
        (1, "apple banana apple"),
        (2, "apple cherry"),
        (3, "apple date date date date"),
        (4, None),
        (5, ""),
    ])
    rows = text_tfidf_topk(spark, sf).collect()
    assert {r.doc_id for r in rows} == {1, 2, 3}
    apple1 = next(r for r in rows if r.doc_id == 1 and r.term == "apple")
    # df(apple)=3, N=5: score = 2 * (ln(6/4) + 1)
    assert apple1.tfidf == round(2 * (math.log(1.5) + 1.0), 6)
    assert apple1.doc_freq == 3


def _write_join_tables(spark, tmp_path, left_ids, right_ids):
    (spark.createDataFrame([(i,) for i in left_ids], "user_id bigint")
          .write.mode("overwrite").parquet(f"{tmp_path}/events.parquet"))
    (spark.createDataFrame([(i,) for i in right_ids], "o_custkey bigint")
          .write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet"))
    return str(tmp_path)


def test_join_cardinality_matches_executed_join(spark, tmp_path):
    # skewed: key 1 dominates (5x4=20 of 23 pairs); keys 3 (left-only),
    # 4 (right-only) and NULLs must contribute nothing
    sf = _write_join_tables(
        spark,
        tmp_path,
        left_ids=[1] * 5 + [2] * 3 + [3] + [None] * 2,
        right_ids=[1] * 4 + [2] + [4] * 7 + [None],
    )
    got = stats_join_cardinality(spark, sf).orderBy("rnk").collect()

    e = spark.read.parquet(f"{sf}/events.parquet")
    o = spark.read.parquet(f"{sf}/orders.parquet")
    executed = e.join(o, e.user_id == o.o_custkey).count()
    assert executed == 23  # 5*4 + 3*1, hand-computed

    assert [(r.join_key, r.left_rows, r.right_rows, r.pair_rows, r.rnk)
            for r in got] == [(1, 5, 4, 20, 1), (2, 3, 1, 3, 2)]
    assert all(r.total_pair_rows == executed for r in got)
    assert got[0].share == round(20 / 23, 6)
    assert got[1].share == round(3 / 23, 6)


def _df(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "k bigint")


def test_advise_join_broadcast_under_threshold(spark):
    left = _df(spark, list(range(10)))
    right = _df(spark, list(range(100)) * 2)
    out = advise_join(left, right, "k", broadcast_rows=20)
    assert out["strategy"] == "broadcast"
    assert out["build_side"] == "left"
    assert out["hot_keys"] == []
    assert out["rationale"]["left"]["total"] == 10
    assert out["rationale"]["right"]["total"] == 200


def test_advise_join_salted_on_hot_key(spark):
    # left: key 7 owns 61 of 80 rows (60 planted + 1 from the uniform
    # tail) over 20 keys -> skew = 61*20/80 = 15.25 >= 8; right uniform
    left = _df(spark, [7] * 60 + list(range(1, 21)))
    right = _df(spark, list(range(1, 31)) * 2)
    out = advise_join(left, right, "k", broadcast_rows=5)
    assert out["strategy"] == "salted"
    assert out["hot_keys"] == [7]
    assert out["rationale"]["left"]["skew_ratio"] == 61 * 20 / 80
    assert out["rationale"]["right"]["skew_ratio"] == 1.0


def test_advise_join_shuffle_otherwise(spark):
    left = _df(spark, list(range(50)) * 2)
    right = _df(spark, list(range(40)) * 3)
    out = advise_join(left, right, "k", broadcast_rows=5)
    assert out["strategy"] == "shuffle"
    assert out["build_side"] is None
    assert out["hot_keys"] == []


def test_advise_join_distinct_key_names_and_empty_side(spark):
    left = spark.createDataFrame([(i,) for i in range(30)], "lk bigint")
    right = (spark.createDataFrame([(1,)], "rk bigint")
                  .filter(F.col("rk") < 0))  # empty
    out = advise_join(left, right, "lk", "rk", broadcast_rows=5)
    # an empty side always broadcasts (total 0 <= any threshold)
    assert out["strategy"] == "broadcast"
    assert out["build_side"] == "right"


def test_bm25_matches_independent_reimplementation(spark, tmp_path):
    import math

    from debezium_nats_cdc_spark.operators.ranking import (
        BM25_B,
        BM25_K1,
        BM25_QUERY,
        text_bm25_topk,
    )

    docs = [
        (1, "hash join hash"),
        (2, "vector"),
        (3, "other words here"),      # no query term -> not retrieved
        (4, "join join join vector hash padding padding padding"),
        (5, None),
    ]
    sf = _write_docs(spark, tmp_path, docs)
    got = {r.doc_id: r for r in text_bm25_topk(spark, sf).collect()}

    # independent reimplementation (plain python floats)
    toks = {d: (t or "").lower().split(" ") for d, t in docs}
    toks = {d: [t for t in ts if t] for d, ts in toks.items()}
    n = len(docs)
    avgdl = sum(len(ts) for ts in toks.values()) / n
    df = {q: sum(1 for ts in toks.values() if q in ts) for q in BM25_QUERY}
    expect = {}
    for d, ts in toks.items():
        s = 0.0
        matched = 0
        for q in BM25_QUERY:
            tf = ts.count(q)
            if not tf:
                continue
            matched += 1
            idf = math.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1.0)
            s += round(idf * tf * (BM25_K1 + 1.0)
                       / (tf + BM25_K1 * (1.0 - BM25_B
                                          + BM25_B * len(ts) / avgdl)), 8)
        if matched:
            expect[d] = (matched, round(s, 6))

    assert set(got) == set(expect)
    for d, (matched, score) in expect.items():
        assert got[d].n_terms_matched == matched, d
        assert abs(got[d].bm25 - score) < 1e-9, (d, got[d].bm25, score)
    # rank order: score desc, doc_id asc
    ranked = sorted(got.values(), key=lambda r: r.rnk)
    assert [r.doc_id for r in ranked] == [
        d for d, _ in sorted(expect.items(), key=lambda kv: (-kv[1][1], kv[0]))]


def test_emb_covariance_matches_numpy(spark, tmp_path):
    import numpy as np

    from debezium_nats_cdc_spark.operators.linalg import emb_covariance

    rng = np.random.RandomState(7)
    vecs = rng.randn(50, 8).astype(np.float32)
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    (spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
          .write.mode("overwrite")
          .parquet(f"{tmp_path}/embeddings.parquet"))

    got = {(r.dim_i, r.dim_j): (r.n_pairs, r.cov)
           for r in emb_covariance(spark, str(tmp_path)).collect()}
    assert len(got) == 8 * 9 // 2

    ref = np.cov(np.round(vecs.astype(np.float64), 6), rowvar=False, ddof=1)
    for i in range(8):
        for j in range(i, 8):
            n_pairs, cov = got[(i, j)]
            assert n_pairs == 50
            assert abs(cov - ref[i, j]) < 1e-6, (i, j, cov, ref[i, j])


def test_emb_covariance_ragged_and_null_vectors(spark, tmp_path):
    from debezium_nats_cdc_spark.operators.linalg import emb_covariance

    rows = [(1, [1.0, 2.0, 3.0]), (2, [2.0, 4.0, 6.0]),
            (3, [3.0, 6.0]),        # ragged: no dim 2
            (4, None)]              # NULL vector ignored entirely
    (spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
          .write.mode("overwrite")
          .parquet(f"{tmp_path}/embeddings.parquet"))
    got = {(r.dim_i, r.dim_j): (r.n_pairs, r.cov)
           for r in emb_covariance(spark, str(tmp_path)).collect()}
    # dims 0,1 pair over 3 vectors; anything touching dim 2 over 2
    assert got[(0, 0)][0] == 3 and got[(0, 2)][0] == 2
    assert got[(0, 0)][1] == 1.0      # var([1,2,3]) ddof=1
    assert got[(0, 1)][1] == 2.0      # cov([1,2,3],[2,4,6])
    assert got[(2, 2)][1] == 4.5      # var([3,6])


def test_advise_join_hot_keys_hottest_first_and_bounded(spark):
    # two hot keys with different weights on the left, one on the right
    # that is ALSO key 9 (merged by max) -> order must be by frequency
    # desc, and the cap applies AFTER the merge
    left = _df(spark, [9] * 40 + [3] * 80 + list(range(100, 120)))
    right = _df(spark, [9] * 90 + list(range(100, 130)))
    out = advise_join(left, right, "k", broadcast_rows=5, max_hot_keys=2)
    assert out["strategy"] == "salted"
    # 9 -> max(40, 90) = 90 beats 3 -> 80
    assert out["hot_keys"] == [9, 3]

    capped = advise_join(left, right, "k", broadcast_rows=5, max_hot_keys=1)
    assert capped["hot_keys"] == [9]


def test_emb_covariance_null_elements_do_not_inflate_n(spark, tmp_path):
    from debezium_nats_cdc_spark.operators.linalg import emb_covariance

    rows = [(1, [1.0, 2.0]), (2, [2.0, 4.0]), (3, [3.0, 6.0]),
            (4, [4.0, None])]  # NULL lane: must not count in (0,1)/(1,1)
    (spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
          .write.mode("overwrite")
          .parquet(f"{tmp_path}/embeddings.parquet"))
    got = {(r.dim_i, r.dim_j): (r.n_pairs, r.cov)
           for r in emb_covariance(spark, str(tmp_path)).collect()}
    assert got[(0, 0)][0] == 4            # dim 0 fully observed
    assert got[(0, 1)][0] == 3            # NULL lane excluded
    assert got[(1, 1)][0] == 3
    assert got[(0, 1)][1] == 2.0          # cov([1,2,3],[2,4,6]) ddof=1
    assert got[(1, 1)][1] == 4.0          # var([2,4,6]) ddof=1
