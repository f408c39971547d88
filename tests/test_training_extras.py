"""Semantic unit tests for the r6 training-pipeline additions
(corpus_global_shuffle, dedup_prefix_cluster, join_salted_skew,
window_ntile_curriculum, emb_norm_stats) — crafted inputs with
hand-computable answers; the sf oracles check engine parity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_nats_cdc_spark.plans.explain import count_exchanges, formatted_plan

DOC_SCHEMA = "doc_id long, lang string, source string, n_chars int, text string"


def _docs(spark, rows, tmp_path):
    spark.createDataFrame(rows, DOC_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


# ------------------------------------------------ corpus_global_shuffle


def test_global_shuffle_is_a_permutation_and_deterministic(spark, tmp_path):
    from debezium_nats_cdc_spark.operators.sampling import corpus_global_shuffle

    n = 300
    root = _docs(spark, [(i, "en", "s", 10, f"doc {i}") for i in range(n)], tmp_path)
    a = corpus_global_shuffle(spark, root).collect()
    b = corpus_global_shuffle(spark, root).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    assert sorted(r["doc_id"] for r in a) == list(range(n))  # a permutation
    # positions are dense 1..k within every shard
    by_shard: dict[str, list[int]] = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # 300 docs over 256 shards: a global sort would leave one shard
    assert len(by_shard) > 100


def test_global_shuffle_plan_has_no_global_sort(spark, tmp_path):
    from debezium_nats_cdc_spark.operators.sampling import corpus_global_shuffle

    root = _docs(spark, [(i, "en", "s", 10, "t") for i in range(10)], tmp_path)
    plan = formatted_plan(corpus_global_shuffle(spark, root))
    assert count_exchanges(plan) == 1  # hash on shard; sort per-partition
    assert "hashpartitioning(shard" in plan
    assert "rangepartitioning" not in plan  # no global sort anywhere


# ------------------------------------------------- dedup_prefix_cluster


def test_prefix_cluster_finds_shared_heads_only(spark, tmp_path):
    from debezium_nats_cdc_spark.operators.dedup import (
        PREFIX_TOKENS,
        dedup_prefix_cluster,
    )

    head = " ".join(f"h{i}" for i in range(PREFIX_TOKENS))
    rows = [
        (1, "en", "s", 100, head + " body one two three"),
        (2, "en", "s", 200, head + " completely different tail"),
        (3, "en", "s", 300, "other " + head),  # shifted: different prefix
        (4, "en", "s", 50, "short doc"),
        (5, "en", "s", 60, "short doc"),  # full-text dup, shorter than K
    ]
    root = _docs(spark, rows, tmp_path)
    out = {r["keeper"]: r for r in dedup_prefix_cluster(spark, root).collect()}
    assert set(out) == {1, 4}
    assert out[1]["n_docs"] == 2 and out[1]["total_chars"] == 300
    assert out[4]["n_docs"] == 2 and out[4]["total_chars"] == 110


def test_prefix_cluster_single_shuffle(spark, tmp_path):
    from debezium_nats_cdc_spark.operators.dedup import dedup_prefix_cluster

    root = _docs(spark, [(1, "en", "s", 1, "t")], tmp_path)
    plan = formatted_plan(dedup_prefix_cluster(spark, root))
    assert count_exchanges(plan) == 1  # map-side partial agg, one shuffle


# ----------------------------------------------------- join_salted_skew


def test_salted_join_equals_unsalted(spark, tmp_path):
    from debezium_nats_cdc_spark.operators.joins import join_salted_skew

    # skewed: order 1 owns 40 of 46 lineitems
    orders = [(1, "1-URGENT"), (2, "2-HIGH"), (3, "3-MEDIUM")]
    lines = [(1, i % 7 + 1, 10.0 + i) for i in range(40)]
    lines += [(2, i + 1, 5.0) for i in range(5)] + [(3, 1, 2.5)]
    spark.createDataFrame(
        orders, "o_orderkey long, o_orderpriority string"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        lines, "l_orderkey long, l_linenumber int, l_extendedprice double"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))

    got = {r["o_orderpriority"]: r for r in
           join_salted_skew(spark, str(tmp_path)).collect()}
    assert got["1-URGENT"]["n_lineitems"] == 40
    assert got["1-URGENT"]["total_price"] == sum(10.0 + i for i in range(40))
    assert got["2-HIGH"]["n_lineitems"] == 5
    assert got["2-HIGH"]["total_price"] == 25.0
    assert got["3-MEDIUM"]["n_lineitems"] == 1
    assert got["3-MEDIUM"]["total_price"] == 2.5


def test_salted_join_spreads_the_key(spark, tmp_path):
    """The join key must be (key, salt): the physical join keys include
    the salt column, so one hot key hashes to SALT_FACTOR reducers; the
    hot set broadcasts to both sides."""
    from debezium_nats_cdc_spark.operators.joins import join_salted_skew
    from debezium_nats_cdc_spark.plans.explain import assert_broadcast_join

    spark.createDataFrame(
        [(1, "1-URGENT")], "o_orderkey long, o_orderpriority string"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, 1, 1.0)], "l_orderkey long, l_linenumber int, l_extendedprice double"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    df = join_salted_skew(spark, str(tmp_path))
    plan = formatted_plan(df)
    assert "_salt" in plan
    assert "CartesianProduct" not in plan
    assert_broadcast_join(df, at_least=2)  # hot set -> probe AND build


def test_salted_join_salts_only_hot_keys(spark, tmp_path):
    """Partial salting: a key above the threshold spreads over multiple
    salt values; a cold key stays on salt 0 with no build replication."""
    from debezium_nats_cdc_spark.operators import joins

    lines = [(1, i % 7 + 1, 1.0) for i in range(40)]  # hot (40 > 16)
    lines += [(2, 1, 1.0)] * 3                        # cold
    spark.createDataFrame(
        [(1, "H"), (2, "C")], "o_orderkey long, o_orderpriority string"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        lines, "l_orderkey long, l_linenumber int, l_extendedprice double"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))

    hot = (
        spark.read.parquet(str(tmp_path / "lineitem.parquet"))
        .groupBy("l_orderkey").count()
        .filter(F.col("count") > joins._HOT_KEY_THRESHOLD)
    )
    assert [r["l_orderkey"] for r in hot.collect()] == [1]
    out = {r["o_orderpriority"]: r for r in
           joins.join_salted_skew(spark, str(tmp_path)).collect()}
    assert out["H"]["n_lineitems"] == 40  # spread across salts, none lost
    assert out["C"]["n_lineitems"] == 3   # unreplicated cold path


# ----------------------------------------------- window_ntile_curriculum


def test_ntile_curriculum_buckets_per_lang(spark, tmp_path):
    from debezium_nats_cdc_spark.operators.windows import window_ntile_curriculum

    # en: lengths 80,70,...,10 -> quartiles of 2; fr: 3 docs -> 1,1,1
    rows = [(i, "en", "s", 80 - 10 * i, "t") for i in range(8)]
    rows += [(100 + i, "fr", "s", 30 - 10 * i, "t") for i in range(3)]
    root = _docs(spark, rows, tmp_path)
    out = {(r["lang"], r["quartile"]): r for r in
           window_ntile_curriculum(spark, root).collect()}
    assert out[("en", 1)]["n_docs"] == 2
    assert out[("en", 1)]["min_chars"] == 70 and out[("en", 1)]["max_chars"] == 80
    assert out[("en", 4)]["max_chars"] == 20
    # NTILE distributes the 3 fr docs 1/1/1 over the first 3 buckets
    assert [out[("fr", q)]["n_docs"] for q in (1, 2, 3)] == [1, 1, 1]
    assert ("fr", 4) not in out


def test_ntile_window_is_partitioned_by_lang(spark, tmp_path):
    from debezium_nats_cdc_spark.operators.windows import window_ntile_curriculum

    root = _docs(spark, [(1, "en", "s", 1, "t")], tmp_path)
    plan = formatted_plan(window_ntile_curriculum(spark, root))
    assert "hashpartitioning(lang" in plan  # parallel per-lang sort
    assert "SinglePartition" not in plan  # never a one-task global window


# ----------------------------------------------------- emb_norm_stats


def test_norm_stats_hand_computed(spark, tmp_path):
    from debezium_nats_cdc_spark.operators.quantize import emb_norm_stats

    rows = [
        (1, [3.0, 4.0], 0),          # norm 5
        (2, [0.0, 0.0], 0),          # zero vector
        (3, [1.0, 0.0], 1),          # norm 1
        (4, None, 1),                # NULL embedding: norm NULL
        (5, [], 1),                  # empty vector == zero vector
        (6, [3.0, None, 4.0], 1),    # NULL element skipped: norm 5
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    out = {r["label"]: r for r in emb_norm_stats(spark, str(tmp_path)).collect()}
    assert out[0]["n_vecs"] == 2 and out[0]["n_zero"] == 1
    assert out[0]["sum_norm"] == 5.0
    assert out[0]["min_norm"] == 0.0 and out[0]["max_norm"] == 5.0
    # NULL vector: counted, excluded from min/max/sum, not "zero";
    # empty vector: a zero vector; NULL element: skipped from the sum
    assert out[1]["n_vecs"] == 4 and out[1]["n_zero"] == 1
    assert out[1]["sum_norm"] == 6.0
    assert out[1]["min_norm"] == 0.0 and out[1]["max_norm"] == 5.0


def test_norm_stats_no_prejoin_shuffle(spark, tmp_path):
    from debezium_nats_cdc_spark.operators.quantize import emb_norm_stats

    spark.createDataFrame(
        [(1, [1.0], 0)], "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    plan = formatted_plan(emb_norm_stats(spark, str(tmp_path)))
    assert count_exchanges(plan) == 1  # map-side norm + one agg shuffle


# -------------------------------------------------- second r6 wave ----


def test_key_skew_report_hand_computed(spark, tmp_path):
    from debezium_nats_cdc_spark.operators.stats import stats_key_skew_report

    # user 1: 6 events, user 2: 3, user 3: 1  (total 10, 3 keys)
    rows = [(i, f"2024-01-0{1 + i % 5}", 1, "t", 1.0, "{}") for i in range(6)]
    rows += [(10 + i, "2024-01-01", 2, "t", 1.0, "{}") for i in range(3)]
    rows += [(20, "2024-01-01", 3, "t", 1.0, "{}")]
    spark.createDataFrame(
        [(r[0], r[1] + " 00:00:00", r[2], r[3], r[4], r[5]) for r in rows],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
        str(tmp_path / "events.parquet")
    )
    out = {r["user_id"]: r for r in
           stats_key_skew_report(spark, str(tmp_path)).collect()}
    assert [out[u]["rnk"] for u in (1, 2, 3)] == [1, 2, 3]
    assert out[1]["n_events"] == 6 and out[1]["share"] == 0.6
    # mean freq = 10/3; skew_ratio(user 1) = 6 / (10/3) = 1.8
    assert out[1]["skew_ratio"] == 1.8
    assert out[1]["total_rows"] == 10 and out[1]["n_keys"] == 3


def test_state_as_of_excludes_post_cutoff_events(spark, tmp_path):
    from debezium_nats_cdc_spark.operators.windows import window_state_as_of

    # max ts = Jan 10; cutoff = Jan 7.  user 1 updates on 1, 6, 9;
    # as-of state must be the Jan 6 event.  user 2 only after cutoff.
    rows = [
        (1, "2024-01-01 00:00:00", 1, "a", 1.0),
        (2, "2024-01-06 00:00:00", 1, "b", 2.0),
        (3, "2024-01-09 00:00:00", 1, "c", 3.0),
        (4, "2024-01-10 00:00:00", 2, "d", 4.0),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, "
              "value double",
    ).withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
        "props", F.lit("{}")
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = {r["user_id"]: r for r in
           window_state_as_of(spark, str(tmp_path)).collect()}
    assert set(out) == {1}
    assert out[1]["asof_event_id"] == 2 and out[1]["asof_value"] == 2.0


def test_dim_stats_hand_computed(spark, tmp_path):
    from debezium_nats_cdc_spark.operators.quantize import emb_dim_stats

    rows = [
        (1, [1.0, -2.0], 0),
        (2, [3.0, 4.0], 0),
        (3, None, 0),  # NULL vector excluded entirely
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    out = {r["pos"]: r for r in emb_dim_stats(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 1}
    assert out[0]["n_vals"] == 2 and out[0]["sum_x"] == 4.0
    assert out[0]["min_x"] == 1.0 and out[0]["max_x"] == 3.0
    assert out[1]["sum_x"] == 2.0 and out[1]["min_x"] == -2.0


# ------------------------------------------- salted-join property test


def test_salted_join_equals_plain_join_property(spark, tmp_path):
    """Model-based: over a spread of key distributions (uniform, heavy
    skew, hot key exactly at/over the threshold, keys without a build
    row), the salted join must equal a plain-join model computed in
    Python.  One Spark round-trip per distribution, model is exact."""
    from collections import defaultdict

    from debezium_nats_cdc_spark.operators import joins

    T = joins._HOT_KEY_THRESHOLD
    distributions = [
        {1: 1, 2: 1, 3: 1},              # uniform tiny (all-cold path)
        {1: T, 2: T + 1, 7: 3},          # at vs just-over threshold +
                                         #   probe key with no build row
        {1: 5 * T, 2: 1},                # heavy skew
        {1: T + 5, 9: T + 5, 2: 2},      # two hot keys, one cold
    ]
    orders = [(k, f"P{k}") for k in (1, 2, 3, 9)]
    for case, dist in enumerate(distributions):
        base = tmp_path / f"case{case}"
        base.mkdir()
        lines = [(k, i % 7 + 1, float(k * 100 + i))
                 for k, n in dist.items() for i in range(n)]
        spark.createDataFrame(
            orders, "o_orderkey long, o_orderpriority string"
        ).coalesce(1).write.parquet(str(base / "orders.parquet"))
        spark.createDataFrame(
            lines, "l_orderkey long, l_linenumber int, l_extendedprice double",
        ).coalesce(1).write.parquet(str(base / "lineitem.parquet"))

        model: dict[str, list[float]] = defaultdict(list)
        okeys = dict(orders)
        for k, _, price in lines:
            if k in okeys:
                model[okeys[k]].append(price)

        got = {r["o_orderpriority"]: (r["n_lineitems"], r["total_price"])
               for r in joins.join_salted_skew(spark, str(base)).collect()}
        want = {p: (len(v), round(sum(v), 2)) for p, v in model.items()}
        assert got == want, f"case {case} ({dist}): {got} != {want}"


def test_mixture_plan_rates_realize_the_target_mixture(spark):
    """End-to-end composition (r7): feed corpus_mixture_plan's per-lang
    rates through a deterministic hash coin (the sampling.py pattern)
    and check the REALIZED sample: the binding language keeps rate 1.0
    exactly, realized per-lang counts track expected_rows (hash-uniform
    deviation only), and the realized mixture lands near the target."""
    from pyspark.sql import functions as F

    from debezium_nats_cdc_spark.io import load_table
    from debezium_nats_cdc_spark.operators.curation import (
        _TARGET_MIX,
        corpus_mixture_plan,
    )

    SF = "/root/testdata/sf0.01"
    plan = {r["lang"]: r for r in corpus_mixture_plan(spark, SF).collect()}
    assert set(plan) == {lang for lang, _ in _TARGET_MIX}
    # exactly one binding language at rate 1.0, everything else below
    binding = [lang for lang, r in plan.items() if r["rate"] == 1.0]
    assert len(binding) == 1
    assert all(r["rate"] < 1.0 for lang, r in plan.items()
               if lang != binding[0])

    d = load_table(spark, SF, "documents")
    # uniform hash coin in [0,1): first 8 md5 hex chars / 16^8 — the
    # deterministic, rebuild-stable coin family sampling.py uses
    coin = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                   16, 10).cast("double") / F.lit(float(16 ** 8)))
    rates = F.create_map(*[x for lang, r in plan.items()
                           for x in (F.lit(lang), F.lit(r["rate"]))])
    sampled = (d.filter(F.col("lang").isin(list(plan)))
               .filter(coin < rates[F.col("lang")]))
    realized = {r["lang"]: r["n"] for r in
                sampled.groupBy("lang").agg(F.count("*").alias("n")).collect()}

    total = sum(realized.values())
    for lang, r in plan.items():
        got, want = realized.get(lang, 0), r["expected_rows"]
        assert abs(got - want) <= max(5, 0.2 * want), (lang, got, want)
        target_share = dict(_TARGET_MIX)[lang]
        assert abs(got / total - target_share) <= 0.08, (
            lang, got / total, target_share)
