"""Tests for skew-salting helpers, the remaining summary shapes (A5
rollup, A6 nested aggregation, A8 stats), and observe() counters."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_salted_count_matches_plain(spark):
    from mel_tnnt_spark.operators.skew import salted_count

    # 90% of rows share one hot key
    df = spark.range(0, 10000).withColumn(
        "k", F.when(F.col("id") % 10 < 9, "hot").otherwise(F.concat(F.lit("cold"), F.col("id") % 7))
    )
    got = {(r["k"], r["count"]) for r in salted_count(df, "k", n_salts=8).collect()}
    exp = {(r["k"], r["count"]) for r in df.groupBy("k").count().collect()}
    assert got == exp


def test_salted_sum_and_join(spark):
    from mel_tnnt_spark.operators.skew import salted_join, salted_sum

    df = spark.range(0, 5000).withColumn("k", (F.col("id") % 3).cast("string")).withColumn(
        "v", F.col("id").cast("double")
    )
    got = {(r["k"], r["sum_v"]) for r in salted_sum(df, "k", "v", 8).collect()}
    exp = {(r["k"], r["sum(v)"]) for r in df.groupBy("k").agg(F.sum("v")).collect()}
    assert got == exp

    dim = spark.createDataFrame([("0", "a"), ("1", "b"), ("2", "c")], "k string, attr string")
    j_salted = salted_join(df, dim, "k", 4).groupBy("attr").count()
    j_plain = df.join(dim, "k").groupBy("attr").count()
    assert {tuple(r) for r in j_salted.collect()} == {tuple(r) for r in j_plain.collect()}


def test_summary_shapes(spark, code_files):
    from mel_tnnt_spark.operators import mentions, metadata, summaries
    from mel_tnnt_spark.operators.lineage import enforce_sha_invariant

    valid, _ = enforce_sha_invariant(code_files)
    m = mentions.detect_mentions(metadata.mel_stage(valid)).cache()

    fine = summaries.ner_summary(m)
    totals = summaries.ner_summary_totals(m)
    rollup = summaries.ner_summary_rollup(m)
    # the one-pass rollup must agree with both separate aggregations
    fine_from_rollup = {
        (r["doc_id"], r["entity"], r["category"], r["model"], r["cnt"])
        for r in rollup.where(~F.col("is_total") & F.col("model").isNotNull()).collect()
    }
    assert fine_from_rollup == {tuple(r) for r in fine.collect()}
    totals_from_rollup = {
        (r["doc_id"], r["entity"], r["cnt"]) for r in rollup.where(F.col("is_total")).collect()
    }
    assert totals_from_rollup == {tuple(r) for r in totals.collect()}

    agg = summaries.aggregated_summary(m)
    row = agg.where(F.size("by_model") > 1).first()
    assert row is not None and row["total"] == sum(x["cnt"] for x in row["by_model"])

    stats = summaries.descriptive_stats(fine).collect()
    assert stats and all(r["min_cnt"] <= r["median_cnt"] <= r["max_cnt"] for r in stats)


def test_descriptive_stats_mode_multimode(spark):
    """A8 mode/multimode vs python statistics semantics: mode is the
    smallest most-frequent value, multimode the sorted set of all
    most-frequent values."""
    import statistics

    from mel_tnnt_spark.operators import summaries

    data = {
        "a": [1, 2, 2, 3, 3, 9],   # bimodal {2, 3}
        "b": [5, 5, 5, 7],          # unimodal {5}
        "c": [4],                   # single value
    }
    rows = [(k, v) for k, vals in data.items() for v in vals]
    fine = spark.createDataFrame(rows, "entity string, cnt long")
    got = {r["entity"]: r for r in summaries.descriptive_stats(fine).collect()}
    for k, vals in data.items():
        mm = sorted(statistics.multimode(vals))
        assert got[k]["mode_cnt"] == mm[0]
        assert list(got[k]["multimode_cnt"]) == mm


def test_observed_counts(spark, code_files):
    from mel_tnnt_spark.operators.lineage import observed_counts
    from mel_tnnt_spark.operators.metadata import mel_stage, with_general_metadata

    meta = mel_stage(code_files)
    observed, obs = observed_counts(meta, "mel")
    n = observed.count()
    got = obs.get
    assert got["rows"] == n and got["docs"] > 0


def test_ensemble_intersect(spark, code_files):
    from mel_tnnt_spark.operators import mentions, metadata

    m = mentions.detect_mentions(metadata.mel_stage(code_files)).cache()
    both = mentions.ensemble_intersect(m, "gazetteer_conll_model", "gazetteer_onto_model")
    rows = both.collect()
    assert rows
    # every intersected span exists in both models' mention sets
    conll = {
        (r["doc_id"], r["entity"], r["start_index"], r["end_index"])
        for r in m.where(F.col("model") == "gazetteer_conll_model").collect()
    }
    onto = {
        (r["doc_id"], r["entity"], r["start_index"], r["end_index"])
        for r in m.where(F.col("model") == "gazetteer_onto_model").collect()
    }
    got = {(r["doc_id"], r["entity"], r["start_index"], r["end_index"]) for r in rows}
    assert got == (conll & onto)


def test_aqe_skew_join_split(spark):
    """AQE must split the hot partition of a skewed join at runtime
    (task-brief: 'salting for skew, AQE for runtime re-plan' — salting
    is operators/skew.py; this pins the AQE half). Operational catch
    pinned here: when the join is followed by an aggregation on the
    join key, OptimizeSkewedJoin is vetoed unless
    forceOptimizeSkewedJoin accepts the extra re-shuffle."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(500_000).select(
            F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id") % 1000).alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("pay"),
        )
        right = spark.range(1000).select(F.col("id").alias("k"), F.lit("d").alias("d"))
        j = left.join(right, "k").groupBy("k").count()
        got = {r["k"]: r["count"] for r in j.collect()}
        es = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "skew=true" in es, "AQE did not split the skewed join"
        # and the answer is still exact under the split
        assert got[0] == 250_000 and got[1] == 500
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
