"""Canonical category join (J9) and the summary aggregations (A5-A8).

Reference anchors:
- NER.postProcessing builds NLP-NER-Summary: count per (doc, entity,
  category, model) plus per-(doc, entity) totals
  (code/MEL/__init__.py:2501-2545 — composite '|/*-$#~|' keys at
  2525-2526, totals 2541-2543).
- Aggregated summaries / by-category variants:
  code/NLP_NER_API/analysis/aggregation.py:156-325.
- Stats suite: aggregation.py:70-146 (max/min/mean/median/mode/stdev/
  variance/quartiles over per-entity model counts).

All are plain hash aggregations — partial (map-side) aggregation and
AQE-coalesced shuffles come free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mel_tnnt_spark.config import label_classification_rows


def label_classification_df(spark: SparkSession) -> DataFrame:
    """The (model, category) -> tnnt:* dim table
    (code/NLP_NER_API/config.json:228-513). Tiny: always broadcast;
    materialized once per session (static config — see linking._memo)."""
    from mel_tnnt_spark.operators.linking import _memo
    from mel_tnnt_spark.session import local_dim

    return _memo(
        spark,
        "label_classification",
        lambda: local_dim(
            spark,
            label_classification_rows(),
            "model string, category string, tnnt_label string",
        ),
    )


def canonicalize(mentions: DataFrame, label_map: DataFrame) -> DataFrame:
    """J9 — broadcast join to the canonical tnnt:* space (applied in the
    reference at aggregation.py:229-242). Left join: unmapped raw
    categories keep NULL tnnt_label (reference skips them when
    regrouping; we keep the row so nothing is silently lost)."""
    return mentions.join(F.broadcast(label_map), ["model", "category"], "left")


def ner_summary(mentions: DataFrame) -> DataFrame:
    """A5 — fine-grained summary: count per (doc, entity, category,
    model). The reference's composite string key is just this group-by
    key; long rows replace the '|/*-$#~|' encoding."""
    return (
        mentions.groupBy("doc_id", "entity", "category", "model")
        .count()
        .withColumnRenamed("count", "cnt")
    )


def ner_summary_totals(mentions: DataFrame) -> DataFrame:
    """A5 totals — per-(doc, entity) overall count
    (code/MEL/__init__.py:2541-2543)."""
    return mentions.groupBy("doc_id", "entity").count().withColumnRenamed("count", "total")


def ner_summary_rollup(mentions: DataFrame) -> DataFrame:
    """A5 in ONE pass via ROLLUP over (model, category): yields both the
    fine rows and the per-(doc, entity) totals with grouping flags —
    one shuffle instead of two at 10^12-file scale."""
    return (
        mentions.rollup("doc_id", "entity", "category", "model")
        .count()
        .where(F.col("doc_id").isNotNull() & F.col("entity").isNotNull())
        .withColumn("is_total", F.col("category").isNull() & F.col("model").isNull())
        .withColumnRenamed("count", "cnt")
    )


def aggregated_summary(mentions: DataFrame) -> DataFrame:
    """A6 — cross-model aggregation (update_aggregation,
    aggregation.py:298-325): per (doc, entity) the list of
    {model, category, count} plus running total, as nested columns."""
    fine = ner_summary(mentions)
    return fine.groupBy("doc_id", "entity").agg(
        F.collect_list(F.struct("model", "category", "cnt")).alias("by_model"),
        F.sum("cnt").alias("total"),
    )


def summary_by_category(canon: DataFrame) -> DataFrame:
    """A7 — regroup by canonical label (aggregated_Summary_By_Category,
    aggregation.py:220-249): totals per (doc, tnnt_label)."""
    return (
        canon.where(F.col("tnnt_label").isNotNull())
        .groupBy("doc_id", "tnnt_label")
        .count()
        .withColumnRenamed("count", "total")
    )


def descriptive_stats(fine_summary: DataFrame, key: str = "entity") -> DataFrame:
    """A8 — the full stats suite over per-entity model counts
    (aggregation.py:70-146, which includes statistics.mode/multimode).
    `percentile` is the exact interpolated percentile; mode/multimode
    come from a value histogram: mode = smallest value among the
    most-frequent (the reference's `mode` takes the first-seen, which is
    nondeterministic under parallel scan order — smallest is the
    deterministic refinement), multimode = ALL most-frequent values,
    sorted (reference returns first-seen order)."""
    hist = fine_summary.groupBy(key, "cnt").agg(F.count("*").alias("_c"))
    modes = (
        hist.groupBy(key)
        .agg(
            F.expr("min_by(cnt, struct(-_c, cnt))").alias("mode_cnt"),
            F.max("_c").alias("_mc"),
            F.collect_list(F.struct("_c", "cnt")).alias("_h"),
        )
        .select(
            key,
            "mode_cnt",
            F.array_sort(
                F.expr("transform(filter(_h, s -> s._c = _mc), s -> s.cnt)")
            ).alias("multimode_cnt"),
        )
    )
    base = fine_summary.groupBy(key).agg(
        F.max("cnt").alias("max_cnt"),
        F.min("cnt").alias("min_cnt"),
        F.round(F.avg("cnt"), 4).alias("mean_cnt"),
        F.round(F.expr("percentile(cnt, 0.5)"), 4).alias("median_cnt"),
        F.round(F.coalesce(F.stddev_samp("cnt"), F.lit(0.0)), 4).alias("stdev_cnt"),
        F.round(F.coalesce(F.var_samp("cnt"), F.lit(0.0)), 4).alias("variance_cnt"),
        F.round(F.expr("percentile(cnt, 0.25)"), 4).alias("q1_cnt"),
        F.round(F.expr("percentile(cnt, 0.75)"), 4).alias("q3_cnt"),
        F.sum("cnt").alias("sum_cnt"),
        F.count("*").alias("n_groups"),
    )
    return base.join(modes, key)


# F17 — summary filters (entity-surface classification).
# Reference: code/NLP_NER_API/analysis/filter_summary.py:9-57 — four
# filters over aggregated-summary entity keys: contains-a-digit,
# only-numeric, only-alphabetic, looks-like-a-website. Two reference
# quirks preserved exactly:
#   * only_num / only_alpha ignore punctuation and spaces, and an
#     entity made ONLY of punctuation/spaces passes both (all([]) is
#     True in the reference's list comprehension);
#   * is_url is an unanchored SEARCH with an optional scheme prefix,
#     so any token containing "x.yz" (2-6 letter TLD-ish tail) hits.
# All four are single JVM-side rlike predicates — no UDF, no shuffle.
_URL_RE = (
    r"((http|https)\:\/\/)?[a-zA-Z0-9\.\/\?\:@\-_=#]+"
    r"\.([a-zA-Z]){2,6}([a-zA-Z0-9\.\&\/\?\:@\-_=#])*"
)


def summary_filters(df: DataFrame, entity_col: str = "entity") -> DataFrame:
    """Classify each entity surface with the reference's four filter
    predicates as boolean columns (relational form: one projection,
    callers filter on the flag they want — filternum/filterOnlyNum/
    filterOnlyString/filterwebsite each correspond to one column).

    Divergence note: the reference uses Python's Unicode-aware
    str.isdigit/isalpha; these predicates use ASCII classes, identical
    on the reference's English corpora and on the gated tables. For a
    Unicode-faithful variant, swap [0-9]->\\p{Nd} and
    [A-Za-z]->\\p{L} (Java regex supports both JVM-side)."""
    e = F.col(entity_col)
    return df.withColumns(
        {
            # \p{Punct} (Java) == string.punctuation == [[:punct:]] (RE2):
            # the same 32 ASCII chars — parity pinned in the q63 oracle.
            "has_digit": e.rlike("[0-9]"),
            "only_num": ~e.rlike(r"[^0-9\p{Punct} ]"),
            "only_alpha": ~e.rlike(r"[^A-Za-z\p{Punct} ]"),
            "is_url": e.rlike(_URL_RE),
        }
    )
