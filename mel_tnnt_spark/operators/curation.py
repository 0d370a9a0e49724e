"""Corpus-composition operators for pretraining-data curation: the
step that decides WHAT fraction of each domain/language/host makes it
into the training mix. Not in the reference (its pipeline selects by
extension/size only — code/NLP_NER/Sampling.py:25-166 and the
extension predicates in code/MEL/__init__.py); these are the added
large-scale-training operators the task brief calls for, modeled on
the published curation recipes (CCNet/RefinedWeb host-frequency caps,
DoReMi-style domain mixtures, token-budget corpus assembly).

All three operators are pure DataFrame plans (zero UDFs) and share one
scale discipline: the per-group rank/cumsum they need is computed with
a SKEW-HARDENED two-stage rank — a salted pre-prune bounds how many
rows of a pathological mega-group (one host owning 30% of a 100 TB
crawl is normal) ever reach the exact per-group window:

  stage 1: rank within (group, salt) — salt = hash(id) mod S, so the
           mega-group's rows split across S bounded partitions; any
           row whose TRUE group rank is <= cap also has within-salt
           rank <= cap (a subsequence preserves relative order), so
           keeping within-salt rank <= cap never drops a winner;
  stage 2: exact row_number over the pruned set — at most S*cap rows
           per group regardless of group size.

The exact window in stage 2 therefore sees O(S*cap) rows per group —
the operator's memory/shuffle profile is set by the CAP, not by the
skew of the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cap_per_group", "token_budget_select", "mixture_sample"]


def _ws_tokens(text_col: str) -> Column:
    """Whitespace token count — IDENTICAL to packing.pack_sequences
    and textstats.token_count's ws_tokens, so budgets agree with the
    packer's layout."""
    return F.size(
        F.filter(
            F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
            lambda t: t != F.lit(""),
        )
    ).cast("long")


def _salted_exact_rank(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    cap_col: Column,
    n_salts: int,
    id_col: str,
) -> DataFrame:
    """Two-stage skew-hardened per-group rank (see module docstring).
    `cap_col` may be a per-row column (e.g. a per-group quota joined
    from a broadcast dim). Emits `rank_in_group` (exact, 1-based) and
    keeps only rows with rank_in_group <= cap."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts))
    ).withColumn("_cap", cap_col)
    w1 = Window.partitionBy(group_col, "_salt").orderBy(*order_cols)
    pruned = (
        salted.withColumn("_rn1", F.row_number().over(w1))
        .where(F.col("_rn1") <= F.col("_cap"))
        .drop("_rn1", "_salt")
    )
    w2 = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        pruned.withColumn("rank_in_group", F.row_number().over(w2))
        .where(F.col("rank_in_group") <= F.col("_cap"))
        .drop("_cap")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    cap: int,
    n_salts: int = 16,
) -> DataFrame:
    """Host/domain frequency capping (CCNet/RefinedWeb "URL dedup +
    per-host cap"): keep at most `cap` rows per group, deterministic
    first-by-id order, with the group's exact 1-based `rank_in_group`
    attached. Skew-hardened: a group 1000x larger than the others
    costs one bounded salted window plus an exact window over at most
    n_salts*cap of its rows."""
    if cap < 1:
        raise ValueError(f"cap_per_group: cap must be >= 1, got {cap}")
    return _salted_exact_rank(
        df, group_col, [id_col], F.lit(cap), n_salts, id_col
    )


def token_budget_select(
    docs: DataFrame,
    group_col: str,
    id_col: str,
    text_col: str,
    budget: int,
) -> DataFrame:
    """Greedy per-group token-budget fill: walk each group's documents
    in id order accumulating whitespace-token counts; a document is
    kept iff the running total THROUGH it stays <= budget (prefix
    rule — deterministic, order-stable, no knapsack backtracking).
    Returns every document with (n_tokens, cum_tokens, kept) so the
    caller can audit the cut point.

    Scale: one shuffle on group_col for the running-sum window. The
    window itself is a running aggregate (constant state per row, no
    buffering of the frame), so a mega-group costs I/O, not memory;
    when only the kept prefix is wanted at extreme skew, pre-prune
    with cap_per_group(cap ~= budget / min_doc_tokens) first — the
    budget bounds how deep into any group the kept prefix can reach.
    """
    base = docs.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        _ws_tokens(text_col).alias("n_tokens"),
    )
    w = Window.partitionBy("grp").orderBy("id")
    return base.select(
        "id",
        F.col("grp").alias(group_col),
        "n_tokens",
        F.sum("n_tokens").over(w).alias("cum_tokens"),
    ).withColumn("kept", F.col("cum_tokens") <= F.lit(budget))


def mixture_sample(
    docs: DataFrame,
    group_col: str,
    id_col: str,
    shares: dict[str, float],
    total_docs: int,
    n_salts: int = 16,
) -> DataFrame:
    """Target-mixture domain sampling (the DoReMi/Pile recipe shape):
    given target proportions per group and a total document budget,
    select floor(share*total + 0.5) documents from each group,
    deterministically pseudo-random — each group is ordered by
    md5(id) (engine-portable, reproducible, no RNG state) and the
    first `quota` documents win. Groups absent from `shares` get
    quota 0 (dropped); a group smaller than its quota contributes
    everything it has (the caller sees the shortfall as
    max(rank_in_group) < quota).

    Returns (id, group, rank_in_group, quota) for the selected rows.

    Scale: the quota dim is a broadcast LocalRelation (|shares| rows);
    selection is the same salted two-stage rank as cap_per_group, so
    a group holding half the corpus never funnels through one task.
    """
    if total_docs < 0:
        raise ValueError(f"mixture_sample: total_docs must be >= 0, got {total_docs}")
    from mel_tnnt_spark.session import local_dim

    spark = docs.sparkSession
    quotas = [
        (g, int(s * total_docs + 0.5)) for g, s in sorted(shares.items())
    ]
    dim = local_dim(spark, quotas, "grp string, quota long")
    base = docs.select(
        F.col(id_col).alias("id"), F.col(group_col).alias("grp")
    ).join(F.broadcast(dim), "grp")
    ordered = base.withColumn("_h", F.md5(F.col("id").cast("string")))
    picked = _salted_exact_rank(
        ordered.where(F.col("quota") > 0),
        "grp",
        ["_h", "id"],
        F.col("quota"),
        n_salts,
        "id",
    )
    return picked.select(
        "id", F.col("grp").alias(group_col), "rank_in_group", "quota"
    )
