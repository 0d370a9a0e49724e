"""As-of join: attach to each probe row the most recent state row with
state.ts <= probe.ts for the same key.

Spark has no ASOF JOIN operator (task-brief custom-operator family —
as-of / range joins). The naive formulation (theta-join on key and
ts-inequality, then max_by) degenerates to a per-key cartesian. The
scale-safe formulation used here is the union trick:

  1. tag state rows 0, probe rows 1;
  2. union on (key, ts, tag);
  3. ONE window per key ordered by (ts, tag, seq): last non-null state
     payload over rows-unbounded-preceding (ignoreNulls) carries the
     current state forward;
  4. keep probe rows.

Cost: one shuffle + one sort of |probe| + |state| rows — the same cost
profile as a windowed aggregate, no join explosion, AQE-skew-friendly.
Tag order (state before probe at equal ts) gives the inclusive <=
semantics of DuckDB's ASOF JOIN; state rows are pre-deduped to one per
(key, ts) by max seq so equal-timestamp ties are deterministic on both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    probe: DataFrame,
    state: DataFrame,
    key: str,
    ts: str,
    payload_cols: list[str],
    seq_col: str | None = None,
    probe_id_col: str | None = None,
) -> DataFrame:
    """Left as-of join: probe columns + `asof_<payload>` columns from
    the latest state row at-or-before the probe's ts (NULL if none).
    `seq_col` (e.g. an event id) breaks equal-ts ties deterministically:
    the HIGHEST seq wins, mirroring arg_max in the oracle.

    All payload columns are carried as ONE struct per state row, so the
    result always comes from a single state row and a NULL payload value
    in the latest state row is preserved (not skipped for an older
    non-null value) — matching native ASOF JOIN row semantics.

    `probe_id_col` (a UNIQUE, NON-NULL probe row id) switches to the
    slim path: only (key, ts, tag, id) flows through the window sort,
    and the wide probe columns are re-attached by an equi-join on the
    id afterward — for wide probe tables this keeps the window
    exchange narrow. A NULL id would drop its asof values in the
    rejoin; use the full-carry path (probe_id_col=None) if ids can be
    NULL."""
    payload_struct = F.struct(*[F.col(c) for c in payload_cols])
    if seq_col is not None:
        # max_by over the struct keeps the dedup row-coherent too: all
        # payload fields come from the single highest-seq row.
        state = state.groupBy(key, ts).agg(
            F.max_by(payload_struct, F.col(seq_col)).alias("_s")
        )
    else:
        state = state.select(F.col(key), F.col(ts), payload_struct.alias("_s"))
    s = state.select(F.col(key), F.col(ts), F.lit(0).alias("_tag"), F.col("_s"))
    s_type = s.schema["_s"].dataType
    if probe_id_col is not None:
        p = probe.select(
            F.col(key), F.col(ts), F.lit(1).alias("_tag"),
            F.lit(None).cast(s_type).alias("_s"),
            F.col(probe_id_col).alias("_rid"),
        )
        s = s.withColumn("_rid", F.lit(None).cast(p.schema["_rid"].dataType))
    else:
        p = probe.select(
            F.col(key), F.col(ts), F.lit(1).alias("_tag"),
            F.lit(None).cast(s_type).alias("_s"),
            F.struct(*probe.columns).alias("_row"),
        )
        s = s.withColumn("_row", F.lit(None).cast(p.schema["_row"].dataType))
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = s.unionByName(p).select(
        "_tag",
        "_rid" if probe_id_col is not None else "_row",
        F.last("_s", ignorenulls=True).over(w).alias("_asof"),
    ).where(F.col("_tag") == 1)
    asof_cols = [F.col("_asof")[c].alias(f"asof_{c}") for c in payload_cols]
    if probe_id_col is not None:
        slim = carried.select(F.col("_rid").alias(probe_id_col), *asof_cols)
        return probe.join(slim, probe_id_col, "left")
    return carried.select(
        *[F.col("_row")[c].alias(c) for c in probe.columns], *asof_cols
    )


def range_join(
    probe: DataFrame,
    intervals: DataFrame,
    key: str,
    ts: str,
    start: str,
    end: str,
    bucket_secs: int = 600,
) -> DataFrame:
    """Range join: probe rows matched to every interval of the same key
    with start <= ts <= end (inclusive both ends).

    The naive theta-join (key equality + two inequalities) makes
    Catalyst fall back to a per-key nested loop — quadratic on hot
    keys. Scale-safe formulation: quantize time into fixed buckets,
    explode each interval to the buckets it spans, bucket the probe
    ts, EQUI-join on (key, bucket), then apply the exact range filter.
    Join fan-out is bounded by interval_span/bucket_secs; each
    (probe, interval) pair meets in exactly one bucket (the probe's),
    so no dedup pass is needed. Pick bucket_secs near the typical
    interval length: too small explodes the interval side, too large
    degrades toward the cartesian per bucket."""
    p = probe.withColumn("_bkt", (F.unix_timestamp(ts) / bucket_secs).cast("long"))
    iv = (
        intervals.where(F.col(start) <= F.col(end))
        .withColumn(
            "_bkt",
            F.explode(
                F.sequence(
                    (F.unix_timestamp(start) / bucket_secs).cast("long"),
                    (F.unix_timestamp(end) / bucket_secs).cast("long"),
                )
            ),
        )
    )
    return p.join(iv, [key, "_bkt"]).where(
        (F.col(ts) >= F.col(start)) & (F.col(ts) <= F.col(end))
    ).drop("_bkt")
