"""Count-min sketch as a relational operator (task-brief "novel
sketch" family, alongside MinHash/SimHash in dedup.py and the HLL
approx_count_distinct used by the lineage counters).

Role at 100 TB: heavy-hitter / frequency estimation over an unbounded
key domain in O(depth x width) memory instead of O(distinct keys) —
the groupBy("key").count() it approximates needs a shuffle sized by
the key cardinality; the sketch's shuffle is capped at depth*width
rows regardless of input size, and sketches of disjoint batches merge
by cell-wise addition (semigroup), so it composes with the rollup /
MERGE machinery.

Fully relational: explode depth rows per input row, hash into width
columns with the engine-portable md5 hash (same expression the DuckDB
oracle uses), ONE groupBy with map-side combine. Estimation is the
classic min over the key's depth cells (>= true count, never under).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cell(key_expr: str, d: str, width: int) -> str:
    # portable 60-bit md5 hash (see dedup._h), bucketed to the sketch width
    return (
        f"CAST(conv(substr(md5(concat({key_expr}, '#', cast({d} as string))), 1, 15), 16, 10) "
        f"AS BIGINT) % {width}"
    )


def count_min_sketch(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the sketch: one row per non-empty cell —
    (d, w, cnt) with w = H_d(key) % width. Shuffle size <= depth*width
    rows; map-side combine collapses the per-partition explosion."""
    return (
        df.select(F.col(key_col).alias("k"), F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"))
        .groupBy("d", F.expr(_cell("k", "d", width)).alias("w"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, keys: DataFrame, key_col: str, depth: int, width: int) -> DataFrame:
    """Point queries: estimate = min over the key's depth cells.
    `keys` is small (the probe set) — the lookup is a broadcast join of
    the probes' cells against the sketch."""
    probes = keys.select(F.col(key_col).alias("k")).distinct().select(
        "k", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    ).select("k", "d", F.expr(_cell("k", "d", width)).alias("w"))
    return (
        F.broadcast(probes)
        .join(sketch, ["d", "w"], "left")
        .groupBy("k")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
        .select(F.col("k").alias(key_col), "est")
    )
