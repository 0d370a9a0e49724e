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


# --- HyperLogLog ------------------------------------------------------------

HLL_HASH_BITS = 60  # portable md5-60bit base hash (same as the CMS)


def hll_registers(df: DataFrame, key_col: str, p: int = 8) -> DataFrame:
    """HyperLogLog register table: (bucket, register) with
    bucket = low p bits of the portable 60-bit key hash and
    register = max over keys of rho(w), the 1-based position of the
    highest set bit counted from the top of the remaining
    (60-p)-bit window (w == 0 -> 60-p+1, the sentinel for an all-zero
    window). Flajolet et al. 2007 semantics.

    Relational shape mirrors the count-min sketch: one codegen hash
    per row, a single map-side-combined groupBy whose shuffle is
    capped at 2^p rows REGARDLESS of input cardinality — the sketch
    for distinct-count questions at 100 TB, where exact
    count(DISTINCT) is a full shuffle of every key. Only non-empty
    buckets emit a row (absent bucket == register 0); the estimator
    accounts for them. rho is integer-exact in both engines via the
    length of the base-2 string (no float log2 near power-of-two
    boundaries)."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    win = HLL_HASH_BITS - p
    h = F.expr(_h60(key_col))
    bucket = h.bitwiseAND(F.lit(m - 1))
    w = F.shiftrightunsigned(h, p)
    bits = F.length(F.conv(w.cast("string"), 10, 2))  # floor(log2(w)) + 1, exact
    rho = F.when(w == 0, F.lit(win + 1)).otherwise(F.lit(win) - bits + 1)
    # the table CARRIES p (one constant column): hll_estimate and
    # hll_merge validate against it, so a mismatched-p call can never
    # silently corrupt the estimate in either direction (round-4
    # review find: the data-range check alone cannot catch
    # built-small/estimated-large)
    return (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("register"))
        .withColumn("p", F.lit(p))
    )


def _h60(key_expr: str) -> str:
    return f"CAST(conv(substr(md5(CAST({key_expr} AS STRING)), 1, 15), 16, 10) AS BIGINT)"


def hll_estimate(registers: DataFrame, p: int | None = None) -> float:
    """Cardinality estimate from a register table (<= 2^p rows —
    bounded driver collect, like the CMS probe set). Standard HLL
    estimator with the small-range linear-counting correction; the
    large-range correction is unnecessary at 60 hash bits for any
    realistic cardinality.

    p handling (round-4 advice + review): the table CARRIES p, which
    is authoritative — pass p only as a cross-check (mismatch raises).
    A table holding more than one distinct p (e.g. a merge of
    differently-sized sketches) raises. Legacy tables without the p
    column require the p argument and get the weaker data-range check
    (bucket < 2^p, register <= 60-p+1), which cannot catch the
    built-small/estimated-large direction — carrying p closes it."""
    import math

    rows = registers.collect()
    if rows and "p" in rows[0].asDict():
        ps = {r["p"] for r in rows}
        if len(ps) > 1:
            raise ValueError(f"register table mixes p values {sorted(ps)}")
        table_p = ps.pop() if ps else None
        if table_p is not None:
            if p is not None and p != table_p:
                raise ValueError(
                    f"register table carries p={table_p}, estimate called with p={p}"
                )
            p = table_p
    if p is None:
        raise ValueError("empty/legacy register table: pass p explicitly")
    m = 1 << p
    regs = {r["bucket"]: r["register"] for r in rows}
    win = HLL_HASH_BITS - p
    for b, v in regs.items():
        if not 0 <= b < m:
            raise ValueError(
                f"register table inconsistent with p={p}: bucket {b} >= 2^{p}"
            )
        if not 0 < v <= win + 1:
            raise ValueError(
                f"register table inconsistent with p={p}: register {v} "
                f"outside [1, {win + 1}]"
            )
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1 + 1.079 / m))
    denom = sum(2.0 ** -regs.get(b, 0) for b in range(m))
    raw = alpha * m * m / denom
    zeros = m - len([v for v in regs.values() if v > 0])
    if raw <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return raw


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Register-wise max — HLL's semigroup merge (sketch of the union),
    the property that lets 100 TB partitions sketch independently.
    p is part of the group key: merging sketches of DIFFERENT p does
    not silently mix registers — the mixed-p result is rejected by
    hll_estimate's one-distinct-p check."""
    extra = ["p"] if "p" in a.columns else []
    return (
        a.unionByName(b)
        .groupBy("bucket", *extra)
        .agg(F.max("register").alias("register"))
        .select("bucket", "register", *extra)
    )
