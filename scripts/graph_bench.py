"""Scale evidence for the graph-query family (q102-q107): the shapes
that would break at 100 TB if the operators were naive, run at the
largest sizes this box handles comfortably.

1. transitive_closure on a DEEP chain — doubling must converge in
   log2(depth) rounds (naive propagation would need `depth` joins).
2. triangle_count on a STAR-dominated graph — degree-ordered
   orientation must keep wedge generation bounded (a src-grouped
   naive wedge join on a 100k-degree hub would enumerate C(100k, 2)
   ~= 5e9 wedges; orientation gives the hub out-degree 0).
3. pagerank_micro at ~1M distinct edges, 3 iterations.
4. maintain_transitive_closure folding equal-size batches — per-batch
   cost must stay flat (delta-proportional) as the stored closure
   grows.

Usage: python scripts/graph_bench.py [--cpus 32]
Prints one markdown table per probe (paste into BENCH.md).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mel_tnnt_spark.operators.graph_query import (
        maintain_transitive_closure,
        pagerank_micro,
        transitive_closure,
        triangle_count,
    )
    from mel_tnnt_spark.session import get_spark

    spark = get_spark(
        "graph-bench", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    # 1. deep chain: depth 2048 -> 11 doubling rounds, 2.1M closure rows
    depth = 2048
    chain = spark.range(1, depth + 1).select(
        F.col("id").alias("child"), (F.col("id") - 1).alias("parent")
    )
    t0 = time.time()
    n = transitive_closure(chain, "child", "parent", max_depth=depth).count()
    t_chain = time.time() - t0
    print(f"| closure: chain depth {depth} | {n:,} pairs | {t_chain:.1f} s | "
          f"{(n / t_chain):,.0f} pairs/s (11 doubling rounds vs {depth} naive) |")

    # 1b. broad ternary tree: 200k nodes, depth ~11
    tree_n = 200_000
    tree = spark.range(1, tree_n).select(
        F.col("id").alias("child"), F.expr("(id - 1) div 3").alias("parent")
    )
    t0 = time.time()
    n = transitive_closure(tree, "child", "parent", max_depth=64).count()
    t_tree = time.time() - t0
    print(f"| closure: ternary tree {tree_n:,} nodes | {n:,} pairs | "
          f"{t_tree:.1f} s | {(n / t_tree):,.0f} pairs/s |")

    # 2. star + ring: hub degree 100k, ring supplies 50k true triangles
    hub_deg, ring_n = 100_000, 50_000
    star = spark.range(hub_deg).select(
        F.lit("hub").alias("a"), F.concat(F.lit("leaf"), F.col("id")).alias("b")
    )
    ring = spark.range(ring_n).select(
        F.concat(F.lit("r"), F.col("id")).alias("a"),
        F.concat(F.lit("r"), (F.col("id") + 1) % ring_n).alias("b"),
    ).unionByName(
        spark.range(ring_n).select(
            F.concat(F.lit("r"), F.col("id")).alias("a"),
            F.concat(F.lit("r"), (F.col("id") + 2) % ring_n).alias("b"),
        )
    )
    t0 = time.time()
    tri = triangle_count(star.unionByName(ring), "a", "b")
    total = tri.agg(F.sum("n_triangles")).collect()[0][0]
    t_star = time.time() - t0
    print(f"| triangles: star(deg {hub_deg:,}) + ring({ring_n:,}) | "
          f"{total:,} node-participations | {t_star:.1f} s | "
          f"naive wedge join at the hub = C({hub_deg:,},2) ~= 5e9 wedges |")

    # 3. pagerank at ~1M edges (power-law-ish via modular hubs)
    m = 1_000_000
    e = spark.range(m).select(
        F.concat(F.lit("n"), (F.col("id") * 7919) % 200_000).alias("src"),
        F.concat(F.lit("n"), (F.col("id") * 104729) % (1 + (F.col("id") % 1000))).alias("dst"),
    )
    t0 = time.time()
    cnt = pagerank_micro(e, "src", "dst", iterations=3).count()
    t_pr = time.time() - t0
    print(f"| pagerank: ~{m / 1e6:.0f}M edge rows, 3 iters | {cnt:,} nodes | "
          f"{t_pr:.1f} s | one groupBy(dst) shuffle per iteration |")

    # 4. incremental closure: 8 equal forest batches, per-fold wall
    import shutil
    import tempfile

    state = tempfile.mkdtemp(prefix="graphbench_closure_")
    try:
        batch_n = 30_000
        times = []
        for k in range(8):
            lo = k * batch_n
            b = spark.range(lo + 1, lo + batch_n).select(
                F.col("id").alias("child"),
                F.expr(f"CASE WHEN id % 30000 = 0 THEN id ELSE {lo} + ((id - {lo} - 1) div 3) END").alias("parent"),
            )
            t0 = time.time()
            maintain_transitive_closure(spark, state, b, "child", "parent", max_depth=64)
            times.append(time.time() - t0)
        joined = ", ".join(f"{t:.1f}" for t in times)
        print(f"| incremental closure: 8 x {batch_n:,}-edge forest batches | "
              f"per-fold s: {joined} | late/early {times[-1] / times[0]:.2f} |")
    finally:
        shutil.rmtree(state, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
