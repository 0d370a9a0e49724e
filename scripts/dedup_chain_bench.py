"""End-to-end dedup decision chain at full corpus scale (VERDICT r4 #8).

Runs the REAL pair generators (the q18/q35/q62 gate configurations:
n-gram Jaccard with the df<=20 hot-shingle cap, MinHash-LSH 8x4,
SimHash 16-bit banded) over the ENTIRE sf documents corpus — not the
150-doc gate fixture — unions their pairs, and drives the full
decision chain: dedup_clusters (connected components + survivor
election) -> curation_decision (composite keep/drop verdict). Records
wall time, pair/cluster/survivor/verdict stats, and property-checks
survivor STABILITY under pair-order shuffling at that scale (the
survivor election must be a pure function of the pair SET — min-id
survivor per component — never of partitioning, row order, or pair
orientation).

Usage: python scripts/dedup_chain_bench.py [--sf-dir /root/testdata/sf0.1]
Prints one JSON line and a BENCH.md-ready markdown row.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    # 16 bits is the q62 GATE config; over this corpus's deliberately
    # tiny vocabulary it links nearly everything (a useful negative:
    # signature width is the knob that keeps the pair graph sparse at
    # scale). 32/64 bits is the production posture.
    ap.add_argument("--simhash-bits", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mel_tnnt_spark.operators.dedup import (
        dedup_clusters,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_pairs,
    )
    from mel_tnnt_spark.operators.textstats import curation_decision
    from mel_tnnt_spark.session import get_spark

    spark = get_spark(
        "dedup-chain", master=f"local[{args.cpus}]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet").select(
        F.col("doc_id").alias("id"), "text"
    )
    n_docs = docs.count()

    def pair_union():
        jac = ngram_jaccard_pairs(docs, "id", "text", n=2, threshold=0.08, max_df=20)
        mh = minhash_lsh_pairs(docs, "id", "text", n=3, k=8, bands=4)
        sh = simhash_pairs(docs, "id", "text", bits=args.simhash_bits, max_hamming=3)
        return (
            jac.select("id_a", "id_b")
            .unionByName(mh.select("id_a", "id_b"))
            .unionByName(sh.select("id_a", "id_b"))
            .distinct()
        )

    # --- timed end-to-end run: generators -> union -> CC+survivors ->
    # composite verdict, one action at the end --------------------------
    t0 = time.time()
    pairs = pair_union()
    verdict = curation_decision(docs, pairs, id_col="id", text_col="text")
    hist = {
        r["reason"] or "kept": r["n"]
        for r in verdict.groupBy("reason").agg(F.count("*").alias("n")).collect()
    }
    wall = time.time() - t0

    n_pairs = pairs.count()
    per_gen = {
        "jaccard": ngram_jaccard_pairs(
            docs, "id", "text", n=2, threshold=0.08, max_df=20
        ).count(),
        "minhash_lsh": minhash_lsh_pairs(docs, "id", "text", n=3, k=8, bands=4).count(),
        "simhash": simhash_pairs(
            docs, "id", "text", bits=args.simhash_bits, max_hamming=3
        ).count(),
    }
    cl = dedup_clusters(docs.select("id"), pairs)
    n_survivors = cl.where("is_survivor").count()
    n_clusters = cl.select("cluster_id").distinct().count()

    # --- survivor stability under pair-order shuffling -----------------
    # same pair SET, adversarially re-ordered: rows shuffled to random
    # partitions in random order AND orientation flipped (a<->b swapped
    # where the CC edge direction must not matter)
    base = {r["id"]: r["survivor_id"] for r in cl.collect()}
    shuffled = (
        pairs.withColumn("_r", F.rand(7))
        .repartition(17, "_r")
        .sortWithinPartitions("_r")
        .select(
            F.when(F.col("_r") < 0.5, F.col("id_b")).otherwise(F.col("id_a")).alias("id_a"),
            F.when(F.col("_r") < 0.5, F.col("id_a")).otherwise(F.col("id_b")).alias("id_b"),
        )
    )
    redo = {
        r["id"]: r["survivor_id"]
        for r in dedup_clusters(docs.select("id"), shuffled).collect()
    }
    stable = base == redo

    rec = {
        "metric": "dedup_chain_end_to_end_sec",
        "value": round(wall, 3),
        "unit": "sec",
        "sf_dir": args.sf_dir,
        "docs": n_docs,
        "pairs": n_pairs,
        "pairs_per_generator": per_gen,
        "simhash_bits": args.simhash_bits,
        "clusters": n_clusters,
        "survivors": n_survivors,
        "verdicts": hist,
        "survivors_stable_under_pair_shuffle": stable,
        "cpus": args.cpus,
    }
    print(json.dumps(rec, separators=(",", ":")))
    print(
        f"| dedup chain (3 generators -> CC -> verdict) | {args.sf_dir} | "
        f"{n_docs} docs | {n_pairs} pairs (simhash bits={args.simhash_bits}) | {n_clusters} clusters / "
        f"{n_survivors} survivors | {wall:.2f} s | shuffle-stable: {stable} |"
    )
    spark.stop()
    return 0 if stable else 1


if __name__ == "__main__":
    raise SystemExit(main())
