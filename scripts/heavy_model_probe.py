"""Heavy-model memory probe: drive a multi-GB-weight model through the
mention mapInPandas stage and measure what the lazy-load design claims.

No real NLP wheel is installable in this container (no network, pip
prohibited — dated note in COVERAGE.md), so the probe uses
HeavyEmbeddingTokenModel: output-identical to the parity-pinned
VectorizedTokenModel, but its per-worker lazy load materializes
SPARK_GRAFT_HEAVY_MB of float32 "weights" (default 1024 MB — the
en_core_web_trf / flair-large ballpark). Claims validated:

1. loads per python worker <= 1 (one-time model load, reused across
   Arrow batches — reference analogue code/MEL/__init__.py:2351-2356);
2. per-worker peak RSS ~ weights + bounded overhead (no per-batch
   re-allocation, no leak across batches);
3. throughput under memory pressure, recorded in BENCH.md.

Usage: python scripts/heavy_model_probe.py [--mb 1024] [--cores 8]
       [--sf-dir /root/testdata/sf0.1]
Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=1024)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_HEAVY_MB"] = str(args.mb)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .appName("heavy-model-probe")
        .config("spark.sql.shuffle.partitions", str(args.cores * 2))
        .config("spark.driver.memory", "24g")
        .config("spark.local.dir", "/dev/shm/spark-heavy-probe")
        .config("spark.executorEnv.SPARK_GRAFT_HEAVY_MB", str(args.mb))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mel_tnnt_spark.operators.mentions import detect_mentions

    # initcap: corpus text is all-lowercase; title-casing makes every
    # token a model hit so the emit path is exercised, not just inference
    docs = (
        spark.read.parquet(f"{args.sf_dir}/documents.parquet")
        .selectExpr("cast(doc_id as string) as doc_id", "initcap(text) as preproc_text")
        .repartition(args.cores * 2)
    )
    n_docs = docs.count()

    t0 = time.time()
    mentions = detect_mentions(docs, models=("heavy_embedding_model",))
    n_mentions = mentions.count()
    elapsed = time.time() - t0

    # sample every persistent python worker (worker reuse keeps the
    # processes alive, and mapInPandas probes land on the SAME pandas
    # worker pool the mention stage used): report pid, peak RSS, and
    # the model-load counter from each worker process
    def probe(batches):
        import resource

        import pandas as pd

        from mel_tnnt_spark.operators.mentions import HeavyEmbeddingTokenModel

        for _ in batches:
            pass
        yield pd.DataFrame(
            [
                {
                    "pid": os.getpid(),
                    "rss_mb": resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024,
                    "loads": HeavyEmbeddingTokenModel._LOADS,
                    "resident": HeavyEmbeddingTokenModel._BLOCK is not None,
                }
            ]
        )

    workers = (
        spark.range(args.cores * 4, numPartitions=args.cores * 4)
        .mapInPandas(probe, "pid long, rss_mb long, loads long, resident boolean")
        .collect()
    )
    by_pid: dict[int, dict] = {}
    for w in workers:
        by_pid[w["pid"]] = w.asDict()
    loaded = [w for w in by_pid.values() if w["resident"]]

    print(
        json.dumps(
            {
                "mb_per_worker": args.mb,
                "cores": args.cores,
                "docs": n_docs,
                "mentions": n_mentions,
                "sec": round(elapsed, 2),
                "docs_per_sec": round(n_docs / elapsed, 1),
                "python_workers_seen": len(by_pid),
                "workers_with_model": len(loaded),
                "max_loads_per_worker": max((w["loads"] for w in by_pid.values()), default=0),
                "rss_mb_loaded_workers": sorted(w["rss_mb"] for w in loaded),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
