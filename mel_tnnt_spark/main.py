"""spark-submit entry point for the KG-construction job.

Usage (cluster):
    zip -r mel_tnnt_spark.zip mel_tnnt_spark
    spark-submit --py-files mel_tnnt_spark.zip mel_tnnt_spark/main.py \
        --output /path/out --lineage /path/lineage --rows 200

On a real deployment `--source-table catalog.db.code_files` replaces
the synthetic generator. Prints one JSON line of run metrics
(triples/sec — the BASELINE.md throughput headline).
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", required=True, help="triples output dir")
    ap.add_argument("--lineage", default=None, help="lineage table dir (enables resume)")
    ap.add_argument("--rows", type=int, default=200, help="synthetic source rows")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--batch-id", default="batch-0")
    args = ap.parse_args()

    # Under spark-submit the session/master come from the launcher.
    spark = SparkSession.builder.appName("mel-tnnt-kg").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from mel_tnnt_spark.datagen import code_files_df
    from mel_tnnt_spark.operators.lineage import record_done, record_partition_metrics
    from mel_tnnt_spark.operators.triples import write_triples
    from mel_tnnt_spark.pipeline import run_pipeline

    import os

    src = code_files_df(spark, n_rows=args.rows, seed=args.seed)
    t0 = time.time()
    res = run_pipeline(spark, src, lineage_path=args.lineage)
    # Resume runs write ONLY their own batch partition (dynamic
    # partition overwrite keyed by batch_id) so earlier batches' triples
    # survive; a fresh run (no lineage yet) statically overwrites the
    # whole table. Replaying a failed batch rewrites the same partition
    # — idempotent. An empty pending set skips the write entirely.
    resuming = args.lineage is not None and os.path.exists(args.lineage)
    n_triples = res.triples.count()
    if n_triples:
        write_triples(
            res.triples, args.output, batch_id=args.batch_id if resuming else None
        )
    n_quarantined = res.quarantined.count()
    elapsed = time.time() - t0
    if args.lineage is not None:
        record_done(res.metadata, args.lineage, "kg", args.batch_id)
        # per-partition counters next to the lineage table: skew in the
        # mention stage shows up as an outlier (partition_id, rows) row
        if n_triples:
            record_partition_metrics(
                res.triples, args.lineage + "_pmetrics", "triples", args.batch_id
            )
    print(
        json.dumps(
            {
                "triples": n_triples,
                "quarantined": n_quarantined,
                "elapsed_sec": round(elapsed, 2),
                "triples_per_sec": round(n_triples / elapsed, 2) if elapsed else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
