"""Span-excision (q83 / ExactSubstr) at scale + under adversarial skew
(VERDICT r5 #2): the driver gate runs 200 docs; this measures

  1. full sf0.1 documents (all rows, k=5) — the real-corpus cost;
  2. a boilerplate-heavy adversarial corpus: one k-gram block shared
     by 50% of docs (the gram-hash shuffle skew case the operator's
     docstring names), with AQE skew-join settings at production
     defaults;
  3. the incremental twin maintain_span_index chained over the same
     adversarial corpus in batches (steady-state per-batch cost).

Prints one JSON line per scenario. Same fresh-session methodology as
the sibling bench scripts.

Usage: python scripts/excision_bench.py [--sf-dir /root/testdata/sf0.1]
       [--adv-docs 60000] [--batches 4]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--adv-docs", type=int, default=60000)
    ap.add_argument("--batches", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mel_tnnt_spark.operators.dedup import (
        excise_duplicate_spans,
        maintain_span_index,
    )
    from mel_tnnt_spark.session import get_spark

    spark = get_spark("excision-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. full sf0.1 corpus
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    t0 = time.time()
    out = excise_duplicate_spans(docs, "doc_id", "text", k=5)
    removed = out.agg(
        F.count("*").alias("docs"), F.sum("n_tokens_removed").alias("tok")
    ).collect()[0]
    dt = time.time() - t0
    print(json.dumps({
        "scenario": "sf0.1_full", "docs": n_docs, "sec": round(dt, 2),
        "docs_per_sec": round(n_docs / dt, 1),
        "tokens_removed": int(removed["tok"] or 0),
    }))

    # 2. adversarial: 50% of docs share one 8-token boilerplate block
    boiler = "all rights reserved terms of service apply here"
    adv = spark.range(args.adv_docs).select(
        F.col("id"),
        F.when(
            F.col("id") % 2 == 0,
            F.concat(
                F.lit(boiler + " "),
                F.concat_ws(
                    " ",
                    F.col("id").cast("string"),
                    F.sha2(F.col("id").cast("string"), 256),
                    F.sha2(F.concat(F.lit("b"), F.col("id").cast("string")), 256),
                ),
            ),
        ).otherwise(
            F.concat_ws(
                " ",
                F.sha2(F.concat(F.lit("c"), F.col("id").cast("string")), 256),
                F.sha2(F.concat(F.lit("d"), F.col("id").cast("string")), 256),
                F.sha2(F.concat(F.lit("e"), F.col("id").cast("string")), 256),
                F.sha2(F.concat(F.lit("f"), F.col("id").cast("string")), 256),
                F.sha2(F.concat(F.lit("g"), F.col("id").cast("string")), 256),
            )
        ).alias("text"),
    ).localCheckpoint(eager=True)
    t0 = time.time()
    adv_out = excise_duplicate_spans(adv, "id", "text", k=5)
    row = adv_out.agg(
        F.count("*").alias("docs"),
        F.sum("n_tokens_removed").alias("tok"),
        F.sum(F.when(F.col("n_tokens_removed") > 0, 1).otherwise(0)).alias(
            "docs_hit"
        ),
    ).collect()[0]
    dt = time.time() - t0
    # correctness spot: every even doc but the survivor loses exactly
    # the boilerplate (8 tokens; k=5 windows tile it), odd docs lose 0
    expect_hit = args.adv_docs // 2 - 1
    print(json.dumps({
        "scenario": "adversarial_boilerplate_50pct", "docs": args.adv_docs,
        "sec": round(dt, 2), "docs_per_sec": round(args.adv_docs / dt, 1),
        "docs_hit": int(row["docs_hit"]), "expect_hit": expect_hit,
        "tokens_removed": int(row["tok"] or 0),
        "exact": int(row["docs_hit"]) == expect_hit
        and int(row["tok"] or 0) == expect_hit * 8,
    }))

    # 3. incremental twin over the adversarial corpus, batch-chained
    idx = tempfile.mkdtemp(prefix="excision_bench_idx_")
    try:
        per = args.adv_docs // args.batches
        times = []
        for b in range(args.batches):
            batch = adv.where(
                (F.col("id") >= b * per) & (F.col("id") < (b + 1) * per)
            )
            t0 = time.time()
            maintain_span_index(spark, idx, batch, "id", "text", k=5).agg(
                F.sum("n_tokens_removed")
            ).collect()
            times.append(round(time.time() - t0, 2))
        print(json.dumps({
            "scenario": "incremental_chained", "batches": args.batches,
            "docs_per_batch": per, "batch_secs": times,
            "late_over_early": round(times[-1] / times[0], 2),
        }))
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
