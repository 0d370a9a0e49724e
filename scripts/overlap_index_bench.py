"""Contamination-index maintenance at scale (VERDICT r4 #3).

Round-4 defect: `maintain_overlap_index` recomputed the df-guard over
the FULL persisted fingerprint index every batch and its pair join
probed the whole index — O(index) per micro-batch, so "check a new
crawl against the corpus" got slower as the corpus grew. Round 5 keys
the index (fingerprint, id), buckets it on (fingerprint,) alone, and
prunes the batch probe to matching buckets with a broadcast semi-join;
the df-guard is recomputed over exactly the touched rows.

This script PINS the fix the way stream_cc_bench pinned streaming CC:
feed constant-size batches through `maintain_overlap_index` while the
index grows >=10x, and report per-batch wall time early vs late. Flat
latency = per-batch cost independent of index size. A final
chained-vs-scratch equality check guards correctness at this scale.

Corpus (deterministic, no RNG): each batch holds `docs_per_batch`
docs of ~60 unique tokens built from the doc id (disjoint shingle
sets across docs -> the index grows linearly, no accidental pairs),
PLUS one "contaminated" doc per batch that embeds the full text of
the PREVIOUS batch's first filler doc — so every batch must surface
exactly ONE pair, against a doc one batch old. Constant matched-set
size per batch isolates the index-size axis: any latency growth is
index-scan cost, not legitimately growing match work. (An earlier
design shared one paragraph across all batches; its matched set grew
linearly and confounded the measurement.)

Prints one JSON line: batches, final index rows, per-batch latency
stats, first-k vs last-k mean ratio (drift), pair-correctness verdict.

Usage: python scripts/overlap_index_bench.py [--batches 24] [--docs-per-batch 400]
"""

from __future__ import annotations

import argparse
import json
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

def _doc_text(doc_id: int) -> str:
    # ~60 tokens unique to this doc: shingles never collide across docs
    return " ".join(f"tok{doc_id}x{j}" for j in range(60))


def _batch_rows(b: int, docs_per_batch: int) -> list[tuple[int, str]]:
    base = b * docs_per_batch
    rows = [(base + j, _doc_text(base + j)) for j in range(docs_per_batch)]
    if b > 0:
        # one contaminated doc per batch (replaces the last filler):
        # embeds the PREVIOUS batch's first filler doc — exactly one
        # expected pair per batch, constant matched-set size
        rows[-1] = (
            base + docs_per_batch - 1,
            _doc_text((b - 1) * docs_per_batch)
            + " trailer "
            + _doc_text(base + docs_per_batch - 1),
        )
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=24)
    ap.add_argument("--docs-per-batch", type=int, default=400)
    ap.add_argument("--n-buckets", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from mel_tnnt_spark.operators.dedup import (
        maintain_overlap_index,
        overlap_pairs_against,
        read_overlap_index,
        winnowing_fingerprints,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("overlap-index-bench")
        # batch-sized work: small shuffle width, per-batch latency is
        # task overhead at this scale, not data volume
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="overlap_bench_")
    idx = str(Path(tmp) / "fpindex")
    lat: list[float] = []
    pair_ok = True
    all_rows: list[tuple[int, str]] = []
    t_all = time.monotonic()
    try:
        for b in range(args.batches):
            rows = _batch_rows(b, args.docs_per_batch)
            batch = spark.createDataFrame(rows, "id bigint, text string")
            t0 = time.monotonic()
            pairs = maintain_overlap_index(
                spark, idx, batch, "id", "text",
                min_shared=2, max_df=None, n_buckets=args.n_buckets,
            )
            got = {(r["corpus_id"], r["batch_id"]) for r in pairs.collect()}
            lat.append(time.monotonic() - t0)
            if b > 0:
                # exactly one pair: the contaminated doc vs the
                # previous batch's first filler it embeds
                contam = b * args.docs_per_batch + args.docs_per_batch - 1
                want = {((b - 1) * args.docs_per_batch, contam)}
                if got != want:
                    pair_ok = False
                    print(
                        f"# batch {b}: pairs mismatch "
                        f"(got {len(got)}, want {len(want)})",
                        file=sys.stderr,
                    )
            all_rows.extend(rows)

        n_index = read_overlap_index(spark, idx).count()

        # chained == scratch spot check on the LAST batch
        last = _batch_rows(args.batches - 1, args.docs_per_batch)
        prior = all_rows[: -len(last)]
        cfp = winnowing_fingerprints(
            spark.createDataFrame(prior, "id bigint, text string"),
            "id", "text",
        )
        scratch = {
            (r["corpus_id"], r["batch_id"])
            for r in overlap_pairs_against(
                cfp,
                spark.createDataFrame(last, "id bigint, text string"),
                "id", "text", min_shared=2, max_df=None,
            ).collect()
        }
        contam = (args.batches - 1) * args.docs_per_batch + args.docs_per_batch - 1
        want_last = {((args.batches - 2) * args.docs_per_batch, contam)}
        scratch_ok = scratch == want_last

        k = max(3, args.batches // 8)
        # skip batch 0 (index creation) and batch 1 (JIT/first probe)
        early = statistics.mean(lat[2 : 2 + k])
        late = statistics.mean(lat[-k:])
        out = {
            "metric": "overlap_index_per_batch_flatness",
            "batches": args.batches,
            "docs_per_batch": args.docs_per_batch,
            "n_buckets": args.n_buckets,
            "index_rows_final": n_index,
            "index_growth_x": round(args.batches, 1),
            "per_batch_sec": {
                "min": round(min(lat), 3),
                "median": round(statistics.median(lat), 3),
                "p90": round(sorted(lat)[int(0.9 * len(lat))], 3),
                "max": round(max(lat), 3),
            },
            "early_mean_sec": round(early, 3),
            "late_mean_sec": round(late, 3),
            "late_over_early": round(late / early, 3),
            "pairs_correct_all_batches": pair_ok,
            "last_batch_equals_scratch": scratch_ok,
            "wall_sec": round(time.monotonic() - t_all, 1),
        }
        print(json.dumps(out))
        return 0 if (pair_ok and scratch_ok) else 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
