"""VM scaling-ceiling probes (the controls quoted in BENCH.md).

Two probes, same min-of-trials fresh-process methodology as
scripts/scaling.py:

  --probe codegen : pure Spark whole-stage-codegen compute (sha2+rlike
                    over range) at local[2] vs local[8] — the Spark-side
                    ceiling of this box.
  --probe kernel  : the pipeline's own python string kernel
                    (clean+preprocess+detect over identical docs) under
                    multiprocessing, NO Spark — proves the string stage
                    itself is not the non-scaling component.

Both print one JSON line with t2/t8/speedup/ceiling_eff.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

_CODEGEN_SINGLE = """
import time, sys
from pyspark.sql import SparkSession, functions as F
cores = int(sys.argv[1])
s = (SparkSession.builder.master(f"local[{cores}]").appName("ceil")
     .config("spark.sql.shuffle.partitions","32")
     .config("spark.ui.enabled","false")
     .config("spark.local.dir","/dev/shm/spark-ceil")
     .getOrCreate())
s.sparkContext.setLogLevel("ERROR")
def job():
    df = s.range(0, 24_000_000, 1, 32).select(
        F.sha2(F.concat(F.lit("x"), F.col("id").cast("string")), 256).alias("h"))
    return df.where(F.col("h").rlike("[0-9a-f]{4}ab")).count()
job()
t0 = time.time(); job(); print(time.time() - t0)
s.stop()
"""


def probe_codegen(trials: int) -> dict:
    best = {2: float("inf"), 8: float("inf")}
    for _ in range(trials):
        for cores in (2, 8):
            r = subprocess.run(
                [sys.executable, "-c", _CODEGEN_SINGLE, str(cores)],
                capture_output=True, text=True,
            )
            best[cores] = min(best[cores], float(r.stdout.strip().splitlines()[-1]))
    return best


_DOCS: list[tuple[str, str]] = []


def _kernel_work(chunk_idx_procs: tuple[int, int]) -> int:
    from mel_tnnt_spark.config import MODELS
    from mel_tnnt_spark.functions.text import py_clean_text, py_preprocess_text
    from mel_tnnt_spark.operators.mentions import detect_mentions_py

    idx, nchunks = chunk_idx_procs
    n = 0
    for doc_id, content in _DOCS[idx::nchunks]:
        n += len(detect_mentions_py(doc_id, py_preprocess_text(py_clean_text(content)), MODELS))
    return n


def probe_kernel(trials: int) -> dict:
    global _DOCS
    from mel_tnnt_spark.datagen import generate_code_files_rows

    rows = generate_code_files_rows(60000, 7)
    _DOCS = [(r[0] + r[1], r[4]) for r in rows if r[4]]
    best = {2: float("inf"), 8: float("inf")}
    for _ in range(trials):
        for procs in (2, 8):
            nchunks = procs * 4
            with mp.Pool(procs) as p:
                p.map(_kernel_work, [(i, nchunks) for i in range(procs)])  # warm
                t0 = time.time()
                p.map(_kernel_work, [(i, nchunks) for i in range(nchunks)])
                best[procs] = min(best[procs], time.time() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", choices=("codegen", "kernel"), required=True)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()
    best = probe_codegen(args.trials) if args.probe == "codegen" else probe_kernel(args.trials)
    print(
        json.dumps(
            {
                "probe": args.probe,
                "t2": round(best[2], 2),
                "t8": round(best[8], 2),
                "speedup": round(best[2] / best[8], 3),
                "ceiling_eff": round(best[2] / best[8] / 4, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
