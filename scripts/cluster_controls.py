"""Instrument controls for the separate-executor-JVM scaling rerun
(round-6 verdict #1): the same bare-shuffle and codegen primitives the
round-6 BENCH.md quotes for local[N], re-run under local-cluster[N,1,m]
— N real executor processes, each with its own block manager — so the
single-JVM shuffle/block-manager share can be separated from the
engine's own scaling.

  --probe shuffle : bare groupBy-sum over 8M string keys (200k
                    distinct) — the primitive that scaled at 0.31 in
                    one JVM (BENCH.md round-6 table).
  --probe codegen : pure whole-stage-codegen compute (sha2+rlike over
                    range) — the compute-bound ceiling control.

Fresh subprocess per measurement, levels interleaved, min-of-trials —
the scripts/scaling.py methodology. Prints one JSON line per probe.

Usage: python scripts/cluster_controls.py --probe shuffle \
           [--n 2] [--trials 2] [--cluster-mem-mb 4096]
       (omit --cluster-mem-mb or pass 0 for the single-JVM local[N]
        baseline of the same primitive)
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_SINGLE = """
import sys, time
from pyspark.sql import SparkSession, functions as F
probe, cores, mem = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
master = f"local-cluster[{cores},1,{mem}]" if mem else f"local[{cores}]"
s = (SparkSession.builder.master(master).appName(f"ctl-{probe}-{cores}")
     .config("spark.sql.shuffle.partitions", "32")
     .config("spark.ui.enabled", "false")
     .config("spark.local.dir", "/dev/shm/spark-ctl")
     .config("spark.driver.memory", "8g")
     .getOrCreate())
s.sparkContext.setLogLevel("ERROR")

def job():
    if probe == "shuffle":
        df = (s.range(8_000_000)
              .select(F.concat(F.lit("node:"), (F.col("id") % 200_000).cast("string")).alias("k"),
                      F.col("id").alias("v"))
              .groupBy("k").agg(F.sum("v").alias("sv")))
    else:
        df = (s.range(60_000_000)
              .select(F.sha2(F.col("id").cast("string").cast("binary"), 256).alias("h"))
              .where(F.col("h").rlike("abc"))
              .agg(F.count(F.lit(1))))
    df.write.format("noop").mode("overwrite").save()

job()  # warm: codegen + executor spin-up
t0 = time.time(); job(); dt = time.time() - t0
s.stop()
print(__import__("json").dumps({"dt": dt}))
"""


def run_single(probe: str, cores: int, mem: int) -> float:
    out = subprocess.run(
        [sys.executable, "-c", _SINGLE, probe, str(cores), str(mem)],
        capture_output=True, text=True, cwd=str(REPO),
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)["dt"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", choices=("shuffle", "codegen"), required=True)
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--cluster-mem-mb", type=int, default=4096)
    args = ap.parse_args()

    levels = [args.n, args.n * 4]
    best: dict[int, float] = {}
    trials: dict[int, list[float]] = {}
    for _ in range(args.trials):
        for cores in levels:
            dt = run_single(args.probe, cores, args.cluster_mem_mb)
            best[cores] = min(best.get(cores, float("inf")), dt)
            trials.setdefault(cores, []).append(round(dt, 2))
    eff = (best[levels[0]] / best[levels[1]]) / 4
    mode = (
        f"local-cluster[N,1,{args.cluster_mem_mb}]"
        if args.cluster_mem_mb else "local[N]"
    )
    print(json.dumps({
        "probe": args.probe, "mode": mode, "n": args.n,
        "t_n_sec": round(best[levels[0]], 2),
        "t_4n_sec": round(best[levels[1]], 2),
        "trials_n": trials[levels[0]], "trials_4n": trials[levels[1]],
        "speedup": round(best[levels[0]] / best[levels[1]], 2),
        "raw_eff": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
