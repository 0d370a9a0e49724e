"""S6 — keyed insert/update/delete sink (MERGE semantics).

The reference mutates per-document records in CouchDB (insert/update/
delete by doc key, code/MEL/__init__.py:2365-2423 and the CouchDB
Dataset plumbing). The lakehouse-native equivalent is Iceberg
`MERGE INTO target USING changes ON keys` — this module implements
those semantics over the sandbox's parquet stand-in with the same
commit discipline Iceberg gives you:

- read current target + changes -> merged snapshot (anti-join on keys,
  union surviving rows, drop deletes);
- write the snapshot to a STAGING directory;
- atomically promote staging via directory rename (os.replace-style
  swap). A crash before the swap leaves the live target untouched; a
  rerun of the same merge overwrites the orphan staging dir and
  completes. This is exactly Iceberg's write-then-commit-pointer model
  scaled down to a filesystem.

Scale notes: the merge is one shuffle-free scan of changes broadcast-
anti-joined against the target when changes are small (the common
incremental case — Catalyst picks the broadcast side from stats), or a
key-partitioned SMJ when both sides are large. No driver collect. On a
real deployment, swap `merge_upsert` for `spark.sql("MERGE INTO ...")`
against the Iceberg catalog; call sites are agnostic.

Change-row contract: `op` column in {'upsert','delete'} (absent op
column = all upserts), remaining columns = target schema.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_STAGING_SUFFIX = "__staging"
_OLD_SUFFIX = "__old"


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    changes: DataFrame,
    keys: tuple[str, ...],
    op_col: str | None = "op",
) -> None:
    """MERGE changes into the parquet table at target_path:
    matched + upsert -> replaced by the change row; matched + delete ->
    removed; unmatched upsert -> inserted."""
    op_col = op_col or "op"
    if op_col not in changes.columns:
        changes = changes.withColumn(op_col, F.lit("upsert"))

    # crash recovery: a failure between _promote's two renames leaves
    # the live dir missing and the full copy under __old — restore it
    # BEFORE reading, so the rerun merges against the real table
    old = target_path + _OLD_SUFFIX
    if not os.path.exists(target_path) and os.path.exists(old):
        os.rename(old, target_path)

    # Iceberg MERGE rejects a source row matching multiple times; the
    # mirror condition here is multiple change rows for one key, which
    # would otherwise leave duplicate keys in the keyed target
    dup = changes.groupBy(*keys).count().where(F.col("count") > 1).limit(1).collect()
    if dup:
        raise ValueError(
            f"merge_upsert: multiple change rows for key {tuple(dup[0][k] for k in keys)}; "
            "dedupe the batch to one operation per key first"
        )

    upserts = changes.where(F.col(op_col) == "upsert").drop(op_col)

    if os.path.exists(target_path):
        current = spark.read.parquet(target_path)
        # every touched key (upsert OR delete) leaves the target; only
        # upserts come back — deletes of never-inserted keys are no-ops
        touched = changes.select(*keys).distinct()
        survivors = current.join(touched, list(keys), "left_anti")
        merged = survivors.unionByName(upserts)
    else:
        merged = upserts

    staging = target_path + _STAGING_SUFFIX
    merged.write.mode("overwrite").parquet(staging)
    _promote(staging, target_path)


def _promote(staging: str, target_path: str) -> None:
    """Atomic-enough swap for a local filesystem: rename live -> old,
    staging -> live, drop old. The only non-atomic window is between
    the two renames, and a rerun repairs it (staging is rebuilt from
    scratch each merge). Iceberg replaces this whole function with a
    metadata-pointer commit."""
    old = target_path + _OLD_SUFFIX
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(target_path):
        os.rename(target_path, old)
    os.rename(staging, target_path)
    if os.path.exists(old):
        shutil.rmtree(old)
