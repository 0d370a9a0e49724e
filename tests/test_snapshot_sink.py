"""Snapshot-capable MERGE sink (operators/snapshot_sink.py): time
travel, atomic pointer commit, schema evolution, expiry — the Iceberg
behaviors the rename-based merge_sink stand-in doesn't cover
(VERDICT r5 "what's missing" #2)."""

from __future__ import annotations

import os

import pytest

from mel_tnnt_spark.operators.snapshot_sink import (
    current_snapshot,
    expire_snapshots,
    merge_snapshot,
    read_snapshot,
    snapshots,
)


def _rows(spark, df):
    return {tuple(r) for r in df.collect()}


def _state(spark, table, as_of=None):
    return _rows(spark, read_snapshot(spark, table, as_of=as_of))


def test_time_travel_reproduces_every_historical_state(spark, tmp_path):
    t = str(tmp_path / "snap")
    s0 = merge_snapshot(
        spark,
        t,
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        keys=("id",),
        n_buckets=4,
    )
    s1 = merge_snapshot(
        spark,
        t,
        spark.createDataFrame(
            [(2, "B", "upsert"), (3, "c", "upsert")], "id long, v string, op string"
        ),
        keys=("id",),
    )
    s2 = merge_snapshot(
        spark,
        t,
        spark.createDataFrame([(1, None, "delete")], "id long, v string, op string"),
        keys=("id",),
    )
    assert (s0, s1, s2) == (0, 1, 2)
    assert current_snapshot(t) == 2
    assert _state(spark, t, as_of=0) == {(1, "a"), (2, "b")}
    assert _state(spark, t, as_of=1) == {(1, "a"), (2, "B"), (3, "c")}
    assert _state(spark, t) == {(2, "B"), (3, "c")}
    assert [m["parent_id"] for m in snapshots(t)] == [None, 0, 1]


def test_schema_evolution_add_column_and_old_snapshot_schema(spark, tmp_path):
    t = str(tmp_path / "snap")
    merge_snapshot(
        spark, t,
        spark.createDataFrame([(1, "a")], "id long, v string"),
        keys=("id",), n_buckets=4,
    )
    # merge 1 ADDS a column; the old row reads NULL for it
    merge_snapshot(
        spark, t,
        spark.createDataFrame([(2, "b", 0.9)], "id long, v string, score double"),
        keys=("id",),
    )
    cur = read_snapshot(spark, t)
    assert cur.columns == ["id", "v", "score"]
    assert _rows(spark, cur) == {(1, "a", None), (2, "b", 0.9)}
    # time travel returns the OLD schema — the added column must not leak
    old = read_snapshot(spark, t, as_of=0)
    assert old.columns == ["id", "v"]
    assert _rows(spark, old) == {(1, "a")}
    # a later merge missing the added column NULL-fills, never drops
    merge_snapshot(
        spark, t,
        spark.createDataFrame([(3, "c")], "id long, v string"),
        keys=("id",),
    )
    assert _rows(spark, read_snapshot(spark, t)) == {
        (1, "a", None), (2, "b", 0.9), (3, "c", None),
    }


def test_commit_is_pointer_swap_crash_before_is_invisible(spark, tmp_path, monkeypatch):
    """Kill the merge after data+manifest are written but BEFORE the
    pointer swap: readers still see the old snapshot; the replayed
    merge commits the identical state."""
    t = str(tmp_path / "snap")
    merge_snapshot(
        spark, t,
        spark.createDataFrame([(1, "a")], "id long, v string"),
        keys=("id",), n_buckets=4,
    )

    real_rename = os.rename

    def dying_rename(src, dst, *a, **kw):
        if dst.endswith("_current"):
            raise RuntimeError("injected kill before pointer swap")
        return real_rename(src, dst, *a, **kw)

    monkeypatch.setattr(os, "rename", dying_rename)
    ch = spark.createDataFrame([(2, "b")], "id long, v string")
    with pytest.raises(RuntimeError, match="injected kill"):
        merge_snapshot(spark, t, ch, keys=("id",))
    monkeypatch.setattr(os, "rename", real_rename)

    # crash window: orphan data + manifest exist, pointer untouched
    assert current_snapshot(t) == 0
    assert _state(spark, t) == {(1, "a")}
    # replay commits; state is exactly the once-applied result
    sid = merge_snapshot(spark, t, ch, keys=("id",))
    assert sid == 1 and current_snapshot(t) == 1
    assert _state(spark, t) == {(1, "a"), (2, "b")}


def test_expire_snapshots_drops_history_keeps_current(spark, tmp_path):
    t = str(tmp_path / "snap")
    for i in range(4):
        merge_snapshot(
            spark, t,
            spark.createDataFrame([(i, f"v{i}")], "id long, v string"),
            keys=("id",), n_buckets=4,
        )
    expired = expire_snapshots(t, keep_last=2)
    assert expired == [0, 1]
    assert [m["snapshot_id"] for m in snapshots(t)] == [2, 3]
    with pytest.raises(ValueError, match="expired"):
        read_snapshot(spark, t, as_of=0)
    # retained snapshots still read exactly, orphan data dirs swept
    assert _state(spark, t, as_of=2) == {(0, "v0"), (1, "v1"), (2, "v2")}
    assert _state(spark, t) == {(0, "v0"), (1, "v1"), (2, "v2"), (3, "v3")}
    referenced = set()
    for m in snapshots(t):
        referenced.update(m["buckets"].values())
    on_disk = set(os.listdir(os.path.join(t, "data")))
    assert on_disk == referenced


def test_delete_empties_bucket_and_duplicate_keys_raise(spark, tmp_path):
    t = str(tmp_path / "snap")
    merge_snapshot(
        spark, t,
        spark.createDataFrame([(1, "a")], "id long, v string"),
        keys=("id",), n_buckets=2,
    )
    merge_snapshot(
        spark, t,
        spark.createDataFrame([(1, None, "delete")], "id long, v string, op string"),
        keys=("id",),
    )
    assert _state(spark, t) == set()
    assert _state(spark, t, as_of=0) == {(1, "a")}
    with pytest.raises(ValueError, match="multiple change rows"):
        merge_snapshot(
            spark, t,
            spark.createDataFrame([(5, "x"), (5, "y")], "id long, v string"),
            keys=("id",),
        )
