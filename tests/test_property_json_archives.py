"""Property tests (hypothesis) for the JSON-navigation and archive
kernels — pure-python twins, no Spark session needed.

- deep merge: cross-engine equivalence with DuckDB's RFC 7386
  json_merge_patch on null-free inputs (the documented coincidence the
  q43 oracle relies on), plus the right-wins/union-of-keys laws.
- recursive key search: agreement with an independently-written
  spec traversal on arbitrary nested structures.
- archives: zip/tar round-trip recovers exactly the member map.
"""

from __future__ import annotations

import io
import json
import zipfile

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

# null-free JSON scalars (merge-patch treats null as delete; dict_update
# assigns it — the engines agree only without nulls, as documented)
scalars = st.one_of(
    st.integers(min_value=-(2**31), max_value=2**31),
    st.booleans(),
    st.text(st.characters(codec="utf-8", exclude_characters='"\\\x00'), max_size=8),
)
keys = st.text("abcdk", min_size=1, max_size=2)
json_objs = st.recursive(
    st.dictionaries(keys, scalars, max_size=4),
    lambda inner: st.dictionaries(keys, st.one_of(scalars, inner), max_size=4),
    max_leaves=12,
)
json_values = st.recursive(
    scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=3), st.dictionaries(keys, inner, max_size=3)
    ),
    max_leaves=12,
)


@settings(max_examples=60, deadline=None)
@given(json_objs, json_objs)
def test_deep_merge_matches_duckdb_merge_patch(a, b):
    from mel_tnnt_spark.functions.json_nav import py_deep_merge

    mine = py_deep_merge(json.loads(json.dumps(a)), b)
    duck = duckdb.sql(
        "SELECT json_merge_patch(?::JSON, ?::JSON)::VARCHAR",
        params=[json.dumps(a), json.dumps(b)],
    ).fetchone()[0]
    assert mine == json.loads(duck)


@settings(max_examples=60, deadline=None)
@given(json_objs, json_objs)
def test_deep_merge_laws(a, b):
    from mel_tnnt_spark.functions.json_nav import py_deep_merge

    merged = py_deep_merge(json.loads(json.dumps(a)), b)
    assert set(merged) == set(a) | set(b)
    for k, v in b.items():
        if not isinstance(v, dict):
            assert merged[k] == v  # right side wins on scalars


def _spec_find(node, key):
    """Independent spec: preorder collection of values under `key`."""
    found = []
    stack = [node]
    while stack:
        cur = stack.pop(0)
        if isinstance(cur, dict):
            for k, v in cur.items():
                if k == key:
                    found.append(v)
                if isinstance(v, (dict, list)):
                    stack.append(v)
        elif isinstance(cur, list):
            stack = list(cur) + stack
    return found


@settings(max_examples=60, deadline=None)
@given(json_values)
def test_find_key_matches_spec(obj):
    from mel_tnnt_spark.functions.json_nav import py_json_find_key

    # compare as multisets (the spec's BFS-ish order may differ from
    # the reference's strict preorder only across sibling subtrees;
    # membership and multiplicity are the contract)
    mine = [json.dumps(v, sort_keys=True) for v in py_json_find_key(obj, "k")]
    spec = [json.dumps(v, sort_keys=True) for v in _spec_find(obj, "k")]
    assert sorted(mine) == sorted(spec)


member_names = st.lists(
    st.text("abcdef_", min_size=1, max_size=8).map(lambda s: s + ".txt"),
    min_size=1,
    max_size=5,
    unique=True,
)


@settings(max_examples=30, deadline=None)
@given(member_names, st.data())
def test_zip_explode_roundtrip(names, data):
    from mel_tnnt_spark.sources.archives import py_explode_members

    members = {n: data.draw(st.binary(max_size=64)) for n in names}
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for n, payload in members.items():
            zf.writestr(n, payload)
    got = py_explode_members(buf.getvalue())
    assert {path: bytes(content) for _, _, path, content in got} == members
    assert all(kind == "zip" for kind, _, _, _ in got)


def test_bounded_jvm_twins_match_pandas_walkers(spark):
    """The JVM bounded-depth twins (json_probe_paths, struct-unrolled
    json_deep_merge_bounded) must agree with the unbounded pandas
    walkers on the gated payload shapes — and run with ZERO Arrow
    stages (the 100x-scale argument for gating them)."""
    from pyspark.sql import functions as F

    from mel_tnnt_spark.functions.json_nav import (
        json_deep_merge,
        json_deep_merge_bounded,
        json_find_key,
        json_probe_paths,
    )
    from mel_tnnt_spark.plans.analyze import plan_flags

    payloads = [
        ('{"k":5}',),
        ('{"a":{"k":6}}',),
        ('{"a":{"b":[{"k":7}]}}',),
        ('{"x":1}',),  # key absent
        ("not json",),
        (None,),
    ]
    df = spark.createDataFrame(payloads, "p string")
    paths = ["$.k", "$.a.k", "$.a.b[0].k"]
    both = df.select(
        json_probe_paths(F.col("p"), paths).alias("jvm"),
        F.try_element_at(json_find_key(F.col("p"), "k"), F.lit(1)).alias("walker"),
    ).collect()
    for r in both:
        assert r["jvm"] == r["walker"], (r["jvm"], r["walker"])
    jvm_only = df.select(json_probe_paths(F.col("p"), paths).alias("v"))
    assert plan_flags(jvm_only)["python_stages"] == 0

    merged = df.select(
        "p",
        json_deep_merge_bounded(
            F.col("p"), F.lit('{"extra":{"m":7},"k":9}'), "k BIGINT, extra STRUCT<m: BIGINT>"
        ).alias("jvm"),
        json_deep_merge(F.col("p"), F.lit('{"extra":{"m":7},"k":9}')).alias("walker"),
    ).collect()
    for r in merged:
        for path in ("$.k", "$.extra.m"):
            got_j = duckdb.sql(
                "SELECT json_extract_string(?::VARCHAR, ?)", params=[r["jvm"] or "{}", path]
            ).fetchone()[0]
            got_w = duckdb.sql(
                "SELECT json_extract_string(?::VARCHAR, ?)", params=[r["walker"], path]
            ).fetchone()[0]
            assert got_j == got_w, (r["p"], path, got_j, got_w)
    jvm_m = df.select(
        json_deep_merge_bounded(
            F.col("p"), F.lit('{"extra":{"m":7},"k":9}'), "k BIGINT, extra STRUCT<m: BIGINT>"
        ).alias("v")
    )
    assert plan_flags(jvm_m)["python_stages"] == 0
