"""JSON navigation functions: P10 recursive key search, F15 deep merge.

P10 — the reference walks arbitrarily nested model-output JSON and
collects every value stored under a given key, at any depth, inside
dicts or lists (readJson, code/NLP_NER_API/interface/json_function.py:
41-66). Flat schemas avoid this in the core pipeline, but the operator
is exposed for users with nested payloads.

F15 — recursive dict merge where the right side wins on scalar
conflicts and nested dicts merge key-by-key (Utils.dict_update,
code/MEL/__init__.py:292-299). Equivalent to RFC 7386 JSON merge-patch
when no nulls are present (nulls: merge-patch deletes, dict_update
assigns — we pin dict_update semantics and document the divergence).

Both are scalar-iterator pandas UDFs (Arrow-batched, stdlib json):
recursion over an unknown-depth tree is not expressible in codegen, so
this is the sanctioned Python escape hatch — one Arrow crossing, no
row-at-a-time Python UDFs. For schemas of KNOWN bounded depth prefer
`F.get_json_object` chains, which stay JVM-side (the oracle queries
demonstrate that equivalence).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType


def py_json_find_key(obj, key: str) -> list:
    """Collect values for `key` at any depth (dicts + lists), in
    document order — the key_arr branch of the reference's readJson.
    (The value_arr branch — "find parents whose value equals key" — is
    an API-side convenience the engine exposes via py_json_find_value.)
    """
    out: list = []

    def walk(node) -> None:
        if isinstance(node, dict):
            for k, v in node.items():
                if str(k) == str(key):
                    out.append(v)
                if isinstance(v, (dict, list)):
                    walk(v)
        elif isinstance(node, list):
            for item in node:
                walk(item)

    walk(obj)
    return out


def py_json_find_value(obj, value: str) -> list:
    """Parents whose direct value equals `value` (readJson value_arr)."""
    out: list = []

    def walk(node) -> None:
        if isinstance(node, dict):
            for v in node.values():
                if str(v) == str(value):
                    out.append(node)
                if isinstance(v, (dict, list)):
                    walk(v)
        elif isinstance(node, list):
            for item in node:
                walk(item)

    walk(obj)
    return out


def py_deep_merge(d: dict, u: dict) -> dict:
    """F15 — Utils.dict_update semantics: u wins; nested dicts merge."""
    for k, v in u.items():
        if isinstance(v, dict):
            base = d.get(k)
            d[k] = py_deep_merge(base if isinstance(base, dict) else {}, v)
        else:
            d[k] = v
    return d


def _scalar_str(v) -> str:
    # JSON-canonical rendering for scalars so Spark/DuckDB agree:
    # strings verbatim, numbers/bools/null via json.dumps.
    return v if isinstance(v, str) else json.dumps(v)


def json_find_key(col, key: str):
    """P10 as a column: array of stringified values found under `key`
    anywhere in the JSON document (nested values re-serialized as
    compact JSON, scalars rendered canonically)."""

    @F.pandas_udf(ArrayType(StringType()))
    def _find(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        def one(s: str | None):
            if s is None:
                return None
            try:
                obj = json.loads(s)
            except ValueError:
                return []
            return [
                json.dumps(v, separators=(",", ":")) if isinstance(v, (dict, list)) else _scalar_str(v)
                for v in py_json_find_key(obj, key)
            ]

        for s in batches:
            yield s.map(one)

    return _find(col)


def json_probe_paths(col, paths: list[str]):
    """P10, bounded-depth JVM twin: when the searched key can occur only
    at a KNOWN set of JSON paths (schemas of bounded depth — the common
    case for pipeline payloads), the any-depth walk collapses to a
    coalesce of `get_json_object` probes in probe order. Whole-stage
    codegen, zero Arrow crossings — at 100x scale this avoids shipping
    every JSON blob through Python. Use `json_find_key` only for
    genuinely unbounded/unknown schemas.

    Returns the FIRST value found (the gated queries take element 1 of
    the walker's result, which for single-occurrence payloads is the
    same value — equivalence pinned in tests).

    Caveat (same class as the merge twin's): get_json_object cannot
    distinguish an explicit JSON null from an absent key, so a payload
    holding null at an earlier probe path falls through to a later
    path where the walker would return the null. Equivalent whenever
    the probed paths carry no explicit nulls."""
    return F.coalesce(*[F.get_json_object(col, p) for p in paths])


def struct_deep_merge(left, right, schema):
    """F15, bounded JVM twin: deep-merge two struct columns that share
    `schema` (the union of both sides' keys, from_json-parsed). Right
    wins on scalar conflicts, struct fields merge field-by-field, a
    NULL side falls back to the other — Utils.dict_update semantics
    over a STATIC schema, recursion unrolled at plan-build time, so the
    whole merge stays in codegen with zero Arrow stages.

    Caveat (same equality condition as the RFC-7386 oracle twin):
    from_json cannot distinguish an absent key from an explicit null,
    so right-side explicit nulls fall back to left — equal to
    dict_update whenever the inputs carry no JSON nulls."""
    from pyspark.sql.types import StructType

    fields = []
    for f in schema.fields:
        l, r = left[f.name], right[f.name]
        if isinstance(f.dataType, StructType):
            merged = struct_deep_merge(l, r, f.dataType)
            fields.append(
                F.when(r.isNull(), l).when(l.isNull(), r).otherwise(merged).alias(f.name)
            )
        else:
            fields.append(F.coalesce(r, l).alias(f.name))
    return F.struct(*fields)


def json_deep_merge_bounded(left, right, schema_ddl: str):
    """F15 bounded twin over JSON strings: parse both sides with the
    known union schema, struct_deep_merge, re-serialize. Invalid/NULL
    JSON degrades to the other side (reference treats a missing dict as
    {}), matching json_deep_merge. JVM-only path."""
    from pyspark.sql.types import StructType

    schema = StructType.fromDDL(schema_ddl)
    lp, rp = F.from_json(left, schema), F.from_json(right, schema)
    merged = F.when(lp.isNull(), F.coalesce(rp, lp)).when(rp.isNull(), lp).otherwise(
        struct_deep_merge(lp, rp, schema)
    )
    return F.to_json(merged)


def json_deep_merge(left, right):
    """F15 as a column: deep-merge two JSON object strings, right wins.
    Invalid/NULL inputs degrade to the other side (reference treats a
    missing dict as {})."""

    @F.pandas_udf(StringType())
    def _merge(batches: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        def load(s):
            if s is None:
                return {}
            try:
                obj = json.loads(s)
            except ValueError:
                return {}
            return obj if isinstance(obj, dict) else {}

        for a, b in batches:
            merged = [
                json.dumps(py_deep_merge(load(x), load(y)), separators=(",", ":"), sort_keys=True)
                for x, y in zip(a, b)
            ]
            yield pd.Series(merged, index=a.index)

    return _merge(left, right)
