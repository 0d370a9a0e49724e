"""Deterministic synthetic `code_files` source table.

BASELINE.json input_hint mandates the shape
(repo:string, path:string, commit:string, lang:string, content:string);
we add `content_sha` (sha256 hex of content) as the per-row invariant
column. Generation is pure-function-of-(seed,index) so the same rows are
produced on any machine at any scale — no external data.

Design choices that exercise the scale paths (FIXTURES.md §1):
- Zipf-skewed repo sizes: repo000 holds ~40% of rows (skew-join /
  salting path).
- >=2 commits for some paths (latest-wins dedup window W3).
- planted, position-known entity surface forms in comments/docstrings
  (gazetteer + regex detector hits, cf. reference example fixtures
  code/_run_MEL_with_Example01.py).
- a few empty / "~$"-prefixed rows (empty/protected filters,
  code/MEL/__init__.py:1094-1105).
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType

CODE_FILES_SCHEMA = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("content", StringType(), True),
        StructField("content_sha", StringType(), True),
        # commit time, epoch seconds — the latest-wins ordering column.
        # (A sha1 `commit` hex has no recency order; W3 needs a real
        # version axis, so the source contract carries one, like any git
        # log / Iceberg snapshot would.)
        StructField("committed_at", LongType(), False),
    ]
)


def _committed_at(i: int, version: int) -> int:
    """Deterministic commit time: later versions are strictly newer."""
    return 1_600_000_000 + (i % 10_000_000) * 7 + version * 86_400

_LANG_BY_EXT = {"py": "python", "java": "java", "md": "markdown", "txt": "text", "json": "json"}
_EXTS = list(_LANG_BY_EXT)

# Surface forms planted into content. Keep in sync with config gazetteers.
_PEOPLE = ["Grace Hopper", "Alan Turing", "Ada Lovelace", "Margaret Hamilton"]
_ORGS = ["Apache Software Foundation", "Mozilla", "CSIRO"]
_PLACES = ["Canberra", "Sydney", "Zurich"]
_LICENSES = ["Apache License", "MIT License"]
_EMAILS = ["dev.team@example.org", "grace@navy.mil", "info@csiro.au"]
_URLS = ["https://spark.apache.org/docs", "https://example.org/kb/page"]
_DATES = ["2021-03-15", "2019-11-02", "2023-07-30"]
_MONEY = ["$1,234.56", "$99", "$10,000.00"]

_CODE_WORDS = (
    "def class return import from for while if else elif try except raise "
    "lambda yield assert with open read write parse build run main args "
    "config value result index token buffer stream schema column row table "
    "partition shuffle broadcast join aggregate filter select window"
).split()


def _commit_hex(repo: str, path: str, version: int) -> str:
    return hashlib.sha1(f"{repo}|{path}|v{version}".encode()).hexdigest()


def _make_content(rng: random.Random, lang: str, ridx: int) -> str:
    """Templated source text with planted entities in comments/strings."""
    lines: list[str] = []
    comment = "#" if lang == "python" else "//" if lang == "java" else ">"
    n_funcs = rng.randint(1, 6)
    person = rng.choice(_PEOPLE)
    org = rng.choice(_ORGS)
    place = rng.choice(_PLACES)
    lic = rng.choice(_LICENSES)
    lines.append(f"{comment} Copyright {org}. Licensed under the {lic}.")
    lines.append(f"{comment} Author: {person} <{rng.choice(_EMAILS)}>")
    lines.append(f"{comment} Office: {place}. Updated {rng.choice(_DATES)}.")
    if rng.random() < 0.3:
        lines.append(f"{comment} Budget: {rng.choice(_MONEY)}. See {rng.choice(_URLS)}")
    for fidx in range(n_funcs):
        words = " ".join(rng.choice(_CODE_WORDS) for _ in range(rng.randint(5, 30)))
        if lang == "python":
            lines.append(f"def fn_{ridx}_{fidx}(x):")
            lines.append(f'    """{words}."""')
            lines.append(f"    return x + {fidx}")
        elif lang == "java":
            lines.append(f"public int fn{ridx}{fidx}(int x) {{ /* {words}. */ return x + {fidx}; }}")
        elif lang == "json":
            lines.append(f'{{"fn": "fn_{ridx}_{fidx}", "doc": "{words}."}}')
        else:
            lines.append(f"{words}.")
    return "\n".join(lines)


def generate_code_files_rows(n_rows: int = 200, seed: int = 42) -> list[tuple]:
    """Pure generator: n_rows rows, Zipf-ish repo skew, dual commits for
    ~10% of paths, ~2% empty and ~2% protected rows."""
    rng = random.Random(seed)
    n_repos = max(3, n_rows // 40)
    rows: list[tuple] = []
    for i in range(n_rows):
        # skew: 40% of rows land in repo000, rest spread uniformly
        repo_idx = 0 if rng.random() < 0.4 else rng.randint(1, n_repos - 1)
        repo = f"repo{repo_idx:03d}"
        ext = rng.choice(_EXTS)
        lang = _LANG_BY_EXT[ext]
        protected = rng.random() < 0.02
        base = f"{'~$' if protected else ''}mod_{i:05d}"
        path = f"src/pkg{i % 7}/{base}.{ext}"
        content = "" if rng.random() < 0.02 else _make_content(rng, lang, i)
        versions = 2 if rng.random() < 0.10 else 1
        for v in range(1, versions + 1):
            c = content if v == versions else content + f"\n{'#'} stale v{v}"
            sha = hashlib.sha256(c.encode()).hexdigest()
            rows.append(
                (repo, path, _commit_hex(repo, path, v), lang, c, sha, _committed_at(i, v))
            )
    return rows


def _rows_for_index(i: int, seed: int, n_repos: int) -> list[tuple]:
    """Pure function of (seed, index) -> the row(s) for one logical file.
    Independent per-index RNG so generation distributes: any executor
    can produce any index's rows with no sequential state."""
    rng = random.Random((seed << 24) ^ i)
    repo_idx = 0 if rng.random() < 0.4 else rng.randint(1, n_repos - 1)
    repo = f"repo{repo_idx:03d}"
    ext = rng.choice(_EXTS)
    lang = _LANG_BY_EXT[ext]
    protected = rng.random() < 0.02
    base = f"{'~$' if protected else ''}mod_{i:07d}"
    path = f"src/pkg{i % 7}/{base}.{ext}"
    content = "" if rng.random() < 0.02 else _make_content(rng, lang, i)
    versions = 2 if rng.random() < 0.10 else 1
    out = []
    for v in range(1, versions + 1):
        c = content if v == versions else content + f"\n# stale v{v}"
        sha = hashlib.sha256(c.encode()).hexdigest()
        out.append(
            (repo, path, _commit_hex(repo, path, v), lang, c, sha, _committed_at(i, v))
        )
    return out


def code_files_distributed(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    """Executor-side generation via mapInPandas over an id range — the
    scale path (no driver loop, no driver memory). Deterministic per
    (seed, index); distribution-equivalent to generate_code_files_rows
    but not row-identical (independent per-index RNG streams)."""
    import pandas as pd

    n_repos = max(3, n_rows // 40)
    cols = [f.name for f in CODE_FILES_SCHEMA.fields]

    def gen(batches):
        for pdf in batches:
            rows: list[tuple] = []
            for i in pdf["id"]:
                rows.extend(_rows_for_index(int(i), seed, n_repos))
            yield pd.DataFrame(rows, columns=cols)

    n_parts = max(spark.sparkContext.defaultParallelism * 2, 8)
    # Hash-distribute by (repo, path): simulates the production layout
    # where the source table is BUCKETED on its key (Iceberg
    # bucket(N, repo||path)), so the latest-wins aggregation and the
    # key-only doc dim run WITHOUT an exchange — at 100 TB the dedup
    # shuffle of content bytes is the single largest data movement, and
    # bucketing is how a real deployment deletes it. The cached frame
    # keeps this partitioning, and Catalyst elides the groupBy(repo,
    # path) exchanges downstream (asserted in tests/test_plans.py).
    return (
        spark.range(0, n_rows, 1, n_parts)
        .mapInPandas(gen, CODE_FILES_SCHEMA)
        .repartition("repo", "path")
    )


def code_files_df(spark: SparkSession, n_rows: int = 200, seed: int = 42) -> DataFrame:
    """Materialize the synthetic source table.

    At real scale this is `spark.read.table("catalog.db.code_files")`
    (Iceberg); the generator stands in because the sandbox has no
    catalog service. Repartition by a hash of (repo, path) so downstream
    per-partition lineage counters are deterministic (SURVEY.md §4d).
    """
    df = spark.createDataFrame(generate_code_files_rows(n_rows, seed), CODE_FILES_SCHEMA)
    return df.repartition("repo", "path")
