"""S7 — JSON document sink + reader.

The reference writes one pretty-printed JSON file per document
(`-MEL_output.json` / `-MEL+NER_output.json`,
Dataset.writeOutputFile/generateOutputFile, code/MEL/__init__.py:
395-431). Per-document driver-side files don't scale; the Spark-native
equivalent is a JSON *dataset* (one line per document, written in
parallel, partitionable) that any JSON tool can consume. Parquet
remains the primary interchange format; this sink is the
debug/interoperability path the reference's JSON outputs serve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_json_docs(
    df: DataFrame,
    path: str,
    *,
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Write one JSON object per row. `ignoreNullFields=false` keeps
    the schema reconstructible from the files alone (the reference's
    outputs likewise serialize explicit nulls for absent metadata)."""
    w = df.write.mode(mode).option("ignoreNullFields", "false")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def read_json_docs(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Read the sink back with an EXPLICIT schema — schema inference is
    a full extra pass over 100 TB and types drift per-file; a declared
    schema makes the read a single streaming scan with column pruning."""
    return spark.read.schema(schema).json(path)
