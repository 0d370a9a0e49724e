"""End-to-end KG-construction pipeline (the reference's MEL.process(),
code/MEL/__init__.py:2719-2723, re-expressed as one lazy DataFrame DAG).

    source -> sha invariant -> MEL metadata -> [resume anti-join]
           -> TNNT mentions (mapInPandas) -> canonical label join
           -> linking (broadcast alias dict) -> connected components
           -> triples + summaries

Every stage returns a DataFrame; nothing collects on the driver except
the connected-components convergence counter.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from mel_tnnt_spark.operators import components, linking, lineage, mentions, metadata, summaries, triples


@dataclass
class PipelineResult:
    source_valid: DataFrame
    quarantined: DataFrame
    metadata: DataFrame
    mentions: DataFrame
    canon: DataFrame
    linked: DataFrame
    entities: DataFrame
    triples: DataFrame
    summary_fine: DataFrame
    summary_totals: DataFrame
    summary_by_category: DataFrame


def run_pipeline(
    spark: SparkSession,
    src: DataFrame,
    lineage_path: str | None = None,
    stage: str = "kg",
) -> PipelineResult:
    valid, quarantined = lineage.enforce_sha_invariant(src)
    meta = metadata.mel_stage(valid)

    if lineage_path is not None:
        lin = lineage.read_lineage(spark, lineage_path)
        meta = lineage.pending_only(meta, lin, stage)

    # The MEL output feeds the mention stage, the doc dim, and the
    # lineage writer — checkpoint so the pandas-UDF text stage runs once.
    # (At cluster scale this is a persisted intermediate Iceberg table;
    # localCheckpoint is the single-job equivalent.)
    meta = meta.localCheckpoint(eager=True)

    ments = mentions.detect_mentions(meta)
    label_map = summaries.label_classification_df(spark)
    canon = summaries.canonicalize(ments, label_map)

    aliases = linking.alias_dict_df(spark)
    linked = linking.link_mentions(canon, aliases)
    # linking feeds CC + triples; materialize once
    linked = linked.localCheckpoint(eager=True)

    ents = components.canonical_entities(linked)
    docs = meta.select("doc_id", "repo").distinct()
    trip = triples.build_triples(docs, linked, ents)

    return PipelineResult(
        source_valid=valid,
        quarantined=quarantined,
        metadata=meta,
        mentions=ments,
        canon=canon,
        linked=linked,
        entities=ents,
        triples=trip,
        summary_fine=summaries.ner_summary(ments),
        summary_totals=summaries.ner_summary_totals(ments),
        summary_by_category=summaries.summary_by_category(canon),
    )
