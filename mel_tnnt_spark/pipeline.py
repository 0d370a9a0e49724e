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
    meta_raw = metadata.latest_commit_only(
        metadata.filter_processable(metadata.with_general_metadata(valid))
    )

    if lineage_path is not None:
        lin = lineage.read_lineage(spark, lineage_path)
        meta_raw = lineage.pending_only(meta_raw, lin, stage)

    # No checkpoint here: the text columns have exactly ONE consumer
    # (the mention stage, whose output is checkpointed below), so MEL →
    # mentions → linking fuses into a single pass over the source. The
    # doc-dim / lineage consumers of `meta` re-derive only pruned
    # columns — Catalyst drops the text-analysis UDFs for them.
    # The exposed metadata frame carries the text-analysis columns
    # lazily; the mention stage takes RAW content and fuses
    # clean+preprocess into its own mapInPandas (one Arrow crossing of
    # the content bytes instead of three — see detect_mentions).
    meta = metadata.with_text_analysis(meta_raw).select(
        "doc_id", "repo", "path", "commit", "lang", "content_sha", "preproc_text"
    )

    ments = mentions.detect_mentions(
        meta_raw.select("doc_id", "content"), text_col="content", preprocess=True
    )
    label_map = summaries.label_classification_df(spark)
    canon = summaries.canonicalize(ments, label_map)

    aliases = linking.alias_dict_df(spark)
    linked = linking.link_mentions(canon, aliases)
    # linking feeds CC + triples; materialize ONCE — but only the four
    # columns those consumers read (doc_id, entity_id, canonical,
    # linked_label). The full 10-column mention-level table is 7.2M
    # rows at the 1M-doc bench (model/category/surface/offsets/score
    # roughly double the materialized bytes) and checkpointing all of
    # it paid block-manager churn for columns nobody downstream
    # touches — guide §8's "materialize the small decision table"
    # applied to the pipeline spine. The exposed `linked` frame keeps
    # the full schema lazily; consumers of the slim columns hit the
    # checkpoint through it only via the internal projections below.
    linked_slim = linked.select(
        "doc_id", "entity_id", "canonical", "linked_label"
    ).localCheckpoint(eager=True)

    # One distinct over the big table yields the tiny entity dim shared
    # by identity canonicalization and the entity-level triples. The
    # dim is bounded by the alias dictionary, so when it fits on the
    # driver we collect it ONCE and do identity canonicalization there
    # (one job instead of three tiny materialization jobs — at 10^12
    # files the per-job scheduling cost is noise, but the collected dim
    # is exactly as small, so the fast path holds at every scale as
    # long as the dictionary does). Distributed CC remains the fallback
    # for unbounded entity universes.
    ENT_DIM_DRIVER_LIMIT = 200_000
    dim_rows = (
        linked_slim.select("entity_id", "canonical", "linked_label")
        .distinct()
        .limit(ENT_DIM_DRIVER_LIMIT + 1)
        .collect()
    )
    dim_schema = "entity_id string, canonical string, linked_label string"
    if len(dim_rows) <= ENT_DIM_DRIVER_LIMIT:
        from mel_tnnt_spark.session import local_dim

        ent_dim = local_dim(spark, dim_rows, dim_schema)
        ents = local_dim(
            spark,
            components.canonical_entities_local(
                [(r["entity_id"], r["canonical"]) for r in dim_rows]
            ),
            "entity_id string, canonical_id string",
        )
    else:
        ent_dim = (
            linked_slim.select("entity_id", "canonical", "linked_label")
            .distinct()
            .localCheckpoint(eager=True)
        )
        ents = components.canonical_entities(
            linked_slim, ent_dim=ent_dim
        ).localCheckpoint(eager=True)
    # Doc dim via the key-only dedup: no content bytes shuffle for this
    # consumer (the wide max_by would drag `content` through the wire
    # just to emit (doc_id, repo)). Resume filtering applies here too.
    docs = metadata.latest_commit_keys(
        metadata.filter_processable(metadata.with_general_metadata(valid))
    )
    if lineage_path is not None:
        docs = lineage.pending_only(docs, lin, stage)
    docs = docs.select("doc_id", "repo")
    trip = triples.build_triples(docs, linked_slim, ents, ent_dim=ent_dim)

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
