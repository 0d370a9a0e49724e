"""Randomized-corpus oracle fuzz: the query/oracle pairs below must
agree on ADVERSARIAL data, not just the driver's well-behaved testdata:

- documents: empty/whitespace/unicode/regex-metachar text, giant
  tokens, duplicate docs, zero-variance groups
- events: malformed / empty / null JSON props
- embeddings: zero-norm vectors, denormals, exact duplicates
- TPC-H-ish: half-cent prices (round-half hazards), duplicate order
  keys, a mktsegment with no orders, customers without 'F' orders,
  orderdate ties within a customer

Found (and fixed): ANSI divideByZeroError on zero-norm cosine in every
similarity path; DuckDB json_extract_string throwing on malformed JSON;
cross-engine round(sum(double)) divergence at half-cent boundaries
(q47 now sums DECIMAL).
"""

from __future__ import annotations

import math

import duckdb
import pytest

EDGE_TEXTS = [
    "",
    "   ",
    "the the the the",
    "spark query spark join filter window data table",
    "a.b*c(d)e[f]g\\h|i+j?k",          # regex metacharacters
    "naïve café über señor — em-dash",   # accents / unicode punct
    "x" * 5000,                          # one giant token
    "word " * 400,                       # long repetitive doc
    "The quick brown fox. She ran! Did it? Yes.",
    "el gato y el perro de la casa que los vio",
    "der und die das ist der und die",
    "le la et les des le la et",
    "tab\tnewline\nquote\"backslash\\",
    "spark some filler words join",      # q33's regex shape
    "mixed EN el the la und 42 7.5",
]

EDGE_PROPS = ['{"k": 0}', '{"k": 87}', '{"k": -3}', "{}", "not json", None, '{"k": 1, "z": {"k": 2}}']


@pytest.fixture(scope="module")
def fuzz_dir(spark, tmp_path_factory):
    import random

    base = tmp_path_factory.mktemp("fuzz")
    rng = random.Random(1234)
    docs = []
    for i in range(600):
        t = rng.choice(EDGE_TEXTS) if rng.random() < 0.5 else (
            " ".join(rng.choices("spark query the a el la und data join of to in".split(), k=rng.randint(1, 30)))
        )
        docs.append((i, t, rng.choice(["en", "es", "de", "fr", "und"]),
                     rng.choice(["web", "wiki", "code"]), len(t)))
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(2).write.mode("overwrite").parquet(f"{base}/documents.parquet")

    evs = []
    for i in range(800):
        evs.append((i, f"2026-01-01 00:{i % 60:02d}:{(i * 7) % 60:02d}",
                    i % 23, rng.choice(["click", "view", "error", "signup", "purchase"]),
                    float(rng.randint(0, 100)), rng.choice(EDGE_PROPS)))
    from pyspark.sql import functions as F

    (
        spark.createDataFrame(
            evs, "event_id bigint, ts string, user_id bigint, event_type string, value double, props string"
        )
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(2)
        .write.mode("overwrite")
        .parquet(f"{base}/events.parquet")
    )

    # embeddings: ids 0-7 regular (gates use 0-3 as pivots/centroids and
    # 7 as the query), then hazards — a zero vector, duplicates, tiny
    # magnitudes
    vecs = []
    for i in range(120):
        if i >= 100 and i % 3 == 0:
            v = [0.0] * 8  # zero-norm
        elif i >= 100 and i % 3 == 1:
            v = [x * 1e-30 for x in range(1, 9)]  # denormal-ish
        elif i >= 100:
            v = [1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0]  # exact dup family
        else:
            v = [round(rng.uniform(-1, 1), 6) for _ in range(8)]
        vecs.append((i, v))
    spark.createDataFrame(vecs, "vec_id bigint, embedding array<float>").coalesce(2).write.mode(
        "overwrite"
    ).parquet(f"{base}/embeddings.parquet")

    # TPC-H-ish tables with rounding/tie/empty-group hazards:
    # half-cent prices (round-half ties), duplicated orderkeys, a
    # mktsegment with no orders, customers without any 'F' order,
    # equal orderdates within a customer (rank tie-break), zero
    # quantities/discounts
    nations = [(i, f"NATION_{i:02d}") for i in range(7)]
    spark.createDataFrame(nations, "n_nationkey bigint, n_name string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{base}/nation.parquet")

    custs = [(i, f"Customer#{i:05d}", rng.choice(["AUTOMOBILE", "BUILDING", "MACHINERY", "GHOST"]),
              i % 7) for i in range(80)]
    spark.createDataFrame(
        custs, "c_custkey bigint, c_name string, c_mktsegment string, c_nationkey bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{base}/customer.parquet")

    orders = []
    for i in range(300):
        cust = rng.randint(0, 59)  # custkeys 60-79 never order
        price = rng.choice([0.0, 0.005, 1.005, 2.675, 99.995, float(rng.randint(1, 9000))])
        orders.append((i, cust, rng.choice(["F", "O", "P"]), price,
                       f"1995-0{rng.randint(1, 9)}-0{rng.randint(1, 9)}"))
    from pyspark.sql import functions as F2

    (
        spark.createDataFrame(
            orders, "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double, o_orderdate string"
        )
        .withColumn("o_orderdate", F2.col("o_orderdate").cast("date"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{base}/orders.parquet")
    )

    # suppliers: a few per nation, plus a nation with none (key 6)
    supps = [(i, f"Supplier#{i:05d}", i % 6) for i in range(25)]
    spark.createDataFrame(
        supps, "s_suppkey bigint, s_name string, s_nationkey bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{base}/supplier.parquet")

    lines = []
    for i in range(900):
        lines.append((rng.randint(0, 299), rng.choice([0.0, 0.5, 1.0, 7.0, 49.5]),
                      rng.choice([0.005, 1.115, 950.0, 0.0]),
                      rng.choice([0.0, 0.05, 0.1]),
                      rng.choice(["A", "N", "R"]), rng.choice(["F", "O"]),
                      f"1995-0{rng.randint(1, 9)}-1{rng.randint(0, 9)} 00:00:00",
                      rng.randint(0, 24)))
    (
        spark.createDataFrame(
            lines,
            "l_orderkey bigint, l_quantity double, l_extendedprice double, l_discount double, "
            "l_returnflag string, l_linestatus string, l_shipdate string, l_suppkey bigint",
        )
        .withColumn("l_shipdate", F2.col("l_shipdate").cast("timestamp"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{base}/lineitem.parquet")
    )
    return str(base)


# documents/events-backed queries; value = skip reason if excluded
FUZZ_QUERIES = [
    "q10_a2_keyword_counts",
    "q11_a3_pattern_match_counts",
    "q12_j6_containment_mentions",
    "q15_w2_pagination",
    "q16_w4_topk_docs",
    "q17_dd_exact_dedup",
    "q18_dd_ngram_jaccard_pairs",
    "q19_dd_minhash_signatures",
    "q20_dd_simhash",
    "q23_ts_lang_id",
    "q24_ts_quality_score",
    "q25_ts_fingerprint",
    "q26_ts_token_count",
    "q31_p9_json_path",
    "q32_f16_wildcard_search",
    "q33_s4_regex_scan",
    "q34_m15_deterministic_sample",
    "q36_j6_large_vocab_containment",
    "q37_j2_lookup_with_fallback",
    "q40_j10_group_by_folder",
    "q41_s13_xml_metadata",
    "q42_p10_recursive_key_search",
    "q43_f15_deep_merge",
    "q46_w_session_windows",
    "q05_a13_time_span_per_type",
    "q04_w3_latest_event_per_user",
    "q21_sim_cosine_topk",
    "q22_sim_bucketed_ann",
    "q44_sim_multiprobe_ann",
    "q45_sim_ivf_ann",
    "q28_cc_embedding_graph",
    "q08_so2_shared_vocabulary",
    "q13_a8_stats_per_lang",
    "q14_a5_rollup_lang_source",
    "q38_a8_multimode_chars_per_lang",
    "q39_p2_only_startfrom",
    "q01_a1_pricing_summary",
    "q02_j1_broadcast_join_agg",
    "q03_j1_multijoin_revenue_by_nation",
    "q07_j5_customers_without_orders",
    "q09_j4_duplicate_orderkeys",
    "q30_a8_mode_quantity_per_flag",
    "q47_w_analytic_running_revenue",
    "q06_a9_value_buckets",
    "q35_dd_lsh_pairs",
    "q48_asof_join_last_purchase",
    "q49_range_join_clicks_in_window",
    "q50_hypertable_rollup",
    "q51_count_min_sketch",
    "q52_m12_pos_dep_tokens",
    "q53_m13_coref_chains",
    "q54_stream_first_seen_batch",
    "q55_multimodal_image_decode",
    "q56_s2_general_metadata",
    "q57_f1_nfkd_ascii_fold",
    "q58_s9_lang_extract",
    "q59_a14_csv_cells",
    "q60_w5_w6_mention_stage",
    "q61_j8_entity_linking",
    "q62_dd_simhash_pairs",
    "q63_f17_summary_filters",
    "q64_multimodal_audio_decode",
    "q65_multimodal_frame_sample",
    "q66_a6_aggregated_summary",
    "q67_m14_archive_members",
    "q68_cc_incremental_maintenance",
    "q69_multimodal_resize",
    "q70_curation_pipeline",
    "q71_hll_registers",
    "q72_bm25_ranking",
    "q73_winnowing_overlap",
    "q74_cc_size_histogram",
    "q75_m_nltk_category_rescan",
    "q76_a14_csv_ner_merge_order",
    "q77_dd_cluster_survivors",
    "q78_ts_pii_scrub",
    "q79_ts_repetition_metrics",
    "q80_dd_cross_corpus_overlap",
    "q81_curation_decision",
    "q82_ts_quality_classifier",
    "q83_dd_span_excision",
    "q84_dd_overlap_index_chained",
    "q85_ts_classifier_training",
    "q86_dd_span_index_chained",
    "q87_pack_sequence_layout",
    "q88_pack_assembled_windows",
    "q89_cur_domain_cap",
    "q90_cur_token_budget",
    "q91_cur_mixture_sample",
    "q92_dd_semantic_dedup",
    "q93_pack_shard_assignment",
    "q94_pack_incremental_layout",
    "q95_ts_lm_fluency",
    "q96_weighted_sample",
    "q97_cur_epoch_mixture",
    "q98_cur_domain_cap_chained",
    "q99_weighted_sample_chained",
    "q100_cur_top_fraction",
    "q101_s2_profile_columns",
    "q102_kg_bgp_match",
    "q103_kg_transitive_closure",
    "q104_kg_pagerank",
    "q105_kg_triangle_count",
    "q106_kg_closure_chained",
    "q107_kg_random_walks",
    "q108_sim_random_projection",
    "q109_kg_property_path",
    "q110_kg_bounded_shortest_paths",
    "q111_s2_exact_quantiles",
    "q112_cur_temperature_mixture",
    "q113_contrastive_triplets",
    "q114_kg_khop_aggregate",
    "q115_kg_edge_jaccard",
]


def test_fuzz_list_covers_every_registered_query():
    """Like the PLANS.md guard: the fuzz corpus must enumerate every
    queries() entry — a new gate can't silently skip adversarial
    coverage."""
    import __spark_entry__ as e

    missing = sorted(set(e.queries()) - set(FUZZ_QUERIES))
    extra = sorted(set(FUZZ_QUERIES) - set(e.queries()))
    assert not missing, f"queries missing from FUZZ_QUERIES: {missing}"
    assert not extra, f"FUZZ_QUERIES names unregistered queries: {extra}"


from mel_tnnt_spark.oracle_compare import duck_connect, normalize as _normalize  # noqa: E402


@pytest.mark.parametrize("name", FUZZ_QUERIES)
def test_fuzz_query_oracle_parity(spark, fuzz_dir, name):
    import __spark_entry__ as e

    con = duck_connect(
        fuzz_dir,
        file_glob=True,  # Spark writes parquet DIRECTORIES
        tables=("documents", "events", "embeddings", "nation", "customer", "supplier", "orders", "lineitem"),
    )
    got = _normalize(e.queries()[name](spark, fuzz_dir).toPandas())
    want = _normalize(con.sql(e.oracle_sql()[name]).df())
    assert got[0] == want[0], f"{name} columns: {got[0]} vs {want[0]}"
    assert got[1] == want[1], (
        f"{name}: {len(got[1])} vs {len(want[1])} rows; "
        f"first diff: {next(((a, b) for a, b in zip(got[1], want[1]) if a != b), None)}"
    )
