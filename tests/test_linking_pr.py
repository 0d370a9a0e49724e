"""Entity-linking precision/recall gate at corpus scale (VERDICT r3 #6).

An ambiguous-alias fixture corpus — shared surfaces with DIFFERENT
priors and labels, hand-labeled gold links — pins P/R >= 0.95 per the
BASELINE contract ("triple-extraction P/R >= 0.95"). The reference's
linking stage resolves species/status surfaces to WikiData URIs one
SPARQL query at a time (code/MEL/DoEE_Species.py:243-274); the rebuild
scores the same decision offline (prior + 0.5*label-match, FIXTURES.md
§7), so the gate must show the scorer actually DISAMBIGUATES:
- label-rescue: low-prior candidates win when context label matches
  ("Mercury" in a Person context -> the deity, prior 0.10);
- prior-fallback: unmapped contexts (tnnt_label NULL) pick the highest
  prior;
- honest errors: one mislabeled-context mention links wrongly
  (precision hit) and one out-of-dictionary surface cannot link
  (recall hit) — the corpus is not rigged for 100%.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# (surface, entity_id, canonical, tnnt_label, prior) — every surface is
# ambiguous (>=2 candidates) except the Hamilton pair's clear favorite
AMBIG_ALIASES = [
    ("Mercury", "ent:mercury_planet", "Mercury (planet)", "tnnt:Location", 0.35),
    ("Mercury", "ent:mercury_element", "Mercury (element)", "tnnt:Misc", 0.45),
    ("Mercury", "ent:mercury_deity", "Mercury (deity)", "tnnt:Person", 0.10),
    ("Paris", "ent:paris_city", "Paris", "tnnt:GPE", 0.70),
    ("Paris", "ent:paris_person", "Paris (mythology)", "tnnt:Person", 0.25),
    ("Jaguar", "ent:jaguar_animal", "Jaguar (animal)", "tnnt:Misc", 0.50),
    ("Jaguar", "ent:jaguar_cars", "Jaguar Cars", "tnnt:Organisation", 0.40),
    ("Hamilton", "ent:hamilton_person", "Margaret Hamilton", "tnnt:Person", 0.55),
    ("Hamilton", "ent:hamilton_city", "Hamilton (city)", "tnnt:GPE", 0.45),
]

# (surface, context tnnt_label or None, gold entity_id or None=NIL)
# — the hand labels; rationale in the comments
GOLD_CASES = [
    ("Mercury", "tnnt:Person", "ent:mercury_deity"),     # label rescues 0.10 prior
    ("Mercury", "tnnt:Location", "ent:mercury_planet"),  # label rescues vs 0.45 element
    ("Mercury", None, "ent:mercury_element"),            # prior-only fallback
    ("Paris", "tnnt:GPE", "ent:paris_city"),
    ("Paris", "tnnt:Person", "ent:paris_person"),        # 0.75 beats city's 0.70
    ("Jaguar", "tnnt:Organisation", "ent:jaguar_cars"),  # 0.90 beats animal's 0.50
    ("Jaguar", None, "ent:jaguar_animal"),
    ("Hamilton", "tnnt:GPE", "ent:hamilton_city"),       # 0.95 beats person's 0.55
]
N_DOCS = 6  # each case appears once per doc -> 48 linkable gold mentions

# honest error rows (one each): a mislabeled context the scorer links
# wrongly (precision), and a surface the dictionary lacks (recall)
ERROR_CASES = [
    ("Jaguar", "tnnt:Organisation", None),               # context mislabel: truly the animal
    ("Atlantis", "tnnt:GPE", "ent:atlantis_city"),       # dictionary coverage gap
]
# plus an out-of-vocabulary NIL that is correctly not linked (no penalty)
NIL_CASES = [("Foobar", None, None)]


def _fixture(spark):
    aliases = spark.createDataFrame(
        AMBIG_ALIASES,
        "alias string, entity_id string, canonical string, tnnt_label string, prior double",
    ).coalesce(1)
    rows = []
    gold = []
    for d in range(N_DOCS):
        for i, (surface, label, gold_id) in enumerate(GOLD_CASES):
            rows.append((f"d{d}", "gazetteer_conll_model", "X", surface, i * 20, i * 20 + len(surface), label))
            gold.append((f"d{d}", i * 20, gold_id))
    for j, (surface, label, gold_id) in enumerate(ERROR_CASES + NIL_CASES):
        rows.append(("derr", "gazetteer_conll_model", "X", surface, j * 20, j * 20 + len(surface), label))
        gold.append(("derr", j * 20, gold_id))
    mentions = spark.createDataFrame(
        rows,
        "doc_id string, model string, category string, entity string, "
        "start_index int, end_index int, tnnt_label string",
    )
    gold_df = spark.createDataFrame(gold, "doc_id string, start_index int, gold_id string")
    return aliases, mentions, gold_df


@pytest.mark.parametrize("plan", ["broadcast_dim", "groupby"])
def test_linking_precision_recall_on_ambiguous_corpus(spark, plan):
    from mel_tnnt_spark.operators.linking import link_mentions, link_mentions_via_groupby

    aliases, mentions, gold_df = _fixture(spark)
    link = link_mentions if plan == "broadcast_dim" else link_mentions_via_groupby
    linked = link(mentions, aliases).select("doc_id", "start_index", "entity_id")

    j = linked.join(gold_df, ["doc_id", "start_index"], "full_outer")
    correct = j.where(F.col("entity_id") == F.col("gold_id")).count()
    n_linked = linked.count()
    n_gold = gold_df.where(F.col("gold_id").isNotNull()).count()
    precision = correct / n_linked
    recall = correct / n_gold

    # exact fixture arithmetic: 48 correct, 1 wrong link (mislabeled
    # Jaguar), 1 unreachable gold (Atlantis), NILs not linked
    assert n_linked == 49 and n_gold == 49 and correct == 48
    assert precision >= 0.95, f"precision {precision:.3f}"
    assert recall >= 0.95, f"recall {recall:.3f}"


def test_linking_label_rescue_is_load_bearing(spark):
    """Ablation: scoring by prior alone (label weight 0) drops well
    below the 0.95 gate on the same corpus — the label-match term is
    what disambiguates, not a rigged dictionary."""
    from mel_tnnt_spark.operators.linking import best_candidate, link_candidates

    aliases, mentions, gold_df = _fixture(spark)
    cand = link_candidates(mentions, aliases).withColumn("score", F.col("prior"))
    linked = best_candidate(cand).select("doc_id", "start_index", "entity_id")
    j = linked.join(gold_df, ["doc_id", "start_index"], "full_outer")
    correct = j.where(F.col("entity_id") == F.col("gold_id")).count()
    precision = correct / linked.count()
    assert precision < 0.80, f"prior-only precision {precision:.3f} — corpus too easy"
