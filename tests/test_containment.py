"""Large-vocabulary containment: Aho-Corasick detector parity with the
naive running-offset gazetteer on a 10^4-surface vocabulary."""

from __future__ import annotations

import random

from mel_tnnt_spark.operators.mentions import _gazetteer_detector, ac_gazetteer_detector


def _big_gazetteer(n: int = 10_000) -> dict[str, str]:
    rng = random.Random(7)
    gaz: dict[str, str] = {}
    for i in range(n):
        w = f"species{i:05d}"
        gaz[w] = "SPECIES"
        if i % 10 == 0:
            gaz[f"{w} major"] = "SPECIES"  # multi-word superstring
    # adversarial overlaps: prefixes, substrings, self-overlapping
    gaz.update({
        "Grace": "PER", "Grace Hopper": "PER", "race": "MISC",
        "aa": "MISC", "aaa": "MISC",
    })
    return gaz


def _corpus(gaz: dict[str, str], n_docs: int = 30) -> list[str]:
    rng = random.Random(13)
    surfaces = sorted(gaz)
    noise = ["lorem", "ipsum", "dolor", "sit", "amet", "Grace", "aaaa", "aaaaa"]
    docs = []
    for _ in range(n_docs):
        words = []
        for _ in range(rng.randint(20, 120)):
            words.append(
                rng.choice(surfaces) if rng.random() < 0.4 else rng.choice(noise)
            )
        docs.append(" ".join(words))
    docs.append("Grace Hopper raced aaaa species00010 major species00010")
    return docs


def test_ac_detector_matches_naive_on_10k_vocab():
    gaz = _big_gazetteer()
    naive = _gazetteer_detector(gaz)
    ac = ac_gazetteer_detector(gaz)
    for text in _corpus(gaz):
        assert set(ac(text)) == set(naive(text))


def test_ac_detector_self_overlap_semantics():
    gaz = {"aa": "X"}
    ac = ac_gazetteer_detector(gaz)
    naive = _gazetteer_detector(gaz)
    # find-advance keeps (0,2) and (2,4) in "aaaa", skipping (1,3)
    assert set(ac("aaaa")) == set(naive("aaaa")) == {("X", "aa", 0, 2), ("X", "aa", 2, 4)}
