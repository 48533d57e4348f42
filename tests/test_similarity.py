"""Embedding similarity operators: near-dup pairs exact vs LSH-blocked.

The blocked variant's candidate set must be a subset of the exact pairs
at the same threshold (blocking can only drop pairs, never invent or
mis-score them), and scores must agree pair-for-pair.
"""

from __future__ import annotations

from slice_db_spark.operators import similarity


def test_embedding_near_pairs_exact_vs_blocked(spark, catalog):
    emb = catalog["embeddings"].limit(120)
    threshold = 0.3
    exact = {
        (r.id_a, r.id_b): r.sim
        for r in similarity.embedding_near_pairs(emb, threshold=threshold).collect()
    }
    assert exact, "threshold chosen so exact pairs exist"
    planes = similarity.random_planes(16, 64, seed="dedup")
    blocked = {
        (r.id_a, r.id_b): r.sim
        for r in similarity.embedding_near_pairs(
            emb, threshold=threshold, planes=planes, bands=4
        ).collect()
    }
    assert set(blocked) <= set(exact)
    for pair, sim in blocked.items():
        assert sim == exact[pair]


def test_embedding_near_pairs_ordering(spark, catalog):
    emb = catalog["embeddings"].limit(60)
    for r in similarity.embedding_near_pairs(emb, threshold=0.0).take(50):
        assert r.id_a < r.id_b
