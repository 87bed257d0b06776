"""Measured-recall contracts for the approximate similarity family.

Round-3 verdict: recall knobs were documented, not tested. These tests
compute recall against the exact twins at the test SF and pin floors —
a hashing/banding/probing regression that silently guts answer quality
now fails pytest instead of shipping behind a green exact-parity row.

Measured values at both test SFs (for headroom context):
- embedding_near_pairs_lsh pair recall: 0.47 (sf0.001) / 0.58 (sf0.01)
- ann_topk_lsh recall@10 (8 tables x 4 planes): 0.66 / 0.66
- ivf_topk recall@10 (nlist=sqrt(n), nprobe=8): 0.70 / 0.68
- ivf_kmeans_search recall@10 (trained centroids, nprobe=8): 0.64 / 0.66
"""

from __future__ import annotations

import lakehouse_workshop_spark.operators.llm_similarity as S

PAIR_RECALL_FLOOR = 0.4
TOPK_RECALL_FLOOR = 0.5


def _topk_set(df):
    return {(r.query_id, r.vec_id) for r in df.collect()}


def test_near_pair_lsh_recall(spark, sf_dir):
    exact = {(r.vec_a, r.vec_b) for r in S.embedding_near_pairs(spark, sf_dir).collect()}
    lsh = {(r.vec_a, r.vec_b) for r in S.embedding_near_pairs_lsh(spark, sf_dir).collect()}
    assert exact, "exact near-pair set is empty — threshold or data drifted"
    assert not lsh - exact, "LSH emitted a pair the exact search did not (not a subset)"
    recall = len(lsh & exact) / len(exact)
    assert recall >= PAIR_RECALL_FLOOR, f"pair recall {recall:.3f} < {PAIR_RECALL_FLOOR}"


def test_ann_topk_lsh_recall(spark, sf_dir):
    exact = _topk_set(S.cosine_topk(spark, sf_dir))
    ann = _topk_set(S.ann_topk_lsh(spark, sf_dir))
    recall = len(ann & exact) / len(exact)
    assert recall >= TOPK_RECALL_FLOOR, f"ann recall@10 {recall:.3f} < {TOPK_RECALL_FLOOR}"


def test_ivf_topk_recall(spark, sf_dir):
    exact = _topk_set(S.cosine_topk(spark, sf_dir))
    ivf = _topk_set(S.ivf_topk(spark, sf_dir))
    recall = len(ivf & exact) / len(exact)
    assert recall >= TOPK_RECALL_FLOOR, f"ivf recall@10 {recall:.3f} < {TOPK_RECALL_FLOOR}"


def test_ivf_kmeans_recall(spark, sf_dir):
    exact = _topk_set(S.cosine_topk(spark, sf_dir))
    km = _topk_set(S.ivf_kmeans_search(spark, sf_dir))
    recall = len(km & exact) / len(exact)
    assert recall >= TOPK_RECALL_FLOOR, f"kmeans recall@10 {recall:.3f} < {TOPK_RECALL_FLOOR}"
