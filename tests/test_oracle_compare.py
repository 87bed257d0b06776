"""Unit tests for the oracle comparator itself (the correctness gate's own
correctness): cell canonicalization across the Spark/DuckDB type seams and
the row-alignment rules."""

from __future__ import annotations

import math

import pandas as pd

from lakehouse_workshop_spark.oracle import _canon_cell, canon_rows


def test_bytes_and_bytearray_canonicalize_identically():
    assert _canon_cell(b"\x00\xff") == _canon_cell(bytearray(b"\x00\xff")) == "00ff"


def test_nan_canonicalizes_to_marker():
    assert _canon_cell(float("nan")) == "NaN"
    assert _canon_cell(1.5) == 1.5


def test_timestamp_canonicalizes_to_isoformat():
    t = pd.Timestamp("2026-01-02T03:04:05.123456")
    assert _canon_cell(t) == "2026-01-02T03:04:05.123456"


def test_numpy_scalars_and_arrays_unwrap():
    import numpy as np

    assert _canon_cell(np.int64(7)) == 7
    assert _canon_cell(np.array([1.0, 2.0])) == (1.0, 2.0)
    assert _canon_cell([np.float64(0.5)]) == (0.5,)


def test_canon_rows_sorts_columns_and_rows():
    a = pd.DataFrame({"b": [2, 1], "a": ["y", "x"]})
    b = pd.DataFrame({"a": ["x", "y"], "b": [1, 2]})
    assert canon_rows(a) == canon_rows(b)


def test_none_survives():
    assert _canon_cell(None) is None


def test_scale_paths_point_at_registered_twins():
    """Every labeled quadratic baseline names a registered production twin."""
    from lakehouse_workshop_spark.operators import all_queries, all_scale_paths

    queries, paths = all_queries(), all_scale_paths()
    assert paths == {
        "embedding_near_pairs": "embedding_near_pairs_lsh",
        "ngram_jaccard_pairs": "ngram_jaccard_pairs_capped",
        "ngram_containment_pairs": "ngram_containment_capped",
        # r8 chain: the fold baseline names the BLAS exact twin (same
        # rows, vectorized); the exact twin names the approximate index
        # for consumers who can trade recall for sub-linear scans
        "cosine_topk": "exact_topk",
        "exact_topk": "ivf_topk",
        "order_percentiles": "order_percentiles_approx",
        # r14: the hybrid retrieval baseline's brute vector arm names the
        # IVF-armed twin (same lexical arm + fusion, probed candidates)
        "hybrid_rank_fusion": "hybrid_rank_fusion_ivf",
    }
    for baseline, twin in paths.items():
        assert baseline in queries and twin in queries
