"""Product-quantized ANN (IVF-PQ) and PCA spectrum over embeddings (round 7).

``ivf_topk`` / ``ivf_topk_kmeans`` keep full vectors in every inverted
list; at 100 TB the candidate scan's memory traffic IS the search cost.
IVF-PQ is the standard fix (Jégou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011): store each vector as M small
subspace codes (here 8 bytes instead of 512), scan candidates by
asymmetric distance against the decoded approximation, then re-rank a
shortlist with exact scores fetched by id — a 64× candidate-bandwidth
reduction with near-exact final ranking.

Training (coarse-centroid prefix rule + per-subspace Lloyd iterations)
is deterministic: fixed sample, fixed init (first K sample rows), fixed
iteration count, first-minimum tie-breaks — so the index, and therefore
the recall contract, is bit-reproducible across runs and cluster sizes.

Like ``ivf_topk_kmeans``, the emission is a *thresholded recall
contract* (iterative codebook training is not SQL-expressible): the
oracle pins the query count exactly and expects the recall boolean to
be literal TRUE; tests/test_recall.py pins the measured recall tighter.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_workshop_spark.operators import query
from lakehouse_workshop_spark.operators.llm_similarity import (
    _DUCK_PREP,
    _emb_view,
    _SPARK_COS,
    _SPARK_PREP,
    EMB_DIM,
    IVF_NLIST_MIN,
    QUERY_FILTER,
    TOP_K,
)

PQ_M = 8  # subspaces
PQ_K = 16  # codes per subspace (4-bit codes)
PQ_TRAIN_N = 4096  # deterministic training-sample prefix (vec_id bound)
PQ_ITERS = 10
PQ_NPROBE = 8
PQ_SHORTLIST = 100
PQ_RECALL_FLOOR = 0.6


def _train_codebooks(residuals: np.ndarray) -> np.ndarray:
    """Deterministic per-subspace Lloyd k-means: init = first PQ_K sample
    rows, PQ_ITERS sweeps, empty clusters keep their previous center,
    ties take the first (lowest-index) code. Returns (M, K, dim/M)."""
    n, dim = residuals.shape
    sub = dim // PQ_M
    books = np.empty((PQ_M, PQ_K, sub), dtype=np.float64)
    for m in range(PQ_M):
        x = residuals[:, m * sub : (m + 1) * sub]
        centers = x[:PQ_K].copy()
        for _ in range(PQ_ITERS):
            d2 = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            code = d2.argmin(axis=1)
            for k in range(PQ_K):
                mask = code == k
                if mask.any():
                    centers[k] = x[mask].mean(axis=0)
        books[m] = centers
    return books


def ivf_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-k: coarse assignment (broadcast-centroid BLAS matmul,
    same prefix-centroid rule as ``ivf_topk``), residual product
    quantization to {PQ_M}×4-bit codes, ADC candidate scoring against the
    decoded approximations, shortlist of {PQ_SHORTLIST}, exact re-rank by
    id — returning (query_id, vec_id, cosine, rnk) like the exact search.

    Scale: the quantized candidate table carries (vec_id, cid, 8 codes) —
    no vectors — so the probe join moves ~{PQ_M} bytes per candidate
    instead of 8·{EMB_DIM}; the only full-width reads are the one encode
    pass and the shortlist re-rank (|queries|·{PQ_SHORTLIST} rows fetched
    by key). Codebooks + centroids broadcast (√n·{EMB_DIM} + {PQ_M}·{PQ_K}
    doubles). Training reads a bounded prefix sample; at 100 TB that
    prefix becomes a hash-sample of the same size — the index shape is
    unchanged.
    """
    _emb_view(spark, sf_dir)
    prepped = spark.sql(_SPARK_PREP)
    prepped.createOrReplaceTempView("pq_prepped")

    # ONE prefix collect covers both the coarse centroids (the same
    # vec_id < nlist prefix rule as _matmul_assign/ivf_topk) and the PQ
    # training sample; the sample's coarse assignment and the codebook
    # training both run driver-side on that bounded slice, so the whole
    # index build costs one count + one collect + one distributed
    # assign-and-encode pass (the first cut of this query re-derived the
    # centroids and the sample through _matmul_assign and paid every job
    # twice).
    n = spark.table("embeddings_raw").select("vec_id").count()
    nlist = max(IVF_NLIST_MIN, int(n**0.5))
    prefix = (
        prepped.where(F.col("vec_id") < max(nlist, PQ_TRAIN_N))
        .orderBy("vec_id")
        .collect()
    )
    unit = np.array([r["emb"] for r in prefix], dtype=np.float64)
    unit /= np.array([r["nrm"] for r in prefix])[:, None]
    is_cent = np.array([int(r["vec_id"]) < nlist for r in prefix])
    cent_mat = unit[is_cent]
    cent_ids = np.array(
        [int(r["vec_id"]) for r in prefix if int(r["vec_id"]) < nlist],
        dtype=np.int64,
    )
    # Sample assignment mirrors the distributed rule exactly: 6-dp
    # rounding BEFORE the argmax, first maximum over cid-ascending axis.
    s_best = np.round(unit @ cent_mat.T, 6).argmax(axis=1)
    books = _train_codebooks(unit - cent_mat[s_best])

    bc = spark.sparkContext.broadcast((cent_mat, cent_ids, books))

    def assign_encode(batches):
        import pandas as pd

        c_mat, c_ids, bks = bc.value
        sub = c_mat.shape[1] // PQ_M
        for pdf in batches:
            vecs = np.stack(pdf["emb"].to_numpy())
            vecs /= pdf["nrm"].to_numpy()[:, None]
            best = np.round(vecs @ c_mat.T, 6).argmax(axis=1)
            res = vecs - c_mat[best]
            codes = np.empty((len(pdf), PQ_M), dtype=np.int32)
            for m in range(PQ_M):
                x = res[:, m * sub : (m + 1) * sub]
                d2 = ((x[:, None, :] - bks[m][None, :, :]) ** 2).sum(axis=2)
                codes[:, m] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cid": c_ids[best],
                    "codes": list(codes),
                }
            )

    codes_df = prepped.mapInPandas(
        assign_encode, "vec_id BIGINT, cid BIGINT, codes ARRAY<INT>"
    ).localCheckpoint(eager=True)
    codes_df.createOrReplaceTempView("pq_codes")

    # Probe ranking: queries × centroid literal table (≤√n rows).
    spark.createDataFrame(
        [
            (int(cid), [float(x) for x in cm])
            for cid, cm in zip(cent_ids, cent_mat)
        ],
        "cid BIGINT, cunit ARRAY<DOUBLE>",
    ).createOrReplaceTempView("pq_centroids")
    spark.sql(
        f"""
        SELECT qid, cid FROM (
            SELECT q.vec_id AS qid, c.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY aggregate(zip_with(q.emb, c.cunit,
                                                   (x, y) -> x * y),
                                          0.0D, (acc, v) -> acc + v) / q.nrm
                                DESC, c.cid) AS prn
            FROM (SELECT * FROM pq_prepped WHERE {QUERY_FILTER}) q
            CROSS JOIN pq_centroids c
        ) WHERE prn <= {PQ_NPROBE}
        """
    ).createOrReplaceTempView("pq_probes")

    # ADC scoring: candidates carry only codes; queries ride along the
    # probe join (the query side is tiny — broadcast).
    cand = spark.sql(
        f"""
        SELECT p.qid, q.emb AS qemb, q.nrm AS qnrm,
               c.vec_id, c.cid, c.codes
        FROM pq_probes p
        JOIN pq_codes c ON p.cid = c.cid
        JOIN (SELECT vec_id, emb, nrm FROM pq_prepped
              WHERE {QUERY_FILTER}) q ON p.qid = q.vec_id
        WHERE c.vec_id <> p.qid
        """
    )

    def adc(batches):
        import pandas as pd

        c_mat, c_ids, bks = bc.value
        c_idx = {int(c): i for i, c in enumerate(c_ids)}
        sub = c_mat.shape[1] // PQ_M
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.stack(pdf["qemb"].to_numpy())
            q /= pdf["qnrm"].to_numpy()[:, None]
            dec = c_mat[[c_idx[int(c)] for c in pdf["cid"]]].copy()
            codes = np.stack(pdf["codes"].to_numpy())
            for m in range(PQ_M):
                dec[:, m * sub : (m + 1) * sub] += bks[m][codes[:, m]]
            approx = np.round(np.einsum("ij,ij->i", q, dec), 6)
            yield pd.DataFrame(
                {
                    "query_id": pdf["qid"].to_numpy(),
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "approx": approx,
                }
            )

    cand.mapInPandas(
        adc, "query_id BIGINT, vec_id BIGINT, approx DOUBLE"
    ).createOrReplaceTempView("pq_scored")

    # Shortlist on the quantized score, then exact re-rank by id.
    return spark.sql(
        f"""
        WITH shortlist AS (
            SELECT query_id, vec_id FROM (
                SELECT query_id, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY approx DESC, vec_id) AS srn
                FROM pq_scored
            ) WHERE srn <= {PQ_SHORTLIST}
        ),
        exact AS (
            SELECT s.query_id, s.vec_id,
                   ROUND({_SPARK_COS}, 6) AS cosine
            FROM shortlist s
            JOIN pq_prepped a ON s.query_id = a.vec_id
            JOIN pq_prepped b ON s.vec_id = b.vec_id
        )
        SELECT query_id, vec_id, cosine, CAST(rnk AS INT) AS rnk FROM (
            SELECT query_id, vec_id, cosine,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, vec_id) AS rnk
            FROM exact
        ) WHERE rnk <= {TOP_K}
        """
    )


@query(
    "ivf_pq_topk",
    tier=2,
    oracle=f"""
    WITH e AS ({_DUCK_PREP})
    SELECT COUNT(*) AS n_queries, TRUE AS recall_ok
    FROM e WHERE {QUERY_FILTER}
    """,
)
def ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall contract for :func:`ivf_pq_search`: mean recall@{TOP_K}
    against the exact cosine top-k must clear {PQ_RECALL_FLOOR} (floor;
    tests/test_recall.py pins the measured value tighter). The oracle
    derives ``n_queries`` exactly and expects ``recall_ok`` = TRUE."""
    from lakehouse_workshop_spark.operators.llm_similarity import _topk_sql

    approx = ivf_pq_search(spark, sf_dir)
    approx.createOrReplaceTempView("ivf_pq_topk_result")
    spark.sql(_topk_sql(_SPARK_COS, _SPARK_PREP)).createOrReplaceTempView(
        "pq_exact_topk"
    )
    return spark.sql(
        f"""
        WITH hits AS (
            SELECT e.query_id,
                   COUNT(a.vec_id) AS n_hit, COUNT(*) AS n_exact
            FROM pq_exact_topk e
            LEFT JOIN ivf_pq_topk_result a
              ON e.query_id = a.query_id AND e.vec_id = a.vec_id
            GROUP BY e.query_id
        )
        SELECT COUNT(*) AS n_queries,
               AVG(n_hit / n_exact) >= {PQ_RECALL_FLOOR}D AS recall_ok
        FROM hits
        """
    )


# --- PCA spectrum --------------------------------------------------------------


@query(
    "embedding_pca_spectrum",
    tier=2,
    oracle=f"""
    WITH x AS (
        SELECT g.i AS dim, CAST(embedding[g.i] AS DOUBLE) AS v
        FROM embeddings, generate_series(1, {EMB_DIM}) AS g(i)
    ),
    per_dim AS (
        SELECT dim,
               COUNT(*) AS n,
               CAST(SUM(CAST(v AS DECIMAL(38,8))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(v * v AS DECIMAL(38,8))) AS DOUBLE) AS sxx
        FROM x GROUP BY dim
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_vectors,
           ROUND(CAST(SUM(CAST(sxx / n - (sx / n) * (sx / n)
                              AS DECIMAL(38,8))) AS DOUBLE), 6)
               AS total_variance,
           TRUE AS eigen_trace_ok,
           TRUE AS shares_descending_ok
    FROM per_dim
    """,
)
def embedding_pca_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA eigen-spectrum contract over the embedding covariance.

    The covariance accumulates distributedly (one {EMB_DIM}×{EMB_DIM}
    partial per Arrow batch — constant-size state, the classic
    tree-aggregate shape); eigenvalues come from the driver-side
    eigendecomposition of that tiny matrix. Eigenvectors/values are not
    SQL-derivable, so the emission is the contract the oracle CAN pin
    exactly: ``total_variance`` (the covariance trace, recomputed
    engine-side via order-independent DECIMAL moment sums over the
    exploded components) plus two internal-consistency booleans —
    Σλ = trace to 1e-6 relative, and shares sorted descending. The
    spectrum itself is pinned against numpy in tests/test_llm_mixture.py.
    """
    _emb_view(spark, sf_dir)

    def partial_cov(batches):
        import pandas as pd

        s = np.zeros(EMB_DIM)
        ss = np.zeros((EMB_DIM, EMB_DIM))
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            s += m.sum(axis=0)
            ss += m.T @ m
            n += len(m)
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.ravel().tolist()]}
            )

    parts = (
        spark.table("embeddings")
        .select("embedding")
        .mapInPandas(
            partial_cov, "n BIGINT, s ARRAY<DOUBLE>, ss ARRAY<DOUBLE>"
        )
        .collect()
    )
    n = sum(p["n"] for p in parts)
    s = np.sum([p["s"] for p in parts], axis=0)
    ss = np.sum([np.array(p["ss"]).reshape(EMB_DIM, EMB_DIM) for p in parts], axis=0)
    cov = ss / n - np.outer(s / n, s / n)
    eig = np.linalg.eigvalsh(cov)[::-1]
    shares = eig / eig.sum()
    trace_ok = bool(abs(eig.sum() - np.trace(cov)) <= 1e-6 * abs(np.trace(cov)))
    desc_ok = bool(np.all(np.diff(shares) <= 1e-12))

    # The hash-compared total_variance comes from the deterministic SQL
    # path (DECIMAL moment sums), NOT the float partials above.
    return spark.sql(
        f"""
        WITH x AS (
            SELECT pos + 1 AS dim, CAST(v AS DOUBLE) AS v
            FROM embeddings LATERAL VIEW posexplode(embedding) AS pos, v
        ),
        per_dim AS (
            SELECT dim,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(v AS DECIMAL(38,8))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(v * v AS DECIMAL(38,8))) AS DOUBLE) AS sxx
            FROM x GROUP BY dim
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n_vectors,
               ROUND(CAST(SUM(CAST(sxx / n - (sx / n) * (sx / n)
                                  AS DECIMAL(38,8))) AS DOUBLE), 6)
                   AS total_variance,
               {str(trace_ok).upper()} AS eigen_trace_ok,
               {str(desc_ok).upper()} AS shares_descending_ok
        FROM per_dim
        """
    )
