"""Semantic invariants for the round-5 corpus-quality / OLAP-shape
operators — properties the DuckDB parity hash can't express (monotonicity,
caps, ordering relations), pinned at sf0.001."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_workshop_spark.operators import llm_quality as Q
from lakehouse_workshop_spark.operators import completions as C
from lakehouse_workshop_spark.operators.olap_tpch import min_cost_supplier


def test_funnel_is_monotone_nonincreasing(spark, sf_dir):
    rows = (
        Q.corpus_quality_funnel(spark, sf_dir)
        .orderBy("stage_no")
        .select("docs")
        .collect()
    )
    counts = [r.docs for r in rows]
    assert len(counts) == 5
    assert counts == sorted(counts, reverse=True)
    assert counts[0] > 0


def test_source_cap_is_hard_and_deterministic(spark, sf_dir):
    out = Q.source_balanced_sample(spark, sf_dir)
    per_source = out.groupBy("source").count().collect()
    assert per_source and all(r["count"] <= Q.SOURCE_CAP for r in per_source)
    # deterministic: two independent builds pick the identical doc set
    a = {r.doc_id for r in out.collect()}
    b = {r.doc_id for r in Q.source_balanced_sample(spark, sf_dir).collect()}
    assert a == b


def test_unigram_lm_score_is_nonpositive_and_total(spark, sf_dir):
    out = Q.unigram_lm_score(spark, sf_dir)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    rows = out.collect()
    assert len(rows) == n_docs  # every doc scored (no token joins lost)
    # ln(c/total) <= 0 always; strict < 0 unless a doc's every token is
    # the entire corpus
    assert all(r.avg_logprob <= 0 for r in rows)


def test_topic_assign_covers_every_vector_once(spark, sf_dir):
    out = Q.topic_assign(spark, sf_dir)
    n_vec = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    rows = out.collect()
    assert len(rows) == n_vec
    assert len({r.vec_id for r in rows}) == n_vec
    # the argmax cosine is a valid cosine
    assert all(-1.0 <= r.cosine <= 1.0 for r in rows)


def test_click_attribution_window_semantics(spark, sf_dir):
    out = C.click_attribution(spark, sf_dir).collect()
    n_purchases = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert len(out) == n_purchases  # zero-click purchases retained
    for r in out:
        assert r.n_clicks >= 0
        if r.last_click_ts is not None:
            assert r.last_click_ts < r.purchase_ts
            delta = (r.purchase_ts - r.last_click_ts).total_seconds()
            assert delta <= C.ATTR_WINDOW_SECONDS


def test_min_cost_supplier_is_true_argmin(spark, sf_dir):
    out = min_cost_supplier(spark, sf_dir)
    # joining back: no (part, supplier) pair may undercut the chosen one
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey",
        "l_suppkey",
        F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6).alias("up"),
    )
    floor = li.groupBy("l_partkey").agg(F.min("up").alias("min_up"))
    joined = out.join(floor, out.p_partkey == floor.l_partkey).collect()
    assert joined
    for r in joined:
        assert abs(r.unit_price - r.min_up) < 1e-9


def test_quality_score_psi_matches_direct_computation(spark, sf_dir):
    """The emitted PSI equals a direct Python recomputation from the
    classifier scores (Laplace-smoothed decile shares), every decile row
    is present, and the smoothed shares sum to 1 per side."""
    import math

    from lakehouse_workshop_spark.operators import llm_quality as Q

    rows = Q.quality_score_psi(spark, sf_dir).collect()
    assert sorted(r.bin for r in rows) == list(range(Q.QS_PSI_BINS))
    assert abs(sum(r.corpus_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.batch_share for r in rows) - 1.0) < 1e-4
    psi_vals = {r.psi for r in rows}
    assert len(psi_vals) == 1  # global metric repeated per row

    scores = Q.quality_classifier_score(spark, sf_dir).collect()
    cc = [0] * Q.QS_PSI_BINS
    cb = [0] * Q.QS_PSI_BINS
    for r in scores:
        b = min(int(r.prob * Q.QS_PSI_BINS), Q.QS_PSI_BINS - 1)
        (cb if r.doc_id % 10 == 9 else cc)[b] += 1
    nc = sum(cc) + Q.QS_PSI_BINS
    nb = sum(cb) + Q.QS_PSI_BINS
    psi = sum(
        ((cb[i] + 1) / nb - (cc[i] + 1) / nc)
        * math.log(((cb[i] + 1) / nb) / ((cc[i] + 1) / nc))
        for i in range(Q.QS_PSI_BINS)
    )
    got = psi_vals.pop()
    assert abs(got - psi) < 1e-5, (got, psi)
    for r in rows:
        assert (r.n_corpus + 1, r.n_batch + 1) == (
            cc[r.bin] + 1,
            cb[r.bin] + 1,
        )
        assert r.shifted == (got >= Q.QS_PSI_SHIFTED)


def test_quality_score_psi_edge_fixtures_cross_engine(spark):
    """Degenerate inputs the real corpus never produces: an EMPTY corpus
    side (every doc in the ingest batch — Laplace smoothing must carry
    the denominator alone), boundary scores 0.0 and 1.0 (the 1.0 case
    must clamp into the top decile, not bin 10), and a one-sided spike.
    Contracts: Spark == DuckDB row-for-row, PSI >= 0 (it is a sum of
    (p-q)ln(p/q) terms, each nonnegative), and all 10 spine rows
    emitted."""
    import duckdb

    from lakehouse_workshop_spark.operators import llm_quality as Q
    from lakehouse_workshop_spark.oracle import canon_rows

    fixtures = {
        # (doc_id, prob): doc_id % 10 = 9 -> batch
        "empty_corpus": [(9, 0.0), (19, 1.0), (29, 0.55), (39, 0.999999)],
        "boundary_probs": [(1, 0.0), (2, 1.0), (9, 0.0), (19, 1.0)],
        "spike": [(i, 0.45) for i in range(1, 9)]
        + [(9, 0.95), (19, 0.95), (29, 0.95)],
    }
    for name, rows in fixtures.items():
        vals = ", ".join(f"({d}, CAST({p} AS DOUBLE))" for d, p in rows)
        rel = f"SELECT * FROM (VALUES {vals}) AS t(doc_id, prob)"
        duck_sql = Q._psi_sql(rel, Q._DUCK_BINS, Q._DUCK_FPLN)
        spark_sql = Q._psi_sql(rel, Q._SPARK_BINS, Q._DUCK_FPLN)
        con = duckdb.connect()
        duck = con.sql(duck_sql).df()
        got = spark.sql(spark_sql)
        pdf = got.toPandas()
        assert canon_rows(pdf) == canon_rows(duck), name
        out = got.collect()
        assert sorted(r.bin for r in out) == list(range(Q.QS_PSI_BINS)), name
        assert all(r.psi >= -1e-12 for r in out), name
        assert all(0 <= r.batch_share <= 1 for r in out), name
    # the spike fixture separates corpus (bin 4) from batch (bin 9)
    # hard enough to cross the action line — the shifted=True branch
    # must fire (the real corpus never exercises it: PSI << 0.25 there)
    vals = ", ".join(
        f"({d}, CAST({p} AS DOUBLE))" for d, p in fixtures["spike"]
    )
    spike = spark.sql(
        Q._psi_sql(
            f"SELECT * FROM (VALUES {vals}) AS t(doc_id, prob)",
            Q._SPARK_BINS,
            Q._DUCK_FPLN,
        )
    ).collect()
    assert spike[0].psi >= Q.QS_PSI_SHIFTED
    assert all(r.shifted for r in spike)


def test_quality_gate_recalibrate_contract(spark, sf_dir):
    """The decision row agrees with `quality_score_psi`'s emission
    (same psi/shifted), the populations match a direct recomputation
    from the classifier scores, ``threshold_recal`` is exactly the
    merged-distribution prob at the corpus-keep-rate rank cut
    (rank*Nc <= Nm*Kc), and ``threshold_used`` switches on shifted."""
    out = Q.quality_gate_recalibrate(spark, sf_dir).collect()
    assert len(out) == 1
    row = out[0]
    psi_rows = Q.quality_score_psi(spark, sf_dir).collect()
    assert row.psi == psi_rows[0].psi
    assert row.shifted == psi_rows[0].shifted

    scores = Q.quality_classifier_score(spark, sf_dir).collect()
    corpus = [r for r in scores if r.doc_id % 10 != 9]
    batch = [r for r in scores if r.doc_id % 10 == 9]
    # the keep-rate yardstick is the prob gate the threshold drives,
    # not the classifier's raw-sign keep flag (they disagree where a
    # barely-negative logit rounds prob to exactly the threshold)
    kc = sum(1 for r in corpus if r.prob >= Q.QGATE_THRESHOLD)
    assert (row.n_corpus, row.n_keep_corpus, row.n_batch) == (
        len(corpus),
        kc,
        len(batch),
    )
    merged = sorted(scores, key=lambda r: (-r.prob, r.doc_id))
    nm, nc = len(merged), len(corpus)
    cut = max(
        (rnk for rnk in range(1, nm + 1) if rnk * nc <= nm * kc), default=0
    )
    expect_thr = merged[cut - 1].prob if cut else 1.0
    assert row.threshold_recal == expect_thr
    assert row.threshold_used == (
        row.threshold_recal if row.shifted else Q.QGATE_THRESHOLD
    )
    # >= -threshold semantics: every rank-cut row passes the published
    # gate, rows can only be ADDED past the cut by ties at the cut
    # value, and everything beyond the tie block is excluded
    assert all(merged[i].prob >= expect_thr for i in range(cut))
    kept_at_thr = sum(1 for r in merged if r.prob >= expect_thr)
    assert kept_at_thr >= cut
    assert all(r.prob < expect_thr for r in merged[kept_at_thr:])
    assert all(r.prob == expect_thr for r in merged[cut:kept_at_thr])


def test_quality_gate_recalibrate_edge_fixtures_cross_engine(spark):
    """Degenerate inputs, Spark == DuckDB row-for-row: an all-drop
    corpus (kc=0 -> recal pins to 1.0), an EMPTY corpus (nc=0 — the
    rank predicate's 0 <= 0 degeneracy must not collapse the cut to
    min(prob)/keep-everything), a shifted psi row (the recalibrated
    threshold must be the one used), and a stable psi row (the
    standing threshold must be the one used)."""
    import duckdb

    from lakehouse_workshop_spark.oracle import canon_rows

    fixtures = {
        # (scores rows as (doc_id, prob) — corpus = doc_id % 10 != 9,
        #  keep under the prob gate = prob >= 0.5; psi rows)
        "all_drop_corpus": (
            [(1, 0.4), (2, 0.3), (9, 0.9)],
            [(0.5, True)],
        ),
        "empty_corpus": (
            [(9, 0.7), (19, 0.2)],
            [(0.5, True)],
        ),
        "shifted_uses_recal": (
            [(1, 0.8), (2, 0.6), (3, 0.2), (9, 0.7)],
            [(0.3, True)],
        ),
        "stable_uses_standing": (
            [(1, 0.8), (2, 0.6), (3, 0.2), (9, 0.7)],
            [(0.01, False)],
        ),
    }
    for name, (score_rows, psi_rows) in fixtures.items():
        svals = ", ".join(
            f"({d}, CAST({p} AS DOUBLE))" for d, p in score_rows
        )
        pvals = ", ".join(
            f"(CAST({p} AS DOUBLE), {str(s).upper()})" for p, s in psi_rows
        )
        srel = f"SELECT * FROM (VALUES {svals}) AS t(doc_id, prob)"
        prel = f"SELECT * FROM (VALUES {pvals}) AS t(psi, shifted)"
        sql = Q._qgate_recal_sql(srel, prel)
        con = duckdb.connect()
        duck = con.sql(sql).df()
        got = spark.sql(sql)
        assert canon_rows(got.toPandas()) == canon_rows(duck), name
        row = got.collect()[0]
        if name == "all_drop_corpus":
            assert row.threshold_recal == 1.0
            assert row.n_keep_corpus == 0
        if name == "empty_corpus":
            # keep-nothing contract, NOT min(prob)/keep-everything
            assert row.n_corpus == 0
            assert row.threshold_recal == 1.0
            assert row.threshold_used == 1.0
        if name == "shifted_uses_recal":
            assert row.threshold_used == row.threshold_recal
            # corpus kc=2 of nc=3, merged 0.8,0.7,0.6,0.2 -> cut at
            # rank 2 -> threshold 0.7
            assert row.threshold_recal == 0.7
        if name == "stable_uses_standing":
            assert row.threshold_used == Q.QGATE_THRESHOLD


def test_quality_gate_apply_realizes_decision(spark, sf_dir):
    """r17: `quality_gate_apply` is the quality family's data terminal —
    the admitted set must be EXACTLY the batch docs whose classifier
    prob clears the decision row's threshold_used (recomputed here from
    the registered parents), with the threshold echoed per row."""
    from lakehouse_workshop_spark.operators import all_queries

    q = all_queries()
    decision = q["quality_gate_recalibrate"](spark, sf_dir).collect()
    assert len(decision) == 1
    thr = decision[0].threshold_used
    scores = q["quality_classifier_score"](spark, sf_dir).collect()
    expected = {
        r.doc_id: r.prob
        for r in scores
        if r.doc_id % 10 == 9 and r.prob >= thr
    }

    rows = q["quality_gate_apply"](spark, sf_dir).collect()
    got = {r.doc_id: r.prob for r in rows}
    assert got == expected
    for r in rows:
        assert r.threshold_used == thr
        assert r.doc_id % 10 == 9
