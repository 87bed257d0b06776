"""Property tests (SURVEY.md §5.4): algebraic invariants of the operators
and the CLV model math.

Model-math properties run driver-side with hypothesis (fast, no Spark);
operator invariants are asserted once over the sf0.001 tables (running
Spark per hypothesis example would be pathological).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lakehouse_workshop_spark.models import BetaGeoModel, GammaGammaModel

# ---------------------------------------------------------------------------
# Model math properties (driver-side, hypothesis-driven)
# ---------------------------------------------------------------------------

# One fixed fit reused across examples — fitting per example would be slow
# and the properties under test are of the *scoring* functions.
_rng = np.random.default_rng(7)
_x = _rng.integers(0, 20, size=200).astype(float)
_tx = _rng.uniform(0, 50, size=200)
_T = _tx + _rng.uniform(0, 10, size=200)
_m = _rng.uniform(1, 500, size=200)

_BGF = BetaGeoModel.fit(_x, _tx, _T, penalizer_coef=0.0001)
_GGF = GammaGammaModel.fit(
    _x[_x > 1] + 1, _m[_x > 1], penalizer_coef=0.01
)

customer = st.tuples(
    st.integers(min_value=0, max_value=60),  # frequency
    st.floats(min_value=0.0, max_value=50.0),  # recency
    st.floats(min_value=0.0, max_value=15.0),  # age - recency
)


@settings(max_examples=200, deadline=None)
@given(customer)
def test_prob_alive_is_probability(c):
    x, t_x, dt = c
    xa, ta, Ta = np.array([float(x)]), np.array([t_x]), np.array([t_x + dt])
    p = _BGF.conditional_probability_alive(xa, ta, Ta)
    assert 0.0 <= p[0] <= 1.0 + 1e-9


@settings(max_examples=200, deadline=None)
@given(customer, st.floats(min_value=0.1, max_value=104.0))
def test_expected_purchases_nonnegative_and_monotone_in_horizon(c, t):
    x, t_x, dt = c
    xa, ta, Ta = np.array([float(x)]), np.array([t_x]), np.array([t_x + dt])
    e1 = _BGF.conditional_expected_purchases(t, xa, ta, Ta)[0]
    e2 = _BGF.conditional_expected_purchases(t + 10.0, xa, ta, Ta)[0]
    assert e1 >= -1e-9
    assert e2 >= e1 - 1e-9  # more horizon, no fewer expected purchases


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=2, max_value=60),
    st.floats(min_value=0.5, max_value=1000.0),
)
def test_gamma_gamma_profit_positive_and_shrinks_toward_prior(x, m):
    xa, ma = np.array([float(x)]), np.array([m])
    e = _GGF.conditional_expected_average_profit(xa, ma)[0]
    assert e > 0.0
    # with more observations the estimate moves toward the observed mean
    e_many = _GGF.conditional_expected_average_profit(np.array([60.0]), ma)[0]
    assert abs(e_many - m) <= abs(e - m) + 1e-6


# ---------------------------------------------------------------------------
# Operator invariants over sf0.001 (one Spark pass each)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def q():
    from lakehouse_workshop_spark.operators import all_queries

    return all_queries()


def test_bucketing_is_total(spark, sf_dir, q):
    """P8: every order lands in exactly one band — bucket counts sum to the
    table count."""
    from lakehouse_workshop_spark.catalog import load_table

    buckets = q["order_value_buckets"](spark, sf_dir).toPandas()
    total = load_table(spark, sf_dir, "orders").count()
    assert int(buckets["n_orders"].sum()) == total


def test_rfm_invariants(spark, sf_dir, q):
    """A4: frequency = count-1 >= 0; recency >= 0; avg monetary > 0."""
    pdf = q["rfm_summary"](spark, sf_dir).toPandas()
    assert (pdf["frequency"] >= 0).all()
    assert (pdf["recency"] >= 0).all()
    assert (pdf["avg_profit"] > 0).all()


def test_minhash_signature_range(spark, sf_dir, q):
    from lakehouse_workshop_spark.operators.llm_dedup import MINHASH_P

    pdf = q["minhash_signatures"](spark, sf_dir).toPandas()
    sig_cols = [c for c in pdf.columns if c.startswith("sig")]
    assert len(sig_cols) == 16
    for c in sig_cols:
        assert pdf[c].between(0, MINHASH_P - 1).all()


def test_simhash_pairs_within_hamming_budget(spark, sf_dir, q):
    from lakehouse_workshop_spark.operators.llm_dedup import SIMHASH_MAX_HAMMING

    pdf = q["simhash_near_pairs"](spark, sf_dir).toPandas()
    assert pdf["hamming"].between(0, SIMHASH_MAX_HAMMING).all()
    assert (pdf["doc_a"] < pdf["doc_b"]).all()


def test_jaccard_bounds_and_pair_order(spark, sf_dir, q):
    pdf = q["ngram_jaccard_pairs"](spark, sf_dir).toPandas()
    assert pdf["jaccard"].between(0.2, 1.0).all()
    assert (pdf["doc_a"] < pdf["doc_b"]).all()


def test_sessionization_conserves_events(spark, sf_dir, q):
    from lakehouse_workshop_spark.catalog import load_table

    sessions = q["sessionize_events"](spark, sf_dir).toPandas()
    total = load_table(spark, sf_dir, "events").count()
    assert int(sessions["n_events"].sum()) == total


def test_cosine_topk_is_valid_ranking(spark, sf_dir, q):
    pdf = q["cosine_topk"](spark, sf_dir).toPandas()
    assert pdf["cosine"].between(-1.0 - 1e-9, 1.0 + 1e-9).all()
    for _, g in pdf.groupby("query_id"):
        ranks = sorted(g["rnk"].tolist())
        assert ranks == list(range(1, len(ranks) + 1))
        by_rank = g.sort_values("rnk")["cosine"].tolist()
        assert all(a >= b - 1e-12 for a, b in zip(by_rank, by_rank[1:]))


def test_approx_count_distinct_close_to_exact(spark, sf_dir, q):
    exact = q["count_distinct_customers"](spark, sf_dir).collect()[0][0]
    approx = q["count_distinct_customers_approx"](spark, sf_dir).collect()[0][0]
    assert abs(approx - exact) / exact < 0.05


def test_results_independent_of_shuffle_partitioning(spark, sf_dir, q):
    """The determinism contract: float aggregates go through decimal
    accumulation, so results are bit-identical under any partitioning —
    what makes the oracle hash stable on a 1000-executor cluster."""
    name = "monthly_sales"
    base = canon(q[name](spark, sf_dir).toPandas())
    original = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for n in ("3", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            assert canon(q[name](spark, sf_dir).toPandas()) == base, n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", original)


def canon(pdf):
    from lakehouse_workshop_spark.oracle import canon_rows

    return canon_rows(pdf)


# --- codec round-trip properties (round 6) ---------------------------------
# The PNG/WAV codecs back REAL decode queries; property tests hammer the
# filter/chunk/endianness logic with arbitrary content and shapes far
# beyond the synthesized 8x8 / 64-sample payloads the queries use.


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_png_roundtrip_property(h, w, seed):
    import numpy as np

    from lakehouse_workshop_spark.llm.multimodal import decode_png, encode_png

    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = decode_png(encode_png(px))
    assert out.shape == px.shape
    assert (out == px).all()


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=256
    ),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_property(samples, rate):
    import numpy as np

    from lakehouse_workshop_spark.llm.multimodal import decode_wav, encode_wav

    arr = np.array(samples, dtype=np.int16)
    got, got_rate = decode_wav(encode_wav(arr, rate))
    assert got_rate == rate
    assert (got == arr).all()


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcxyz", min_size=1, max_size=8),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=0, max_value=40),
)
def test_bpe_is_lossless_for_any_corpus(words, n_merges):
    """BPE never loses information: for ANY corpus and ANY merge budget,
    encoding a word with the learned ranks and concatenating its tokens
    recovers the word + boundary marker exactly."""
    from collections import Counter

    from lakehouse_workshop_spark.llm.bpe import (
        END_OF_WORD,
        encode_word,
        learn_merges,
    )

    counts = list(Counter(words).items())
    merges = learn_merges(counts, n_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in set(words):
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + END_OF_WORD
        # merges only ever concatenate — token count is bounded by chars+1
        assert 1 <= len(toks) <= len(w) + 1


# ---------------------------------------------------------------------------
# Drift-family decision SQL properties (DuckDB-driven per example — running
# Spark per hypothesis example would be pathological; the Spark twin of each
# SQL is pinned cross-engine on fixed fixtures in test_llm_quality/test_llm_ops
# and by the registered oracles)
# ---------------------------------------------------------------------------

_qgate_scores = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=99),  # doc_id (% 10 = 9 -> batch)
        st.integers(min_value=0, max_value=1_000_000),  # prob on the 1e-6 grid
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[0],
)


@settings(max_examples=150, deadline=None)
@given(_qgate_scores, st.booleans())
def test_qgate_recal_sql_matches_reference(rows, shifted):
    """`_qgate_recal_sql`'s rank-cut threshold equals an independent
    Python implementation of the contract on random score sets —
    corpus-empty, all-drop, tie-heavy, and batch-only inputs all arise
    naturally. Probs live on the 1e-6 grid so SQL literals and Python
    floats are the identical doubles."""
    import duckdb

    from lakehouse_workshop_spark.operators import llm_quality as Q

    scores = [(d, p / 1_000_000.0) for d, p in rows]
    svals = ", ".join(f"({d}, CAST({p!r} AS DOUBLE))" for d, p in scores)
    srel = f"SELECT * FROM (VALUES {svals}) AS t(doc_id, prob)"
    prel = (
        "SELECT CAST(0.3 AS DOUBLE) AS psi, "
        f"{str(shifted).upper()} AS shifted"
    )
    con = duckdb.connect()
    row = con.sql(Q._qgate_recal_sql(srel, prel)).fetchall()
    assert len(row) == 1
    (psi, got_shifted, n_corpus, n_keep, n_batch, keep_rate,
     thr_old, thr_recal, thr_used) = row[0]

    corpus = [(d, p) for d, p in scores if d % 10 != 9]
    nc, nb = len(corpus), len(scores) - len(corpus)
    kc = sum(1 for _, p in corpus if p >= Q.QGATE_THRESHOLD)
    merged = sorted(scores, key=lambda t: (-t[1], t[0]))
    nm = len(merged)
    cut = max(
        (r for r in range(1, nm + 1) if nc > 0 and r * nc <= nm * kc),
        default=0,
    )
    want_thr = merged[cut - 1][1] if cut else 1.0

    assert (n_corpus, n_keep, n_batch) == (nc, kc, nb)
    assert got_shifted == shifted
    assert thr_old == Q.QGATE_THRESHOLD
    assert thr_recal == want_thr
    assert thr_used == (want_thr if shifted else Q.QGATE_THRESHOLD)
    if nc:
        assert abs(keep_rate - round(kc / nc, 6)) < 1e-9
    else:
        assert keep_rate == 0.0


_budget_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=19),  # source index
        st.integers(min_value=1, max_value=1_000_000),  # n_docs
        st.integers(min_value=1, max_value=10**12),  # n_tokens
    ),
    min_size=1,
    max_size=8,
    unique_by=lambda t: t[0],
)


@settings(max_examples=150, deadline=None)
@given(_budget_rows)
def test_budget_plan_sql_invariants(rows):
    """`_budget_plan_sql` structural invariants on random fertility
    rollups (uniform default target): inputs echo exactly, token shares
    sum to 1, the normalized target is exactly uniform, epochs_used
    caps at MAX_DATA_EPOCHS, the action branch is consistent with the
    EMITTED (rounded) epochs, and deficit — computed exactly from the
    unrounded budget share (r15 ADVICE #1), NOT by multiplying rounded
    epochs back by n_tokens — matches the double-for-double Python
    mirror of the SQL expression even at n_tokens = 1e12, where the old
    form drifted by up to ~5e5 tokens. Rounded doubles compare with
    tolerance (SQL ROUND is half-away-from-zero, Python's is
    half-even)."""
    import duckdb

    from lakehouse_workshop_spark.operators import llm_text as T

    vals = ", ".join(
        f"('s{i}', 'en', {d}, {t})" for i, d, t in rows
    )
    rel = f"SELECT * FROM (VALUES {vals}) AS t(source, lang, n_docs, n_tokens)"
    con = duckdb.connect()
    out = con.sql(T._budget_plan_sql(rel)).fetchall()
    assert len(out) == len(rows)
    by_src = {r[0]: r for r in out}
    ns = len(rows)
    nt_total = sum(t for _, _, t in rows)
    share_sum = 0.0
    for i, d, t in rows:
        (src, n_docs, n_tokens, token_share, target_share, budget_tokens,
         epochs_needed, epochs_used, action, deficit) = by_src[f"s{i}"]
        assert (n_docs, n_tokens) == (d, t)
        share_sum += token_share
        assert abs(token_share - t / nt_total) < 1e-6
        assert abs(target_share - 1.0 / ns) < 1e-6
        # the SQL's exact path: DECIMAL(18,6) 1.000000 / ns.000000 both
        # cast to double, so the Python mirror is bit-identical
        budget_exact = T.TOKEN_BUDGET * (1.0 / ns)
        assert abs(budget_tokens - budget_exact) < 1e-6
        assert (
            abs(epochs_needed - budget_exact / t) < 1e-6
            or abs(epochs_needed / (budget_exact / t) - 1) < 1e-6
        )
        assert epochs_used == min(epochs_needed, float(T.MAX_DATA_EPOCHS))
        if epochs_needed > T.MAX_DATA_EPOCHS:
            assert action == "cap_repeat"
            assert deficit > 0
            want = max(budget_exact - T.MAX_DATA_EPOCHS * t, 0.0)
            assert abs(deficit - want) <= 1e-6
        elif epochs_needed > 1:
            assert action == "repeat"
            assert deficit == 0.0
        else:
            assert action == "sample"
            assert deficit == 0.0
    assert abs(share_sum - 1.0) < 1e-4


_mix_budget_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=19),  # source index
        st.integers(min_value=1, max_value=1_000_000),  # n_docs
        st.integers(min_value=1, max_value=10**12),  # n_tokens
        st.integers(min_value=0, max_value=1_000_000),  # target on 1e-6 grid
    ),
    min_size=1,
    max_size=8,
    unique_by=lambda t: t[0],
).filter(lambda rows: sum(r[3] for r in rows) > 0)


@settings(max_examples=150, deadline=None)
@given(_mix_budget_rows)
def test_budget_plan_sql_follows_target_vector(rows):
    """`_budget_plan_sql(target_rel=...)` with an arbitrary non-negative
    target vector (r16: the `token_budget_plan_mixture` wiring):
    budget_tokens follows the NORMALIZED vector exactly (targets live on
    the 1e-6 grid so the DECIMAL(18,6) casts are exact and the Python
    double mirror is bit-identical), budgets reconcile to TOKEN_BUDGET,
    and deficit reconciles exactly against the unrounded budget share on
    the cap branch."""
    import duckdb

    from lakehouse_workshop_spark.operators import llm_text as T

    vals = ", ".join(f"('s{i}', 'en', {d}, {t})" for i, d, t, _ in rows)
    rel = f"SELECT * FROM (VALUES {vals}) AS t(source, lang, n_docs, n_tokens)"
    tvals = ", ".join(
        f"('s{i}', CAST({w / 1_000_000.0!r} AS DOUBLE))" for i, _, _, w in rows
    )
    trel = f"SELECT * FROM (VALUES {tvals}) AS t(source, target_share)"
    con = duckdb.connect()
    out = con.sql(T._budget_plan_sql(rel, target_rel=trel)).fetchall()
    assert len(out) == len(rows)
    by_src = {r[0]: r for r in out}
    total_micro = sum(w for _, _, _, w in rows)
    budget_sum = 0.0
    for i, d, t, w in rows:
        (_, n_docs, n_tokens, _token_share, target_share, budget_tokens,
         epochs_needed, epochs_used, action, deficit) = by_src[f"s{i}"]
        assert (n_docs, n_tokens) == (d, t)
        # mirror the SQL double-for-double: DECIMAL(18,6) -> DOUBLE on
        # both operands, one division, one multiply
        tshare_d = w / 1_000_000
        total_d = total_micro / 1_000_000
        budget_exact = T.TOKEN_BUDGET * (tshare_d / total_d)
        assert abs(target_share - tshare_d / total_d) < 1e-6
        assert abs(budget_tokens - budget_exact) < 1e-6
        budget_sum += budget_tokens
        if epochs_needed > T.MAX_DATA_EPOCHS:
            assert action == "cap_repeat"
            want = max(budget_exact - T.MAX_DATA_EPOCHS * t, 0.0)
            assert abs(deficit - want) <= 1e-6
        else:
            assert deficit == 0.0
    # budgets reconcile: rounding each share at 6 dp costs < 5e-7 * n
    assert abs(budget_sum - T.TOKEN_BUDGET) < 1e-5 * len(rows) + 1e-6


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=10**9),
        min_size=1,
        max_size=60,
    )
)
def test_ltv_decile_rank_formula_matches_ntile(vals):
    """The exact NTILE closed form `customer_ltv_deciles` now bands with
    on the Spark side — with q = N div K, m = N mod K: rank r maps to
    ceil(r/(q+1)) while r <= (q+1)*m, else m + ceil((r-(q+1)*m)/q) —
    agrees with SQL NTILE row-for-row for EVERY N, including N < K
    (ties, constant columns, and skewed values all arise naturally).
    This pin originally caught the tempting (r-1)*K div N + 1 form
    spreading the oversized buckets instead of front-loading them the
    way NTILE does (falsified at N=12, K=10, all-equal values). The
    DuckDB oracle keeps NTILE, so this pins the two forms to each
    other."""
    import duckdb

    from lakehouse_workshop_spark.operators.olap_tpch import LTV_DECILES

    K = LTV_DECILES
    rows = ", ".join(f"({i}, {v})" for i, v in enumerate(vals))
    q = f"""
    WITH s AS (SELECT * FROM (VALUES {rows}) AS t(id, spend)),
    r AS (SELECT ROW_NUMBER() OVER (ORDER BY spend DESC, id) AS rnk,
                 NTILE({K}) OVER (ORDER BY spend DESC, id) AS nt,
                 COUNT(*) OVER () AS n
          FROM s)
    SELECT COUNT(*) FROM r
    WHERE nt <> CASE WHEN rnk <= (n // {K} + 1) * (n % {K})
                     THEN (rnk + n // {K}) // (n // {K} + 1)
                     ELSE n % {K}
                          + (rnk - (n // {K} + 1) * (n % {K})
                             + n // {K} - 1) // (n // {K})
                END
    """
    assert duckdb.sql(q).fetchone()[0] == 0


# One deterministic giant row whose OLD BIGINT pair-count product
# (cnt*(cnt-1) = 1.369e19) wraps past BIGINT max (9.22e18) while the
# pair count itself (6.8e18) still fits the emitted BIGINT — exactly
# the r15-queued overflow class the DECIMAL(38,0) promotion pays.
_GIANT_CNT = 3_700_000_000

_dup_small_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # hash index
        st.integers(min_value=0, max_value=3),  # source index
        st.integers(min_value=1, max_value=1000),  # cnt
    ),
    min_size=0,
    max_size=10,
    unique_by=lambda t: (t[0], t[1]),
)


def _dup_matrix_reference(rows):
    """Independent Python-int mirror of the dup-matrix contract."""
    pairs: dict[tuple[str, str], int] = {}
    shared: dict[tuple[str, str], int] = {}
    for ha, sa, ca in rows:
        for hb, sb, cb in rows:
            if ha != hb or sa > sb:
                continue
            if sa == sb:  # (h, source) unique => the self-joined row
                if ca < 2:
                    continue
                n = ca * (ca - 1) // 2
            else:
                n = ca * cb
            key = (sa, sb)
            pairs[key] = pairs.get(key, 0) + n
            shared[key] = shared.get(key, 0) + 1
    return sorted(
        (sa, sb, pairs[(sa, sb)], shared[(sa, sb)]) for sa, sb in pairs
    )


@settings(max_examples=100, deadline=None)
@given(_dup_small_rows)
def test_dup_matrix_pair_counts_exact_past_bigint_wrap(rows):
    """`_dup_matrix_sql`'s pair counts stay exact when one text has
    3.7e9 copies in one source — the count whose cnt*(cnt-1) product
    wrapped the pre-r16 BIGINT form — mixed with random small counts
    (the r15 NOTE's degenerate-boilerplate scenario). Verified against
    arbitrary-precision Python ints."""
    import duckdb

    from lakehouse_workshop_spark.operators import llm_dedup as D

    named = [(f"h{h}", f"s{s}", c) for h, s, c in rows]
    named.append(("hG", "s0", _GIANT_CNT))
    vals = ", ".join(
        f"('{h}', '{s}', CAST({c} AS BIGINT))" for h, s, c in named
    )
    rel = f"SELECT * FROM (VALUES {vals}) AS t(h, source, cnt)"
    con = duckdb.connect()
    out = con.sql(D._dup_matrix_sql("({x}) // 2", hs_rel=rel)).fetchall()
    assert sorted(tuple(r) for r in out) == _dup_matrix_reference(named)


def test_dup_matrix_spark_div_halving_matches_reference(spark):
    """The Spark dialect of the same arithmetic (`div` halving of the
    even factor, DECIMAL(38,0) products) reproduces the Python-int
    reference on the giant-count fixture — pinning that Spark's `div`
    and `%` on BIGINT behave as the oracle's `//` does."""
    from lakehouse_workshop_spark.operators import llm_dedup as D

    named = [
        ("hG", "s0", _GIANT_CNT),
        ("hG", "s1", 7),
        ("h0", "s0", 2),
        ("h0", "s1", 1),
        ("h1", "s2", 3_700_000_001),  # odd giant: the other halving branch
    ]
    vals = ", ".join(
        f"('{h}', '{s}', CAST({c} AS BIGINT))" for h, s, c in named
    )
    rel = f"SELECT * FROM (VALUES {vals}) AS t(h, source, cnt)"
    out = spark.sql(D._dup_matrix_sql("({x}) div 2", hs_rel=rel)).collect()
    got = sorted((r[0], r[1], r[2], r[3]) for r in out)
    assert got == _dup_matrix_reference(named)


_rebalance_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=19),  # source index
        st.integers(min_value=1, max_value=10**9),  # n_tokens
        st.integers(min_value=0, max_value=10**10),  # budget in micro-tokens
    ),
    min_size=1,
    max_size=8,
    unique_by=lambda t: t[0],
)


@settings(max_examples=150, deadline=None)
@given(_rebalance_rows)
def test_rebalance_sql_waterfills_exactly(rows):
    """`_rebalance_sql` invariants on arbitrary plan vectors (budgets on
    the 1e-6 grid; deficits derived the way the planner defines them —
    max(budget − cap, 0) — so capped and uncapped sources, all-capped
    corpora, and zero-deficit corpora all arise): no receiver crosses
    its 4-epoch cap, extra is proportional to spare, the residual is
    exactly max(D − S, 0), and sum(tokens_granted) + residual recovers
    sum(min(budget, cap)) + D — the conservation law — against an
    arbitrary-precision Fraction mirror."""
    from fractions import Fraction

    import duckdb

    from lakehouse_workshop_spark.operators import llm_mixture as M
    from lakehouse_workshop_spark.operators.llm_text import MAX_DATA_EPOCHS

    plan = []
    for i, nt, bud_micro in rows:
        bud = Fraction(bud_micro, 1_000_000)
        cap = MAX_DATA_EPOCHS * nt
        deficit = max(bud - cap, Fraction(0))
        plan.append((f"s{i}", nt, bud, deficit))
    vals = ", ".join(
        f"('{s}', {nt}, CAST({float(b)!r} AS DOUBLE), CAST({float(d)!r} AS DOUBLE))"
        for s, nt, b, d in plan
    )
    rel = (
        "SELECT * FROM (VALUES "
        + vals
        + ") AS t(source, n_tokens, budget_tokens, deficit_tokens)"
    )
    con = duckdb.connect()
    out = con.sql(M._rebalance_sql(rel)).fetchall()
    assert len(out) == len(plan)
    by_src = {r[0]: r for r in out}

    # Fraction mirror of the pooled quantities (inputs are exact doubles
    # on the 1e-6 grid, so Fraction(float) is exact)
    D = sum(Fraction(float(d)) for _, _, _, d in plan)
    S = sum(
        max(Fraction(MAX_DATA_EPOCHS * nt) - Fraction(float(b)), Fraction(0))
        for _, nt, b, _ in plan
    )
    granted_sum = 0.0
    for s, nt, bud, deficit in plan:
        (_, n_tokens, budget_tokens, deficit_tokens, spare_tokens,
         extra_tokens, tokens_granted, epochs_final, rebalanced,
         residual) = by_src[s]
        cap = MAX_DATA_EPOCHS * nt
        spare = max(Fraction(cap) - bud, Fraction(0))
        assert abs(spare_tokens - float(spare)) < 1e-6
        if D > 0 and S > 0:
            want_extra = float(min(D, S)) * (float(spare) / float(S))
        else:
            want_extra = 0.0
        assert abs(extra_tokens - want_extra) < 1e-5
        assert epochs_final <= MAX_DATA_EPOCHS + 1e-6, s
        assert abs(tokens_granted - (float(min(bud, Fraction(cap))) + want_extra)) < 1e-5
        granted_sum += tokens_granted
        assert abs(residual - float(max(D - S, Fraction(0)))) < 1e-6
    # conservation: granted + residual = sum(min(budget, cap)) + D
    base = sum(float(min(b, Fraction(MAX_DATA_EPOCHS * nt))) for _, nt, b, _ in plan)
    want_total = base + float(min(D, S))
    assert abs(granted_sum - want_total) < 1e-4 * len(plan) + 1e-6


# ---------------------------------------------------------------------------
# Budgeted materialization: copies construction (round 17)
# ---------------------------------------------------------------------------

def _budget_copies_reference(alloc, docs):
    """Arbitrary-precision mirror of `_budget_copies_ctes` + epoch
    explode: copies = floor(e) + (md5-16-bit fraction < frac(e))."""
    import hashlib
    import math

    out = []
    for doc_id, source, n_tokens in docs:
        if source not in alloc:
            continue
        e = alloc[source]
        pct = (
            int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16)
            / 65536.0
        )
        n = int(math.floor(e)) + (1 if pct < e - math.floor(e) else 0)
        out.extend((doc_id, source, k, n_tokens) for k in range(1, n + 1))
    return sorted(out)


def _budget_inject(alloc_rows, doc_rows, dialect):
    """The production CTE prefix + tail over injected VALUES relations
    (the dup-matrix injection pattern). Texts are k space-separated
    'a's, so the _TOK_REGEX count is exactly k in both dialects."""
    from lakehouse_workshop_spark.operators import llm_mixture as M
    from lakehouse_workshop_spark.operators.llm_text import _TOK_REGEX

    alloc_rel = "SELECT * FROM (VALUES " + ", ".join(
        f"('{s}', CAST({e!r} AS DOUBLE))" for s, e in alloc_rows
    ) + ") AS a(source, epochs_final)"
    docs_rel = "SELECT * FROM (VALUES " + ", ".join(
        f"(CAST({d} AS BIGINT), '{s}', '{'a ' * (k - 1) + 'a'}')"
        for d, s, k in doc_rows
    ) + ") AS dv(doc_id, source, text)"
    if dialect == "duck":
        tok, pct, tail = (
            M._DUCK_TOK.format(rx=_TOK_REGEX),
            M._DUCK_PCT16,
            M._MATERIALIZE_TAIL_DUCK,
        )
    else:
        tok, pct, tail = (
            M._SPARK_TOK.format(rx=_TOK_REGEX),
            M._SPARK_PCT16,
            M._MATERIALIZE_TAIL_SPARK,
        )
    prefix = M._budget_copies_ctes(alloc_rel, tok, pct).replace(
        "FROM documents", f"FROM ({docs_rel}) docs_t"
    )
    return prefix + tail


_budget_alloc = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # source index
        st.integers(min_value=0, max_value=4_000_000),  # epochs, 1e-6 grid
    ),
    min_size=1,
    max_size=4,
    unique_by=lambda t: t[0],
)
_budget_docs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10**9),  # doc_id
        st.integers(min_value=0, max_value=5),  # source index
        st.integers(min_value=1, max_value=9),  # token count
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[0],
)


@settings(max_examples=120, deadline=None)
@given(_budget_alloc, _budget_docs)
def test_budget_copies_sql_matches_reference(alloc_rows, doc_rows):
    """`token_budget_materialize`'s copies construction (DuckDB dialect,
    exact production fragments) reproduces the arbitrary-precision
    Python mirror for ANY 6-dp epochs in [0, 4] — covering floor
    0/1/2/3/4, frac 0, and the cap boundary the sf fixtures' ~1.0-1.3
    epochs never reach. Docs whose source has no allocation drop; e = 0
    ships nothing."""
    import duckdb

    alloc = [(f"s{i}", e / 1e6) for i, e in alloc_rows]
    docs = [(d, f"s{i}", k) for d, i, k in doc_rows]
    con = duckdb.connect()
    got = con.sql(_budget_inject(alloc, docs, "duck")).fetchall()
    want = _budget_copies_reference(dict(alloc), docs)
    assert sorted(tuple(r) for r in got) == want


def test_budget_copies_spark_matches_reference(spark):
    """The Spark dialect of the same construction (conv/md5 pct16,
    sequence-explode) reproduces the Python mirror on a fixture that
    hits every branch: floor 0 (sample), exact integers 1 and 4 (frac
    0 — no Bernoulli row), fractional 2.5, the 4.0 cap, e = 0 (ships
    nothing), and an unallocated source (drops)."""
    alloc = [
        ("s0", 0.0),
        ("s1", 0.731234),
        ("s2", 1.0),
        ("s3", 2.5),
        ("s4", 4.0),
    ]
    docs = [(d, f"s{d % 6}", (d % 9) + 1) for d in range(60)]
    got = spark.sql(_budget_inject(alloc, docs, "spark")).collect()
    want = _budget_copies_reference(dict(alloc), docs)
    assert sorted(tuple(r) for r in got) == want


# ---------------------------------------------------------------------------
# Training-shard construction (r17): the EXACT production SQL against an
# arbitrary-precision mirror over injected manifests (the dup-matrix
# injection pattern) — arbitrary token counts including 0 and
# larger-than-a-shard docs, and DUPLICATE shuffle keys so the
# (shuffle_key, doc_id, epoch) tie-break is pinned, not assumed.
# ---------------------------------------------------------------------------

_shard_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),  # doc_id
        st.integers(min_value=1, max_value=4),  # epoch
        st.sampled_from(["ka", "kb", "kc", "kd"]),  # shuffle_key (dups!)
        st.integers(min_value=0, max_value=20_000),  # n_tokens (0, >S)
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda r: (r[0], r[1]),
)


def _shard_reference(rows, t0=0):
    """Python-int mirror of cumsum + start-offset shard bucketing."""
    from lakehouse_workshop_spark.operators.llm_mixture import (
        TRAIN_SHARD_TOKENS,
    )

    cum = t0
    out = []
    for doc_id, epoch, skey, n in sorted(
        rows, key=lambda r: (r[2], r[0], r[1])
    ):
        out.append((doc_id, epoch, skey, n, cum // TRAIN_SHARD_TOKENS))
        cum += n
    return sorted(out)


def _shard_values_rel(rows):
    vals = ", ".join(
        f"({d}, 's', CAST({e} AS INT), CAST({n} AS BIGINT), '{k}')"
        for d, e, k, n in rows
    )
    return (
        f"SELECT * FROM (VALUES {vals})"
        " AS t(doc_id, source, epoch, n_tokens, shuffle_key)"
    )


@settings(max_examples=100, deadline=None)
@given(_shard_rows)
def test_shard_manifest_sql_matches_int_mirror(rows):
    """`_shard_cumsum_sql` + `_shard_manifest_tail_sql` (the registered
    oracle's exact fragments) bucket arbitrary manifests identically to
    the arbitrary-precision mirror."""
    import duckdb

    from lakehouse_workshop_spark.operators import llm_mixture as M

    sql = M._shard_manifest_tail_sql(
        M._shard_cumsum_sql(_shard_values_rel(rows)), "//"
    )
    con = duckdb.connect()
    out = con.sql(sql).fetchall()
    got = sorted((d, e, k, n, s) for d, _, e, n, k, s in out)
    assert got == _shard_reference(rows)


@settings(max_examples=100, deadline=None)
@given(_shard_rows, st.integers(min_value=0, max_value=10**15))
def test_shard_append_sql_matches_int_mirror(rows, t0):
    """The append tail displaces every start offset by t0 — exact for
    arbitrary standing totals up to the 1e15-token (100 TB-class)
    range."""
    import duckdb

    from lakehouse_workshop_spark.operators import llm_mixture as M

    sql = M._shard_append_tail_sql(
        M._shard_cumsum_sql(_shard_values_rel(rows)),
        f"SELECT CAST({t0} AS BIGINT) AS t0",
        "//",
    )
    con = duckdb.connect()
    out = con.sql(sql).fetchall()
    got = sorted((d, e, k, n, s) for d, _, e, n, k, s in out)
    assert got == _shard_reference(rows, t0=t0)


def test_shard_tail_spark_div_matches_reference(spark):
    """The Spark dialect of the same arithmetic — two-pass
    `global_cumsum` + the `div` tail — reproduces the mirror on a
    fixture covering duplicate shuffle keys, a zero-token row, a
    larger-than-a-shard row, and a huge standing offset (pinning that
    Spark's `div` on BIGINT behaves as the oracle's `//`)."""
    from pyspark.sql import functions as F

    from lakehouse_workshop_spark.functions.exprs import global_cumsum
    from lakehouse_workshop_spark.operators import llm_mixture as M

    rows = [
        (1, 1, "ka", 5000),
        (1, 2, "ka", 0),
        (2, 1, "ka", 20000),
        (3, 1, "kb", 1),
        (4, 1, "kc", 4095),
        (5, 1, "kc", 4097),
    ]
    t0 = 10**15 + 123
    df = spark.createDataFrame(
        [(d, "s", e, n, k) for d, e, k, n in rows],
        "doc_id INT, source STRING, epoch INT, n_tokens BIGINT,"
        " shuffle_key STRING",
    )
    c = global_cumsum(df, "n_tokens", "shuffle_key", "doc_id", "epoch", name="cum")
    c.createOrReplaceTempView("shard_pin_cum")
    spark.sql(f"SELECT CAST({t0} AS BIGINT) AS t0").createOrReplaceTempView(
        "shard_pin_t0"
    )
    out = spark.sql(
        M._shard_append_tail_sql(
            "SELECT * FROM shard_pin_cum", "SELECT t0 FROM shard_pin_t0", "div"
        )
    ).collect()
    got = sorted((r.doc_id, r.epoch, r.shuffle_key, r.n_tokens, r.shard_id) for r in out)
    assert got == _shard_reference(rows, t0=t0)
