"""Tests for the round-7 mixture/curation operators (llm_mixture.py)."""

from __future__ import annotations

import math

from lakehouse_workshop_spark.operators import all_queries


def test_bloom_never_false_negative(spark, sf_dir):
    """Bloom semantics: exact_dup=True implies bloom_maybe_dup=True for
    every batch doc — false positives are allowed, false negatives never."""
    rows = all_queries()["bloom_dedup"](spark, sf_dir).collect()
    assert rows, "batch slice should be non-empty"
    for r in rows:
        if r.exact_dup:
            assert r.bloom_maybe_dup, f"false negative for doc {r.doc_id}"


def test_token_entropy_matches_pure_python(spark, sf_dir):
    """Spot-check the entropy identity against collections.Counter."""
    from collections import Counter

    out = {
        r.doc_id: (r.n_tokens, r.token_entropy)
        for r in all_queries()["token_entropy"](spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20).collect()
    for d in docs:
        toks = d.text.split(" ")
        n = len(toks)
        counts = Counter(toks)
        h = -sum((c / n) * math.log(c / n) for c in counts.values())
        got_n, got_h = out[d.doc_id]
        assert got_n == n
        assert abs(got_h - h) < 1e-4, (d.doc_id, got_h, h)


def test_zipf_slope_matches_numpy_fit(spark, sf_dir):
    """The closed-form DECIMAL-moment fit equals numpy's least squares."""
    import numpy as np
    from collections import Counter

    row = all_queries()["zipf_slope"](spark, sf_dir).collect()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    counts = Counter(t for d in docs for t in d.text.split(" "))
    top = sorted(counts.values(), reverse=True)[:1000]
    x = np.log(np.arange(1, len(top) + 1))
    y = np.log(np.array(top, dtype=float))
    slope = np.polyfit(x, y, 1)[0]
    assert row.n_ranks == len(top)
    assert abs(row.zipf_slope - slope) < 1e-4, (row.zipf_slope, slope)


def test_curriculum_spans_are_contiguous_and_cover(spark, sf_dir):
    rows = sorted(
        all_queries()["curriculum_stages"](spark, sf_dir).collect(),
        key=lambda r: r.stage,
    )
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs
    nxt = 0
    for r in rows:
        assert r.order_lo == nxt
        assert r.order_hi == r.order_lo + r.n_docs - 1
        nxt = r.order_hi + 1
    assert nxt == n_docs


def test_mixture_weights_average_to_one_token_weighted(spark, sf_dir):
    """Sum over sources of token_share * mix_weight = 1 (each source's
    weighted share is exactly the uniform target share)."""
    rows = all_queries()["domain_mixture_weights"](spark, sf_dir).collect()
    total = sum(r.token_share * r.mix_weight for r in rows)
    assert abs(total - 1.0) < 1e-3, total


def test_user_path_trigrams_matches_pure_python(spark):
    """Trigram path counts vs a pure-Python fold over randomized streams
    (breaks any window/tie-break bug symmetry with the SQL oracle)."""
    import random
    from collections import Counter

    from lakehouse_workshop_spark.operators.event_analytics import _path_sql

    rng = random.Random(11)
    types = ["view", "click", "purchase", "error"]
    rows = []
    for eid in range(400):
        rows.append(
            (eid, rng.randint(0, 20), f"2024-01-01 00:{eid // 60:02d}:{eid % 60:02d}",
             rng.choice(types))
        )
    # duplicate timestamps within a user are common in real streams —
    # event_id breaks the tie, so inject some
    rows += [(1000 + i, 3, "2024-01-01 00:00:07", rng.choice(types)) for i in range(5)]

    expect = Counter()
    by_user = {}
    for eid, uid, ts, et in rows:
        by_user.setdefault(uid, []).append((ts, eid, et))
    for stream in by_user.values():
        stream.sort()
        for i in range(len(stream) - 2):
            expect[">".join(s[2] for s in stream[i : i + 3])] += 1
    top = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    spark.createDataFrame(
        [(e, u, t, y) for e, u, t, y in rows],
        "event_id BIGINT, user_id BIGINT, ts_s STRING, event_type STRING",
    ).selectExpr(
        "event_id", "user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "event_type"
    ).createOrReplaceTempView("events")
    got = [(r.path, r.n) for r in spark.sql(_path_sql()).collect()]
    assert got == top


def test_range_join_pre_epoch_timestamp_fails_loudly(spark, tmp_path):
    """DIV truncates toward zero, so a pre-1970 timestamp would silently
    land in the wrong cell; the in-plan assert_true must turn that into a
    loud failure instead of wrong counts (r9 ADVICE)."""
    import pytest

    from lakehouse_workshop_spark.operators.event_analytics import (
        range_join_error_purchases,
    )

    spark.createDataFrame(
        [
            (1, "error", "1969-12-31 23:59:59"),
            (2, "purchase", "1970-01-01 00:00:30"),
        ],
        ["event_id", "event_type", "ts_s"],
    ).selectExpr(
        "event_id", "event_type", "CAST(ts_s AS TIMESTAMP) AS ts"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    with pytest.raises(Exception, match="pre-epoch"):
        range_join_error_purchases(spark, str(tmp_path)).collect()


def test_km_probe_positions_pairwise_distinct():
    """The KM gate's n_set = K criterion relies on each doc's K probe
    positions being pairwise distinct: g_i = (h1 + i*h2') mod m with h2'
    forced odd and m a power of two gives h2'*(i-j) != 0 (mod m) for
    0 < i-j < m, so collisions are impossible for K < m. Pinned over
    random 60-bit hash pairs with the exact SQL arithmetic."""
    import random

    from lakehouse_workshop_spark.operators.llm_mixture import BLOOM_K, BLOOM_M

    rng = random.Random(7)
    for _ in range(1000):
        h1 = rng.randrange(1 << 60)
        h2 = rng.randrange(1 << 60)
        h2p = h2 - h2 % 2 + 1  # the SQL's force-odd spelling
        pos = [(h1 + i * h2p) % BLOOM_M for i in range(BLOOM_K)]
        assert len(set(pos)) == BLOOM_K


def test_budget_plan_mixture_follows_mixture_target(spark, sf_dir):
    """r16 (r15 verdict ask #4): `token_budget_plan_mixture`'s budget
    split follows `domain_mixture_weights`' emitted target vector —
    budget_tokens ∝ (mix_weight · token_share) normalized — budgets
    reconcile to TOKEN_BUDGET, and deficit_tokens reconciles exactly
    against the unrounded budget share on every cap_repeat row."""
    from lakehouse_workshop_spark.operators.llm_text import (
        MAX_DATA_EPOCHS,
        TOKEN_BUDGET,
    )

    q = all_queries()
    mix = {
        r.source: round(r.mix_weight * r.token_share, 6)
        for r in q["domain_mixture_weights"](spark, sf_dir).collect()
    }
    rows = q["token_budget_plan_mixture"](spark, sf_dir).collect()
    assert sorted(r.source for r in rows) == sorted(mix)
    total = sum(mix.values())
    budget_sum = 0.0
    for r in rows:
        want_share = mix[r.source] / total
        # python round() is half-even vs SQL's half-away: allow one
        # 1e-6 grid step of slack on anything derived from mix values
        assert abs(r.target_share - want_share) < 2e-6, r.source
        budget_exact = TOKEN_BUDGET * (mix[r.source] / total)
        assert abs(r.budget_tokens - budget_exact) < 0.1, r.source
        budget_sum += r.budget_tokens
        if r.action == "cap_repeat":
            want = max(budget_exact - MAX_DATA_EPOCHS * r.n_tokens, 0.0)
            assert abs(r.deficit_tokens - want) < 0.1, r.source
        else:
            assert r.deficit_tokens == 0.0, r.source
    assert abs(budget_sum - TOKEN_BUDGET) < 0.1


def test_budget_rebalance_reconciles_and_respects_caps(spark, sf_dir):
    """r16: `token_budget_rebalance` reconciliation — every source's
    tokens_granted stays within its 4-epoch cap (epochs_final <=
    MAX_DATA_EPOCHS), extra flows only to uncapped sources, and
    sum(tokens_granted) + residual_deficit recovers TOKEN_BUDGET up to
    6-dp rounding."""
    from lakehouse_workshop_spark.operators.llm_text import (
        MAX_DATA_EPOCHS,
        TOKEN_BUDGET,
    )

    rows = all_queries()["token_budget_rebalance"](spark, sf_dir).collect()
    assert rows
    granted = 0.0
    residual = rows[0].residual_deficit
    for r in rows:
        assert r.epochs_final <= MAX_DATA_EPOCHS + 1e-9, r.source
        assert r.tokens_granted >= -1e-9, r.source
        if r.rebalanced:
            assert r.spare_tokens > 0, r.source
        assert r.residual_deficit == residual  # global, repeated per row
        granted += r.tokens_granted
    assert abs(granted + residual - TOKEN_BUDGET) < 0.1


def test_budget_materialize_copies_match_allocation(spark, sf_dir):
    """r17 (r16 verdict ask #5): `token_budget_materialize` is the
    budget chain's data terminal. Per doc, copies = floor(epochs_final)
    + the deterministic hash-Bernoulli extra — recomputed here with
    hashlib against the SAME md5-16-bit construction — epochs are
    contiguous 1..n_copies, nothing exceeds the epoch cap, and for any
    source granted >= 1 epoch the distinct-doc token mass equals the
    allocation's exact n_tokens supply."""
    import hashlib
    import math
    from collections import defaultdict

    from lakehouse_workshop_spark.operators.llm_text import MAX_DATA_EPOCHS

    q = all_queries()
    alloc = {
        r.source: r for r in q["token_budget_rebalance"](spark, sf_dir).collect()
    }
    rows = q["token_budget_materialize"](spark, sf_dir).collect()
    assert rows

    per_doc = defaultdict(list)
    for r in rows:
        per_doc[(r.source, r.doc_id, r.n_tokens)].append(r.epoch)
    for (source, doc_id, _), epochs in per_doc.items():
        e = alloc[source].epochs_final
        frac = e - math.floor(e)
        pct = (
            int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16)
            / 65536.0
        )
        want = int(math.floor(e)) + (1 if pct < frac else 0)
        assert sorted(epochs) == list(range(1, want + 1)), (source, doc_id)
        assert want <= MAX_DATA_EPOCHS

    shipped_docs = defaultdict(int)
    for (source, doc_id, n_tokens), _ in per_doc.items():
        shipped_docs[source] += n_tokens
    for source, a in alloc.items():
        if a.epochs_final >= 1:  # every doc ships >= 1 copy
            assert shipped_docs[source] == a.n_tokens, source


def test_budget_fill_report_reconciles_with_manifest(spark, sf_dir):
    """r17: `token_budget_fill_report` is an exact rollup of the
    manifest against the allocation — shipped counts/token mass match a
    Python re-aggregation row-for-row, every allocation source appears
    (even zero-shipped), and fill_ratio is the 6-dp shipped/granted."""
    from collections import defaultdict

    q = all_queries()
    manifest = q["token_budget_materialize"](spark, sf_dir).collect()
    alloc = {
        r.source: r for r in q["token_budget_rebalance"](spark, sf_dir).collect()
    }
    rows = {r.source: r for r in q["token_budget_fill_report"](spark, sf_dir).collect()}
    assert sorted(rows) == sorted(alloc)

    agg = defaultdict(lambda: [0, set(), 0])
    for m in manifest:
        a = agg[m.source]
        a[0] += 1
        a[1].add(m.doc_id)
        a[2] += m.n_tokens
    for source, r in rows.items():
        n_rows, docs, toks = agg.get(source, [0, set(), 0])
        assert r.rows_shipped == n_rows, source
        assert r.docs_shipped == len(docs), source
        assert r.tokens_shipped == toks, source
        if r.tokens_granted > 0:
            assert abs(r.fill_ratio - toks / r.tokens_granted) < 1e-6, source


def test_training_shard_manifest_matches_python_mirror(spark, sf_dir):
    """r17: `training_shard_manifest` is the budget chain's last mile.
    Re-derive the whole construction in Python from the materialize
    manifest — md5 shuffle key, (shuffle_key, doc_id, epoch) total
    order, inclusive token cumsum, shard = start-offset div
    TRAIN_SHARD_TOKENS — and require row-for-row equality, plus the
    balance property the design exists for: every non-final shard's
    token total lands within one max-document of TRAIN_SHARD_TOKENS."""
    import hashlib
    from collections import defaultdict

    from lakehouse_workshop_spark.operators.llm_mixture import (
        TRAIN_SHARD_TOKENS,
    )

    q = all_queries()
    manifest = q["token_budget_materialize"](spark, sf_dir).collect()
    rows = q["training_shard_manifest"](spark, sf_dir).collect()
    assert len(rows) == len(manifest) > 0

    mirror = []
    for m in manifest:
        skey = hashlib.md5(f"{m.doc_id}:{m.epoch}".encode()).hexdigest()
        mirror.append((skey, m.doc_id, m.epoch, m.source, m.n_tokens))
    mirror.sort()
    cum = 0
    want = {}
    for skey, doc_id, epoch, source, n_tokens in mirror:
        want[(doc_id, epoch)] = (
            skey,
            source,
            n_tokens,
            cum // TRAIN_SHARD_TOKENS,
        )
        cum += n_tokens

    assert len(rows) == len(want)
    shard_tokens = defaultdict(int)
    for r in rows:
        skey, source, n_tokens, shard = want[(r.doc_id, r.epoch)]
        assert r.shuffle_key == skey, (r.doc_id, r.epoch)
        assert r.source == source and r.n_tokens == n_tokens
        assert r.shard_id == shard, (r.doc_id, r.epoch)
        shard_tokens[r.shard_id] += r.n_tokens

    assert sorted(shard_tokens) == list(range(len(shard_tokens)))
    max_doc = max(n for *_, n in mirror)
    for shard in range(len(shard_tokens) - 1):
        assert (
            TRAIN_SHARD_TOKENS - max_doc
            < shard_tokens[shard]
            < TRAIN_SHARD_TOKENS + max_doc
        ), shard


def test_training_shard_append_continues_standing_stream(spark, sf_dir):
    """r17: `training_shard_append` is the O(batch) ingest mirror —
    batch rows only, shard ids continuing from the standing stream's
    token total. Re-derive in Python: T0 = standing manifest tokens,
    batch rows in (shuffle_key, doc_id, epoch) order, shard =
    (T0 + start-offset) div TRAIN_SHARD_TOKENS — and require
    row-for-row equality plus the append contract: no batch shard
    precedes the standing tail shard."""
    import hashlib

    from lakehouse_workshop_spark.operators.llm_mixture import (
        TRAIN_SHARD_TOKENS,
    )
    from lakehouse_workshop_spark.operators.llm_pipeline import (
        NEW_BATCH_PRED,
    )

    assert NEW_BATCH_PRED == "doc_id % 10 = 9"  # mirror below assumes it
    q = all_queries()
    manifest = q["token_budget_materialize"](spark, sf_dir).collect()
    t0 = sum(m.n_tokens for m in manifest if m.doc_id % 10 != 9)
    batch = [m for m in manifest if m.doc_id % 10 == 9]
    mirror = sorted(
        (
            hashlib.md5(f"{m.doc_id}:{m.epoch}".encode()).hexdigest(),
            m.doc_id,
            m.epoch,
            m.source,
            m.n_tokens,
        )
        for m in batch
    )
    cum = t0
    want = {}
    for skey, doc_id, epoch, source, n_tokens in mirror:
        want[(doc_id, epoch)] = (
            skey,
            source,
            n_tokens,
            cum // TRAIN_SHARD_TOKENS,
        )
        cum += n_tokens

    rows = q["training_shard_append"](spark, sf_dir).collect()
    assert len(rows) == len(want) > 0
    for r in rows:
        skey, source, n_tokens, shard = want[(r.doc_id, r.epoch)]
        assert r.shuffle_key == skey and r.source == source
        assert r.n_tokens == n_tokens and r.shard_id == shard
    assert min(r.shard_id for r in rows) >= t0 // TRAIN_SHARD_TOKENS
