"""Tests for the BPE tokenizer (distributed count/apply, exact learn)."""

from __future__ import annotations

from lakehouse_workshop_spark.llm.bpe import (
    END_OF_WORD,
    apply_bpe,
    encode_word,
    learn_merges,
    train_bpe,
    word_counts,
)


def test_learn_merges_textbook_example():
    # Sennrich et al.'s canonical example family: 'low'-type corpus.
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = learn_merges(counts, 4)
    # 'es' (9), then 'est' (9), then 'est</w>' (9), then 'lo' (7)
    assert merges[:4] == [
        ("e", "s"),
        ("es", "t"),
        ("est", END_OF_WORD),
        ("l", "o"),
    ]


def test_learn_merges_is_deterministic_on_ties():
    counts = [("ab", 3), ("cd", 3)]
    # both pairs have weight 3 (plus boundary pairs); lexicographic
    # tie-break must always pick the same winner
    assert learn_merges(counts, 1) == learn_merges(list(reversed(counts)), 1)


def test_encode_word_applies_ranks_in_order():
    merges = [("e", "s"), ("es", "t"), ("est", END_OF_WORD), ("l", "o"), ("lo", "w")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("lowest", ranks) == ["low", "est" + END_OF_WORD]
    # unseen word falls back to characters + boundary
    assert encode_word("zq", ranks) == ["z", "q", END_OF_WORD]


def test_distributed_apply_matches_local_encode(spark):
    docs = [
        (1, "low lower newest"),
        (2, "widest low low"),
        (3, ""),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    merges = train_bpe(df, 8)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {r.doc_id: (list(r.tokens), r.n_tokens) for r in apply_bpe(df, merges).collect()}
    for doc_id, text in docs:
        expect = []
        for w in text.split(" "):
            if w:
                expect.extend(encode_word(w, ranks))
        assert got[doc_id] == (expect, len(expect)), doc_id


def test_word_counts_reduce(spark):
    df = spark.createDataFrame([(1, "a b a"), (2, "b")], ["doc_id", "text"])
    got = {r.word: r.cnt for r in word_counts(df).collect()}
    assert got == {"a": 2, "b": 2}


def test_roundtrip_token_concatenation_recovers_text(spark):
    # BPE is lossless: concatenating a word's tokens and stripping the
    # boundary marker recovers the word, for every doc in the fixture.
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    merges = train_bpe(df, 50)
    out = {r.doc_id: r.tokens for r in apply_bpe(df, merges).collect()}
    texts = {r.doc_id: r.text for r in df.collect()}
    for doc_id, toks in out.items():
        rebuilt = "".join(toks).replace(END_OF_WORD, " ").rstrip()
        assert rebuilt == " ".join(w for w in texts[doc_id].split(" ") if w)


def test_frozen_merge_table_is_consistent_and_chain_equivalent():
    """materialize_training_set's SQL oracle tokenizes with a literal
    replace-chain in merge-rank order; that equals the greedy
    lowest-rank-first encoder ONLY for a consistent table (every
    multi-char part formed by an earlier merge). Pin both: the
    consistency property itself, and chain == encode_word on the corpus
    vocabulary plus 20k random words over the corpus alphabet."""
    import random

    from lakehouse_workshop_spark.operators.llm_pipeline import (
        BPE_CHAIN_REPS,
        BPE_FROZEN_MERGES,
    )

    formed: set[str] = set()
    for a, b in BPE_FROZEN_MERGES:
        for part in (a, b):
            assert len(part) == 1 or part == END_OF_WORD or part in formed, (
                f"inconsistent merge part {part!r} — the replace-chain "
                "equivalence no longer holds; retrain or reorder the table"
            )
        formed.add(a + b)

    ranks = {p: i for i, p in enumerate(BPE_FROZEN_MERGES)}

    def chain(word: str) -> list[str]:
        s = "|" + "|".join(list(word) + [END_OF_WORD]) + "|"
        for a, b in BPE_FROZEN_MERGES:
            for _ in range(BPE_CHAIN_REPS):
                s = s.replace(f"|{a}|{b}|", f"|{a}{b}|")
        return s.strip("|").split("|")

    vocab = [
        "a", "agg", "batch", "big", "column", "customer", "data", "dup",
        "fast", "filter", "group", "hash", "join", "key", "line", "merge",
        "order", "part", "query", "row", "scan", "slow", "small", "sort",
        "spark", "stream", "table", "the", "value", "vector", "window",
    ]
    for w in vocab:
        assert chain(w) == encode_word(w, ranks), w
    rng = random.Random(7)
    for _ in range(20000):
        w = "".join(
            rng.choice("aeorstwinluh") for _ in range(rng.randint(1, 12))
        )
        assert chain(w) == encode_word(w, ranks), w


def test_bpe_oracle_word_length_guard():
    """The SQL replace-chain's BPE_CHAIN_REPS bound is proven only for
    words <= BPE_MAX_WORD_CHARS chars; the oracle word stage must error()
    loudly on a longer word instead of silently desyncing from the greedy
    encoder (r10 ADVICE). Pinned here against a synthetic long word."""
    import duckdb
    import pytest

    from lakehouse_workshop_spark.operators.llm_pipeline import (
        BPE_MAX_WORD_CHARS,
        _bpe_words_sql,
    )

    con = duckdb.connect()
    long_word = "x" * (BPE_MAX_WORD_CHARS + 1)
    con.execute(
        f"CREATE VIEW kept AS SELECT 1 AS doc_id, 'ok {long_word}' AS text"
    )
    # the consumer must READ word (as the replace chain does) — a bare
    # COUNT(*) lets the optimizer prune the guarded column entirely
    with pytest.raises(Exception, match="BPE_CHAIN_REPS bound"):
        con.execute(
            f"SELECT SUM(length(word)) FROM ({_bpe_words_sql('kept')})"
        ).fetchall()
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW kept AS SELECT 1 AS doc_id, 'all short words' AS text"
    )
    assert con2.execute(
        f"SELECT SUM(length(word)) FROM ({_bpe_words_sql('kept')})"
    ).fetchall()[0][0] == 13
