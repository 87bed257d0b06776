"""Byte-pair-encoding tokenizer: distributed counting + apply, exact learn.

The missing piece between ``bpe_merge_candidates`` (the distributed
first-round pair-count primitive) and a usable tokenizer: learn a merge
table and apply it to a corpus.

Division of labor follows how production BPE trainers actually work
(Sennrich et al. 2016; HuggingFace/sentencepiece do the same):

- **Word counting is distributed** — one map-side-combined groupBy over
  the corpus; the result is the Zipf-bounded type vocabulary (millions of
  rows at 100 TB, not trillions), small enough to reduce.
- **Merge learning runs on the reduced word-count table** — the greedy
  loop is inherently sequential (merge k+1 depends on the counts after
  merge k), so no engine distributes it; what matters is that its input
  is the aggregated vocabulary, never the raw corpus.
- **Apply is distributed** — the learned merge ranks broadcast to every
  task (a merge table is KBs–MBs) and an Arrow-batched pandas iterator
  tokenizes documents with per-word memoization; the corpus never
  collects.

Determinism: pair-count ties break lexicographically, so the learned
table is a pure function of the corpus.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"  # marks word boundary so merges never cross words


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distributed (word, count) reduction — the trainer's real input.

    Scale: one exchange keyed on the Zipf-skewed word column; partial
    aggregation collapses almost everything map-side.
    """
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _symbolize(word: str) -> tuple[str, ...]:
    return tuple(word) + (END_OF_WORD,)


def learn_merges(
    counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Greedy BPE merge learning over a (word, count) vocabulary.

    Classic Sennrich algorithm: repeatedly merge the most frequent
    adjacent symbol pair (count-weighted by word frequency), ties broken
    lexicographically so the table is deterministic. Runs driver-side on
    the aggregated vocabulary — see the module docstring for why that is
    the production shape, not a shortcut.
    """
    vocab: dict[tuple[str, ...], int] = {}
    for word, cnt in counts:
        if word:
            vocab[_symbolize(word)] = vocab.get(_symbolize(word), 0) + int(cnt)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, cnt in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + cnt
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Tokenize one word with a learned merge-rank table (lowest rank
    merges first — the exact inference rule BPE training implies)."""
    syms = list(_symbolize(word))
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distributed BPE tokenization: (id, tokens array, n_tokens) per doc.

    The merge table broadcasts inside the serialized closure (KBs–MBs);
    tokenization runs in Arrow-batched ``mapInPandas`` with a per-batch
    word memo — the Zipf head means most words hit the memo, so work is
    ~O(distinct words per batch), not O(tokens).
    """
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    ranks = {pair: i for i, pair in enumerate(merges)}
    schema = StructType(
        [
            StructField(id_col, LongType(), True),
            StructField("tokens", ArrayType(StringType()), True),
            StructField("n_tokens", LongType(), True),
        ]
    )

    def body(batches):
        import pandas as pd

        memo: dict[str, list[str]] = {}
        for pdf in batches:
            ids, toks, ns = [], [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                out: list[str] = []
                for w in str(text).split(" "):
                    if not w:
                        continue
                    enc = memo.get(w)
                    if enc is None:
                        enc = encode_word(w, ranks)
                        memo[w] = enc
                    out.extend(enc)
                ids.append(int(i))
                toks.append(out)
                ns.append(len(out))
            yield pd.DataFrame({id_col: ids, "tokens": toks, "n_tokens": ns})

    return df.select(id_col, text_col).mapInPandas(body, schema=schema)


def train_bpe(
    df: DataFrame, n_merges: int, text_col: str = "text"
) -> list[tuple[str, str]]:
    """End-to-end trainer: distributed word counts → driver-side greedy
    merge learning. The collect is the aggregated type vocabulary (Zipf-
    bounded), never the corpus."""
    rows = word_counts(df, text_col).collect()
    return learn_merges([(r.word, r.cnt) for r in rows], n_merges)
