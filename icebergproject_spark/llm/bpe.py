"""Distributed BPE tokenizer-vocabulary training.

Extension beyond the reference surface: the reference has no text
processing at all; this implements the iterative merge-learning loop of
Sennrich et al., "Neural Machine Translation of Rare Words with Subword
Units" (ACL 2016) — the algorithm behind GPT-2/RoBERTa-style tokenizer
training — in the shape a 100 TB corpus needs:

- The corpus is reduced ONCE to its word vocabulary (groupBy word →
  frequency).  Word frequencies are Zipfian, so the vocab is orders of
  magnitude smaller than the token stream; every subsequent round runs
  over vocab-sized data only.
- Each round: distributed weighted pair count (explode adjacent symbol
  pairs, groupBy with map-side combine), a deterministic argmax (count
  desc, pair lexicographic — a bounded TakeOrderedAndProject, not a
  full sort), then a vectorized merge pass over the symbol arrays
  (Arrow-batched ``mapInPandas`` — the merge is an inherently
  sequential left-to-right scan WITHIN a word, but embarrassingly
  parallel ACROSS words).
- ``localCheckpoint`` after each merge truncates lineage; without it the
  plan doubles per round and the optimizer, not the executors, dies.

``token_count_bpe`` / ``bpe_pair_counts`` (llm/text.py) are the
single-round building blocks; this is the full training loop.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _merge_batch(a: str, b: str):
    """mapInPandas kernel: greedy left-to-right merge of adjacent
    (a, b) symbol occurrences — Sennrich's reference semantics
    ("aaa" under merge (a,a) → ["aa", "a"])."""

    def apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            merged = []
            for syms in pdf["syms"]:
                out, i, n = [], 0, len(syms)
                while i < n:
                    if i < n - 1 and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                merged.append(out)
            yield pd.DataFrame({"syms": merged, "wcnt": pdf["wcnt"]})

    return apply


def bpe_train(
    df: DataFrame,
    content_col: str = "text",
    num_merges: int = 10,
    min_freq: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges from a corpus; returns
    [(left, right, pair_frequency), ...] in merge order.

    Deterministic: exact integer pair counts with a total tie-break
    (freq desc, left asc, right asc), so the learned merge table is
    stable across partitionings, retries, and cluster sizes.  Stops
    early when the best pair drops below ``min_freq``.
    """
    vocab = (
        df.select(F.explode(F.split(F.col(content_col), " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wcnt"))
        # split into chars without the trailing empty string '' emits
        .select(F.split(F.col("w"), "(?!$)").alias("syms"), "wcnt")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        pair = F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.struct(
                F.element_at("syms", i.cast("int")).alias("l"),
                F.element_at("syms", (i + 1).cast("int")).alias("r"),
            ),
        )
        best = (
            vocab.filter(F.size("syms") >= 2)
            .select("wcnt", F.explode(pair).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("wcnt").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_freq:
            break
        left, right, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append((left, right, cnt))
        vocab = vocab.mapInPandas(
            _merge_batch(left, right), "syms array<string>, wcnt bigint"
        ).localCheckpoint(eager=True)
    return merges


def bpe_train_df(
    df: DataFrame,
    content_col: str = "text",
    num_merges: int = 10,
    min_freq: int = 2,
) -> DataFrame:
    """`bpe_train` as a DataFrame: (rank, left, right, freq).  The merge
    table is a driver-side list (it IS the training output — bounded by
    num_merges), re-parallelized for the registry/driver contract."""
    merges = bpe_train(df, content_col, num_merges, min_freq)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(i + 1, l, r, c) for i, (l, r, c) in enumerate(merges)],
        "rank int, left string, right string, freq bigint",
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge table: per document, the BPE token count
    under the trained vocabulary — the number the packing/budgeting
    stages (pack_sequences, mixing_weights) consume.

    The merge table is bounded (len = num_merges), shipped in the UDF
    closure; encoding is Arrow-batched ``mapInPandas`` with a per-batch
    word→length memo (Zipf again: most words in a batch repeat, so the
    merge loop runs once per DISTINCT word).  Words shorter than 2 chars
    are single tokens by construction (they cannot contain a pair).
    """
    ranked = [(m[0], m[1]) for m in merges]

    def encode(batches):
        import pandas as pd

        memo: dict[str, int] = {}

        def word_len(w: str) -> int:
            got = memo.get(w)
            if got is not None:
                return got
            syms = list(w)
            for a, b in ranked:
                if len(syms) < 2:
                    break
                out, i, n = [], 0, len(syms)
                while i < n:
                    if i < n - 1 and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            memo[w] = len(syms)
            return memo[w]

        for pdf in batches:
            counts = [
                sum(word_len(w) for w in t.split(" ") if w)
                for t in pdf[content_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "n_tokens_bpe": counts})

    return df.select(id_col, content_col).mapInPandas(
        encode, f"{id_col} long, n_tokens_bpe bigint"
    )


def bpe_vocab(
    df: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    content_col: str = "text",
) -> list[str]:
    """Deterministic id-ordered vocabulary for a trained merge table:
    the corpus's distinct single characters (sorted — ids are stable
    across engines and partitionings) followed by the merged symbols in
    rank order.  Base characters come from the SAME corpus the encoder
    runs on, so encoding can never hit an out-of-vocabulary symbol.

    The char inventory is one distributed pass (explode → distinct —
    the result is alphabet-sized, tiny); the merge table is already
    bounded by num_merges.  Returns the vocab as an id-indexed list.
    """
    chars = sorted(
        r["c"]
        for r in df.select(
            F.explode(F.split(F.col(content_col), "")).alias("c")
        )
        .filter(F.col("c") != "")
        .distinct()
        .collect()
    )
    seen = set(chars)
    out = list(chars)
    for m in merges:
        sym = m[0] + m[1]
        if sym not in seen:
            seen.add(sym)
            out.append(sym)
    return out


def bpe_tokenize(
    df: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    vocab: list[str],
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full corpus tokenization under a trained BPE vocabulary — the
    trainer-input artifact (``bpe_encode`` only counts): per document,
    the id sequence of its greedy-merged symbols.

    Same 100 TB shape as the other Arrow kernels: the merge table and
    vocab ship in the closure (bounded — num_merges + alphabet), the
    kernel is ``mapInPandas`` with a per-batch word→ids memo (Zipf:
    the merge loop runs once per DISTINCT word per batch), and the op
    is a pure projection — zero shuffle, scales linearly.  Whitespace
    splitting matches ``bpe_train``'s word inventory, so every symbol
    the merge loop can produce is either a corpus character or a
    ranked merge — both in ``vocab`` by construction
    (:func:`bpe_vocab`); a genuinely unseen character (tokenizing a
    corpus the vocab wasn't built from) maps to id -1 rather than
    crashing, mirroring an UNK id.
    """
    ranked = [(m[0], m[1]) for m in merges]
    ids = {s: i for i, s in enumerate(vocab)}

    def tokenize(batches):
        memo: dict[str, list[int]] = {}

        def word_ids(w: str) -> list[int]:
            got = memo.get(w)
            if got is not None:
                return got
            syms = list(w)
            for a, b in ranked:
                if len(syms) < 2:
                    break
                out, i, n = [], 0, len(syms)
                while i < n:
                    if i < n - 1 and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            memo[w] = [ids.get(s, -1) for s in syms]
            return memo[w]

        for pdf in batches:
            toks = [
                [t for w in text.split(" ") if w for t in word_ids(w)]
                for text in pdf[content_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "token_ids": toks,
                    "n_tokens": [len(t) for t in toks],
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        tokenize, f"{id_col} long, token_ids array<int>, n_tokens bigint"
    )
