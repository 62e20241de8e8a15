"""BPE tokenizer induction over a distributed corpus.

The scale structure mirrors how production tokenizer training actually
works (the reference pipeline has no tokenizer stage; this belongs to the
training-data toolkit the engine adds):

1. The corpus collapses to a WORD-COUNT table first — one map-side
   combinable word-count shuffle, the canonical Spark job. Everything
   per-character afterwards runs over the distinct-word table weighted by
   counts: O(vocab), not O(corpus). At 100 TB the corpus may be 10^11
   documents while the vocab is 10^7 words — this step is why tokenizer
   training is tractable at all.
2. :func:`pair_stats` — the distributed merge-candidate scan: weighted
   adjacent-symbol pair counts over the word table (top-k, deterministic
   (count DESC, pair ASC) order). Gated by `t_bpe_pairs` against a
   from-scratch DuckDB oracle.
3. :func:`learn` — the classic greedy merge loop over the TOP-N word
   rows (bounded driver state, the same contract as kmeans_fit's
   centroids): each round re-counts pairs and merges the best one.
   Real trainers (e.g. the published BPE algorithm of Sennrich et al.
   2016) run exactly this loop on an in-memory word-count dict; the
   distributed part is producing that dict.

:func:`apply_merges` / :func:`encode` apply a learned merge list —
encode runs the exact per-word rule once per DISTINCT word (Arrow-batched
over the vocab table) and rebuilds documents with joins, so the
corpus-sized work stays in the JVM while Python cost is O(vocab).
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve via globals
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import tokens_col


# fixed merge list for the driver-gated encode query (t_bpe_encode): the
# gated operator is the DISTRIBUTED APPLY (encode), so the list is pinned
# rather than learned — chosen to exercise the two subtle rules: priority
# chains (t+h -> th, then th+e -> the; a+n -> an, then an+d -> and) and
# SELF-PAIR RUNS (e e / o o pair strictly left-to-right: 'eeeeee' ->
# ee|ee|ee), where replace-chain shortcuts diverge. The DuckDB oracle
# re-applies the same list from scratch with a recursive CTE.
DEMO_MERGES: list[tuple[str, str]] = [
    ("e", "e"), ("t", "h"), ("th", "e"), ("a", "n"),
    ("o", "o"), ("i", "n"), ("an", "d"), ("e", "r"),
]


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wc) — one map-side-combinable shuffle over the corpus."""
    return (
        df.select(F.explode(tokens_col(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def pair_stats(df: DataFrame, text_col: str = "text", top_k: int = 50) -> DataFrame:
    """Top-``top_k`` weighted adjacent-character-pair counts (the round-1
    BPE merge candidates): (rank, pair, n) ordered by (n DESC, pair ASC).
    Per-character work happens on the distinct-word table only."""
    wc = word_counts(df, text_col).where(F.length("word") >= 2)
    pairs = (
        wc.select(
            "wc",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(word) - 1), "
                    "i -> concat(substring(word, i, 1), ' ', "
                    "substring(word, i + 1, 1)))"
                )
            ).alias("pair"),
        )
        .groupBy("pair")
        .agg(F.sum("wc").cast("long").alias("n"))
    )
    # orderBy+limit = TakeOrderedAndProject (no full sort); the rank window
    # runs over the surviving top_k rows only
    w = Window.orderBy(F.desc("n"), "pair")
    return (
        pairs.orderBy(F.desc("n"), "pair")
        .limit(top_k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "pair", "n")
    )


def learn(
    df: DataFrame,
    n_merges: int = 50,
    max_words: int = 100_000,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Greedy BPE merge list from the corpus. Only the top ``max_words``
    (by count, ties lexicographic) word rows reach the driver — bounded
    state, like kmeans' k x dim centroids; the merge loop itself is the
    standard in-memory algorithm over that dict."""
    rows = (
        word_counts(df, text_col)
        .orderBy(F.desc("wc"), "word")
        .limit(max_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        vocab[tuple(r["word"])] = vocab.get(tuple(r["word"]), 0) + r["wc"]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        nxt: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + c
        vocab = nxt
    return merges


def apply_merges(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Segment one word with a learned merge list (merge priority =
    list order, the standard BPE apply rule)."""
    syms = list(word)
    rank = {m: i for i, m in enumerate(merges)}
    while len(syms) > 1:
        pairs = [(rank.get((a, b), len(rank)), i) for i, (a, b) in enumerate(zip(syms, syms[1:]))]
        r, i = min(pairs)
        if r >= len(rank):
            break
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    return syms


def encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Add ``bpe_tokens`` (array<string>): every whitespace token segmented
    with :func:`apply_merges` — bit-identical to the per-word priority
    rule, including self-pair runs (``aaaaaa`` under merge (a, a) pairs
    strictly left-to-right), where replace-chain tricks diverge.

    Scale shape: the Python rule runs ONCE PER DISTINCT WORD (an
    Arrow-batched UDF over the vocab table — O(vocab), same contract as
    :func:`pair_stats`); the corpus-sized work is pure joins/aggregations
    the optimizer can plan (AQE broadcasts the segmented vocab when it is
    small). Token order is restored by sorting (pos, segment) structs, so
    the result is deterministic regardless of join ordering."""
    from pyspark.sql.types import ArrayType, StringType

    @F.pandas_udf(ArrayType(StringType()))
    def seg_udf(w: pd.Series) -> pd.Series:
        return w.map(lambda x: apply_merges(x, merges))

    toks = df.select(id_col, F.posexplode(tokens_col(text_col)).alias("pos", "word"))
    seg = toks.select("word").distinct().withColumn("seg", seg_udf("word"))
    per_doc = (
        toks.join(seg, "word")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list(F.struct("pos", "seg"))).alias("ps"))
        .select(id_col, F.flatten(F.col("ps").getField("seg")).alias("bpe_tokens"))
    )
    empty = F.array().cast("array<string>")
    return df.join(per_doc, id_col, "left").withColumn(
        "bpe_tokens", F.coalesce(F.col("bpe_tokens"), empty)
    )
