"""BPE tokenizer induction (operators/bpe.py): distributed pair stats,
driver-side merge learning, native-expression encoding."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from open_buildings_spark.operators import bpe


def _tiny_corpus(spark):
    rows = [
        (1, "low low low lower lower newest newest newest newest widest"),
        (2, "widest widest newest low lowest"),
        (3, "the the the newest banana"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _brute_pair_counts(rows: list[str]) -> Counter:
    words = Counter()
    for text in rows:
        for w in text.split(" "):
            if w:
                words[w] += 1
    pairs = Counter()
    for w, c in words.items():
        for a, b in zip(w, w[1:]):
            pairs[f"{a} {b}"] += c
    return pairs


def test_pair_stats_matches_brute_force(spark):
    df = _tiny_corpus(spark)
    got = bpe.pair_stats(df, top_k=10).collect()
    brute = _brute_pair_counts([r["text"] for r in df.collect()])
    want = sorted(brute.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["pair"], r["n"]) for r in got] == want
    assert [r["rank"] for r in got] == list(range(1, len(want) + 1))


def test_pair_stats_plan_partial_agg(spark):
    """The word count and the pair count must both partial-aggregate
    (HashAggregate -> Exchange -> HashAggregate) — at 100 TB the map-side
    combine IS the operator."""
    import contextlib
    import io
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bpe.pair_stats(_tiny_corpus(spark)).explain("formatted")
    nodes = re.findall(r"^\(\d+\) (\w+)", buf.getvalue(), re.M)
    assert nodes.count("HashAggregate") >= 4  # two partial+final pairs
    assert "TakeOrderedAndProject" in nodes  # top-k, not a global sort


def _reference_learn(rows: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Sennrich-style reference: greedy merges over the word-count dict."""
    vocab = Counter()
    for text in rows:
        for w in text.split(" "):
            if w:
                vocab[tuple(w)] += 1
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        out = Counter()
        for syms, c in vocab.items():
            syms = list(syms)
            i, acc = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    acc.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    acc.append(syms[i])
                    i += 1
            out[tuple(acc)] += c
        vocab = out
    return merges


def test_learn_matches_reference(spark):
    df = _tiny_corpus(spark)
    rows = [r["text"] for r in df.collect()]
    for n in (1, 5, 12):
        assert bpe.learn(df, n_merges=n) == _reference_learn(rows, n)


def test_learn_bounded_words_is_subset_behaviour(spark):
    # with max_words smaller than the vocab the loop still runs and yields
    # merges drawn from the kept (most frequent) words
    df = _tiny_corpus(spark)
    merges = bpe.learn(df, n_merges=3, max_words=3)
    assert len(merges) == 3


def test_apply_merges_standard_rule():
    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    assert bpe.apply_merges("lowest", merges) == ["low", "est"]
    assert bpe.apply_merges("low", merges) == ["low"]
    assert bpe.apply_merges("x", merges) == ["x"]
    # unknown chars stay single
    assert bpe.apply_merges("zq", merges) == ["z", "q"]


def test_encode_matches_apply_merges(spark):
    df = _tiny_corpus(spark)
    merges = bpe.learn(df, n_merges=8)
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe.encode(df, merges).select("doc_id", "bpe_tokens").collect()
    }
    for r in df.collect():
        want = []
        for w in r["text"].split(" "):
            if w:
                want.extend(bpe.apply_merges(w, merges))
        assert got[r["doc_id"]] == want, r["doc_id"]


def test_encode_repeated_selfpair(spark):
    # self-pair runs are where corpus-wide replace chains diverge from the
    # strict left-to-right pairing rule — including runs >= 5, which a
    # two-pass delimiter replace gets WRONG (['aa','a','aa','a'] for 6)
    df = spark.createDataFrame(
        [(1, "aaaa aaa aa a"), (2, "aaaaaa aaaaa soooooo")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe.encode(df, [("a", "a"), ("aa", "aa"), ("o", "o")]).collect()
    }
    assert rows[1] == ["aaaa", "aa", "a", "aa", "a"]
    assert rows[2] == ["aaaa", "aa", "aaaa", "a", "s", "oo", "oo", "oo"]


def test_encode_token_count_parity_on_corpus(spark):
    """Sanity on the real documents table: encoding with 0 merges equals
    character count per token; with merges, token count only shrinks."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = bpe.learn(docs, n_merges=10)
    out = bpe.encode(docs, merges).select(
        F.size("bpe_tokens").alias("n_bpe"),
        F.aggregate(
            F.filter(F.split("text", " "), lambda t: t != F.lit("")),
            F.lit(0),
            lambda acc, w: acc + F.length(w),
        ).alias("n_chars"),
    )
    row = out.agg(F.sum("n_bpe").alias("b"), F.sum("n_chars").alias("c")).collect()[0]
    assert 0 < row["b"] < row["c"]
