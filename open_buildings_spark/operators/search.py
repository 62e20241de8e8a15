"""Corpus-level lexical search operators: vocabulary statistics and BM25
keyword ranking. Like the rest of the text stack these are pure built-in
JVM expressions (explode + map-side-combinable groupBys — no UDFs), and
every score is either an exact integer or a deterministic double rounded
before ranking so the DuckDB oracle matches bit-for-bit.

Scale shape: both operators are one token explode followed by hash
aggregations on the term key — the same plan as a word-count, which is the
canonical embarrassingly-scalable Spark job. The only global ordering is a
top-N, which Spark executes as TakeOrderedAndProject (per-partition heaps,
no full sort). BM25 (Robertson-Sparck Jones, public formula) needs two
corpus scalars (doc count, average doc length) — one tiny aggregate,
broadcast — and the per-term document frequencies, also broadcast (bounded
by the query's term count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import tokens_col

BM25_K1 = 1.2
BM25_B = 0.75


def vocab_stats(df: DataFrame, top_n: int = 100, id_col: str = "doc_id") -> DataFrame:
    """Top-``top_n`` corpus vocabulary: (term, term_freq, doc_freq, rank),
    ranked by collection frequency (ties: term ascending).

    Two aggregations over one explode — term_freq counts every occurrence,
    doc_freq counts distinct docs via a distinct-pairs pre-aggregation
    (never countDistinct inside the agg: the distinct itself is a
    map-side-combinable groupBy)."""
    toks = df.select(id_col, F.explode(tokens_col()).alias("term"))
    tf = toks.groupBy("term").agg(F.count("*").alias("term_freq"))
    dfreq = (
        toks.distinct().groupBy("term").agg(F.count("*").alias("doc_freq"))
    )
    top = (
        tf.join(dfreq, "term")
        .orderBy(F.desc("term_freq"), "term")
        .limit(top_n)
    )
    # rank assignment only runs over the already-reduced top_n rows, so the
    # single-partition window is O(top_n), not O(vocabulary)
    w = Window.orderBy(F.desc("term_freq"), F.asc("term"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def bm25_search(
    df: DataFrame,
    terms: list[str],
    k: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` docs for a bag-of-words query under BM25
    (k1=1.2, b=0.75, idf = ln((N - df + 0.5)/(df + 0.5) + 1)):
    (doc_id, score_r6, rank). Scores are rounded to 6 dp BEFORE ranking
    (ties then break on doc_id) so the ordering is reproducible across
    engines despite non-associative float summation.

    The posting list is built by filtering the exploded tokens to the query
    terms FIRST — the expensive aggregation only ever sees rows matching
    the query, and document frequencies (one row per query term) broadcast
    to the scoring join."""
    toks = df.select(id_col, F.explode(tokens_col()).alias("term"))
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.avg("dl").alias("avgdl"), F.count("*").alias("n_docs")
    )
    tf = (
        toks.filter(F.col("term").isin(list(terms)))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    contrib = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                + 1.0
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (BM25_K1 + 1))
            / (
                F.col("tf")
                + BM25_K1
                * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    scored = contrib.groupBy(id_col).agg(
        F.round(F.sum("contrib"), 6).alias("score_r6")
    )
    top = scored.orderBy(F.desc("score_r6"), id_col).limit(k)
    w = Window.orderBy(F.desc("score_r6"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))
