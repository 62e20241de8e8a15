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


RRF_K = 60  # the standard reciprocal-rank-fusion constant (Cormack et al.)


def hybrid_search_rrf(
    docs: DataFrame,
    emb: DataFrame,
    terms: list[str],
    queries: DataFrame,
    k: int = 20,
    depth: int = 50,
    k_rrf: int = RRF_K,
    id_col: str = "doc_id",
) -> DataFrame:
    """Hybrid sparse+dense retrieval via reciprocal-rank fusion: the
    canonical RAG / training-data retrieval composition (score ranked
    lists from incomparable scorers by rank alone):

        rrf(d) = sum over lists containing d of 1 / (k_rrf + rank_d)

    Sparse list = :func:`bm25_search` top-``depth``; dense list =
    ``similarity.cosine_topk`` top-``depth`` for the (single) query row
    of ``queries`` (query_id, q_embedding); ``emb`` is (vec_id,
    embedding) with vec_id in the same id domain as ``docs.doc_id``.
    Returns (doc_id, rrf_r9, rank) of the fused top-``k``.

    Determinism: ranks are integers, each doc contributes at most two
    1/(k_rrf + rank) terms — an exact, order-free float sum — and the
    fused score still rounds (9 dp) before ranking with a doc_id
    tie-break, the engine-wide cross-engine device. Scale shape: both
    input lists are top-``depth`` (TakeOrderedAndProject /
    windowed-filter bounded), so the fusion join touches at most
    2 x depth rows regardless of corpus size."""
    from .similarity import cosine_topk

    sparse = bm25_search(docs, terms, k=depth).select(
        F.col(id_col).alias("fid"), F.col("rank").alias("r_sparse")
    )
    dense = cosine_topk(emb, queries, k=depth).select(
        F.col("vec_id").alias("fid"), F.col("rank").alias("r_dense")
    )
    fused = sparse.join(dense, "fid", "full_outer").select(
        "fid",
        (
            F.coalesce(1.0 / (F.lit(k_rrf) + F.col("r_sparse")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(k_rrf) + F.col("r_dense")), F.lit(0.0))
        ).alias("rrf"),
    )
    scored = fused.select(
        F.col("fid").alias(id_col), F.round("rrf", 9).alias("rrf_r9")
    )
    w = Window.orderBy(F.desc("rrf_r9"), F.asc(id_col))
    return (
        scored.orderBy(F.desc("rrf_r9"), F.asc(id_col))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
    )
