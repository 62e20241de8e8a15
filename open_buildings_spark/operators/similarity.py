"""Similarity search over the embeddings table (array<float> column):
brute-force cosine top-k as the exact baseline, and a random-hyperplane
LSH-bucketed variant as the scale path. Pure built-in expressions —
``zip_with``/``aggregate`` for dot products — no UDFs.

Determinism for the oracle: similarities are ranked on (round(sim, 6) DESC,
vec_id ASC) so last-ulp accumulation-order differences between engines
cannot flip ranks; LSH plane weights are integer-hash-derived so the SQL
oracle reproduces the exact same buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 8
DIM = 64


def plane_weight(p: int, d: int) -> float:
    """Deterministic pseudo-random hyperplane component (1-based dim d)."""
    return ((p * 131 + d) * 2654435761 % 1000) / 1e3 - 0.5


def _vecd(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def cosine_topk(
    emb: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact brute-force cosine top-k: (query_id, vec_id, rank).

    ``emb``: (vec_id, embedding). ``queries``: (query_id, q_embedding) —
    a SMALL broadcast side; the cross join is the documented exact baseline
    (cost Q x N, run the LSH variant for large Q)."""
    e = emb.select("vec_id", _vecd(F.col("embedding")).alias("v"))
    q = queries.select("query_id", _vecd(F.col("q_embedding")).alias("qv"))
    crossed = e.crossJoin(F.broadcast(q))
    sim = _dot(F.col("v"), F.col("qv")) / (
        F.sqrt(_dot(F.col("v"), F.col("v"))) * F.sqrt(_dot(F.col("qv"), F.col("qv")))
    )
    scored = crossed.withColumn("sim_r", F.round(sim, 6))
    w = Window.partitionBy("query_id").orderBy(F.col("sim_r").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.col("rank").cast("long").alias("rank"))
    )


def lsh_signature(emb: DataFrame) -> DataFrame:
    """(vec_id, sig): 8-bit random-hyperplane signature — the bucket key.
    At scale the bucket is the shuffle/partition key; queries probe only
    their own bucket (and optionally neighboring signatures)."""
    v = _vecd(F.col("embedding"))
    bits = []
    for p in range(N_PLANES):
        w = F.array(*[F.lit(plane_weight(p, d)) for d in range(1, DIM + 1)])
        s = _dot(v, w)
        bits.append(F.when(s > 0, F.lit("1")).otherwise(F.lit("0")))
    return emb.select("vec_id", F.concat(*bits).alias("sig"))


def ann_topk_lsh(emb: DataFrame, query_ids: list[int], k: int = 3) -> DataFrame:
    """LSH-bucketed ANN: per query vector, top-k among vectors sharing its
    signature bucket: (query_id, vec_id, rank). Misses across buckets are
    the documented recall trade-off of the scale path."""
    sig = lsh_signature(emb)
    e = emb.join(sig, "vec_id").select(
        "vec_id", "sig", _vecd(F.col("embedding")).alias("v")
    )
    q = e.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("sig").alias("qsig"),
        F.col("v").alias("qv"),
    )
    cand = e.join(F.broadcast(q), e["sig"] == q["qsig"])
    sim = _dot(F.col("v"), F.col("qv")) / (
        F.sqrt(_dot(F.col("v"), F.col("v"))) * F.sqrt(_dot(F.col("qv"), F.col("qv")))
    )
    scored = cand.withColumn("sim_r", F.round(sim, 6)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim_r").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.col("rank").cast("long").alias("rank"))
    )


def embedding_near_dups(emb: DataFrame, threshold: float = 0.999) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within LSH buckets:
    (a, b, sim_r) with rounded cosine >= threshold — the embedding-space
    analogue of MinHash dedup; bucket join keeps it O(bucket^2), not O(N^2)."""
    sig = lsh_signature(emb)
    e = emb.join(sig, "vec_id").select(
        "vec_id", "sig", _vecd(F.col("embedding")).alias("v")
    )
    a = e.select(F.col("vec_id").alias("a"), F.col("sig"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("b"), F.col("sig"), F.col("v").alias("vb"))
    pairs = a.join(b, "sig").filter(F.col("a") < F.col("b"))
    sim = _dot(F.col("va"), F.col("vb")) / (
        F.sqrt(_dot(F.col("va"), F.col("va"))) * F.sqrt(_dot(F.col("vb"), F.col("vb")))
    )
    return (
        pairs.withColumn("sim_r", F.round(sim, 6))
        .filter(F.col("sim_r") >= threshold)
        .select("a", "b", "sim_r")
    )


# ------------------------------ IVF variant ------------------------------

N_CENTROIDS = 16
N_PROBE = 2
CENTROID_STRIDE = 7


def ivf_centroids(emb: DataFrame, n_centroids: int = N_CENTROIDS,
                  stride: int = CENTROID_STRIDE) -> DataFrame:
    """Deterministic coarse quantizer: centroid c = the embedding of
    vec_id c*stride (a fixed sample standing in for k-means training, which
    would be nondeterministic across engines). (cid, cv)."""
    ids = [i * stride for i in range(n_centroids)]
    return emb.filter(F.col("vec_id").isin(ids)).select(
        (F.col("vec_id") / stride).cast("int").alias("cid"),
        _vecd(F.col("embedding")).alias("cv"),
    )


def ivf_assign(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, cid): each vector joins its nearest centroid by cosine
    (rounded, cid-ascending tie-break). The centroid table is tiny and
    broadcast; at scale ``cid`` is the partition key of the index — probes
    read only the probed cells' partitions."""
    crossed = emb.select("vec_id", _vecd(F.col("embedding")).alias("v")).crossJoin(
        F.broadcast(centroids)
    )
    sim = _dot(F.col("v"), F.col("cv")) / (
        F.sqrt(_dot(F.col("v"), F.col("v"))) * F.sqrt(_dot(F.col("cv"), F.col("cv")))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.round(sim, 6).desc(), F.col("cid").asc()
    )
    return (
        crossed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid")
    )


def ann_topk_ivf(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    n_probe: int = N_PROBE,
) -> DataFrame:
    """IVF-bucketed ANN (the scale path alongside the LSH variant): assign
    every vector to its nearest coarse centroid, probe each query's
    ``n_probe`` nearest cells, exact cosine top-k among those candidates
    only: (query_id, vec_id, rank). Cost Q x (N * n_probe / n_centroids)
    instead of Q x N."""
    cent = ivf_centroids(emb)
    cells = ivf_assign(emb, cent)
    q = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), _vecd(F.col("embedding")).alias("qv")
    )
    qsim = _dot(F.col("qv"), F.col("cv")) / (
        F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("cv"), F.col("cv")))
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.round(qsim, 6).desc(), F.col("cid").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "cid", "qv")
    )
    cand = (
        emb.select("vec_id", _vecd(F.col("embedding")).alias("v"))
        .join(cells, "vec_id")
        .join(F.broadcast(probes), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    sim = _dot(F.col("v"), F.col("qv")) / (
        F.sqrt(_dot(F.col("v"), F.col("v"))) * F.sqrt(_dot(F.col("qv"), F.col("qv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_r").desc(), F.col("vec_id").asc()
    )
    return (
        cand.withColumn("sim_r", F.round(sim, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.col("rank").cast("long").alias("rank"))
    )
