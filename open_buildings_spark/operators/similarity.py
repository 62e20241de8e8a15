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

N_PLANES = 16
N_BANDS = 2
DIM = 64
# injected-duplicate id offset for the near-dup fixtures: must clear the
# real vec_id space at any plausible sf (~20k vec_ids per sf unit; 100k
# collided from sf~5, silently corrupting cluster semantics)
EMB_DUP_OFFSET = 10_000_000


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


def lsh_signature(emb: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """(vec_id, sig): n_planes-bit random-hyperplane signature.

    Width is a runtime knob, not a compile-time constant: bucket count is
    2^band_width once banded (see :func:`lsh_bands`), so operators tune the
    candidate-set size to the corpus (10^9 vectors want >= 20-plane
    signatures banded into ~16-bit buckets; the old fixed 8 planes capped
    the table at 256 buckets => Theta(N^2/256) self-joins)."""
    v = _vecd(F.col("embedding"))
    bits = []
    for p in range(n_planes):
        w = F.array(*[F.lit(plane_weight(p, d)) for d in range(1, DIM + 1)])
        s = _dot(v, w)
        bits.append(F.when(s > 0, F.lit("1")).otherwise(F.lit("0")))
    return emb.select("vec_id", F.concat(*bits).alias("sig"))


def lsh_bands(
    emb: DataFrame, n_planes: int = N_PLANES, n_bands: int = N_BANDS
) -> DataFrame:
    """(vec_id, band, bsig): the signature split into ``n_bands`` contiguous
    bands — standard OR-of-ANDs LSH amplification (same shape as
    dedup.lsh_candidate_pairs over MinHash). Two vectors are candidates iff
    they agree on at least one full band; each (band, bsig) bucket is the
    shuffle key, so bucket size is controlled by band width while recall is
    recovered by the OR across bands."""
    if n_planes % n_bands:
        raise ValueError(f"n_planes={n_planes} not divisible by n_bands={n_bands}")
    width = n_planes // n_bands
    sig = lsh_signature(emb, n_planes)
    bands = F.array(
        *[F.substring("sig", i * width + 1, width) for i in range(n_bands)]
    )
    return sig.select("vec_id", F.posexplode(bands).alias("band", "bsig"))


def ann_topk_lsh(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    n_planes: int = N_PLANES,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """Banded-LSH ANN: per query vector, top-k among vectors sharing at
    least one signature band: (query_id, vec_id, rank). Misses across all
    bands are the documented recall trade-off of the scale path; recall and
    bucket size tune independently via (n_planes, n_bands)."""
    bands = lsh_bands(emb, n_planes, n_bands)
    e = emb.select("vec_id", _vecd(F.col("embedding")).alias("v"))
    q = e.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    qb = bands.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), "band", "bsig"
    )
    # OR-amplification: a pair sharing several bands appears once
    cand_ids = (
        bands.join(F.broadcast(qb), ["band", "bsig"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    cand = cand_ids.join(e, "vec_id").join(F.broadcast(q), "query_id")
    sim = _dot(F.col("v"), F.col("qv")) / (
        F.sqrt(_dot(F.col("v"), F.col("v"))) * F.sqrt(_dot(F.col("qv"), F.col("qv")))
    )
    scored = cand.withColumn("sim_r", F.round(sim, 6))
    w = Window.partitionBy("query_id").orderBy(F.col("sim_r").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.col("rank").cast("long").alias("rank"))
    )


def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.999,
    n_planes: int = N_PLANES,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within banded LSH buckets:
    (a, b, sim_r) with rounded cosine >= threshold — the embedding-space
    analogue of MinHash dedup. The per-band bucket join keeps candidate
    generation O(sum bucket^2) instead of O(N^2); near-identical vectors
    agree on every plane, so any single full band finds them and the OR
    across bands only adds recall for borderline pairs."""
    bands = lsh_bands(emb, n_planes, n_bands)
    a = bands.select(F.col("vec_id").alias("a"), "band", "bsig")
    b = bands.select(F.col("vec_id").alias("b"), "band", "bsig")
    pair_ids = (
        a.join(b, ["band", "bsig"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    e = emb.select("vec_id", _vecd(F.col("embedding")).alias("v"))
    pairs = (
        pair_ids.join(e.select(F.col("vec_id").alias("a"), F.col("v").alias("va")), "a")
        .join(e.select(F.col("vec_id").alias("b"), F.col("v").alias("vb")), "b")
    )
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


def _nearest_cid(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, cid, v): each (vec_id, v) row joined to its nearest
    centroid by cosine (rounded, cid-ascending tie-break) — the single
    argmax kernel shared by serving (:func:`ivf_assign`) and training
    (:func:`kmeans_fit`), so their assignment rules can never diverge."""
    crossed = vecs.crossJoin(F.broadcast(centroids))
    sim = _dot(F.col("v"), F.col("cv")) / (
        F.sqrt(_dot(F.col("v"), F.col("v"))) * F.sqrt(_dot(F.col("cv"), F.col("cv")))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.round(sim, 6).desc(), F.col("cid").asc()
    )
    return (
        crossed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid", "v")
    )


def ivf_assign(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, cid): each vector joins its nearest centroid by cosine
    (rounded, cid-ascending tie-break). The centroid table is tiny and
    broadcast; at scale ``cid`` is the partition key of the index — probes
    read only the probed cells' partitions."""
    return _nearest_cid(
        emb.select("vec_id", _vecd(F.col("embedding")).alias("v")), centroids
    ).select("vec_id", "cid")


def kmeans_fit(
    emb: DataFrame,
    n_centroids: int = N_CENTROIDS,
    n_iter: int = 3,
    stride: int = CENTROID_STRIDE,
) -> DataFrame:
    """Lloyd k-means trainer for the IVF coarse quantizer (the step
    :func:`ivf_centroids`' fixed sample stands in for): deterministic
    sample init, then ``n_iter`` rounds of assign (cosine argmax, the same
    kernel as :func:`ivf_assign`) + per-component mean recompute.

    Scale shape — the canonical distributed k-means: the DATA never moves
    or collects; each round is one broadcast-join assignment pass plus one
    map-side-combinable avg groupBy on (cid, component). Only the centroid
    table (n_centroids x dim doubles) comes to the driver between rounds,
    which also keeps the plan lineage flat across iterations. The driver
    gate mirrors the trainer with a 3-round unrolled DuckDB Lloyd
    (oracles_text.s_kmeans_ivf): the assignment rule — cosine similarity
    ROUNDED to 6 dp, cid-ascending tie-break — absorbs the engines'
    float-sum-order drift in the means, so changing that rule breaks the
    oracle; the pytest fixture additionally pins cluster recovery.

    Returns (cid, cv, n_assigned) for the final round. A centroid that
    loses every vector drops out (standard Lloyd shrinkage) — the output
    may carry fewer than ``n_centroids`` rows on degenerate inputs.
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    spark = emb.sparkSession
    cent = ivf_centroids(emb, n_centroids, stride)
    vecs = emb.select("vec_id", _vecd(F.col("embedding")).alias("v")).persist()
    rows = []
    for _ in range(n_iter):
        asg = _nearest_cid(vecs, cent)
        # one aggregation tree for means AND counts: every pos of a cid has
        # the same row count (= n_assigned), so max(cnt) recovers it without
        # a second pass over the crossJoin+window assignment
        comp = asg.select("cid", F.posexplode("v").alias("pos", "x"))
        rows = (
            comp.groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"), F.count("*").alias("cnt"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda t: t["m"],
                ).alias("cv"),
                F.max("cnt").alias("n_assigned"),
            )
            .collect()
        )
        cent = spark.createDataFrame(
            [(r["cid"], r["cv"]) for r in rows], "cid int, cv array<double>"
        )
    vecs.unpersist()
    return spark.createDataFrame(
        [(r["cid"], r["cv"], r["n_assigned"]) for r in rows],
        "cid int, cv array<double>, n_assigned long",
    )


def ann_topk_ivf(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    n_probe: int = N_PROBE,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-bucketed ANN (the scale path alongside the LSH variant): assign
    every vector to its nearest coarse centroid, probe each query's
    ``n_probe`` nearest cells, exact cosine top-k among those candidates
    only: (query_id, vec_id, rank). Cost Q x (N * n_probe / n_centroids)
    instead of Q x N. Pass ``centroids`` (cid, cv) to serve against a
    :func:`kmeans_fit`-trained quantizer instead of the fixed sample."""
    cent = (
        centroids.select("cid", "cv") if centroids is not None else ivf_centroids(emb)
    )
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


def embedding_neardup_clusters(
    emb: DataFrame,
    threshold: float = 0.999,
    n_planes: int = N_PLANES,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """Embedding near-dup canonicalization: close the verified cosine pair
    graph of :func:`embedding_near_dups` into connected components (same
    hash-min label propagation as text near-dups, dedup.connected_components)
    and tag every vector with its component's minimum id —
    (vec_id, canonical_id, cluster_size), singletons keep themselves.
    'Keep one vector per cluster' is then the filter vec_id = canonical_id."""
    from .dedup import connected_components

    pairs = embedding_near_dups(emb, threshold, n_planes, n_bands).select("a", "b")
    ids = emb.select(F.col("vec_id").alias("id")).distinct()
    labels = connected_components(ids, pairs)
    sizes = labels.groupBy("canonical_id").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "canonical_id").select(
        F.col("id").alias("vec_id"), "canonical_id", "cluster_size"
    )
