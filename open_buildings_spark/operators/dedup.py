"""Deduplication operators over the documents table — exact, MinHash+LSH,
SimHash, and n-gram Jaccard. First-class training-data-pipeline components
(not in the reference, which is geospatial-only; these follow the same
engine discipline: built-in JVM expressions everywhere, no Python UDFs).

Hash parity: every hash is ``md5`` over explicit strings, so the DuckDB
correctness oracle reproduces results bit-for-bit. The synthetic corpus has
no duplicates, so :func:`augment_corpus` injects deterministic exact and
near duplicates (same derivation on the oracle side).
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

NEAR_DUP_OFFSET = 1_000_000
EXACT_DUP_OFFSET = 2_000_000


def augment_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ near-dups (doc_id%3==0, text + ' the') ∪ exact dups
    (doc_id%7==0). Keep in sync with :func:`corpus_sql_cte`."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    near = (
        d.filter(F.col("doc_id") % 3 == 0)
        .withColumn("doc_id", F.col("doc_id") + NEAR_DUP_OFFSET)
        .withColumn("text", F.concat(F.col("text"), F.lit(" the")))
    )
    exact = d.filter(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + EXACT_DUP_OFFSET
    )
    return d.unionByName(near).unionByName(exact)


def corpus_sql_cte() -> str:
    return f"""
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {NEAR_DUP_OFFSET}, text || ' the' FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + {EXACT_DUP_OFFSET}, text FROM documents WHERE doc_id % 7 = 0
)
""".strip()


# ---------------------------------------------------------------------------
# exact dedup: hash-groupBy
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, fingerprint, canonical_id, group_size): canonical = min id per
    md5(text). One shuffle on the fingerprint; at scale this is the classic
    map-side-combinable hash-groupBy."""
    fp = F.md5(F.col(text_col))
    w = Window.partitionBy("fingerprint")
    return (
        df.withColumn("fingerprint", fp)
        .withColumn("canonical_id", F.min(id_col).over(w))
        .withColumn("group_size", F.count("*").over(w))
        .select(id_col, "fingerprint", "canonical_id", "group_size")
    )


# ---------------------------------------------------------------------------
# tokens / shingles (shared)
# ---------------------------------------------------------------------------


def tokens_col(text_col: str = "text"):
    """Whitespace tokens, empties dropped (same rule in the SQL oracle)."""
    return F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))


def word_shingles(df: DataFrame, n: int = 3, id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle)."""
    toks = tokens_col()
    # guard: Spark sequence(1, 0) DESCENDS ([1, 0]) instead of being empty
    sh = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(id_col, F.explode(sh).alias("shingle")).distinct()


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(shingles: DataFrame, k: int = 8, id_col: str = "doc_id") -> DataFrame:
    """k min-hashes per doc: mh_i = min(md5(i || '|' || shingle)). One
    groupBy with k partial-aggregable mins (map-side combine)."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"mh_{i}")
        for i in range(k)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sig: DataFrame, bands: int = 4, rows_per_band: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """Band-hash bucket join: docs sharing any band signature become a
    candidate pair (a < b). The self-join shuffles on the band key — the
    standard LSH equi-join; skewed buckets are handled by AQE skew-join."""
    # one struct array + explode (NOT a per-band union: each union branch
    # would re-evaluate the whole minhash aggregation upstream)
    band_structs = []
    for b in range(bands):
        parts = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_structs.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat(*parts)).alias("bkey"))
        )
    stacked = sig.select(
        F.col(id_col).alias("id"), F.explode(F.array(*band_structs)).alias("bb")
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))
    left = stacked.select(F.col("id").alias("a"), "bkey", "band")
    right = stacked.select(F.col("id").alias("b"), "bkey", "band")
    return (
        left.join(right, ["bkey", "band"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def pair_jaccard(shingles: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs: (a, b, jac)."""
    sizes = shingles.groupBy(id_col).agg(F.count("*").alias("n"))
    sa = shingles.select(F.col(id_col).alias("a"), "shingle")
    sb = shingles.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        pairs.join(sa, "a").join(sb, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    na = sizes.select(F.col(id_col).alias("a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "a")
        .join(nb, "b")
        .withColumn(
            "jac",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
        )
        .select("a", "b", "jac")
    )


def minhash_lsh_dedup(
    df: DataFrame, threshold: float = 0.35, k: int = 8, bands: int = 4
) -> DataFrame:
    """Full near-dup pipeline: shingle -> minhash -> LSH bucket join ->
    exact-Jaccard verification: (a, b, jac) with jac >= threshold."""
    sh = word_shingles(df)
    sig = minhash_signatures(sh, k)
    pairs = lsh_candidate_pairs(sig, bands, k // bands)
    return pair_jaccard(sh, pairs).filter(F.col("jac") >= threshold)


# ---------------------------------------------------------------------------
# near-dup cluster canonicalization (connected components over the pair graph)
# ---------------------------------------------------------------------------


def connected_components(ids: DataFrame, pairs: DataFrame) -> DataFrame:
    """(id, canonical_id): the minimum node id reachable from each node in
    the undirected pair graph; nodes absent from ``pairs`` keep themselves.

    Pregel-style hash-min label propagation: each round joins labels to the
    symmetric edge list, takes the per-node min over neighbor labels, and
    stops when no label shrinks — O(component diameter) rounds of two
    bounded shuffles (labels ~ |V|, edges ~ 2|E|), with per-round persist so
    lineage never grows. Near-dup graphs are shallow (dup clusters are
    near-cliques: diameter 2-3); for adversarially deep graphs swap in the
    large-star/small-star variant — same join shapes, fewer rounds.

    ``ids``: one column ``id`` (all nodes, so singletons appear).
    ``pairs``: columns ``a``, ``b``.
    """
    edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
        .persist()
    )
    labels = ids.select("id", F.col("id").alias("canonical_id")).persist()
    labels.count()  # materialize before iterating
    to_free = []
    while True:
        prop = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("canonical_id").alias("nbr_min"))
        )
        joined = labels.join(prop, labels["id"] == prop["src"], "left").persist()
        changed = joined.filter(F.col("nbr_min") < F.col("canonical_id")).count()
        if changed == 0:
            joined.unpersist()
            break
        new_labels = joined.select(
            "id",
            # least() skips nulls: nodes with no (improving) neighbor keep
            F.least("canonical_id", "nbr_min").alias("canonical_id"),
        ).persist()
        new_labels.count()
        joined.unpersist()
        to_free.append(labels)
        labels = new_labels
    edges.unpersist()
    for old in to_free:
        old.unpersist()
    # hand back an UNCACHED result with truncated lineage: localCheckpoint
    # materializes the final labels (eager) so the iterative join chain is
    # cut, then the persisted working copy is released — without this every
    # call leaked one cached label table into executor storage for the
    # session lifetime
    out = labels.localCheckpoint(eager=True)
    labels.unpersist()
    return out


def neardup_clusters(
    df: DataFrame,
    threshold: float = 0.35,
    k: int = 8,
    bands: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus -> (doc_id, canonical_id, cluster_size): the near-dup analogue
    of :func:`exact_dedup`'s canonical groups — LSH pairs (verified by exact
    Jaccard >= threshold) are closed into connected components, each doc is
    tagged with its component's minimum id, and singletons keep themselves
    with cluster_size 1. 'Keep one doc per cluster' is then a filter on
    doc_id = canonical_id."""
    if id_col != "doc_id":
        # the minhash/shingle pipeline underneath keys on 'doc_id'
        if "doc_id" in df.columns:
            df = df.drop("doc_id")
        df = df.withColumnRenamed(id_col, "doc_id")
    pairs = minhash_lsh_dedup(df, threshold, k, bands).select("a", "b")
    ids = df.select(F.col("doc_id").alias("id")).distinct()
    labels = connected_components(ids, pairs)
    sizes = labels.groupBy("canonical_id").agg(
        F.count("*").alias("cluster_size")
    )
    return labels.join(sizes, "canonical_id").select(
        F.col("id").alias(id_col), "canonical_id", "cluster_size"
    )


def dedup_apply(
    df: DataFrame,
    threshold: float = 0.35,
    k: int = 8,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """End-to-end corpus dedup: exact stage then near-dup stage, emitting the
    KEPT corpus (one doc per duplicate group) — the materialization step a
    training-data pipeline actually ships, not just the pair/cluster reports.

    Stage 1 (exact): md5-fingerprint groupBy; keep the min-id doc per
    distinct text. Stage 2 (near): :func:`neardup_clusters` over the
    exact-kept survivors only (the expensive LSH pipeline never sees exact
    copies — at web scale exact dups are the bulk, so pruning them first
    shrinks the shingle explode by that factor); keep the min-id doc per
    connected near-dup cluster.

    Output: (id, fingerprint, exact_group_size, near_cluster_size) for each
    kept doc — group sizes carry the dedup provenance (how many docs this
    one stands for). Join back to the corpus on id for the text.
    """
    if text_col != "text":
        # the shingle pipeline underneath (tokens_col) reads 'text'
        if "text" in df.columns:
            df = df.drop("text")
        df = df.withColumnRenamed(text_col, "text")
    ex = exact_dedup(df, "text", id_col)
    kept_exact = df.join(
        ex.filter(F.col(id_col) == F.col("canonical_id")).select(
            id_col,
            "fingerprint",
            F.col("group_size").alias("exact_group_size"),
        ),
        id_col,
    )
    clusters = neardup_clusters(kept_exact, threshold, k, bands, id_col)
    kept = kept_exact.join(
        clusters.filter(F.col(id_col) == F.col("canonical_id")).select(
            id_col, F.col("cluster_size").alias("near_cluster_size")
        ),
        id_col,
    )
    return kept.select(
        id_col, "fingerprint", "exact_group_size", "near_cluster_size"
    )


# ---------------------------------------------------------------------------
# exact-substring duplication (rolling window fingerprints)
# ---------------------------------------------------------------------------

DUP_SPAN_WINDOW = 8


def dup_span_stats(
    df: DataFrame, window: int = DUP_SPAN_WINDOW, id_col: str = "doc_id"
) -> DataFrame:
    """Exact-substring duplication signal: the shuffle-groupBy form of the
    suffix-array exact-substring dedup used on LLM training corpora (Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models Better" —
    public method, no code consulted). A doc sharing any ``window``-token
    span verbatim with ANOTHER doc has that span flagged; the per-doc
    output (doc_id, n_windows, dup_windows, dup_frac) is the standard
    filter signal ("drop docs with dup_frac > X" / "cut the spans").

    Shape: every W-token window is fingerprinted (md5 of the space-joined
    window — windows never shuffle as text, only 32-byte hashes); a window
    is duplicated iff its fingerprint occurs in >= 2 DISTINCT docs, decided
    by the partial-aggregable ``min(doc) != max(doc)`` trick (no
    countDistinct shuffle). At 10^12 docs this is two map-side-combinable
    groupBys plus one hash join on the fingerprint — the same scale shape
    as MinHash banding; a suffix array, by contrast, needs a global sort of
    every token position.

    Cross-doc only by design: a span repeated WITHIN one doc (min == max)
    is not flagged.
    """
    toks = tokens_col()
    wins = F.when(
        F.size(toks) >= window,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (window - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, window))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    w = df.select(id_col, F.explode(wins).alias("fp"))
    dup_fps = (
        w.groupBy("fp")
        .agg(F.min(id_col).alias("mn"), F.max(id_col).alias("mx"))
        .filter(F.col("mn") != F.col("mx"))
        .select("fp")
    )
    per_doc = w.groupBy(id_col).agg(F.count("*").alias("n_windows"))
    dup_per_doc = (
        w.join(dup_fps, "fp").groupBy(id_col).agg(F.count("*").alias("dup_windows"))
    )
    return (
        per_doc.join(dup_per_doc, id_col, "left")
        .na.fill({"dup_windows": 0})
        .withColumn(
            "dup_frac", F.col("dup_windows") / F.col("n_windows")
        )
        .select(id_col, "n_windows", "dup_windows", "dup_frac")
    )


def contamination_stats(
    corpus: DataFrame,
    benchmark: DataFrame,
    window: int = DUP_SPAN_WINDOW,
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination signal: per corpus doc, how many of its
    ``window``-token windows appear VERBATIM in any benchmark/eval doc —
    the n-gram-overlap decontamination check training pipelines run against
    held-out eval sets (public method, e.g. GPT-3/PaLM appendix
    decontamination; no code consulted). Filter `contam_windows > 0` (or a
    frac threshold) to quarantine.

    Shape: the benchmark side reduces to DISTINCT window fingerprints —
    typically tiny vs the corpus (eval sets are thousands of docs, the
    corpus billions) — then one semi-joinable hash join on the fingerprint
    against the corpus windows plus the same two map-side-combinable
    groupBys as :func:`dup_span_stats`. Fingerprints are md5 strings, so
    no text shuffles.

    Output: (id, n_windows, contam_windows) — docs with fewer than
    ``window`` tokens have no windows and report (0, 0).
    """
    toks = tokens_col()
    wins_arr = F.when(
        F.size(toks) >= window,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (window - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, window))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bfps = (
        benchmark.select(F.explode(wins_arr).alias("fp")).distinct()
    )
    cwins = corpus.select(id_col, F.explode(wins_arr).alias("fp"))
    per_doc = cwins.groupBy(id_col).agg(F.count("*").alias("n_windows"))
    contam = (
        # eval sets are small by definition — broadcasting their distinct
        # fingerprints keeps the 10^12-row corpus-windows side from ever
        # shuffling for this join
        cwins.join(F.broadcast(bfps), "fp")
        .groupBy(id_col)
        .agg(F.count("*").alias("contam_windows"))
    )
    return (
        corpus.select(id_col)
        .distinct()
        .join(per_doc, id_col, "left")
        .join(contam, id_col, "left")
        .na.fill({"n_windows": 0, "contam_windows": 0})
        .select(id_col, "n_windows", "contam_windows")
    )


def dup_span_cut(
    df: DataFrame, window: int = DUP_SPAN_WINDOW, id_col: str = "doc_id"
) -> DataFrame:
    """The CUT step of exact-substring dedup: rewrite each doc with every
    cross-doc-duplicated ``window``-token span removed (Lee et al. 2022 cut
    duplicated spans rather than dropping whole docs). A token survives iff
    no duplicated window covers its position.

    All built-in exprs: posexplode for positions, the same fingerprint
    groupBy as :func:`dup_span_stats` for the duplicated-window set, a
    sequence explode for covered positions, a left-anti join to drop them,
    and an order-preserving rebuild via array_sort over (pos, token)
    structs (collect_list order is partition-nondeterministic; the sort
    restores document order deterministically).

    Output: (id, clean_hash, n_tokens, n_removed) — clean_hash = md5 of the
    space-joined surviving tokens ('' when everything was cut), so the
    result is compact and engine-comparable. Short docs (< window tokens)
    have no windows and survive whole (modulo whitespace normalization:
    the rebuild joins tokens with single spaces).
    """
    toks = tokens_col()
    d = df.select(id_col, toks.alias("tk"))
    wins_arr = F.when(
        F.size("tk") >= window,
        F.transform(
            F.sequence(F.lit(1), F.size("tk") - (window - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("tk"), i, window))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    wins = d.select(id_col, F.posexplode(wins_arr).alias("p", "fp")).select(
        id_col, (F.col("p") + 1).alias("i"), "fp"
    )
    dup_fps = (
        wins.groupBy("fp")
        .agg(F.min(id_col).alias("mn"), F.max(id_col).alias("mx"))
        .filter(F.col("mn") != F.col("mx"))
        .select("fp")
    )
    covered = (
        wins.join(dup_fps, "fp")
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("i"), F.col("i") + (window - 1))
            ).alias("idx"),
        )
        .distinct()
    )
    tokx = d.select(id_col, F.posexplode("tk").alias("p", "tok")).select(
        id_col, (F.col("p") + 1).alias("idx"), "tok"
    )
    kept = tokx.join(covered, [id_col, "idx"], "left_anti")
    clean = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "tok"))),
                lambda x: x["tok"],
            ),
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    return (
        d.join(clean, id_col, "left")
        .select(
            id_col,
            F.md5(F.coalesce("clean_text", F.lit(""))).alias("clean_hash"),
            F.size("tk").cast("long").alias("n_tokens"),
            (F.size("tk") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(df: DataFrame, bits: int = 32, id_col: str = "doc_id") -> DataFrame:
    """32-bit SimHash over whitespace tokens (token weight = multiplicity):
    bit b of the hash is the sign of sum(+1/-1 over tokens' md5 bit b)."""
    toks = df.select(id_col, F.explode(tokens_col()).alias("tok"))
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    toks = toks.withColumn("h", h)
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b) % 2 == 1, 1).otherwise(-1)
        ).alias(f"s_{b}")
        for b in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*bit_aggs)
    sim = functools.reduce(
        lambda acc, b: acc
        + F.when(F.col(f"s_{b}") > 0, F.lit(2**b).cast("long")).otherwise(0),
        range(bits),
        F.lit(0).cast("long"),
    )
    return agg.select(id_col, sim.alias("simhash"))


# ---------------------------------------------------------------------------
# character n-gram Jaccard (direct near-dup scoring)
# ---------------------------------------------------------------------------


def char_ngrams(df: DataFrame, n: int = 5, id_col: str = "doc_id") -> DataFrame:
    """Distinct character n-grams per doc: (id, gram)."""
    grams = F.expr(
        f"CASE WHEN length(text) >= {n} THEN "
        f"transform(sequence(1, length(text) - {n - 1}), i -> substring(text, i, {n})) "
        f"ELSE array() END"
    )
    return df.select(id_col, F.explode(grams).alias("gram")).distinct()


def ngram_jaccard_pairs(df: DataFrame, pairs: DataFrame, n: int = 5) -> DataFrame:
    """Char n-gram Jaccard for given (a, b) pairs."""
    grams = char_ngrams(df, n)
    return pair_jaccard(grams.withColumnRenamed("gram", "shingle"), pairs)
