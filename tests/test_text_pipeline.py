

def test_repetition_stats_semantics(spark):
    """Gopher repetition signals: 'a b a b a b' yields 5 bigrams over 2
    distinct values ('a b' x3, 'b a' x2), so dup_2gram_frac = 3/5 and the
    top 2-gram covers 3*2/6 tokens; a doc of unique words scores 0 on the
    dup fractions; newline-duplicated lines count; single-token docs emit
    zeros rather than dropping out."""
    from open_buildings_spark.operators import textstats

    rows = [
        (1, "a b a b a b"),           # bigrams: ab ba ab ba ab (5, 2 distinct)
        (2, "u v w x y z"),           # all unique
        (3, "line1\nline2\nline1"),   # duplicate line
        (4, "solo"),                  # 1 token: no bigram
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in textstats.repetition_stats(docs).collect()}
    r1 = out[1]
    assert r1["n_tokens"] == 6
    assert r1["dup_2gram_frac"] == round((5 - 2) / 5, 6)
    assert r1["dup_3gram_frac"] == round((4 - 2) / 4, 6)
    assert r1["top_2gram_frac"] == round(3 * 2 / 6, 6)  # 'a b' x3
    r2 = out[2]
    assert r2["dup_2gram_frac"] == 0.0 and r2["top_2gram_frac"] == round(2 / 6, 6)
    assert out[3]["dup_line_frac"] == round(1 / 3, 6)
    r4 = out[4]
    assert r4["dup_2gram_frac"] == 0.0 and r4["top_2gram_frac"] == 0.0


def test_pii_stats_detect_and_scrub(spark):
    """Counts per PII class and typed-mask scrubbing; clean text is
    untouched; overlapping classes never double-mask."""
    from open_buildings_spark.operators import textstats

    rows = [
        (1, "mail a.b@x.org and c@d.io ok"),
        (2, "call 555-010-4242 or 555-010-0000"),
        (3, "host 192.168.0.1 up"),
        (4, "nothing here"),
        (5, "u@v.com 555-010-1111 10.0.0.1"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in textstats.pii_stats(docs).collect()}
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ipv4"]) == (2, 0, 0)
    assert out[1]["clean_text"] == "mail [EMAIL] and [EMAIL] ok"
    assert out[2]["n_phone"] == 2
    assert out[2]["clean_text"] == "call [PHONE] or [PHONE]"
    assert out[3]["n_ipv4"] == 1 and "[IPV4]" in out[3]["clean_text"]
    assert out[4]["clean_text"] == "nothing here"
    assert out[5]["clean_text"] == "[EMAIL] [PHONE] [IPV4]"


def test_normalize_text_semantics(spark):
    from open_buildings_spark.operators import textstats

    docs = spark.createDataFrame(
        [(1, "  Hello\t\tWorld \r\n again  "), (2, "clean"), (3, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textstats.normalize_text(docs).collect()}
    assert out[1]["norm_text"] == "hello world again"
    assert out[1]["n_chars_removed"] == len("  Hello\t\tWorld \r\n again  ") - len(
        "hello world again"
    )
    assert out[2]["norm_text"] == "clean" and out[2]["n_chars_removed"] == 0
    assert out[3]["norm_text"] == ""


def test_chunk_documents_windows(spark):
    """Sliding windows: stride = max - overlap, consecutive chunks share
    `overlap` tokens, final chunk may be short, every token covered."""
    import pytest as _pytest

    from open_buildings_spark.operators import textstats

    words = [f"w{i}" for i in range(25)]
    docs = spark.createDataFrame(
        [(1, " ".join(words)), (2, "a b"), (3, "solo")],
        "doc_id long, text string",
    )
    out = textstats.chunk_documents(docs, max_tokens=10, overlap=2).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    # 25 tokens, stride 8 -> ceil(23/8) = 3 chunks
    assert [r["chunk_idx"] for r in c1] == [0, 1, 2]
    assert c1[0]["chunk_text"].split() == words[0:10]
    assert c1[1]["chunk_text"].split() == words[8:18]
    assert c1[2]["chunk_text"].split() == words[16:25]
    assert c1[2]["n_chunk_tokens"] == 9
    # union of chunks covers every token
    covered = set()
    for r in c1:
        covered.update(r["chunk_text"].split())
    assert covered == set(words)
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "a b"
    assert len(by_doc[3]) == 1
    with _pytest.raises(ValueError):
        textstats.chunk_documents(docs, max_tokens=10, overlap=10)


def test_pack_sequences_semantics(spark):
    """Concat-and-cut packing: global offsets follow doc_id order across
    bucket boundaries, sequence ranges tile the token stream exactly."""
    from open_buildings_spark.operators import textstats

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "d e"), (2, ""), (3, "f g h i j"), (70, "x y")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in textstats.pack_sequences(docs, seq_len=4, bucket=2).collect()
    }
    assert 2 not in out  # empty doc dropped
    assert (out[0]["tok_start"], out[0]["first_seq"], out[0]["last_seq"]) == (0, 0, 0)
    assert (out[1]["tok_start"], out[1]["n_seqs"]) == (3, 2)  # spans seqs 0-1
    assert (out[3]["tok_start"], out[3]["first_seq"], out[3]["last_seq"]) == (5, 1, 2)
    assert (out[70]["tok_start"], out[70]["first_seq"]) == (10, 2)
    # stream is gapless: each doc starts where the previous ended
    ordered = [out[k] for k in sorted(out)]
    for prev, cur in zip(ordered, ordered[1:]):
        assert cur["tok_start"] == prev["tok_start"] + prev["n_tokens"]


def test_pack_sequences_plan(spark):
    """The bucket-offsets side joins via BROADCAST (no full-data shuffle
    for the offset join) and no window runs over the unbucketed data."""
    from open_buildings_spark.operators import textstats

    docs = spark.createDataFrame(
        [(i, "tok " * (i % 5 + 1)) for i in range(200)],
        "doc_id long, text string",
    )
    plan = textstats.pack_sequences(docs, seq_len=8, bucket=16)._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" in plan or "broadcast" in plan.lower()


def test_pack_bucket_plan_thresholds():
    """Auto-sizing bounds the offsets frame; explicit buckets keep the
    broadcast hint only under the bound (the r5-verdict watch item: a
    10^12-doc corpus with the old fixed bucket=1024 default would have
    HINTED a ~10^9-row broadcast)."""
    import pytest as _pytest

    from open_buildings_spark.operators.textstats import _pack_bucket_plan

    b, bc = _pack_bucket_plan(10**12, "auto", 1_000_000)
    assert bc and 10**12 // b + 1 <= 1_000_001
    assert _pack_bucket_plan(500, "auto", 1_000_000) == (1, True)
    b, bc = _pack_bucket_plan(10**12, 1024, 1_000_000)
    assert b == 1024 and not bc
    b, bc = _pack_bucket_plan(10**6, 1024, 1_000_000)
    assert b == 1024 and bc
    with _pytest.raises(ValueError):
        _pack_bucket_plan(10, 0, 100)


def test_pack_sequences_bucket_invariant(spark):
    """tok_start/seq ranges are identical for any bucket choice (buckets
    partition the id order) — auto, explicit, and the gated no-broadcast
    path all emit the same rows."""
    from open_buildings_spark.operators import textstats

    docs = spark.createDataFrame(
        [(i * 37, "w " * (i % 7 + 1)) for i in range(60)],
        "doc_id long, text string",
    )

    def rows(**kw):
        return [
            tuple(r)
            for r in textstats.pack_sequences(docs, seq_len=5, **kw)
            .orderBy("doc_id")
            .collect()
        ]

    base = rows(bucket=1)
    assert rows(bucket="auto") == base
    assert rows(bucket=7) == base
    # explicit bucket past the bound: broadcast gate OFF, same rows
    assert rows(bucket=1, max_offset_rows=2) == base


def test_dsir_weights_prefer_target_like_docs(spark):
    """Docs sharing the target set's bigrams must score a HIGHER mean
    log-ratio than docs made of source-only bigrams; absent feature
    smoothing keeps out-of-domain docs finite; short docs are absent."""
    from pyspark.sql import functions as F

    from open_buildings_spark.operators import textstats

    target_text = "alpha beta gamma delta alpha beta"
    source_text = "xx yy zz ww xx yy zz"
    rows = [(i, target_text if i % 10 == 0 else source_text) for i in range(40)]
    rows.append((100, "alpha beta gamma"))   # target-like probe
    rows.append((101, "xx yy zz"))           # source-like probe
    rows.append((102, "single"))             # no bigram -> absent
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in textstats.dsir_weights(
            docs, docs.filter(F.col("doc_id") % 10 == 0)
        ).collect()
    }
    assert 102 not in out
    assert out[100]["avg_logratio_r6"] > out[101]["avg_logratio_r6"]
    assert out[100]["n_grams"] == 2 and out[101]["n_grams"] == 2


def test_mixture_sample_proportions_and_binding(spark):
    """The scarcest source (relative to its weight) binds the mix; other
    sources downsample to proportion; zero/absent weights drop; a missing
    weighted source empties the mix (n_total = 0); output is stable
    across repartitioning."""
    import pytest as _pytest

    from open_buildings_spark.operators import sampling

    rows = (
        [(i, "a") for i in range(100)]
        + [(100 + i, "b") for i in range(10)]
        + [(200 + i, "c") for i in range(50)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    # b is scarce: n_total = min(100/.5, 10/.25, 50/.25) = 40
    out = sampling.mixture_sample(
        docs, {"a": 0.5, "b": 0.25, "c": 0.25}
    ).collect()
    by_src: dict = {}
    for r in out:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    assert {s: len(v) for s, v in by_src.items()} == {"a": 20, "b": 10, "c": 10}
    # determinism under repartitioning
    out2 = sampling.mixture_sample(
        docs.repartition(7), {"a": 0.5, "b": 0.25, "c": 0.25}
    ).collect()
    assert {(r["doc_id"], r["mix_rank"]) for r in out2} == {
        (r["doc_id"], r["mix_rank"]) for r in out
    }
    # weighted-but-absent source binds the whole mix to zero
    assert (
        sampling.mixture_sample(docs, {"a": 0.5, "zz": 0.5}).count() == 0
    )
    with _pytest.raises(ValueError):
        sampling.mixture_sample(docs, {"a": -0.1})
    with _pytest.raises(ValueError):
        sampling.mixture_sample(docs, {"a": 0.0})


def test_leakage_safe_split_keeps_clusters_together(spark):
    """Every member of a duplicate cluster must land in ONE split; docs
    absent from the cluster table fall back to their own id (and then
    agree with plain hash_split)."""
    from pyspark.sql import functions as F

    from open_buildings_spark.operators import sampling

    docs = spark.createDataFrame(
        [(i,) for i in range(300)], "doc_id long"
    )
    # clusters: docs 0-99 pair up (i ~ i+100); 200-249 unclustered rows
    # missing from the table entirely
    clusters = spark.createDataFrame(
        [(i, i % 100) for i in range(200)]
        + [(i, i) for i in range(250, 300)],
        "doc_id long, canonical_id long",
    )
    out = sampling.leakage_safe_split(docs, clusters).collect()
    split_of = {r["doc_id"]: r["split"] for r in out}
    canon_of = {r["doc_id"]: r["canonical_id"] for r in out}
    for i in range(100):
        assert split_of[i] == split_of[i + 100]  # cluster stays together
        assert canon_of[i] == canon_of[i + 100] == i
    plain = {
        r["doc_id"]: r["split"]
        for r in sampling.hash_split(docs.filter(F.col("doc_id").between(200, 249))).collect()
    }
    for i in range(200, 250):  # fallback = own id = plain hash_split
        assert split_of[i] == plain[i] and canon_of[i] == i
    # the whole corpus is assigned
    assert len(out) == 300
