"""Streaming ingest into the manifest table layer: append_rows routing,
exactly-once replay, snapshot immutability across appends, and foreachBatch
end-to-end parity with the batch enrichment."""

import os

import pytest
from pyspark.sql import functions as F

from open_buildings_spark.operators import enrich
from open_buildings_spark.table import iceberg_lite as tbl


@pytest.fixture()
def geo(docs):
    return enrich.add_geo_columns(docs, drop_nongeo=True)


def test_append_routes_existing_and_new_cells(spark, geo, tmp_path):
    root = str(tmp_path / "t")
    half_a = geo.filter(F.hash("doc_id") % 2 == 0)
    half_b = geo.filter(F.hash("doc_id") % 2 != 0)
    m1 = tbl.write_partitioned(half_a, root, max_per_file=2000)
    n_a = half_a.count()
    cells_before = {p["cell"] for p in m1["partitions"]}

    m2 = tbl.append_rows(half_b, root, batch_id=1)
    total = tbl.read_table(spark, root).count()
    assert total == geo.count()
    # late rows landing in committed cells were APPENDED, not dropped
    # (write_partitioned would have skipped those cells entirely)
    assert m2["metrics"]["rows_written"] == geo.count()
    # every appended row is routed to exactly one cell: per-cell n_rows sums
    assert sum(p["n_rows"] for p in m2["partitions"]) == geo.count()
    # new-geography cells (if any) are z12 leaves, disjoint from old leaves
    new_cells = {p["cell"] for p in m2["partitions"]} - cells_before
    for c in new_cells:
        assert len(c) == 12
        assert not any(c.startswith(o) or o.startswith(c) for o in cells_before)

    # snapshot immutability: the pre-append snapshot still reads its rows
    assert tbl.read_table(spark, root, snapshot_id=m1["snapshot_id"]).count() == n_a


def test_append_replay_is_idempotent(spark, geo, tmp_path):
    root = str(tmp_path / "t")
    tbl.write_partitioned(geo.limit(1000), root, max_per_file=2000)
    extra = geo.limit(1500).subtract(geo.limit(1000))
    m1 = tbl.append_rows(extra, root, batch_id=7)
    n1 = tbl.read_table(spark, root).count()
    # replay of the same micro-batch (crash between table commit and
    # checkpoint ack) must be a no-op
    m2 = tbl.append_rows(extra, root, batch_id=7)
    assert m2["snapshot_id"] == m1["snapshot_id"]
    assert tbl.read_table(spark, root).count() == n1
    # the next batch id goes through
    m3 = tbl.append_rows(extra.limit(10), root, batch_id=8)
    assert m3["snapshot_id"] == m1["snapshot_id"] + 1


def test_append_rejects_unknown_columns(geo, tmp_path):
    root = str(tmp_path / "t")
    tbl.write_partitioned(geo.limit(100), root, max_per_file=2000)
    with pytest.raises(ValueError, match="not in table schema"):
        tbl.append_rows(geo.limit(10).withColumn("bogus", F.lit(1)), root)


def test_append_updates_anchor_offset_metric(spark, geo, tmp_path):
    root = str(tmp_path / "t")
    m1 = tbl.write_partitioned(geo.limit(500), root, max_per_file=2000)
    if "max_anchor_offset_m" not in m1["metrics"]:
        pytest.skip("table lacks kNN metric columns")
    m2 = tbl.append_rows(geo.limit(2000).subtract(geo.limit(500)), root, batch_id=1)
    assert m2["metrics"]["max_anchor_offset_m"] >= m1["metrics"]["max_anchor_offset_m"]


def test_ingest_to_table_matches_batch(spark, docs, geo, tmp_path):
    from open_buildings_spark.streaming import geo as geo_stream

    docs_dir = str(tmp_path / "docs")
    docs.repartition(6).write.parquet(docs_dir)
    root = str(tmp_path / "table")
    q = geo_stream.ingest_to_table(
        spark, docs_dir, root, str(tmp_path / "ckpt"),
        max_per_file=5000, max_files_per_trigger=2,
    )
    q.awaitTermination()
    m = tbl.current_manifest(root)
    # several micro-batches ran: bootstrap + >=1 append
    assert m["metrics"].get("appended_batches", 0) >= 1
    got = {
        (r["doc_id"], r["quadkey"])
        for r in tbl.read_table(spark, root).select("doc_id", "quadkey").collect()
    }
    expect = {
        (r["doc_id"], r["quadkey"])
        for r in geo.select("doc_id", "quadkey").collect()
    }
    assert got == expect
    # restart with the same checkpoint: no new data -> no duplicate rows
    q2 = geo_stream.ingest_to_table(
        spark, docs_dir, root, str(tmp_path / "ckpt"),
        max_per_file=5000, max_files_per_trigger=2,
    )
    q2.awaitTermination()
    assert tbl.read_table(spark, root).count() == len(expect)


def test_ingest_to_table_keyed(spark, docs, geo, tmp_path):
    """Streaming ingest INTO a key-partitioned table: the bootstrap builds
    with keys, every later micro-batch routes through the keyed dirs, and
    the final state matches the batch enrichment with its key column."""
    from open_buildings_spark.streaming import geo as geo_stream

    docs_dir = str(tmp_path / "docs")
    docs.repartition(6).write.parquet(docs_dir)
    root = str(tmp_path / "ktable")

    def add_key(df):
        return df.withColumn(
            "ckey", F.concat(F.lit("0"), F.substring("quadkey", 4, 1))
        )

    q = geo_stream.ingest_to_table(
        spark, docs_dir, root, str(tmp_path / "kckpt"),
        max_per_file=5000, max_files_per_trigger=2,
        keys=["ckey"], transform=add_key,
    )
    q.awaitTermination()
    m = tbl.current_manifest(root)
    assert m["keys"] == ["ckey"]
    assert m["metrics"].get("appended_batches", 0) >= 1
    back = tbl.read_table(spark, root)
    expect = add_key(geo)
    assert back.count() == expect.count()
    got = {
        (r["doc_id"], r["ckey"])
        for r in back.select("doc_id", "ckey").collect()
    }
    want = {
        (r["doc_id"], r["ckey"])
        for r in expect.select("doc_id", "ckey").collect()
    }
    assert got == want


def test_ingest_stream_to_s2_table(spark, docs, geo, tmp_path):
    """Streaming ingest into an S2-layout table: provider metrics stamp at
    bootstrap and SURVIVE appends, the ingested rows equal a batch-built
    S2 table's, and the cover-pruned window read serves the live table."""
    from open_buildings_spark import datagen
    from open_buildings_spark.table import s2table as s2t

    docs_dir = str(tmp_path / "docs")
    docs.repartition(6).write.parquet(docs_dir)
    root = str(tmp_path / "s2table")
    q = s2t.ingest_stream_to_s2_table(
        spark, docs_dir, root, str(tmp_path / "ckpt"),
        level=12, max_per_file=5000, max_files_per_trigger=2,
    )
    q.awaitTermination()
    m = tbl.current_manifest(root)
    assert m["metrics"].get("appended_batches", 0) >= 1  # multi-batch run
    assert s2t.table_key_level(root) == 12  # provider metrics survived
    got = {
        (r["doc_id"], r["quadkey"])
        for r in tbl.read_table(spark, root).select("doc_id", "quadkey").collect()
    }
    batch_root = str(tmp_path / "s2batch")
    s2t.write_s2_table(
        geo.select("doc_id", "lon", "lat"), batch_root, max_per_file=5000,
        level=12,
    )
    expect = {
        (r["doc_id"], r["quadkey"])
        for r in tbl.read_table(spark, batch_root).select("doc_id", "quadkey").collect()
    }
    assert got == expect
    w, s, e, n = datagen.aoi_bounds(datagen.city_aoi())
    assert s2t.window_read(spark, root, w, s, e, n, cover_level=10).count() == (
        s2t.window_read(spark, batch_root, w, s, e, n, cover_level=10).count()
    )
