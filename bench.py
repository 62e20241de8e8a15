"""Benchmark harness: headline engine queries over the interleaved-docs table.

Prints ONE JSON line:
  {"metric": "joined-docs/sec (spatial join + tile assignment)",
   "value": <docs/sec>, "unit": "docs/sec", "queries": {...per-query sec...},
   "sf": ..., "cpus": N, "n_docs": ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS  (default 32).

The docs table is materialized to parquet once per sf (quadkey-sorted,
like the reference archive layout) so the timings measure the engine's
read+compute path, not the synthetic generator.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # default ×4 input replication: at sf0.1×1 (457k docs) several queries are
    # scheduling-overhead-dominated and the headline docs/sec under-reports
    # the engine; ×4 (1.8M docs) keeps stages long enough to measure compute
    replicas = int(os.environ.get("SPARK_GRAFT_REPLICAS", "4"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"ob-spark-bench-{cpus}")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    # Arrow stages run a JVM task thread + a Python worker (~2 runnable
    # threads per task). Budgeting 2 cpus/task keeps runnable threads ≈
    # cores — the same spark.executor.cores vs spark.task.cpus sizing a
    # real cluster uses for pandas-UDF-heavy jobs. Measured here: kNN
    # 15.5s → 7.2s at local[32]; JVM-only queries unaffected. Overridable
    # so the scaling harness can hold task sizing constant across N and 4N.
    task_cpus = os.environ.get("SPARK_GRAFT_TASK_CPUS") or ("2" if cpus >= 16 else "1")
    if task_cpus != "1":
        spark = spark.config("spark.task.cpus", task_cpus)
    spark = spark.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from open_buildings_spark import datagen, oracles
    from open_buildings_spark.operators import aoi as aoi_op
    from open_buildings_spark.operators import enrich, explode, knn, partition, tiles

    # cache keyed on DATAGEN_REV too: a derivation change must not serve
    # stale benchmark inputs
    docs_path = f"/tmp/ob_spark_bench/docs_rev{datagen.DATAGEN_REV}_sf{sf}_r{replicas}.parquet"
    # _SUCCESS, not the dir: a killed prior run leaves a partial cache
    if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
        docs = datagen.interleaved_docs(spark, sf_dir, replicas)
        # fixed 64-way layout: input parallelism must not depend on which
        # cluster size materialized the cache (identical input for scaling)
        docs.repartition(64).write.mode("overwrite").parquet(docs_path)

    docs = spark.read.parquet(docs_path)
    n_docs = docs.count()

    # warm the Python workers (a real cluster has long-lived executors;
    # first-task interpreter startup is not what we're measuring)
    docs.limit(50000).mapInArrow(lambda it: it, docs.schema).select(
        F.count("*")
    ).collect()

    loadavg_start = round(os.getloadavg()[0], 1)
    times: dict[str, float] = {}

    # best-of-N: the host carries bursty external load (loadavg swings
    # 0<->35 within minutes; see BENCH/BASELINE.md methodology) — a single
    # sample can read 2-3x slow. N=2 by default, 1 restores single-shot.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    # idle gate: before each sample, wait for external load to drain so the
    # recorded numbers track the code, not the neighbors. The wait budget
    # is SHARED across the whole run (env-capped), so driver wall-time
    # stays bounded even on a permanently-busy host.
    idle_thresh = float(os.environ.get("SPARK_GRAFT_IDLE_LOADAVG", "8"))
    idle_budget = [float(os.environ.get("SPARK_GRAFT_IDLE_WAIT_S", "240"))]

    def _idle_gate() -> None:
        while idle_budget[0] > 0 and os.getloadavg()[0] > idle_thresh:
            time.sleep(5)
            idle_budget[0] -= 5

    def timed(name: str, fn) -> None:
        samples = []
        for _ in range(max(reps, 1)):
            _idle_gate()
            t0 = time.time()
            fn()
            samples.append(time.time() - t0)
        if len(samples) >= 2 and max(samples) > 1.4 * min(samples):
            # high variance = a sample likely ate an external burst; one
            # extra gated sample (bounded escalation, <= reps+1 total)
            _idle_gate()
            t0 = time.time()
            fn()
            samples.append(time.time() - t0)
        times[name] = round(min(samples), 3)

    clist = [
        (iso, [([[w, s], [e, s], [e, n], [w, n], [w, s]], False)])
        for iso, (w, s, e, n) in datagen.countries()
    ]

    # headline: enrich -> country spatial join -> tile assignment, one pass
    def q_join_tiles():
        g = enrich.add_geo_columns(docs, countries=clist)
        g = enrich.extract_media_tiles(g)
        out = g.withColumn(
            "tile_match", F.col("quadkey") == F.col("media_qk")
        )
        out.select(
            F.count("*"),
            F.count("country_iso"),
            F.sum(F.when(F.col("tile_match"), 1).otherwise(0)),
        ).collect()

    def q_aoi():
        aoi_op.aoi_query(docs, datagen.city_aoi()).select(F.count("*")).collect()

    def q_s2_rollup():
        from open_buildings_spark.geo import s2 as s2mod

        g = enrich.add_s2_cell(
            enrich.add_geo_columns(docs, drop_nongeo=True), level=10
        )
        face, pos = s2mod.face_pos_cols(F.col("s2_cell"), 10)
        g.groupBy(face.alias("s2_face"), pos.alias("s2_pos")).agg(
            F.count(F.lit(1)).alias("n_docs")
        ).select(F.count(F.lit(1)), F.sum("n_docs")).collect()

    # AOI over the enriched, manifest-partitioned table: the serving path —
    # manifest file pruning + pushed StartsWith + refine on survivors only
    table_root = f"/tmp/ob_spark_bench/table_rev{datagen.DATAGEN_REV}_sf{sf}_r{replicas}"
    def _ensure_table():
        from open_buildings_spark.table import iceberg_lite as tbl

        m = tbl.current_manifest(table_root)
        if m is not None and "max_anchor_offset_m" not in m.get("metrics", {}):
            # stale cache from a build predating the kNN exactness metric:
            # rebuild so serving paths read the stored bound instead of
            # paying an extra corpus aggregate per call
            tbl.drop_table(table_root)
            m = None
        if m is None:
            # keep_bbox: the stored kNN exactness metric is then the TIGHT
            # max dist(bbox midpoint, centroid) instead of the conservative
            # tile-diagonal bound — tighter margin, smaller kNN covers
            g = enrich.add_geo_columns(
                docs, drop_nongeo=True, keep_bbox=True, countries=clist
            )
            tbl.write_partitioned(g, table_root, max_per_file=200_000)

    def q_aoi_table():
        from open_buildings_spark.geo.mercator import geojson_to_quadkey
        from open_buildings_spark.table import iceberg_lite as tbl

        aoi = datagen.city_aoi()
        t = tbl.read_table(spark, table_root, quadkey_prefix=geojson_to_quadkey(aoi))
        aoi_op.aoi_query(t, aoi).select(F.count("*")).collect()

    # city window over the S2-ordered layout: manifest file prune ->
    # pushed OR-of-BETWEEN (row-group pruning) -> native lon/lat refine
    s2_root = f"/tmp/ob_spark_bench/s2layout_rev{datagen.DATAGEN_REV}_sf{sf}_r{replicas}"
    def _ensure_s2_layout():
        import os

        from open_buildings_spark.operators import s2scan

        if not os.path.exists(os.path.join(s2_root, s2scan.MANIFEST_NAME)):
            g = enrich.add_geo_columns(docs, drop_nongeo=True)
            s2scan.write_s2_layout(g, s2_root, num_files=64)

    def q_s2_scan():
        from open_buildings_spark.operators import s2scan

        w, s, e, n = datagen.aoi_bounds(datagen.city_aoi())
        s2scan.s2_bbox_scan(spark, s2_root, w, s, e, n, cover_level=10).select(
            F.count("*")
        ).collect()

    s2tbl_root = (
        f"/tmp/ob_spark_bench/s2table_rev{datagen.DATAGEN_REV}_sf{sf}_r{replicas}"
    )

    def _ensure_s2_table():
        from open_buildings_spark.table import iceberg_lite as tbl
        from open_buildings_spark.table import s2table as s2t

        if tbl.current_manifest(s2tbl_root) is None:
            g = enrich.add_geo_columns(docs, drop_nongeo=True).select(
                "doc_id", "lon", "lat"
            )
            s2t.write_s2_table(g, s2tbl_root, max_per_file=50_000)

    def q_s2_window():
        # table-LAYER S2 serve (manifest cell prune + pushed startswith
        # cover + native refine) — the snapshot/MERGE-capable sibling of
        # q_s2_scan's sidecar layout
        from open_buildings_spark.table import s2table as s2t

        w, s, e, n = datagen.aoi_bounds(datagen.city_aoi())
        s2t.window_read(spark, s2tbl_root, w, s, e, n, cover_level=10).select(
            F.count("*")
        ).collect()

    def q_partition_plan():
        g = enrich.add_geo_columns(docs, drop_nongeo=True)
        partition.partition_plan(g, 10000).select(F.count("*")).collect()

    def q_knn():
        # serving path: kNN over the STORED enriched table (column-pruned
        # parquet scan of 4 columns) — re-enriching raw docs inside the
        # timed window measured the WKT parse, not the lookup
        from open_buildings_spark.table import iceberg_lite as tbl

        t = tbl.read_table(spark, table_root)
        b = t.select("doc_id", "quadkey", "lon", "lat")
        knn.knn(spark, b, oracles.knn_queries(), k=5).select(F.count("*")).collect()

    def q_explode():
        explode.explode_multipolygons(docs).select(F.count("*")).collect()

    # reference-comparable conversion benchmark: the reference converts a
    # 101 MB Google CSV (~multipolygon split + area + plus code) in 1.9-2.3s
    # single-node DuckDB (README.md:131-143). Same pipeline here over an
    # equivalent CSV materialized once.
    csv_path = (
        f"/tmp/ob_spark_bench/google_rev{datagen.DATAGEN_REV}_sf{sf}_r{replicas}.csv"
    )
    def _ensure_csv():
        # marker file: a killed prior run leaves a partial csv
        if not os.path.exists(csv_path + ".done"):
            from open_buildings_spark import datagen as dg

            b = dg.derive_buildings(spark, sf_dir, replicas).filter(
                F.col("wkt").isNotNull()
            )
            (
                b.select(
                    F.col("lat").alias("latitude"),
                    F.col("lon").alias("longitude"),
                    (F.col("r") * F.col("r") * 4).alias("area_in_meters"),
                    F.col("conf").alias("confidence"),
                    F.col("wkt").alias("geometry"),
                    F.lit("XXXXXXXX+XX").alias("full_plus_code"),
                )
                .coalesce(8)
                .write.mode("overwrite")
                .option("header", True)
                .csv(csv_path)
            )
            with open(csv_path + ".done", "w") as fh:
                fh.write("ok")

    def q_convert_csv():
        from open_buildings_spark.operators import convert

        out = convert.convert_google_csv(spark, csv_path)
        out.write.mode("overwrite").option("compression", "snappy").parquet(
            "/tmp/ob_spark_bench/convert_out.parquet"
        )

    def q_dedup_minhash():
        from open_buildings_spark.operators import dedup

        corpus = dedup.augment_corpus(spark, sf_dir)
        dedup.minhash_lsh_dedup(corpus).select(F.count("*")).collect()

    def q_cosine_topk():
        from open_buildings_spark.operators import similarity

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        q = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
        )
        similarity.cosine_topk(emb, q).select(F.count("*")).collect()

    def q_fgb_export():
        # reference headline: 101 MB Google CSV -> FlatGeobuf in ~2.0-2.3 s
        # single-node GDAL/DuckDB (README.md:131-143). Same semantics here:
        # distributed WKT->Feature encode + single-file assembly.
        from open_buildings_spark.operators import flatgeobuf
        from open_buildings_spark.table import iceberg_lite as tbl

        t = tbl.read_table(spark, table_root).select("doc_id", "wkt", "quadkey")
        flatgeobuf.write_fgb(t, "/tmp/ob_spark_bench/export.fgb")

    def q_windowed_agg():
        from open_buildings_spark.streaming import events as ev

        ev.windowed_counts_batch(spark, sf_dir).select(F.count("*")).collect()

    def q_gpkg_export():
        from open_buildings_spark.operators import gpkg
        from open_buildings_spark.table import iceberg_lite as tbl

        t = tbl.read_table(spark, table_root).select("doc_id", "wkt", "quadkey")
        gpkg.write_gpkg(t, "/tmp/ob_spark_bench/export.gpkg")

    def q_fgb_sharded():
        # the planet-scale export shape: one spec-complete Hilbert-indexed
        # .fgb per quadkey shard, written inside its own task — no driver
        # byte-funnel (contrast with fgb/gpkg/shp_export's single-file
        # assembly, which is inherent to those formats)
        import shutil

        from open_buildings_spark.operators import sharded
        from open_buildings_spark.table import iceberg_lite as tbl

        out = "/tmp/ob_spark_bench/export_shards"
        shutil.rmtree(out, ignore_errors=True)
        t = tbl.read_table(spark, table_root).select("doc_id", "wkt", "quadkey")
        sharded.sharded_export(t, out, fmt="fgb", level=6)

    def q_shp_export():
        from open_buildings_spark.operators import shapefile
        from open_buildings_spark.table import iceberg_lite as tbl

        t = tbl.read_table(spark, table_root).select("doc_id", "wkt", "quadkey")
        shapefile.write_shp(t, "/tmp/ob_spark_bench/export.shp")

    def q_knn_join():
        # distributed kNN JOIN (both sides tables): every place x its 3
        # nearest stored buildings within 3 km; anchor offset read from the
        # table manifest metric (written at enrich time) — no extra pass
        from open_buildings_spark.table import iceberg_lite as tbl

        stored = (tbl.current_manifest(table_root) or {}).get("metrics", {}).get(
            "max_anchor_offset_m"
        )
        t = tbl.read_table(spark, table_root).select("doc_id", "quadkey", "lon", "lat")
        p = datagen.places_df(spark, sf_dir).select("place_id", "lon", "lat")
        # a table written before the metric existed falls back to 'auto'
        # (one corpus aggregate) — defaulting to 0.0 would silently drop
        # the exactness margin
        knn.knn_join(
            p, t, k=3, radius_m=3000.0,
            anchor_offset_m=float(stored) if stored is not None else "auto",
        ).select(F.count("*")).collect()

    def q_big_aoi_join():
        # big-big spatial join: docs x a 1-in-20 subset of the big AOI table
        # (the full sf0.1 AOI side yields ~100M result rows — a data-volume
        # artifact of the dense synthetic fixture, not a harder plan; the
        # subset keeps the bench measuring the join machinery)
        from open_buildings_spark.operators import spatial_join

        aois = (
            datagen.big_aois_df(spark, sf_dir)
            .filter(F.col("aoi_id") % 20 == 0)
            .select("aoi_id", "wkt")
        )
        out = spatial_join.aoi_join_big(docs, aois, cover_level=12)
        out.select(F.count("*")).collect()

    all_queries = {
        "join_tiles": q_join_tiles,
        "aoi_query": q_aoi,
        "s2_rollup": q_s2_rollup,
        "s2_scan": q_s2_scan,
        "s2_window": q_s2_window,
        "aoi_table": q_aoi_table,
        "partition_plan": q_partition_plan,
        "knn": q_knn,
        "explode": q_explode,
        "dedup_minhash": q_dedup_minhash,
        "cosine_topk": q_cosine_topk,
        "windowed_agg": q_windowed_agg,
        "fgb_export": q_fgb_export,
        "fgb_sharded": q_fgb_sharded,
        "gpkg_export": q_gpkg_export,
        "shp_export": q_shp_export,
        "big_aoi_join": q_big_aoi_join,
        "knn_join": q_knn_join,
        "convert_csv": q_convert_csv,
    }
    selected = os.environ.get("SPARK_GRAFT_QUERIES", "")
    names = [n for n in selected.split(",") if n] or list(all_queries)
    unknown = [n for n in names if n not in all_queries]
    if unknown:
        raise SystemExit(
            f"unknown bench queries {unknown}; valid: {sorted(all_queries)}"
        )
    if {"aoi_table", "knn", "knn_join", "fgb_export", "gpkg_export", "shp_export"} & set(
        names
    ):
        _ensure_table()  # one-time build outside the timed window
    if "s2_scan" in names:
        _ensure_s2_layout()
    if "s2_window" in names:
        _ensure_s2_table()
    if "convert_csv" in names:
        _ensure_csv()
    for name in names:
        timed(name, all_queries[name])

    throughput = n_docs / times["join_tiles"] if times.get("join_tiles") else 0.0
    print(
        json.dumps(
            {
                "metric": "joined-docs/sec (spatial join + tile assignment)",
                "value": round(throughput, 1),
                "unit": "docs/sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
                "cpus": cpus,
                "n_docs": n_docs,
                "replicas": replicas,
                "loadavg_start": loadavg_start,
                "loadavg_end": round(os.getloadavg()[0], 1),
                "idle_waited_s": round(
                    float(os.environ.get("SPARK_GRAFT_IDLE_WAIT_S", "240"))
                    - idle_budget[0],
                    1,
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
