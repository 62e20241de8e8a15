"""spark-submit job main: build the enriched table and run the flagship AOI
query — the north_rule's `spark-submit --py-files` ship path.

    python -c "from open_buildings_spark.session import package_zip; print(package_zip())"
    spark-submit --master local[8] \
        --py-files /tmp/ob_spark_pkg/open_buildings_spark.zip \
        scripts/run_pipeline.py /root/testdata/sf0.001 /tmp/pipeline_table

The package arrives via --py-files (no repo on PYTHONPATH needed).
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    table_root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pipeline_table"

    spark = SparkSession.builder.appName("ob-spark-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from open_buildings_spark import datagen
    from open_buildings_spark.operators import aoi as aoi_op
    from open_buildings_spark.operators import enrich
    from open_buildings_spark.table import iceberg_lite as tbl

    clist = [
        (iso, [([[w, s], [e, s], [e, n], [w, n], [w, s]], False)])
        for iso, (w, s, e, n) in datagen.countries()
    ]
    docs = datagen.interleaved_docs(spark, sf_dir)
    g = enrich.add_geo_columns(docs, drop_nongeo=True, countries=clist)
    m = tbl.write_partitioned(g, table_root, max_per_file=100_000)

    aoi = datagen.city_aoi()
    from open_buildings_spark.geo.mercator import geojson_to_quadkey

    t = tbl.read_table(spark, table_root, quadkey_prefix=geojson_to_quadkey(aoi))
    hits = aoi_op.aoi_query(t, aoi).count()
    print(
        json.dumps(
            {
                "snapshot": m["snapshot_id"],
                "partitions": len(m["partitions"]),
                "rows": m["metrics"]["rows_written"],
                "aoi_hits": hits,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
