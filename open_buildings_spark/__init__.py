"""open_buildings_spark — a from-scratch PySpark-native spatial-join + tiling
engine with the query/data-processing capabilities of opengeos/open-buildings,
re-expressed Spark-first over an Iceberg-style table of interleaved
text+media documents."""

__version__ = "0.1.0"
