"""Sinks: GeoParquet (parquet + `geo` footer metadata) and GeoJSON.

Reference equivalents:
- S6 parquet sink with compression/row-group/quadkey clustering
  (open_buildings/overture/partition.py:149,182; google/process.py:166-169)
  -> the iceberg_lite writer (quadkey-sorted, snappy);
- S7 `gpq convert` subprocess rewriting parquet with GeoParquet metadata
  (overture/partition.py:33-52, google/process.py:171-189) -> in-process
  pyarrow footer rewrite, no subprocess;
- S9 GeoJSON export (download_buildings.py:304-311) -> feature-collection
  text assembly (fixture-scale outputs; not a hot path).
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GEOPARQUET_VERSION = "1.0.0"


def add_wkb_column(df: DataFrame, wkt_col: str = "wkt", out_col: str = "geometry") -> DataFrame:
    """WKT -> WKB binary column (the reference's storage encoding for the
    Overture path). Arrow-batched parse + serialize."""
    import pyarrow as pa
    from pyspark.sql.types import BinaryType, StructField, StructType

    from ..geo.wkt import parse_wkt_batch, wkb_from_batch

    schema = StructType(list(df.schema.fields) + [StructField(out_col, BinaryType())])
    idx = [f.name for f in df.schema.fields].index(wkt_col)
    names = [f.name for f in schema.fields]

    def conv(batches):
        for rb in batches:
            wkt = rb.column(idx).to_pandas()
            batch = parse_wkt_batch(wkt)
            wkb = wkb_from_batch(batch)
            yield pa.RecordBatch.from_arrays(
                list(rb.columns) + [pa.array(wkb, type=pa.binary())], names=names
            )

    return df.mapInArrow(conv, schema)


def geo_metadata(geometry_col: str = "geometry", bbox: list | None = None) -> dict:
    """GeoParquet 1.0 `geo` metadata dict (public spec)."""
    col = {
        "encoding": "WKB",
        "geometry_types": ["Polygon", "MultiPolygon"],
        "crs": None,  # per spec: null means OGC:CRS84 (lon/lat)
    }
    if bbox is not None:
        col["bbox"] = bbox
    return {
        "version": GEOPARQUET_VERSION,
        "primary_column": geometry_col,
        "columns": {geometry_col: col},
    }


def fix_geoparquet_metadata(path: str, geometry_col: str = "geometry") -> int:
    """Rewrite every parquet file under ``path`` with GeoParquet `geo`
    footer metadata — the reference's `gpq convert` step, in-process.
    Returns the number of files rewritten."""
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    meta_json = json.dumps(geo_metadata(geometry_col))
    n = 0
    for f in files:
        t = pq.read_table(f)
        if geometry_col not in t.column_names:
            continue
        existing = t.schema.metadata or {}
        new_meta = {**existing, b"geo": meta_json.encode()}
        pq.write_table(
            t.replace_schema_metadata(new_meta),
            f + ".tmp",
            compression="snappy",
            row_group_size=10_000,  # reference default (cli.py:258)
        )
        os.replace(f + ".tmp", f)
        # drop Hadoop's checksum sidecar — it no longer matches the
        # rewritten file and would fail subsequent reads
        crc = os.path.join(os.path.dirname(f), "." + os.path.basename(f) + ".crc")
        if os.path.exists(crc):
            os.remove(crc)
        n += 1
    return n


def write_geoparquet(
    df: DataFrame, path: str, wkt_col: str = "wkt", mode: str = "overwrite"
) -> int:
    """WKT df -> GeoParquet directory: WKB conversion + parquet write +
    footer metadata fixup. Returns files written."""
    out = add_wkb_column(df, wkt_col).drop(wkt_col)
    out.write.mode(mode).option("compression", "snappy").parquet(path)
    return fix_geoparquet_metadata(path)


def to_geojson_features(df: DataFrame, wkt_col: str = "wkt", limit_cols: list | None = None):
    """Collect rows as GeoJSON Feature dicts (driver-side; fixture-scale
    exports only — the reference's .json output path)."""
    from ..geo.wkt import parse_wkt_batch

    cols = limit_cols or [c for c in df.columns if c not in (wkt_col, "spans")]
    pdf = df.select(*cols, wkt_col).toPandas()
    batch = parse_wkt_batch(pdf[wkt_col])
    feats = []
    for i in range(len(pdf)):
        rings = [
            batch.ring(r).tolist()
            for r in range(batch.n_rings)
            if batch.ring_geom[r] == i
        ]
        gtype = "Polygon" if batch.gtype[i] == 3 else "MultiPolygon"
        coords = rings if gtype == "Polygon" else [[r] for r in rings]
        props = {c: (None if pd.isna(pdf[c].iloc[i]) else pdf[c].iloc[i]) for c in cols}
        props = {
            k: (v.item() if isinstance(v, np.generic) else v) for k, v in props.items()
        }
        feats.append(
            {
                "type": "Feature",
                "properties": props,
                "geometry": {"type": gtype, "coordinates": coords},
            }
        )
    return feats


def write_geojson(df: DataFrame, path: str, wkt_col: str = "wkt") -> int:
    feats = to_geojson_features(df, wkt_col)
    with open(path, "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)
    return len(feats)
