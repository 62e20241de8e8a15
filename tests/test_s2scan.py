"""S2-ordered layout + range-pruned bbox scan (operators/s2scan.py)."""

from __future__ import annotations

import contextlib
import io
import json
import os
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from open_buildings_spark.geo import s2
from open_buildings_spark.operators import s2scan


def test_merge_ranges_coalesces_and_caps():
    # a contiguous cover collapses to few ranges; never across the sign flip
    cover = s2.cover_bbox(12.0, 41.5, 13.0, 42.5, 8)
    ranges = s2.merge_ranges(cover)
    assert 1 <= len(ranges) <= len(cover)
    for lo, hi in ranges:
        assert lo <= hi and (lo < 0) == (hi < 0)
    # every cover cell's full leaf range stays inside some merged range
    clo, chi = s2.cell_range(np.array(cover))
    for a, b in zip(clo.tolist(), chi.tolist()):
        assert any(lo <= a and b <= hi for lo, hi in ranges)
    # capping closes gaps but keeps coverage (superset)
    capped = s2.merge_ranges(cover, max_ranges=2)
    assert len(capped) <= max(2, len(ranges))
    for a, b in zip(clo.tolist(), chi.tolist()):
        assert any(lo <= a and b <= hi for lo, hi in capped)


def test_merge_ranges_never_spans_sign_flip():
    # one cell at the end of face 3 (positive) and one at the start of
    # face 4 (negative): uint-adjacent, must NOT merge
    f3 = s2.cell_at_level(
        s2.leaf_from_face_ij(
            np.array([3]), np.array([(1 << 30) - 1]), np.array([(1 << 30) - 1])
        ),
        2,
    )
    f4 = s2.cell_at_level(
        s2.leaf_from_face_ij(np.array([4]), np.array([0]), np.array([0])), 2
    )
    # only adjacent if the face-3 cell's range_max + 1 == face-4 range_min
    # in uint space; merge_ranges must keep them apart either way
    ranges = s2.merge_ranges(np.array([int(f3[0]), int(f4[0])]), max_ranges=1)
    assert len(ranges) == 2
    assert ranges[0][1] >= 0 > ranges[1][0]


@pytest.fixture(scope="module")
def layout(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("s2layout") / "docs")
    rng = np.random.default_rng(41)
    n = 4_000
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(n)],
            "lon": rng.uniform(-179, 179, n),
            "lat": rng.uniform(-85, 85, n),
        }
    )
    # cluster half the points around a city so the window test prunes
    pdf.loc[: n // 2, "lon"] = rng.uniform(12.0, 13.0, n // 2 + 1)
    pdf.loc[: n // 2, "lat"] = rng.uniform(41.5, 42.5, n // 2 + 1)
    df = spark.createDataFrame(pdf)
    manifest = s2scan.write_s2_layout(df, path, num_files=8)
    return path, pdf, manifest


def test_layout_manifest_disjoint_sorted(layout):
    path, pdf, manifest = layout
    files = manifest["files"]
    assert len(files) == 8
    assert sum(f["rows"] for f in files) == len(pdf)
    # files own disjoint id intervals (range partitioning), in uint order
    ivals = sorted(
        ((f["lo"], f["hi"]) for f in files),
        key=lambda t: np.int64(t[0]).view(np.uint64) if t[0] is not None else 0,
    )
    for (l0, h0), (l1, h1) in zip(ivals, ivals[1:]):
        assert np.int64(h0).view(np.uint64) < np.int64(l1).view(np.uint64)


def test_bbox_scan_exact_and_pruned(layout, spark):
    path, pdf, manifest = layout
    w, s, e, n = 12.2, 41.7, 12.8, 42.3
    got = s2scan.s2_bbox_scan(spark, path, w, s, e, n)
    want = pdf[
        (pdf.lon >= w) & (pdf.lon <= e) & (pdf.lat >= s) & (pdf.lat <= n)
    ]
    assert want.shape[0] > 50  # the fixture clusters points here
    assert sorted(r["doc_id"] for r in got.select("doc_id").collect()) == sorted(
        want.doc_id
    )
    # the manifest pruned the file list before Spark saw it
    read = {os.path.basename(f) for f in got.inputFiles()}
    assert 0 < len(read) < len(manifest["files"])
    # and the range predicate reached the parquet scan
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "GreaterThanOrEqual(s2_cell" in m.group(1)


def test_bbox_scan_empty_window(layout, spark):
    path, pdf, _ = layout
    # mid-Pacific window chosen empty in the fixture's fixed seed
    got = s2scan.s2_bbox_scan(spark, path, -139.95, -34.98, -139.90, -34.93)
    assert got.columns == spark.read.parquet(path).columns
    assert got.count() == len(
        pdf[
            (pdf.lon >= -139.95)
            & (pdf.lon <= -139.90)
            & (pdf.lat >= -34.98)
            & (pdf.lat <= -34.93)
        ]
    )


def test_bbox_scan_world_window(layout, spark):
    path, pdf, _ = layout
    got = s2scan.s2_bbox_scan(spark, path, -180, -90, 180, 90)
    assert got.count() == len(pdf)


def test_custom_coordinate_columns_roundtrip(spark, tmp_path):
    """lon_col/lat_col must flow through the manifest to the read side —
    the refine must filter the SAME columns the layout was keyed on."""
    import pandas as pd

    path = str(tmp_path / "custom")
    pdf = pd.DataFrame(
        {
            "doc_id": ["a", "b", "c"],
            "cx": [12.5, 50.0, 12.6],
            "cy": [41.9, 10.0, 41.95],
        }
    )
    m = s2scan.write_s2_layout(
        spark.createDataFrame(pdf), path, num_files=2, lon_col="cx", lat_col="cy"
    )
    assert m["lon_col"] == "cx" and m["lat_col"] == "cy"
    got = s2scan.s2_bbox_scan(spark, path, 12.0, 41.0, 13.0, 42.0)
    assert sorted(r["doc_id"] for r in got.collect()) == ["a", "c"]
    # no leftover temp manifest from the atomic rename
    assert not [f for f in os.listdir(path) if f.endswith(".inprogress")]


def test_manifest_is_invisible_to_spark(layout, spark):
    path, pdf, _ = layout
    # the underscore-prefixed manifest must not break a plain read
    assert spark.read.parquet(path).count() == len(pdf)
    assert json.load(open(os.path.join(path, s2scan.MANIFEST_NAME)))["version"] == 1
