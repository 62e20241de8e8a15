"""Multimodal columns: media spans as opaque binary + typed metadata.

Image/audio libraries are not installed in this container, so the decode
step is STUBBED with a deterministic fake (md5-derived bytes) behind a
try-import — but the Spark-side plumbing is real and tested: schema,
Arrow batch shape, partitioning, and the mapInArrow signature are exactly
what a real tile decoder would use (swap `_fake_decode` for PIL/ffmpeg).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .enrich import extract_media_tiles

try:  # pragma: no cover - not installed in this environment
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except Exception:  # pragma: no cover
    HAVE_PIL = False

FEAT_DIM = 4


def _fake_decode(refs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic fake 'tile decode': bytes = md5(media_ref).

    NOT a hot-path kernel — stands in for an image decoder (inherently
    per-item native code). Returns (raw bytes (N,16), features (N, FEAT_DIM)).
    """
    raw = np.empty((len(refs), 16), dtype=np.uint8)
    for i, r in enumerate(refs):  # per-item like a real decoder would be
        raw[i] = np.frombuffer(hashlib.md5(r.encode()).digest(), dtype=np.uint8)
    feats = raw[:, :FEAT_DIM].astype(np.float32)
    return raw, feats


def decode_media(docs: DataFrame) -> DataFrame:
    """One row per doc with a media span: (doc_id, media_ref, media_qk,
    media_bytes, feat array<float>, width, height).

    Real pipeline shape: mapInArrow batches, binary column out, fixed-dim
    feature vector; decode itself is the stub above (or PIL when present).
    """
    if HAVE_PIL:  # pragma: no cover
        raise NotImplementedError(
            "real image decode wired but untested in this container; "
            "use the deterministic stub"
        )
    media = F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("media"))
    ref = F.when(F.size(media) > 0, F.element_at(media, 1)["media_ref"])
    df = (
        docs.withColumn("media_ref", ref)
        .filter(F.col("media_ref").isNotNull())
    )
    df = extract_media_tiles(df).select("doc_id", "media_ref", "media_qk")

    schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("media_ref", StringType()),
            StructField("media_qk", StringType()),
            StructField("media_bytes", BinaryType()),
            StructField("feat", ArrayType(FloatType())),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def decode_batches(batches):
        for rb in batches:
            refs = rb.column(1).to_pandas().to_numpy(dtype=object)
            raw, feats = _fake_decode(refs)
            n = len(refs)
            # stub metadata: tile decoders return fixed tile sizes
            width = np.full(n, 256, dtype=np.int32)
            height = np.full(n, 256, dtype=np.int32)
            # one tobytes() for the whole batch — calling it inside the
            # per-row comprehension re-copied the block once per row
            blk = raw.tobytes()
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(0),
                    rb.column(1),
                    rb.column(2),
                    pa.array(
                        [blk[i * 16 : (i + 1) * 16] for i in range(n)],
                        type=pa.binary(),
                    ),
                    pa.FixedSizeListArray.from_arrays(
                        pa.array(feats.ravel(), type=pa.float32()), FEAT_DIM
                    ).cast(pa.list_(pa.float32())),
                    pa.array(width, type=pa.int32()),
                    pa.array(height, type=pa.int32()),
                ],
                names=[f.name for f in schema.fields],
            )

    return df.mapInArrow(decode_batches, schema)


def media_feature_table(docs: DataFrame) -> DataFrame:
    """Oracle-checkable view of the decode output: md5-hex feature hash and
    the first two feature bytes as ints (native exprs, same values as the
    stub decoder)."""
    d = decode_media(docs)
    return d.select(
        "doc_id",
        "media_qk",
        F.md5(F.col("media_ref")).alias("feat_hash"),
        F.element_at(F.col("feat"), 1).cast("long").alias("feat0"),
        F.element_at(F.col("feat"), 2).cast("long").alias("feat1"),
        "width",
        "height",
    )


def resize_media(decoded: DataFrame, out_w: int = 64, out_h: int = 64) -> DataFrame:
    """Resize plumbing over a decoded-media table (doc_id, media_bytes,
    width, height, ...): mapInArrow batches, binary in -> binary out with
    new dims. The pixel resample itself is the stub (a real tile pipeline
    swaps in PIL.Image.resize); batch shape, schema, and pass-through of
    the other columns are the real thing.
    """
    in_names = decoded.columns
    bytes_idx = in_names.index("media_bytes")
    schema = StructType(
        [f for f in decoded.schema.fields if f.name not in ("width", "height")]
        + [StructField("width", IntegerType()), StructField("height", IntegerType())]
    )
    out_names = [f.name for f in schema.fields]
    keep_idx = [i for i, n in enumerate(in_names) if n not in ("width", "height")]

    def resize_batches(batches):
        for rb in batches:
            n = rb.num_rows
            blobs = rb.column(bytes_idx).to_pylist()
            # stub resample: deterministic re-hash standing in for the
            # per-item native resize; output length scales with out dims
            out_len = max(4, (out_w * out_h) // 1024)
            resized = [
                hashlib.md5(b + bytes([out_w % 256, out_h % 256])).digest()[:out_len]
                for b in blobs
            ]
            cols = [rb.column(i) for i in keep_idx]
            # replace media_bytes in place (same position among kept cols)
            mb_pos = out_names.index("media_bytes")
            cols[mb_pos] = pa.array(resized, type=pa.binary())
            cols += [
                pa.array(np.full(n, out_w, dtype=np.int32), type=pa.int32()),
                pa.array(np.full(n, out_h, dtype=np.int32), type=pa.int32()),
            ]
            yield pa.RecordBatch.from_arrays(cols, names=out_names)

    return decoded.mapInArrow(resize_batches, schema)


def sample_frames(docs: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing: treat each media span as a short clip whose
    frame count is derived deterministically from the ref (1..8); emit one
    row per sampled frame (doc_id, media_ref, frame_idx, frame_bytes) —
    the 1→N Arrow explode shape a real ffmpeg frame sampler produces.
    """
    media = F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("media"))
    ref = F.when(F.size(media) > 0, F.element_at(media, 1)["media_ref"])
    df = (
        docs.withColumn("media_ref", ref)
        .filter(F.col("media_ref").isNotNull())
        .select("doc_id", "media_ref")
    )
    schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("media_ref", StringType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_bytes", BinaryType()),
        ]
    )

    def frame_batches(batches):
        for rb in batches:
            doc_ids = rb.column(0).to_pylist()
            refs = rb.column(1).to_pylist()
            o_doc, o_ref, o_idx, o_bytes = [], [], [], []
            for d, r in zip(doc_ids, refs):
                h = hashlib.md5(r.encode()).digest()
                n_frames = (h[0] % 8) + 1
                for i in range(0, n_frames, every_n):
                    o_doc.append(d)
                    o_ref.append(r)
                    o_idx.append(i)
                    o_bytes.append(hashlib.md5(h + bytes([i])).digest())
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(o_doc, type=pa.string()),
                    pa.array(o_ref, type=pa.string()),
                    pa.array(o_idx, type=pa.int32()),
                    pa.array(o_bytes, type=pa.binary()),
                ],
                names=[f.name for f in schema.fields],
            )

    return df.mapInArrow(frame_batches, schema)
