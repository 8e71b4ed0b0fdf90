"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media are opaque ``binary`` columns plus a typed metadata struct — the
standard large-scale layout (payload stays opaque to Catalyst; metadata is
columnar and prunable/filterable).  The real decoders (PIL / soundfile /
pyav) are NOT in this container, so the decode step is STUBBED: payloads are
deterministic ASCII bytes derived from the documents table, and the
"feature extraction" kernels compute real byte-level features over real
Arrow batches — the Spark-side plumbing (schema, partitioning, mapInPandas
signature, batch shape) is production-shaped and oracle-checked; only the
codec call is fake.

Scale notes: the media table at 100 TB is the fat table — all three kernels
are narrow ``mapInPandas`` (zero shuffle), metadata predicates (kind/width/
duration) are plain parquet filters pushed into the scan, and frame
sampling's explode happens inside the Arrow batch so the shuffle-free plan
survives arbitrary payload sizes (bound per-task memory with
``spark.sql.execution.arrow.maxRecordsPerBatch``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F

from .relational import t

__all__ = ["media_table", "media_features", "frame_sample", "resize_plan",
           "decode_image", "QUERIES", "ORACLES"]

FRAME_BYTES = 32          # one fake "frame" = 32 payload bytes
FRAME_STRIDE = 2          # sample every 2nd frame
N_MD5_BLOCKS = 8          # payload = 8 chained md5 hex digests = 256 bytes


def decode_image(payload: bytes):
    """Decode an image payload to an RGB ndarray (H, W, 3) — feature-gated:
    dispatches to PIL the moment a codec is importable, raises
    NotImplementedError otherwise (this sandbox has no imaging library).
    Everything downstream treats the decode output as an opaque ndarray,
    so installing Pillow makes the operator production-real with no other
    code change; tests cover both the present and absent paths
    (tests/test_multimodal.py)."""
    try:
        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "image codec not available in this environment; "
            "media_features uses the deterministic byte-level fake instead"
        ) from exc
    import io

    import numpy as np
    with Image.open(io.BytesIO(payload)) as im:
        return np.asarray(im.convert("RGB"))


# --- the media table (deterministic synthesis, Catalyst-native) --------------

def media_table(spark, sf_dir):
    """documents -> media rows (media_id, kind, payload:binary, typed meta).

    Payload = 8 chained md5 hex digests of the text (256 ASCII bytes) —
    deterministic, engine-portable, and byte-addressable so the kernels below
    have an exact SQL oracle.  Metadata is derived arithmetic (stands in for
    codec-header fields).
    """
    d = t(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    blocks = [F.md5(F.concat(F.col("text"), F.lit(str(i))))
              for i in range(N_MD5_BLOCKS)]
    kind = (F.when(F.col("doc_id") % 3 == 0, "image")
            .when(F.col("doc_id") % 3 == 1, "audio")
            .otherwise("video"))
    return d.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.concat(*blocks), "UTF-8").alias("payload"),
        (F.col("n_chars") % 1920 + 16).alias("width"),
        (F.col("n_chars") % 1080 + 16).alias("height"),
        (F.col("n_chars") % 48000 + 8000).alias("sample_rate"),
        (F.col("n_chars") * 7 % 600000).alias("duration_ms"))


ORACLE_MEDIA = """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
       ENCODE(md5(text || '0') || md5(text || '1') || md5(text || '2') ||
              md5(text || '3') || md5(text || '4') || md5(text || '5') ||
              md5(text || '6') || md5(text || '7')) AS payload,
       n_chars % 1920 + 16 AS width,
       n_chars % 1080 + 16 AS height,
       n_chars % 48000 + 8000 AS sample_rate,
       n_chars * 7 % 600000 AS duration_ms
FROM documents
"""


# --- feature extraction: Arrow-batched kernel over the binary column ---------

_FEAT_SCHEMA = ("media_id long, kind string, n_bytes int, checksum string, "
                "head string")


def _features_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payload = pdf["payload"]
        yield pd.DataFrame({
            "media_id": pdf["media_id"],
            "kind": pdf["kind"],
            "n_bytes": payload.map(len).astype("int32"),
            "checksum": payload.map(
                lambda b: hashlib.md5(bytes(b)).hexdigest()),
            "head": payload.map(lambda b: bytes(b)[:8].decode("ascii")),
        })


def media_features(spark, sf_dir):
    """Byte-level 'decode' features per media row.

    In production the kernel body calls :func:`decode_image` / the audio
    codec; here it computes length + md5 + header bytes — real work on the
    real binary column through the real Arrow path.
    """
    media = media_table(spark, sf_dir).select("media_id", "kind", "payload")
    return media.mapInPandas(_features_kernel, schema=_FEAT_SCHEMA)


ORACLE_FEATURES = f"""
WITH media AS ({ORACLE_MEDIA})
SELECT media_id, kind, octet_length(payload)::INT AS n_bytes,
       md5(payload::VARCHAR) AS checksum,
       substr(payload::VARCHAR, 1, 8) AS head
FROM media
"""


# --- frame sampling: per-row explode inside the Arrow batch ------------------

_FRAME_SCHEMA = "media_id long, frame_no int, frame_md5 string"


def _frames_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        ids, nos, sums = [], [], []
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            raw = bytes(payload)
            n_frames = len(raw) // FRAME_BYTES
            for fno in range(0, n_frames, FRAME_STRIDE):
                ids.append(mid)
                nos.append(fno)
                sums.append(hashlib.md5(
                    raw[fno * FRAME_BYTES:(fno + 1) * FRAME_BYTES]).hexdigest())
        yield pd.DataFrame({"media_id": pd.Series(ids, dtype="int64"),
                            "frame_no": pd.Series(nos, dtype="int32"),
                            "frame_md5": pd.Series(sums, dtype="object")})


def frame_sample(spark, sf_dir):
    """Every ``FRAME_STRIDE``-th fixed-size frame of each video payload.

    Real video would pyav-demux inside the same kernel; the explode stays
    inside the batch so the plan has no shuffle and no Spark-level explode of
    the binary column.
    """
    media = (media_table(spark, sf_dir)
             .where(F.col("kind") == "video")
             .select("media_id", "payload"))
    return media.mapInPandas(_frames_kernel, schema=_FRAME_SCHEMA)


ORACLE_FRAMES = f"""
WITH media AS ({ORACLE_MEDIA}),
frames AS (
  SELECT media_id, UNNEST(range(0, {256 // FRAME_BYTES}, {FRAME_STRIDE})) AS frame_no,
         payload::VARCHAR AS s
  FROM media WHERE kind = 'video')
SELECT media_id, frame_no::INT AS frame_no,
       md5(substr(s, frame_no * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS frame_md5
FROM frames
"""


# --- resize planning: metadata-only (no payload touched) ---------------------

def resize_plan(spark, sf_dir, max_side: int = 256):
    """Target dimensions for image resize — metadata arithmetic only, so the
    100 TB payload column is never read (column pruning keeps the scan to the
    small meta columns)."""
    media = media_table(spark, sf_dir).where(F.col("kind") == "image")
    scale = F.least(F.lit(1.0), F.lit(max_side) /
                    F.greatest("width", "height"))
    return media.select(
        "media_id", "width", "height",
        F.round(F.col("width") * scale).cast("int").alias("out_w"),
        F.round(F.col("height") * scale).cast("int").alias("out_h"))


ORACLE_RESIZE = f"""
WITH media AS ({ORACLE_MEDIA})
SELECT media_id, width, height,
       CAST(ROUND(width * LEAST(1.0, 256.0 / GREATEST(width, height)))
            AS INT) AS out_w,
       CAST(ROUND(height * LEAST(1.0, 256.0 / GREATEST(width, height)))
            AS INT) AS out_h
FROM media WHERE kind = 'image'
"""


def _meta_only(spark, sf_dir):
    return media_table(spark, sf_dir).drop("payload")


ORACLE_META_ONLY = f"""
WITH media AS ({ORACLE_MEDIA})
SELECT media_id, kind, width, height, sample_rate, duration_ms FROM media
"""

QUERIES = {
    "mm_media_meta": _meta_only,
    "mm_media_features": media_features,
    "mm_frame_sample": frame_sample,
    "mm_resize_plan": resize_plan,
}

ORACLES = {
    "mm_media_meta": ORACLE_META_ONLY,
    "mm_media_features": ORACLE_FEATURES,
    "mm_frame_sample": ORACLE_FRAMES,
    "mm_resize_plan": ORACLE_RESIZE,
}
