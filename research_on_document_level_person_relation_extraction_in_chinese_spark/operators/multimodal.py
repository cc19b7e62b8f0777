"""Multimodal column plumbing (driver mandate).

Image/audio/video ride as opaque ``binary`` columns + typed metadata structs;
decode / feature-extract run as Arrow-batched ``mapInPandas`` stages. The
actual codec step is STUBBED (pillow/librosa/av are not in this container):
``decode_image`` raises ``NotImplementedError`` unless a decoder is
registered, and ``fake_feature_extract`` is the deterministic test double
(byte histogram + length) that keeps the Spark-side plumbing — schema,
partitioning, UDF signature, Arrow batch shape — real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "meta struct<width:int,height:int,sample_rate:int,n_frames:int>"
)

_DECODERS: dict[str, Callable[[bytes, dict], np.ndarray]] = {}


def register_decoder(media_type: str, fn: Callable[[bytes, dict], np.ndarray]) -> None:
    _DECODERS[media_type] = fn


def decode_image(payload: bytes, meta: dict) -> np.ndarray:
    """Real decode hook — STUB: no image codec in this container."""
    if "image" in _DECODERS:
        return _DECODERS["image"](payload, meta)
    raise NotImplementedError(
        "image decoding requires a codec library (e.g. pillow); register one "
        "with register_decoder('image', fn)"
    )


def fake_feature_extract(payload: bytes, dims: int = 8) -> list[float]:
    """Deterministic stand-in feature vector: normalized byte histogram folded
    to ``dims`` buckets + md5-derived stable jitter. Pure function of bytes."""
    if not payload:
        return [0.0] * dims
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dims, minlength=dims).astype("float64")
    hist /= max(arr.size, 1)
    seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "big") / 2**32
    return [round(float(v + seed * 1e-6), 9) for v in hist]


def attach_media(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    media_type: str = "image",
    n_frames: int = 1,
) -> DataFrame:
    """Synthesize a media table from a doc table (deterministic payload =
    UTF-8 bytes of the text — a stand-in for real image/audio bytes)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.lit(media_type).alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(n_frames).alias("n_frames"),
        ).alias("meta"),
    )


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame sampling for video payloads, entirely JVM-side: explode every
    k-th frame index from the metadata and slice the payload into its frame's
    byte range (equal-stride layout — the deterministic fake-codec contract;
    a container format would do the same slicing from its real frame index).
    One row per sampled frame: (doc_id, frame_idx, frame_payload, meta).

    Scale shape: pure codegen (sequence + explode + substring on binary) —
    the expensive per-frame DECODE stays downstream in the Arrow-batched
    ``extract_features``/``resize_images`` stage, so sampling prunes frames
    BEFORE any Python/codec cost is paid."""
    stride = F.floor(F.length("payload") / F.col("meta.n_frames")).cast("int")
    idx = F.explode(
        F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_k))
    ).alias("frame_idx")
    return media.select("doc_id", "payload", "meta", stride.alias("_stride"), idx).select(
        "doc_id",
        "frame_idx",
        F.substring(F.col("payload"), F.col("frame_idx") * F.col("_stride") + 1, F.col("_stride")).alias(
            "frame_payload"
        ),
        "meta",
    )


def resize_images(
    media: DataFrame,
    width: int = 8,
    height: int = 8,
    decoder: Callable[[bytes, dict], np.ndarray] | None = None,
) -> DataFrame:
    """Arrow-batched decode→resize: nearest-neighbor resample of the decoded
    pixel array (pure numpy index math — no codec needed once decoded) in one
    ``mapInPandas`` pass. The decode itself goes through the registered
    decoder hook (STUB by default, same contract as ``decode_image``); tests
    register a deterministic fake decoder, keeping schema / batch shape /
    index arithmetic — the real plumbing — fully exercised.

    The decoder is resolved ON THE DRIVER at plan-build time and shipped to
    the workers inside the closure — the ``_DECODERS`` registry is
    driver-process module state that Python workers (fresh imports) never
    see, so a worker-side registry lookup would always hit the stub."""
    out_schema = "doc_id long, pixels array<double>, out_w int, out_h int"
    decode = decoder or _DECODERS.get("image") or decode_image

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                meta = dict(meta) if meta is not None else {}
                arr = decode(bytes(payload), meta)
                h, w = arr.shape[:2]
                rows = (np.arange(height) * h) // height
                cols = (np.arange(width) * w) // width
                out.append([float(v) for v in arr[rows][:, cols].reshape(-1)])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "pixels": out,
                    "out_w": width,
                    "out_h": height,
                }
            )

    return media.mapInPandas(run, schema=out_schema)


def extract_features(media: DataFrame, dims: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    One ``mapInPandas`` pass; at scale this is exactly where a GPU decoder
    would slot in (one model per executor, batch = Arrow batch).
    """
    out_schema = f"doc_id long, media_type string, features array<double>, n_bytes long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "features": [fake_feature_extract(p, dims) for p in pdf["payload"]],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(run, schema=out_schema)
