"""Multimodal column plumbing (driver mandate).

Image/audio/video ride as opaque ``binary`` columns + typed metadata structs;
decode / feature-extract run as Arrow-batched ``mapInPandas`` stages.

Codecs: uncompressed formats are decoded for REAL by the pure-Python
codecs below — BMP (24-bit BI_RGB, bottom-up, 4-byte row padding) and PPM
(binary P6) — ``decode_image`` sniffs the magic bytes and dispatches.
Compressed formats (JPEG/PNG/…) still need a registered decoder
(pillow/librosa/av are not in this container): for those ``decode_image``
raises ``NotImplementedError`` unless one is registered via
``register_decoder``. ``fake_feature_extract`` remains the deterministic
test double (byte histogram + length) for opaque payloads.
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


def encode_bmp(arr: np.ndarray) -> bytes:
    """Pure-Python 24-bit BMP (BI_RGB) encoder: ``arr`` is (H, W, 3) uint8
    RGB top-down; emits the standard bottom-up BGR layout with rows padded
    to 4-byte multiples. Round-trips bit-exactly through ``decode_bmp``."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"encode_bmp wants (H, W, 3) uint8, got {arr.shape}")
    h, w = arr.shape[:2]
    pad = (-3 * w) % 4
    bgr = arr[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    rows = b"".join(bgr[r].tobytes() + b"\x00" * pad for r in range(h))
    size = 54 + len(rows)
    header = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(rows).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + rows


def decode_bmp(payload: bytes, meta: dict | None = None) -> np.ndarray:
    """Pure-Python BMP decoder for the uncompressed 24-bit BI_RGB flavor
    (what ``encode_bmp`` and every basic exporter writes): honors the pixel
    offset, negative-height (top-down) files, and 4-byte row padding.
    Returns (H, W, 3) uint8 RGB, rows top-down."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    offset = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    if hdr_size < 40:
        raise NotImplementedError(f"BMP core-header size {hdr_size} unsupported")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={compression})")
    top_down = h < 0
    h = abs(h)
    stride = 3 * w + ((-3 * w) % 4)
    raw = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=offset)
    rows = raw.reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # BGR → RGB
    return rgb if top_down else rgb[::-1]


def encode_ppm(arr: np.ndarray) -> bytes:
    """Binary PPM (P6, maxval 255): (H, W, 3) uint8 RGB top-down."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode("ascii") + arr.tobytes()


def decode_ppm(payload: bytes, meta: dict | None = None) -> np.ndarray:
    """Binary PPM (P6) decoder — whitespace/comment-tolerant header scan."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError(f"PPM maxval {maxval} unsupported")
    return np.frombuffer(payload, dtype=np.uint8, count=3 * w * h, offset=pos).reshape(h, w, 3)


def decode_image(payload: bytes, meta: dict) -> np.ndarray:
    """Real decode: BMP and P6-PPM are decoded in pure Python (above);
    anything else dispatches to a registered codec or raises."""
    if payload[:2] == b"BM":
        return decode_bmp(payload, meta)
    if payload[:2] == b"P6":
        return decode_ppm(payload, meta)
    if "image" in _DECODERS:
        return _DECODERS["image"](payload, meta)
    raise NotImplementedError(
        "compressed image decoding requires a codec library (e.g. pillow); "
        "register one with register_decoder('image', fn)"
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
