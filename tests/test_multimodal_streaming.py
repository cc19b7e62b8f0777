"""Multimodal plumbing + Structured-Streaming ingest."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.multimodal import (
    attach_media,
    decode_image,
    extract_features,
    fake_feature_extract,
    register_decoder,
    _DECODERS,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.plans.pipeline import (
    extract_triples,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.sources.corpus import (
    generate_corpus,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.streaming import (
    stream_extract_triples,
)


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG", {})
    register_decoder("image", lambda payload, meta: np.zeros((2, 2)))
    try:
        assert decode_image(b"\x89PNG", {}).shape == (2, 2)
    finally:
        _DECODERS.clear()


def test_fake_features_deterministic():
    a = fake_feature_extract(b"hello world")
    b = fake_feature_extract(b"hello world")
    assert a == b and len(a) == 8
    assert fake_feature_extract(b"") == [0.0] * 8


def test_media_pipeline(spark):
    docs = spark.createDataFrame(
        [(1, "hello"), (2, "world!!"), (3, "")], "doc_id long, text string"
    )
    feats = extract_features(attach_media(docs)).collect()
    assert len(feats) == 3
    by_id = {r["doc_id"]: r for r in feats}
    assert by_id[1]["n_bytes"] == 5
    assert len(by_id[2]["features"]) == 8
    assert by_id[1]["features"] == fake_feature_extract(b"hello")


def test_streaming_matches_batch(spark, tmp_path):
    corpus = generate_corpus(spark, 120, seed=42)
    in_dir = str(tmp_path / "in")
    corpus.repartition(6).write.parquet(in_dir)

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream_extract_triples(spark, in_dir, out_dir, ckpt, available_now=True)

    streamed = spark.read.parquet(out_dir).select("url", "subj", "obj", "rel").distinct()
    batch = extract_triples(spark.read.parquet(in_dir)).distinct()
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0

    # exactly-once: re-running with the same checkpoint adds nothing
    stream_extract_triples(spark, in_dir, out_dir, ckpt, available_now=True)
    assert spark.read.parquet(out_dir).count() == streamed.count()


def test_sample_frames_byte_slices(spark):
    from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.multimodal import (
        attach_media,
        sample_frames,
    )

    df = spark.createDataFrame([(1, "abcdefgh"), (2, "xyz")], ["doc_id", "text"])
    media = attach_media(df, media_type="video", n_frames=4)
    got = {
        (r["doc_id"], r["frame_idx"]): bytes(r["frame_payload"]).decode()
        for r in sample_frames(media, every_k=2).collect()
    }
    # doc 1: stride 2 → frame 0 = "ab", frame 2 = "ef"
    # doc 2: stride 0 → empty frames (degenerate payload guard)
    assert got == {(1, 0): "ab", (1, 2): "ef", (2, 0): "", (2, 2): ""}


def test_resize_images_nearest_neighbor(spark):
    import numpy as np

    from research_on_document_level_person_relation_extraction_in_chinese_spark.operators import (
        multimodal as M,
    )

    def fake_decoder(payload, meta):
        # 16 bytes → 4×4 "image" of the raw byte values
        return np.frombuffer(payload, dtype=np.uint8).reshape(4, 4).astype("float64")

    M.register_decoder("image", fake_decoder)
    try:
        df = spark.createDataFrame([(1, "0123456789abcdef")], ["doc_id", "text"])
        out = M.resize_images(M.attach_media(df), width=2, height=2).collect()
        # nearest-neighbor on rows [0,2] × cols [0,2] of the 4×4 grid
        src = np.frombuffer(b"0123456789abcdef", dtype=np.uint8).reshape(4, 4)
        want = [float(v) for v in src[[0, 2]][:, [0, 2]].reshape(-1)]
        assert out[0]["pixels"] == want
        assert (out[0]["out_w"], out[0]["out_h"]) == (2, 2)
    finally:
        M._DECODERS.pop("image", None)


def test_resize_without_decoder_raises(spark):
    from research_on_document_level_person_relation_extraction_in_chinese_spark.operators import (
        multimodal as M,
    )

    import pytest as _pytest

    df = spark.createDataFrame([(1, "abcd")], ["doc_id", "text"])
    with _pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
        M.resize_images(M.attach_media(df)).collect()
