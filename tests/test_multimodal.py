"""Multimodal plumbing: binary payload layout + mapInPandas decoders
(deterministic fake kernels; the distributed shape is the product)."""

import hashlib

from udacity_data_engineering_capstone_project_spark.operators.multimodal import (
    attach_payload,
    decode_image,
    extract_payload_features,
    frame_sample,
)


def _payload_df(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "x" * 300)], "doc_id long, text string"
    )
    return attach_payload(df, "doc_id", "text", modality="image")


def test_attach_payload_layout(spark):
    out = _payload_df(spark)
    assert [f.name for f in out.schema] == ["doc_id", "payload", "meta"]
    r = {x.doc_id: x for x in out.collect()}
    assert bytes(r[1].payload) == b"hello world"
    assert r[1].meta.modality == "image" and r[1].meta.n_bytes == 11


def test_extract_features_md5_matches(spark):
    out = extract_payload_features(_payload_df(spark)).collect()
    got = {r.doc_id: (r.n_bytes, r.payload_md5) for r in out}
    assert got[1] == (11, hashlib.md5(b"hello world").hexdigest())


def test_decode_image_fixed_shape(spark):
    out = decode_image(_payload_df(spark), target_size=(4, 4)).collect()
    r = {x.doc_id: x for x in out}
    assert len(out) == 2
    for x in out:
        assert (x.height, x.width) == (4, 4)
        assert len(x.pixels) == 16
        assert all(0.0 <= p <= 1.0 for p in x.pixels)
    # deterministic fake: byte tiling -> first pixel = ord('h')/255
    assert abs(r[1].pixels[0] - ord("h") / 255.0) < 1e-6
    assert r[1].mean_px_x1000 == r[1].mean_px_x1000  # stable int feature


def test_frame_sample_one_to_many(spark):
    out = frame_sample(
        _payload_df(spark), frame_bytes=64, every_n_frames=2
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    # doc 1: 11 bytes -> 1 frame -> idx 0; doc 2: 300 bytes -> 4 frames
    # -> sampled idx 0, 2
    assert by_doc[1] == [0]
    assert sorted(by_doc[2]) == [0, 2]
    digest = next(r.frame_md5 for r in out if r.doc_id == 2 and r.frame_idx == 0)
    assert digest == hashlib.md5(b"x" * 64).hexdigest()
