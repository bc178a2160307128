import pytest

from html_to_document_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    frame_sample,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("d1", "media://a", bytearray(b"\x89PNG fake"), ("image/png", 10, 10, None)),
        ("d2", "media://b", bytearray(b"RIFF fake"), ("video/webm", None, None, 3500)),
        ("d3", "media://c", None, ("image/gif", 1, 1, None)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_media_fake_plumbing(spark, media):
    out = decode_media(media, fake=True, feature_dim=8).collect()
    rows = {r.doc_id: r for r in out}
    assert rows["d1"].mime == "image/png"
    assert rows["d1"].n_bytes == 9
    assert len(rows["d1"].feature) == 8
    assert rows["d3"].n_bytes == 0
    # deterministic: same bytes -> same feature
    again = {r.doc_id: r for r in decode_media(media, fake=True, feature_dim=8).collect()}
    assert rows["d1"].feature == again["d1"].feature
    assert rows["d1"].sha256 != rows["d2"].sha256


def test_decode_media_real_is_stubbed(spark, media):
    with pytest.raises(Exception) as exc_info:
        decode_media(media, fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_frame_sample(spark, media):
    frames = frame_sample(media, every_ms=1000).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r.frame_ms)
    assert sorted(by_doc["d2"]) == [0, 1000, 2000, 3000]
    assert by_doc["d1"] == [0]  # no duration -> single frame at 0


def test_resize_images_plumbing(spark, media):
    from html_to_document_spark.operators.multimodal import resize_images

    out = {r.doc_id: r for r in
           resize_images(media, width=32, height=16).collect()}
    assert set(out) == {"d1", "d2", "d3"}
    for r in out.values():
        assert r.meta.width == 32 and r.meta.height == 16
        assert isinstance(bytes(r.content), bytes) and len(r.content) == 128
    # original mime travels through; deterministic surrogate bytes
    assert out["d1"].meta.mime == "image/png"
    again = {r.doc_id: r for r in
             resize_images(media, width=32, height=16).collect()}
    assert bytes(out["d1"].content) == bytes(again["d1"].content)
    assert bytes(out["d1"].content) != bytes(out["d2"].content)
    # resized output chains into decode_media (schema-compatible)
    feats = decode_media(resize_images(media), fake=True, feature_dim=4).collect()
    assert len(feats) == 3 and all(len(r.feature) == 4 for r in feats)
