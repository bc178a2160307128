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
