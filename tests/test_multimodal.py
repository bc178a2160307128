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


def _pil_present() -> bool:
    try:
        import PIL  # noqa: F401, PLC0415

        return True
    except ImportError:
        return False


@pytest.mark.skipif(_pil_present(), reason="PIL importable: real path works")
def test_decode_media_real_requires_backend(spark, media):
    """fake=False is feature-detected: without PIL it must refuse loudly
    rather than silently emit fake features."""
    with pytest.raises(Exception) as exc_info:
        decode_media(media, fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


@pytest.mark.skipif(not _pil_present(), reason="PIL unavailable here")
def test_decode_media_real_with_pil(spark):
    """Real path (runs wherever PIL exists): decodable images produce
    pixel-derived features; non-images fall back to the byte-hash
    feature; the schema is identical to the fake path."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (8, 8), color=200).save(buf, format="PNG")
    rows = [
        ("r1", "media://png", bytearray(buf.getvalue()),
         ("image/png", 8, 8, None)),
        ("r2", "media://junk", bytearray(b"not an image"),
         ("image/png", None, None, None)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    real = {r.doc_id: r for r in
            decode_media(df, fake=False, feature_dim=16).collect()}
    fake = {r.doc_id: r for r in
            decode_media(df, fake=True, feature_dim=16).collect()}
    # uniform gray 200 -> every pixel feature 200/255 - 0.5
    assert all(abs(x - (200 / 255.0 - 0.5)) < 1e-6 for x in real["r1"].feature)
    assert real["r1"].feature != fake["r1"].feature
    assert real["r2"].feature == fake["r2"].feature  # fallback
    assert set(real["r1"].asDict()) == set(fake["r1"].asDict())


@pytest.mark.skipif(not _pil_present(), reason="PIL unavailable here")
def test_resize_images_real_with_pil(spark):
    import io

    from PIL import Image

    from html_to_document_spark.operators.multimodal import resize_images

    buf = io.BytesIO()
    Image.new("RGB", (10, 6), color=(250, 10, 10)).save(buf, format="PNG")
    df = spark.createDataFrame(
        [("r1", "media://png", bytearray(buf.getvalue()),
          ("image/png", 10, 6, None))],
        MEDIA_SCHEMA,
    )
    out = resize_images(df, width=4, height=2, fake=False).collect()[0]
    resized = Image.open(io.BytesIO(bytes(out.content)))
    assert resized.size == (4, 2)
    assert out.meta.width == 4 and out.meta.height == 2
    assert out.meta.mime == "image/png"


def test_frame_sample_real_always_raises(spark, media):
    """Real frame decode is not implemented; fake=False must refuse
    loudly even where ffprobe exists — the fake path's digests must
    never be mistaken for decoded pixels (ADVICE r3)."""
    with pytest.raises(Exception) as exc_info:
        frame_sample(media, fake=False).collect()
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
