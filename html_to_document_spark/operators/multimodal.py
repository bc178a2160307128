"""Multimodal column plumbing (task brief).

Media (image/audio/video) travels as opaque ``binary`` columns with a
typed metadata struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` stages. The decode step itself is
STUBBED (no image/audio libs in this container): ``decode_media`` with
``fake=False`` raises ``NotImplementedError``; with ``fake=True`` it
produces deterministic pseudo-features so the Spark-side plumbing —
schema, batching, partitioning, UDF signatures — is fully real and
tested end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "doc_id string, media_ref string, content binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int>"
)

FEATURE_SCHEMA = (
    "doc_id string, media_ref string, mime string, n_bytes int, "
    "sha256 string, feature array<float>"
)


def _fake_feature(content: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real encoder: bytes -> unit-ish vec."""
    out = []
    h = content or b""
    counter = 0
    while len(out) < dim:
        d = hashlib.sha256(h + counter.to_bytes(4, "big")).digest()
        out.extend(b / 255.0 - 0.5 for b in d)
        counter += 1
    return [round(x, 6) for x in out[:dim]]


def decode_media(
    df: "DataFrame", *, fake: bool = True, feature_dim: int = 16
) -> "DataFrame":
    """binary media -> features. Real decode is NOT implemented in this
    container (no PIL/ffmpeg); the ``fake`` path keeps batch shapes,
    schema and partitioning behavior identical to a real encoder."""
    import pandas as pd

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg; not available "
                    "in this environment — use fake=True for plumbing"
                )
            contents = [bytes(c) if c is not None else b"" for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "mime": [m["mime"] if m else None for m in pdf["meta"]],
                    "n_bytes": [len(c) for c in contents],
                    "sha256": [hashlib.sha256(c).hexdigest() for c in contents],
                    "feature": [_fake_feature(c, feature_dim) for c in contents],
                }
            )

    return df.mapInPandas(fn, FEATURE_SCHEMA)


def resize_images(
    df: "DataFrame", width: int = 64, height: int = 64, *, fake: bool = True
) -> "DataFrame":
    """Image resize plumbing: binary in -> binary out with updated meta.
    Real pixel decode/resample requires PIL (absent here): the ``fake``
    path emits a deterministic content surrogate (sha256 of input bytes
    + target dims) with the real schema/batching so the Spark-side
    pipeline (partitioning, meta propagation, byte budgets) is tested.
    """
    import pandas as pd

    schema = (
        "doc_id string, media_ref string, content binary, "
        "meta struct<mime:string, width:int, height:int, duration_ms:int>"
    )

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image resize requires PIL; unavailable here"
                )
            contents, metas = [], []
            for content, meta in zip(pdf["content"], pdf["meta"]):
                c = bytes(content) if content is not None else b""
                digest = hashlib.sha256(
                    c + width.to_bytes(4, "big") + height.to_bytes(4, "big")
                ).digest()
                # deterministic surrogate sized like a tiny thumbnail
                contents.append(digest * 4)
                m = dict(meta or {})
                m["width"], m["height"] = width, height
                m.setdefault("mime", None)
                m.setdefault("duration_ms", None)
                metas.append(m)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "content": contents,
                    "meta": metas,
                }
            )

    return df.mapInPandas(fn, schema)


def frame_sample(
    df: "DataFrame", every_ms: int = 1000, *, fake: bool = True
) -> "DataFrame":
    """Video frame sampling plumbing: one output row per sampled frame
    position (duration-driven). Frame decode itself is stubbed."""
    import pandas as pd

    schema = "doc_id string, media_ref string, frame_ms int, frame sha2_stub string".replace(
        " sha2_stub", ""
    )

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real frame decode unavailable")
            rows = {"doc_id": [], "media_ref": [], "frame_ms": [], "frame": []}
            for doc_id, ref, content, meta in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["content"], pdf["meta"]
            ):
                dur = (meta or {}).get("duration_ms") or 0
                c = bytes(content) if content is not None else b""
                for ms in range(0, max(int(dur), 1), every_ms):
                    rows["doc_id"].append(doc_id)
                    rows["media_ref"].append(ref)
                    rows["frame_ms"].append(ms)
                    rows["frame"].append(
                        hashlib.sha256(c + ms.to_bytes(8, "big")).hexdigest()[:16]
                    )
            yield pd.DataFrame(rows)

    return df.mapInPandas(fn, schema)
