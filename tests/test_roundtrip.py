"""Round-trip property: extract(serialize(spans)) == spans for every
golden fixture output (mirrors the reference's serialize∘parse fixpoint
test, html.serializer.test.ts:14-60)."""

import json
import pathlib

import pytest

from html_to_document_spark.core.extract import ExtractOptions, extract_document
from html_to_document_spark.core.serializer import serialize_spans

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"
FIXTURES = sorted(GOLDEN_DIR.glob("*.json"))

# cells containing tab/newline cannot survive table re-linearization;
# none of the goldens do, but guard the param list anyway
def _roundtrippable(spans):
    return all(
        not (s[0] == "table" and any(ch in c for row in (s[1] or "").split("\n") for c in row.split("\t") for ch in "\t\n"))
        for s in spans
    )


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.stem)
def test_roundtrip(path):
    fx = json.loads(path.read_text())
    opts = ExtractOptions(**fx.get("options", {}))
    spans1 = extract_document(fx["html"], opts)
    assert _roundtrippable(spans1)
    html2 = serialize_spans(spans1)
    spans2 = extract_document(html2)  # default options on re-parse
    assert spans2 == spans1
