"""Golden span-sequence tests: exact equality on (kind, text,
media_ref, order) per document (BASELINE.json correctness invariant).

Pure-python core path — the Spark path over the same corpus is
tests/test_spark_extract.py.
"""

import json
import pathlib

import pytest

from html_to_document_spark.core.extract import ExtractOptions, extract_document

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"
FIXTURES = sorted(GOLDEN_DIR.glob("*.json"))


def load(path):
    return json.loads(path.read_text())


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.stem)
def test_golden(path):
    fx = load(path)
    opts = ExtractOptions(**fx.get("options", {}))
    got = extract_document(fx["html"], opts)
    expected = [tuple(row) for row in fx["expected"]]
    assert [tuple(s) for s in got] == expected
