"""Word-blocklist page filter (C4 bad-words rule mechanism), char-
entropy gibberish signal, and fuzzy (near-dup) decontamination."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from html_to_document_spark.operators.corpus_hygiene import (
    decontaminate_fuzzy,
)
from html_to_document_spark.operators.quality_rules import (
    blocklist_keep_col,
    word_blocklist_flags,
)
from html_to_document_spark.operators.text_analysis import (
    char_entropy,
    char_entropy_col,
)

BAD = ("zorple", "quuxish")


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestBlocklist:
    def test_any_hit_drops_and_counts(self, spark):
        df = _df(spark, [
            (1, "clean words only here"),
            (2, "one zorple in the middle"),
            (3, "zorple quuxish zorple flood"),
        ])
        out = {
            r["doc_id"]: r
            for r in word_blocklist_flags(df, BAD).collect()
        }
        assert out[1]["n_flagged_words"] == 0 and out[1]["blocklist_keep"]
        assert out[2]["n_flagged_words"] == 1 and not out[2]["blocklist_keep"]
        assert out[3]["n_flagged_words"] == 3
        assert out[3]["flagged_word_fraction"] == 0.75

    def test_fraction_threshold_relaxation(self, spark):
        # 1 hit in 10 words = 0.1; max_fraction=0.1 keeps, 0.05 drops
        df = _df(spark, [(1, "zorple " + " ".join(["w"] * 9))])
        keep = word_blocklist_flags(df, BAD, max_fraction=0.1).collect()[0]
        drop = word_blocklist_flags(df, BAD, max_fraction=0.05).collect()[0]
        assert keep["blocklist_keep"] and not drop["blocklist_keep"]

    def test_case_and_edge_punctuation_normalized(self, spark):
        df = _df(spark, [
            (1, "he said Zorple."),
            (2, '"QUUXISH," she replied'),
            (3, "zorpleish is NOT on the list"),  # substring must not match
        ])
        out = {
            r["doc_id"]: r["n_flagged_words"]
            for r in word_blocklist_flags(df, BAD).collect()
        }
        assert out == {1: 1, 2: 1, 3: 0}

    def test_keep_col_filter_and_plan(self, spark):
        df = _df(spark, [(1, "fine text"), (2, "zorple text")])
        kept = df.filter(blocklist_keep_col(BAD))
        assert [r["doc_id"] for r in kept.collect()] == [1]
        plan = kept._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Python" not in plan

    def test_empty_blocklist_raises(self, spark):
        df = _df(spark, [(1, "x")])
        with pytest.raises(ValueError):
            word_blocklist_flags(df, ())


class TestCharEntropy:
    def test_known_values(self, spark):
        df = _df(spark, [
            (1, "aaaa"),          # single symbol -> 0 bits
            (2, "abab"),          # uniform over 2 -> 1 bit
            (3, "abcdabcdabcd"),  # uniform over 4 -> 2 bits
            (4, ""),              # empty -> 0 by convention
        ])
        out = {
            r["doc_id"]: r["char_entropy"]
            for r in char_entropy(df).collect()
        }
        assert out[1] == 0.0
        assert out[2] == 1.0
        assert out[3] == 2.0
        assert out[4] == 0.0

    def test_matches_python_reference(self, spark):
        texts = [
            "the quick brown fox jumps over the lazy dog",
            "aaaaaaaaaaaaaaaaaaab",
            "x" * 1 + "yz" * 7,
        ]
        df = _df(spark, list(enumerate(texts)))
        out = {
            r["doc_id"]: r["char_entropy"]
            for r in char_entropy(df).collect()
        }
        for i, t in enumerate(texts):
            n = len(t)
            ref = -sum(
                (t.count(ch) / n) * math.log2(t.count(ch) / n)
                for ch in sorted(set(t))
            )
            assert out[i] == pytest.approx(ref, abs=1e-4)

    def test_band_pass_keep(self, spark):
        df = _df(spark, [
            (1, "aaaaaaaaaa"),                      # 0 bits -> drop
            (2, "the quick brown fox jumps here"),  # ~4 bits -> keep
        ])
        out = {
            r["doc_id"]: r["entropy_keep"]
            for r in char_entropy(df).collect()
        }
        assert out == {1: False, 2: True}

    def test_zero_shuffle_plan(self, spark):
        df = _df(spark, [(1, "some text")])
        plan = (
            char_entropy(df)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan and "Python" not in plan


def _phrase(k: int) -> str:
    return " ".join(f"f{i}s{k}" for i in range(10))


class TestDecontaminateFuzzy:
    def test_planted_near_dups_flagged(self, spark):
        # benchmark doc k = phrase(k) x4; contaminated train docs carry
        # phrase(k) x6 — different string, IDENTICAL 3-gram shingle
        # set, so est_jaccard = 1.0 on every band (provable); clean
        # train docs share zero shingles with any benchmark phrase.
        bench = _df(spark, [
            (100 + k, " ".join([_phrase(k)] * 4)) for k in range(3)
        ])
        train = _df(spark, [
            (1, " ".join([_phrase(0)] * 6)),
            (2, " ".join([_phrase(2)] * 6)),
            (3, "entirely unrelated words " + " ".join(
                f"u{i}" for i in range(30)
            )),
        ])
        out = {
            r["doc_id"]: r
            for r in decontaminate_fuzzy(
                train, bench, threshold=0.85, exact_verify=True
            ).collect()
        }
        assert set(out) == {1, 2}
        for r in out.values():
            assert r["n_benchmark_matches"] == 1
            assert r["max_est_jaccard"] == 1.0
            assert r["max_jaccard"] == 1.0

    def test_anti_join_decontaminates(self, spark):
        bench = _df(spark, [(100, " ".join([_phrase(0)] * 4))])
        train = _df(spark, [
            (1, " ".join([_phrase(0)] * 6)),
            (2, "clean " + " ".join(f"c{i}" for i in range(30))),
        ])
        flagged = decontaminate_fuzzy(train, bench, threshold=0.85)
        clean = train.join(flagged.select("doc_id"), "doc_id", "left_anti")
        assert [r["doc_id"] for r in clean.collect()] == [2]

    def test_max_chars_prefix_semantics(self, spark):
        t = "abab" + "z" * 100
        df = _df(spark, [(1, t)])
        capped = df.select(
            char_entropy_col(F.col("text"), max_chars=4).alias("e")
        ).collect()[0]["e"]
        assert capped == pytest.approx(1.0, abs=1e-9)  # entropy of "abab"
