"""From-scratch BPE tokenizer (operators/tokenizer.py)."""

import pytest

from html_to_document_spark.operators.tokenizer import (
    EOW,
    UNK_ID,
    _encode_word,
    bpe_decode_tokens,
    bpe_encode,
    fit_bpe,
)

# the literature's classic corpus (Sennrich et al. 2016 §3.2 uses
# low/lower/newest/widest); frequencies chosen so the merge order is
# hand-checkable below
ROWS = [
    (0, "low low low low low"),
    (1, "lower lower"),
    (2, "newest newest newest newest newest newest"),
    (3, "widest widest widest"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


@pytest.fixture(scope="module")
def model(corpus):
    return fit_bpe(corpus, num_merges=6, word_cap=None)


def test_merge_order_hand_computed(model):
    # pair counts over {low:5, lower:2, newest:6, widest:3}:
    # ('e','s') appears in newest(6)+widest(3)=9 -> first merge;
    # ('es','t') 9 -> second; ('est','</w>') 9 -> third;
    # ('l','o') 7, ('o','w') 7 ... fourth merge is the count-7 pair
    # that sorts first lexicographically: ('l','o'); then ('lo','w')
    # 7; sixth: ('e','w'), ('n','e'), ('w','est</w>') tie at 6 ->
    # ('e','w') lexicographically.
    assert model["merges"][:6] == [
        ("e", "s"),
        ("es", "t"),
        ("est", EOW),
        ("l", "o"),
        ("lo", "w"),
        ("e", "w"),
    ]


def test_vocab_ids_deterministic(model):
    v = model["vocab"]
    assert v["<unk>"] == UNK_ID
    # single-char symbols sorted, then merged tokens in learned order
    assert v["est</w>"] > v["est"] > v["es"]
    assert len(set(v.values())) == len(v)


def test_encode_greedy_matches_rules(model):
    ranks = {p: i for i, p in enumerate(model["merges"])}
    v = model["vocab"]
    inv = {i: t for t, i in v.items()}
    # "lowest": low + est</w> via learned merges
    toks = [inv[i] for i in _encode_word("lowest", ranks, v)]
    assert toks == ["low", "est</w>"]
    # unseen word falls back to chars (+ whatever merges apply)
    toks = [inv[i] for i in _encode_word("no", ranks, v)]
    assert toks[-1] == EOW or toks[-1].endswith(EOW)


def test_spark_encode_roundtrip_and_counts(spark, corpus, model):
    df = spark.createDataFrame(
        [(10, "low lowest newest"), (11, ""), (12, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in bpe_encode(df, model).collect()}
    assert bpe_decode_tokens(rows[10]["token_ids"], model) == (
        "low lowest newest"
    )
    assert rows[10]["n_bpe_tokens"] == len(rows[10]["token_ids"])
    for d in (11, 12):
        assert rows[d]["token_ids"] == [] and rows[d]["n_bpe_tokens"] == 0


def test_fit_deterministic_under_partitioning(spark, corpus, model):
    m2 = fit_bpe(corpus.repartition(7), num_merges=6, word_cap=None)
    assert m2 == model


def test_word_cap_bounds_and_is_deterministic(corpus):
    # cap 2 keeps newest(6) and low(5); merges learned only from them
    m = fit_bpe(corpus, num_merges=3, word_cap=2)
    flat = {w for pair in m["merges"] for w in pair}
    assert all(
        set(t.replace(EOW, "")) <= set("newstlow") for t in flat
    )
    assert m == fit_bpe(corpus, num_merges=3, word_cap=2)


def test_unknown_char_maps_to_unk(model):
    ranks = {p: i for i, p in enumerate(model["merges"])}
    ids = _encode_word("loΩ", ranks, model["vocab"])
    assert UNK_ID in ids


def test_packing_integration(spark, model):
    from html_to_document_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(i, "newest " * (i + 1)) for i in range(8)],
        "doc_id long, text string",
    )
    enc = bpe_encode(df, model)
    packed = pack_sequences(
        enc, budget=16, tokens_col="n_bpe_tokens", id_col="doc_id"
    )
    rows = packed.collect()
    # pack_sequences normalizes doc_id to string
    assert {r["doc_id"] for r in rows} == {str(i) for i in range(8)}
    # counts are the exact BPE counts, not the whitespace estimate
    enc_counts = {
        str(r["doc_id"]): r["n_bpe_tokens"] for r in enc.collect()
    }
    assert all(r["n_tokens"] == enc_counts[r["doc_id"]] for r in rows)
