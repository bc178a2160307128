"""From-scratch BPE tokenizer — fit merge rules on the corpus, encode
documents to token ids (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units").

Completes the tokenize→pack path: ``packing.pack_sequences`` bins by a
token-count column, and until now that count was the whitespace/
regex estimate from ``text_analysis.token_stats``. This operator
produces REAL subword token ids (and their exact count) with no
external tokenizer library — the sandbox has none, and none is
needed: classic word-internal BPE is ~80 lines.

Algorithm (the published recipe):

1. FIT: collect the corpus's word-frequency table, represent each
   word as a character sequence plus an end-of-word marker, and
   repeatedly merge the most frequent adjacent symbol pair until
   ``num_merges`` rules are learned.  Ties break by (count desc,
   pair lexicographic) so the rule list is deterministic.
2. ENCODE: split text into words, split each word into characters,
   and apply the learned merges in rank order (lowest rank first) —
   the standard greedy BPE encode.  Symbols that never appeared in
   fit fall back to single-character tokens (id of ``<unk>`` if the
   character itself is unseen).

Scale shape (100 TB lens):

- FIT's only distributed work is ONE explode + map-side-combinable
  word-count groupBy; ``word_cap`` keeps the top-N word forms by
  (count desc, word asc) so the driver collect is bounded no matter
  the crawl vocabulary, and ``sample_fraction`` fits on a seeded
  sample — merge-rule learning is a frequency estimate, a 1% sample
  of 10^12 docs is statistically exact.  The merge loop itself is
  driver-side pure Python over the bounded word table (the classic
  algorithm), not a Spark job per merge.
- ENCODE is shuffle-free: the model (merge ranks + symbol ids) is an
  ``sc.broadcast`` dict and encoding is ONE Arrow-batched
  mapInPandas projection with a per-worker word memo — web text
  repeats words massively, so the amortized cost per token is a
  dict hit, not a merge loop.
- No oracle row: greedy iterative merging is not expressible in
  ANSI SQL (the driver's rows-only gate would apply); correctness
  is pytest-pinned against hand-computed merges on the literature's
  classic example and a decode-roundtrip property.

Tokenizer contract: ASCII ``\\s`` word split (the corpus-wide
convention — see ``dsir._WS``).  The end-of-word marker ``</w>`` is
a single atomic symbol; literal ``<``/``>`` characters in text are
single-char symbols, so a collision requires fit to LEARN the exact
merge chain spelling ``"</w>"`` — possible on adversarial corpora,
benign for token counting/packing (the ids still round-trip
deterministically), ambiguous only for ``bpe_decode_tokens``.
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

__all__ = ["fit_bpe", "bpe_encode", "bpe_decode_tokens"]

EOW = "</w>"
UNK_ID = 0
_WS = re.compile(r"\s+", re.ASCII)


def _words(text) -> list[str]:
    if not isinstance(text, str) or not text.strip():
        return []
    return _WS.split(text.strip())


def _pair_counts(word_freq: dict[tuple[str, ...], int]) -> dict:
    pc: dict[tuple[str, str], int] = {}
    for sym, c in word_freq.items():
        for i in range(len(sym) - 1):
            p = (sym[i], sym[i + 1])
            pc[p] = pc.get(p, 0) + c
    return pc


def _merge_word(sym: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i, n = 0, len(sym)
    a, b = pair
    while i < n:
        if i < n - 1 and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def fit_bpe(
    df: "DataFrame",
    text_col: str = "text",
    *,
    num_merges: int = 200,
    word_cap: int | None = 50_000,
    sample_fraction: float | None = None,
    seed: int = 42,
) -> dict:
    """Learn ``num_merges`` BPE merge rules from the corpus.

    Returns a broadcastable plain-dict model: ``{"merges": [(a, b),
    ...] in rank order, "vocab": {token: id}, "num_merges"}``.
    Token ids: 0 = ``<unk>``, then single-character symbols and
    merged tokens in first-learned order — deterministic under any
    partitioning (word counts are exact integers; ties break by
    (count desc, pair lexicographic))."""
    from pyspark.sql import functions as F

    if sample_fraction is not None:
        df = df.sample(False, sample_fraction, seed=seed)

    wc = (
        df.select(
            F.explode(
                F.split(F.trim(F.col(text_col)), r"\s+")
            ).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .count()
    )
    if word_cap is not None:
        rows = (
            wc.orderBy(F.col("count").desc(), F.col("w").asc())
            .limit(int(word_cap))
            .collect()
        )
    else:
        rows = wc.collect()

    word_freq: dict[tuple[str, ...], int] = {}
    for r in rows:
        word_freq[tuple(r["w"]) + (EOW,)] = r["count"]

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pc = _pair_counts(word_freq)
        if not pc:
            break
        # deterministic argmax: count desc, then pair lexicographic
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        word_freq = {
            _merge_word(sym, best): c for sym, c in word_freq.items()
        }

    vocab: dict[str, int] = {"<unk>": UNK_ID}
    for sym in sorted({ch for w in rows for ch in r_chars(w["w"])}):
        vocab.setdefault(sym, len(vocab))
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    return {"merges": merges, "vocab": vocab, "num_merges": len(merges)}


def r_chars(word: str) -> list[str]:
    return list(word) + [EOW]


def _encode_word(word: str, ranks: dict, vocab: dict) -> list[int]:
    sym = list(word) + [EOW]
    # standard greedy encode: repeatedly apply the lowest-rank merge
    # present in the current symbol sequence
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return [vocab.get(s, UNK_ID) for s in sym]


def bpe_encode(
    df: "DataFrame",
    model: dict,
    text_col: str = "text",
    *,
    ids_col: str = "token_ids",
    count_col: str = "n_bpe_tokens",
) -> "DataFrame":
    """Append (``token_ids array<int>``, ``n_bpe_tokens int``) — a
    shuffle-free broadcast-model Arrow-batched projection; all input
    columns pass through."""
    import pandas as pd  # noqa: F811
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StructField,
        StructType,
    )

    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(
        {
            "ranks": {p: i for i, p in enumerate(model["merges"])},
            "vocab": model["vocab"],
        }
    )
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField(ids_col, ArrayType(IntegerType())),
            StructField(count_col, IntegerType()),
        ]
    )

    def fn(batches):
        m = bc.value
        ranks, vocab = m["ranks"], m["vocab"]
        memo: dict[str, list[int]] = {}

        def enc(text) -> list[int]:
            ids: list[int] = []
            for w in _words(text):
                got = memo.get(w)
                if got is None:
                    if len(memo) > 1_000_000:  # adversarial-vocab cap
                        memo.clear()
                    got = memo.setdefault(w, _encode_word(w, ranks, vocab))
                ids.extend(got)
            return ids

        for pdf in batches:
            out = pdf.copy()
            encs = [enc(t) for t in pdf[text_col]]
            out[ids_col] = encs
            out[count_col] = [len(e) for e in encs]
            yield out

    return df.mapInPandas(fn, out_schema)


def bpe_decode_tokens(ids: list[int], model: dict) -> str:
    """Inverse of the encode for tests/debugging: token ids back to
    text (words rejoined with single spaces; ``<unk>`` ids yield the
    literal ``<unk>``). Pure Python — decoding 10^12 docs is not a
    pipeline operation."""
    inv = {i: t for t, i in model["vocab"].items()}
    text = "".join(inv.get(i, "<unk>") for i in ids)
    return text.replace(EOW, " ").strip()
