"""Text-analysis operators for training-data pipelines (task brief):
language-ID, quality scoring, token counting, document fingerprinting.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM,
whole-stage codegen) — no Python UDFs. Each operator has a matching
ANSI-SQL oracle in ``__spark_entry__.oracle_sql`` so semantics are
pinned cross-engine (DuckDB).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import Column, DataFrame

# small deterministic stopword profiles (n-gram heuristic, SQL-expressible)
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "et", "des"],
    "de": ["der", "die", "und", "das", "ist"],
}

FINGERPRINT_MOD = 1_000_000_007


def r4(col) -> "Column":
    """Engine-portable 4-decimal rounding: ``floor(x*1e4 + 0.5)/1e4``.
    Spark's round() is HALF_UP, DuckDB's is half-even; this form is
    bit-identical on both given the same double input."""
    from pyspark.sql import functions as F

    return F.floor(col * 10000 + F.lit(0.5)) / F.lit(10000.0)


def _word_count(col) -> "Column":
    from pyspark.sql import functions as F

    return F.size(F.split(F.trim(col), r"\s+"))


def token_stats(df: "DataFrame", text_col: str = "text") -> "DataFrame":
    """Whitespace tokens + BPE-ish subword estimate + char stats."""
    from pyspark.sql import functions as F

    c = F.col(text_col)
    return df.select(
        "doc_id",
        F.length(c).alias("n_chars_measured"),
        _word_count(c).alias("n_tokens_ws"),
        # BPE-ish: alnum runs + punctuation each count as a token
        F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), F.lit(0))).alias(
            "n_tokens_bpe"
        ),
        r4(
            F.length(F.regexp_replace(c, r"\s+", "")) / _word_count(c)
        ).alias("avg_token_len"),
    )


def lang_scores(col, lang: str) -> "Column":
    """Count of the language's stopwords as standalone words.

    Case-insensitive ('The', 'El', 'Der' at sentence starts count):
    matching lowercased text avoids the systematic undercount that made
    short docs fall back to 'und' (ADVICE r1)."""
    from pyspark.sql import functions as F

    pat = r"\b(" + "|".join(LANG_PROFILES[lang]) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(pat), F.lit(0)))


def lang_pred_col(c) -> "Column":
    """``lang_id``'s prediction as a single Column expression — lets a
    pipeline ADD the column as a per-row projection instead of joining
    a separate lang_id() frame back on doc_id (VERDICT r1 #1: the join
    form re-instantiated the upstream extraction subtree). Whole-stage
    codegen's subexpression elimination dedupes the repeated score
    expressions."""
    from pyspark.sql import functions as F

    scores = {lang: lang_scores(c, lang) for lang in LANG_PROFILES}
    best = F.greatest(*scores.values())
    pred = F.when(best == 0, F.lit("und"))
    for lang, s in scores.items():  # first max wins => deterministic
        pred = pred.when(s == best, F.lit(lang))
    return pred


def lang_id(df: "DataFrame", text_col: str = "text") -> "DataFrame":
    """Stopword-profile language ID; ties break by profile order
    (en, es, fr, de) and fall back to 'und' when all scores are 0."""
    from pyspark.sql import functions as F

    c = F.col(text_col)
    scored = df.select(
        "doc_id",
        *[lang_scores(c, lang).alias(f"score_{lang}") for lang in LANG_PROFILES],
    )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_PROFILES])
    pred = F.when(best == 0, F.lit("und"))
    for lang in LANG_PROFILES:  # first max wins => deterministic tie-break
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return scored.withColumn("lang_pred", pred)


def quality_col(c) -> "Column":
    """``quality_score``'s quality as a single Column expression (same
    projection-not-join rationale as ``lang_pred_col``)."""
    from pyspark.sql import functions as F

    n_chars = F.length(c)
    n_words = _word_count(c)
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"[^\w\s]"), F.lit(0)))
    n_stop = lang_scores(c, "en")
    punct_ratio = r4(n_punct / F.greatest(n_chars, F.lit(1)))
    stop_ratio = r4(n_stop / F.greatest(n_words, F.lit(1)))
    len_score = F.least(n_words / F.lit(20.0), F.lit(1.0))
    return r4(
        0.5 * len_score
        + 0.3 * F.least(stop_ratio * 5, F.lit(1.0))
        + 0.2 * (1 - F.least(punct_ratio * 10, F.lit(1.0)))
    )


def quality_score(df: "DataFrame", text_col: str = "text") -> "DataFrame":
    """Length / punctuation / stopword heuristics -> [0,1] quality."""
    from pyspark.sql import functions as F

    c = F.col(text_col)
    n_chars = F.length(c)
    n_words = _word_count(c)
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"[^\w\s]"), F.lit(0)))
    n_stop = lang_scores(c, "en")
    punct_ratio = r4(n_punct / F.greatest(n_chars, F.lit(1)))
    stop_ratio = r4(n_stop / F.greatest(n_words, F.lit(1)))
    return df.select(
        "doc_id",
        n_chars.alias("n_chars_measured"),
        n_words.alias("n_words"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        quality_col(c).alias("quality"),
    )


def fingerprint(df: "DataFrame", text_col: str = "text") -> "DataFrame":
    """Order-sensitive rolling document fingerprint.

    Defined over (position, first-char code, word length) so the exact
    same integer is computable in ANSI SQL on any engine:
        fp = sum_i (i+1) * (ascii(word_i[0]) * 31 + len(word_i)) mod P
    """
    from pyspark.sql import functions as F

    from .parallelism import widen_small_scan

    # widen tiny scans before the posexplode + sum aggregate (r6,
    # guide §2.2); keyed on doc_id so the groupBy reuses the exchange
    words = widen_small_scan(
        df.select("doc_id", text_col), "doc_id"
    ).select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
            "pos", "word"
        ),
    )
    term = (F.col("pos") + 1) * (
        F.ascii(F.substring("word", 1, 1)) * 31 + F.length("word")
    )
    return (
        words.groupBy("doc_id")
        .agg((F.sum(term) % FINGERPRINT_MOD).alias("fp"))
    )


def repetition_stats(df: "DataFrame", text_col: str = "text") -> "DataFrame":
    """Within-document repetition signals (Gopher-style quality rules,
    public: Rae et al. 2021 §A1.1 — fraction of duplicate lines and the
    fraction of characters inside duplicated lines).

    One explode + one per-(doc, line) count + one per-doc agg — a single
    shuffle keyed by doc_id; all expressions JVM-side.
    """
    from pyspark.sql import functions as F

    lines = df.select(
        "doc_id",
        F.explode(F.split(F.col(text_col), r"\n")).alias("line"),
    ).filter(F.trim("line") != "")
    per_line = lines.groupBy("doc_id", "line").agg(
        F.count("*").alias("n"), F.length("line").alias("len")
    )
    return per_line.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_lines"),
        F.count("*").cast("long").alias("n_distinct_lines"),
        r4(1 - F.count("*") / F.sum("n")).alias("dup_line_frac"),
        r4(
            F.sum(F.when(F.col("n") > 1, F.col("n") * F.col("len")).otherwise(0))
            / F.sum(F.col("n") * F.col("len"))
        ).alias("dup_line_char_frac"),
        F.max("len").cast("long").alias("max_line_len"),
    )


def corpus_stats(df: "DataFrame", text_col: str = "text") -> "DataFrame":
    """Per-language corpus profile (the "datasheet" aggregate every
    published corpus ships): doc counts, EXACT length percentiles
    (exact `percentile`, not approx, so the result is
    engine-portable; at 100 TB switch to percentile_approx and drop
    the oracle row to rows-only), whitespace-token totals, and the
    mean heuristic quality.

    ``mean_quality`` is engine-reproducible by construction: per-doc
    quality is 4-decimal-quantized (:func:`r4`), so the aggregate sums
    EXACT integers (quality*10⁴ as long — no order-sensitive float
    summation) and divides once at the end."""
    from pyspark.sql import functions as F

    c = F.col(text_col)
    n = F.length(c)
    q_int = F.round(quality_col(c) * 10000).cast("long")
    return df.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(n).cast("long").alias("total_chars"),
        r4(F.expr(f"percentile(length({text_col}), 0.5)")).alias("p50_chars"),
        r4(F.expr(f"percentile(length({text_col}), 0.9)")).alias("p90_chars"),
        F.max(n).cast("long").alias("max_chars"),
        F.sum(_word_count(c)).cast("long").alias("total_words"),
        r4(F.expr(
            f"percentile(size(split(trim({text_col}), '\\\\s+')), 0.5)"
        )).alias("p50_words"),
        r4(F.sum(q_int) / (F.count("*") * F.lit(10000.0)))
        .alias("mean_quality"),
    )


def top_ngram_stats(
    df: "DataFrame", text_col: str = "text", n: int = 2
) -> "DataFrame":
    """Remaining Gopher repetition rule (Rae et al. 2021 §A1.1): the
    fraction of characters covered by the single most frequent word
    n-gram. High values flag templated/spammy documents.

    Shape: explode n-grams (contiguous, NOT deduped — counts matter),
    per-(doc, gram) counts, keep the max-count gram per doc via one
    ordered window. Two shuffles, both keyed by doc_id.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    words = F.split(F.trim(F.col(text_col)), r"\s+")

    def grams(wb):
        k = F.size(wb) - (n - 1)
        return F.transform(
            F.sequence(F.lit(0), F.greatest(k, F.lit(1)) - 1),
            lambda i: F.concat_ws(" ", F.slice(wb, i + 1, n)),
        )

    exploded_g = df.select(
        "doc_id",
        F.length(F.col(text_col)).alias("_chars"),
        F.explode(F.flatten(F.transform(F.array(words), grams))).alias("g"),
    )
    counts = exploded_g.groupBy("doc_id", "_chars", "g").agg(
        F.count("*").alias("cnt")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("cnt"), F.asc("g")
    )
    top = counts.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    return top.select(
        "doc_id",
        F.col("g").alias("top_gram"),
        F.col("cnt").cast("long").alias("top_gram_count"),
        r4(
            (F.col("cnt") * F.length("g"))
            / F.greatest(F.col("_chars"), F.lit(1))
        ).alias("top_gram_char_frac"),
    )


def char_entropy_col(c, max_chars: int | None = None) -> "Column":
    """Shannon entropy (bits/char) of the document's character
    distribution — the standard cheap gibberish / encoding-artifact
    signal (low entropy = repeated-char runs and template filler, high
    entropy = binary-ish or key-mashed noise; Dolma-style pipelines
    band-pass on it between language-ID and the learned classifier).

    Engine-portable by construction so a DuckDB oracle can replay the
    exact doubles: the char array is SORTED, run-length encoded with
    array higher-order functions (the ``gopher_repetition``
    ``impl="local"`` trick), and the ``-(k/n)*log2(k/n)`` terms fold
    LEFT-TO-RIGHT in sorted-character order — both engines add the
    same terms in the same sequence. Zero shuffles, zero Python.
    ASCII/BMP caveat: Spark splits on UTF-16 code units while DuckDB
    splits on code points, so cross-engine parity holds for BMP text
    (astral chars count as 2 units here).

    ``max_chars``: compute over only the first N chars (the oracle
    mirror is ``substr(text, 1, N)``). Measured ~1 µs/char (the sort
    dominates); the distribution of a prefix converges to the doc's
    within a few KB, so capping is the right shape when documents can
    be arbitrarily large — ``None`` (exact, default) fits corpora
    whose docs are already length-bounded upstream.
    """
    from pyspark.sql import functions as F

    if max_chars is not None:
        c = F.substring(c, 1, max_chars)

    # one-element-array transforms give LET-BINDING semantics: the
    # sorted char array (and then the run-start list) evaluate once
    # per row instead of once per lambda ELEMENT — without this,
    # Catalyst re-evaluates the outer sort per sequence index and the
    # expression goes O(len^2) per document (the round-4
    # gopher_repetition transform-lambda lesson)
    def ent_of(chars):
        m = F.size(chars)
        starts_expr = F.filter(
            F.sequence(F.lit(1), m),
            lambda i: (i == F.lit(1))
            | (
                F.element_at(chars, i)
                != F.element_at(chars, i - F.lit(1))
            ),
        )

        def with_starts(starts):
            ends = F.concat(
                F.slice(starts, 2, F.size(starts)), F.array(m + 1)
            )
            counts = F.zip_with(
                starts, ends, lambda s, e: (e - s).cast("double")
            )
            md = m.cast("double")
            return F.aggregate(
                counts,
                F.lit(0.0),
                lambda acc, k: acc - (k / md) * F.log2(k / md),
            )

        return F.element_at(
            F.transform(F.array(starts_expr), with_starts), 1
        )

    ent = F.element_at(
        F.transform(F.array(F.array_sort(F.split(c, ""))), ent_of), 1
    )
    return F.when(F.length(c) >= 1, ent).otherwise(F.lit(0.0))


def char_entropy(
    df: "DataFrame",
    text_col: str = "text",
    *,
    min_bits: float = 2.0,
    max_bits: float = 6.0,
    max_chars: int | None = None,
) -> "DataFrame":
    """Per-document character entropy + the band-pass keep bit.

    Returns (doc_id, char_entropy, entropy_keep). Natural-language
    text sits around 3.5-4.5 bits/char; the default band keeps it and
    drops single-char floods (0 bits), template filler (< 2) and
    high-entropy noise (> 6 — base64 blobs, minified blobs, mashed
    keys). A pure projection — same plan class as the Gopher rules.
    """
    from pyspark.sql import functions as F

    ent = char_entropy_col(F.col(text_col), max_chars)
    return df.select(
        "doc_id",
        r4(ent).alias("char_entropy"),
        ((ent >= min_bits) & (ent <= max_bits)).alias("entropy_keep"),
    )


def _sentence_count(c) -> "Column":
    """[.!?]+-run sentence count, floored at 1 (shared by flesch_col
    and readability_scores so the two surfaces cannot drift)."""
    from pyspark.sql import functions as F

    return F.greatest(
        F.size(F.filter(F.split(c, "[.!?]+"), lambda s: F.trim(s) != "")),
        F.lit(1),
    )


def _syllable_count(c) -> "Column":
    """Vowel-group syllable estimate (the standard approximation)."""
    from pyspark.sql import functions as F

    return F.size(
        F.regexp_extract_all(F.lower(c), F.lit("[aeiouy]+"), F.lit(0))
    )


def flesch_col(c) -> "Column":
    """:func:`readability_scores`'s Flesch reading ease as a single
    Column expression (the projection-not-join shape the pipelines
    fold into their existing filter stage)."""
    from pyspark.sql import functions as F

    sentences = _sentence_count(c)
    words = F.greatest(_word_count(c), F.lit(1))
    syllables = _syllable_count(c)
    return r4(
        F.lit(206.835)
        - F.lit(1.015) * (words / sentences)
        - F.lit(84.6) * (syllables / words)
    )


def readability_scores(df: "DataFrame", text_col: str = "text") -> "DataFrame":
    """Flesch Reading Ease + its components — the classic readability
    measure educational-quality curation uses as a cheap proxy (the
    FineWeb-Edu family scores "educational value"; readability is the
    zero-model member of that family). Heuristic and English-centric
    by definition: sentences are [.!?]+ runs, syllables are vowel
    GROUPS ([aeiouy]+) — the standard approximation.

    Returns ``df`` plus n_sentences / n_syllables (longs) and
    ``flesch`` = r4(206.835 − 1.015·(words/sentences) −
    84.6·(syllables/words)). Fixed-order double arithmetic over exact
    integer counts, so any engine reproduces the value bit-for-bit;
    sentence/word counts are floored at 1 (an empty doc scores as one
    empty sentence rather than dividing by zero).

    100 TB shape: a pure Column projection — zero shuffle, zero
    Python."""
    from pyspark.sql import functions as F

    c = F.col(text_col)
    return df.select(
        "*",
        _sentence_count(c).cast("long").alias("n_sentences"),
        _syllable_count(c).cast("long").alias("n_syllables"),
        flesch_col(c).alias("flesch"),
    )


# Unicode script ranges as LITERAL char-class strings (BMP core blocks
# — the ranges that carry the bulk of real web text per script). The
# class strings are built from literal codepoints, not \u/\x escapes,
# so the IDENTICAL string is valid in both Java regex (Spark) and RE2
# (DuckDB) — the same dialect-pinning trick as the control-char scrub.
SCRIPT_CLASSES = {
    "latin": "[A-Za-z" + chr(0xC0) + "-" + chr(0x24F) + "]",
    "cyrillic": "[" + chr(0x400) + "-" + chr(0x4FF) + "]",
    "greek": "[" + chr(0x370) + "-" + chr(0x3FF) + "]",
    "arabic": "[" + chr(0x600) + "-" + chr(0x6FF) + "]",
    # Hiragana+Katakana, CJK ext A, CJK unified, Hangul syllables
    "cjk": (
        "[" + chr(0x3040) + "-" + chr(0x30FF)
        + chr(0x3400) + "-" + chr(0x4DBF)
        + chr(0x4E00) + "-" + chr(0x9FFF)
        + chr(0xAC00) + "-" + chr(0xD7AF) + "]"
    ),
}
SCRIPT_ORDER = ("latin", "cyrillic", "greek", "arabic", "cjk")


def script_profile(df: "DataFrame", text_col: str = "text") -> "DataFrame":
    """Unicode-script character profile — the lang-ID companion signal
    for non-space-delimited and non-Latin text (CCNet/fastText-style
    pipelines route on script before language): per doc, the count of
    characters in each major script class, the non-whitespace total,
    per-script fractions (r4-rounded), and the dominant script
    (highest count; ties and all-zero resolve through the fixed
    SCRIPT_ORDER, then 'other').

    Counting is ``length(text) - length(regexp_replace(text, class,
    ''))`` per class — pure JVM codegen, zero shuffle, and the class
    strings are literal-codepoint ranges valid verbatim in DuckDB's
    RE2, so the oracle replays the identical patterns (a cross-engine
    dialect gate). Returns (doc_id, n_script_chars, n_<script>...,
    <script>_frac..., dominant_script)."""
    from pyspark.sql import functions as F

    c = F.col(text_col)
    # counts cast to long: the DuckDB oracle's length() is BIGINT and
    # the driver hash compares raw dtypes
    total = (
        F.length(F.regexp_replace(c, r"\s+", "")).cast("long")
    ).alias("n_script_chars")
    counts = {
        name: (
            F.length(c) - F.length(F.regexp_replace(c, cls, ""))
        ).cast("long").alias(f"n_{name}")
        for name, cls in SCRIPT_CLASSES.items()
    }
    out = df.select("doc_id", total, *counts.values())
    tot = F.greatest(F.col("n_script_chars"), F.lit(1))
    for name in SCRIPT_ORDER:
        out = out.withColumn(
            f"{name}_frac",
            r4(F.col(f"n_{name}").cast("double") / tot.cast("double")),
        )
    best = F.greatest(*[F.col(f"n_{s}") for s in SCRIPT_ORDER])
    dom = F.when(best == 0, F.lit("other"))
    for name in SCRIPT_ORDER:
        dom = dom.when(F.col(f"n_{name}") == best, F.lit(name))
    return out.withColumn("dominant_script", dom)


def extraction_f1(
    pred: "DataFrame",
    gold: "DataFrame",
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> "DataFrame":
    """Token-level extraction quality vs a gold reference — the
    standard main-content-extraction benchmark metric (how
    trafilatura/boilerpipe-style evals score extractors): per doc,
    multiset precision/recall/F1 of whitespace tokens.

    ``overlap = sum over distinct tokens of min(pred_count,
    gold_count)``; precision = overlap/n_pred, recall =
    overlap/n_gold, F1 = 2PR/(P+R) (0 when degenerate), all r4-rounded
    at OUTPUT (the division chain itself is IEEE-deterministic given
    the integer counts, so an oracle replaying the same expression
    shape matches bit-for-bit).

    Scale shape: one explode per side to (doc, token) counts, a full
    outer equi-join on (doc, token), then a per-doc sum — everything
    shuffles on (doc, token) pairs, never text. Docs empty on BOTH
    sides produce no row (nothing to score); a doc empty on one side
    scores 0 on that side's metric."""
    from pyspark.sql import functions as F

    def counts(df, name):
        toks = df.select(
            F.col(doc_col).alias("doc_id"),
            F.explode(
                F.filter(
                    F.split(F.trim(F.col(text_col)), r"\s+"),
                    lambda x: x != "",
                )
            ).alias("tok"),
        )
        return toks.groupBy("doc_id", "tok").agg(
            F.count("*").alias(name)
        )

    zero = F.lit(0).cast("long")
    j = counts(pred, "n_p").join(
        counts(gold, "n_g"), ["doc_id", "tok"], "full"
    )
    per = j.groupBy("doc_id").agg(
        F.sum(F.coalesce("n_p", zero)).alias("n_pred"),
        F.sum(F.coalesce("n_g", zero)).alias("n_gold"),
        F.sum(
            F.least(F.coalesce("n_p", zero), F.coalesce("n_g", zero))
        ).alias("n_overlap"),
    )
    p = F.when(
        F.col("n_pred") > 0, F.col("n_overlap") / F.col("n_pred")
    ).otherwise(F.lit(0.0))
    rr = F.when(
        F.col("n_gold") > 0, F.col("n_overlap") / F.col("n_gold")
    ).otherwise(F.lit(0.0))
    f1 = F.when(
        (p + rr) > 0, F.lit(2.0) * p * rr / (p + rr)
    ).otherwise(F.lit(0.0))
    return per.select(
        "doc_id", "n_pred", "n_gold", "n_overlap",
        r4(p).alias("precision"), r4(rr).alias("recall"),
        r4(f1).alias("f1"),
    )
