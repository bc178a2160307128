"""BM25 retrieval (operators/retrieval.py): value parity against a
pure-Python recomputation with the same fixed-order arithmetic, cut
determinism, and plan shape (no Python eval, no cartesian corpus
join)."""

import math

import pytest

from html_to_document_spark.operators.retrieval import bm25_score, bm25_topk

K1, B = 1.2, 0.75


def _py_bm25(corpus, terms):
    """Reference scores with the operator's exact evaluation order."""
    toks = {i: [w for w in t.lower().split() if w] for i, t in corpus}
    dl = {i: len(ws) for i, ws in toks.items()}
    n = float(len(corpus))
    avgdl = float(sum(dl.values())) / n
    dfq = {
        t: float(sum(1 for ws in toks.values() if t in ws)) for t in terms
    }
    out = {}
    for i, ws in toks.items():
        score = None
        matched = 0
        for t in sorted(set(terms)):
            tf = float(ws.count(t))
            if tf > 0:
                matched += 1
            idf = math.log(1.0 + (n - dfq[t] + 0.5) / (dfq[t] + 0.5))
            denom = tf + K1 * ((1.0 - B) + B * dl[i] / avgdl)
            s = idf * tf * (K1 + 1.0) / denom
            score = s if score is None else score + s
        if matched:
            out[i] = (matched, math.floor(score * 10000 + 0.5) / 10000)
    return out


CORPUS = [
    (1, "spark shuffle join hash join hash table"),
    (2, "broadcast join small table"),
    (3, "sort merge join large shuffle"),
    (4, "hash aggregate partial combine"),
    (5, "nothing relevant here at all"),
    (6, "  hash   join \t hash join  "),  # messy whitespace
]


def test_scores_match_reference(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_matched"], r["score"])
        for r in bm25_score(df, ["join", "hash"]).collect()
    }
    assert got == _py_bm25(CORPUS, ["join", "hash"])


def test_no_match_docs_excluded(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    ids = {r["doc_id"] for r in bm25_score(df, ["join"]).collect()}
    assert 5 not in ids and 4 not in ids
    assert ids == {1, 2, 3, 6}


def test_topk_cut_deterministic(spark):
    # docs 10/11/12 are identical -> identical scores; the cut inside
    # the tie must take the smallest ids
    corpus = [(i, "alpha beta") for i in (10, 11, 12)] + [
        (1, "alpha alpha alpha beta")
    ]
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    rows = bm25_topk(df, ["alpha"], k=3).collect()
    assert [r["doc_id"] for r in rows] == [1, 10, 11]


def test_empty_query_raises(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    with pytest.raises(ValueError):
        bm25_score(df, ["  ", ""])


def test_plan_shape(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    plan = (
        bm25_score(df, ["join", "hash"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # stays JVM-side and the single-row aggregates broadcast (BNLJ),
    # never a cartesian of the corpus against itself
    assert "BatchEvalPython" not in plan and "mapInPandas" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# multi-query batch (bm25_score_multi / bm25_topk_multi)
# ---------------------------------------------------------------------------

QUERIES = {
    "q_join": ["join", "hash"],
    "q_shuffle": ["shuffle"],
    "q_table": ["table", "small", "join"],
}


def test_multi_bit_identical_to_single(spark):
    from html_to_document_spark.operators.retrieval import bm25_score_multi

    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    multi = bm25_score_multi(df, QUERIES).collect()
    got = {
        (r["query_id"], r["doc_id"]): (r["n_matched"], r["score"])
        for r in multi
    }
    expect = {}
    for qid, terms in QUERIES.items():
        for r in bm25_score(df, terms).collect():
            expect[(qid, r["doc_id"])] = (r["n_matched"], r["score"])
    # exact equality INCLUDING the float scores: the sorted-term fold
    # replays the single-query pivot's addition order bit-for-bit
    assert got == expect


def test_multi_topk_per_query(spark):
    from html_to_document_spark.operators.retrieval import (
        bm25_topk, bm25_topk_multi,
    )

    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    multi = bm25_topk_multi(df, QUERIES, k=2).collect()
    for qid, terms in QUERIES.items():
        single = [r["doc_id"] for r in bm25_topk(df, terms, k=2).collect()]
        got = sorted(
            [r for r in multi if r["query_id"] == qid],
            key=lambda r: (-r["score"], r["doc_id"]),
        )
        assert [r["doc_id"] for r in got] == single


def test_multi_empty_query_raises(spark):
    from html_to_document_spark.operators.retrieval import bm25_score_multi

    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    with pytest.raises(ValueError):
        bm25_score_multi(df, {"bad": ["", "  "]})


def test_tfidf_keywords_hand_case(spark):
    import math

    from html_to_document_spark.operators.retrieval import tfidf_keywords

    def pr4(x):
        return math.floor(x * 1e4 + 0.5) / 1e4

    d = spark.createDataFrame(
        [
            (1, "apple apple banana kiwi a"),
            (2, "banana kiwi kiwi melon bb"),
            (3, "melon melon apple zebra"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_keywords(d, k=2, max_df_frac=0.7).collect()
    rows = {(r.doc_id, r.rank): (r.term, r.tf, r.score) for r in out}
    idf2 = math.log(4.0 / 3.0) + 1.0  # df=2, N=3 -> ln(4/3)+1
    idf1 = math.log(2.0) + 1.0  # df=1 -> ln(4/2)+1
    assert rows[(3, 1)] == ("melon", 2, pr4(2 * idf2))
    assert rows[(3, 2)] == ("zebra", 1, pr4(idf1))
    assert rows[(1, 1)] == ("apple", 2, pr4(2 * idf2))
    # banana/kiwi tie at idf2 -> term asc picks banana
    assert rows[(1, 2)] == ("banana", 1, pr4(idf2))
    assert rows[(2, 1)] == ("kiwi", 2, pr4(2 * idf2))
    # min_word_len dropped "a" and "bb" everywhere
    assert not any(r.term in ("a", "bb") for r in out)


def test_tfidf_keywords_corpus_stopword_prune(spark):
    from html_to_document_spark.operators.retrieval import tfidf_keywords

    d = spark.createDataFrame(
        [
            (1, "apple apple banana kiwi"),
            (2, "banana kiwi kiwi melon"),
            (3, "melon melon apple zebra"),
        ],
        "doc_id long, text string",
    )
    # df/N <= 0.5 excludes every term in 2 of 3 docs: only zebra stays
    only = tfidf_keywords(d, k=3, max_df_frac=0.5).collect()
    assert {(r.doc_id, r.term) for r in only} == {(3, "zebra")}
