"""Mixture resampling: fraction math (pure) + Spark composition."""

import pytest

from html_to_document_spark.operators.mixture import (
    mixture_fractions,
    resample_mixture,
)


def test_mixture_fractions_binding_source():
    counts = {"web": 1000, "books": 100, "code": 400}
    # want 50/25/25; books binds: 100/0.25 = 400 total max
    f = mixture_fractions(counts, {"web": 0.5, "books": 0.25, "code": 0.25})
    assert f["books"] == 1.0
    assert f["web"] == pytest.approx(200 / 1000)
    assert f["code"] == pytest.approx(100 / 400)


def test_mixture_fractions_drops_untargeted_and_validates():
    f = mixture_fractions({"a": 10, "junk": 99}, {"a": 1.0})
    assert f == {"a": 1.0, "junk": 0.0}
    with pytest.raises(ValueError):
        mixture_fractions({"a": 10}, {"a": 1.0, "missing": 1.0})
    with pytest.raises(ValueError):
        mixture_fractions({"a": 10}, {})


def test_resample_mixture_composition(spark):
    rows = ([(i, "web") for i in range(4000)]
            + [(i, "books") for i in range(4000, 4400)]
            + [(i, "code") for i in range(4400, 6000)])
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = resample_mixture(df, {"web": 0.5, "books": 0.25, "code": 0.25},
                           seed=7)
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").count().withColumnRenamed("count", "n")
           .collect()}
    # books binds at 400 -> total ~1600: web ~800, code ~400
    assert got["books"] == 400               # fraction 1.0 is exact
    assert 700 <= got["web"] <= 900          # Bernoulli tolerance
    assert 330 <= got["code"] <= 470
    # deterministic for a fixed seed
    again = {r["source"]: r["n"] for r in
             resample_mixture(df, {"web": 0.5, "books": 0.25,
                                   "code": 0.25}, seed=7)
             .groupBy("source").count().withColumnRenamed("count", "n")
             .collect()}
    assert got == again


def test_select_token_budget_exact_prefix(spark):
    """r5: keep_budget marks exactly the greedy (quality desc, id asc)
    prefix whose running token total fits the budget — strict prefix
    (nothing later slips in), boundary bucket split by id order, NULL
    quality never kept, NULL tokens count 0."""
    from html_to_document_spark.operators.mixture import (
        select_token_budget,
    )

    rows = [
        (1, 0.9, 100), (2, 0.9, 100),            # q=0.9: 200 total
        (3, 0.5, 100), (4, 0.5, 100), (5, 0.5, 100),  # boundary bucket
        (6, 0.1, 10),                             # after boundary: out
        (7, None, 10),                            # NULL quality: out
        (8, 0.5, None),                           # NULL tokens: 0
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, quality double, n_tokens long"
    )
    # budget 450: q=0.9 bucket (200) fully kept; boundary q=0.5 has
    # remaining 250 -> ids 3,4 (cum 100,200) kept, 5 (cum 300) out —
    # and id 8 (0 tokens) is ALSO out: its running total (500)
    # includes id 5's overflow, the strict-prefix rule
    out = {r.doc_id: r.keep_budget for r in select_token_budget(
        df, budget=450
    ).collect()}
    assert out == {1: True, 2: True, 3: True, 4: True, 5: False,
                   6: False, 7: False, 8: False}

    # budget covers everything scored -> all non-NULL-quality kept
    out = {r.doc_id: r.keep_budget for r in select_token_budget(
        df, budget=10_000
    ).collect()}
    assert out == {i: (i != 7) for i in range(1, 9)}

    # budget smaller than the best bucket's first doc: nothing kept
    out = {r.doc_id: r.keep_budget for r in select_token_budget(
        df, budget=50
    ).collect()}
    assert not any(out.values())


# ---------------------------------------------------------------------------
# hash_split_col: deterministic md5-prefix train/val/test assignment
# ---------------------------------------------------------------------------

def test_hash_split_matches_python_md5(spark):
    import hashlib

    from pyspark.sql import functions as F

    from html_to_document_spark.operators.mixture import (
        hash_split_col, split_boundaries,
    )

    fr = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    bounds = split_boundaries(fr)
    df = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    got = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", hash_split_col("doc_id", fr, "z").alias("s")
        ).collect()
    }

    def expect(i):
        p = hashlib.md5(f"z{i}".encode()).hexdigest()[:8]
        for (label, _), b in zip(fr, bounds):
            if p < b:
                return label
        return fr[-1][0]

    assert got == {i: expect(i) for i in range(500)}
    # all three labels actually occur at this n
    assert set(got.values()) == {"train", "val", "test"}


def test_hash_split_stable_under_repartition(spark):
    from pyspark.sql import functions as F

    from html_to_document_spark.operators.mixture import hash_split_col

    fr = [("a", 0.5), ("b", 0.5)]
    df = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    one = df.select("doc_id", hash_split_col("doc_id", fr).alias("s"))
    other = (
        df.repartition(7, "doc_id")
        .select("doc_id", hash_split_col("doc_id", fr).alias("s"))
    )
    assert sorted(map(tuple, one.collect())) == sorted(
        map(tuple, other.collect())
    )


def test_split_boundaries_validation():
    import pytest

    from html_to_document_spark.operators.mixture import split_boundaries

    with pytest.raises(ValueError):
        split_boundaries([])
    with pytest.raises(ValueError):
        split_boundaries([("a", -0.1), ("b", 1.1)])
    with pytest.raises(ValueError):
        split_boundaries([("a", 0.0)])
    # unnormalized weights normalize
    assert split_boundaries([("a", 2), ("b", 2)]) == ["80000000"]


def test_split_boundaries_saturated_fraction(spark):
    """A cumulative fraction reaching 1.0 must still compare GREATER
    than every 8-hex md5 prefix (review r5-cont4: format(2**32,'08x')
    is 9 chars and lexically SMALLER than most prefixes, flipping
    ~94% of assignments to the zero-fraction label)."""
    from pyspark.sql import functions as F

    from html_to_document_spark.operators.mixture import (
        hash_split_col, split_boundaries,
    )

    assert split_boundaries([("train", 1.0), ("x", 0.0)]) == ["g"]
    df = spark.range(0, 300).select(F.col("id").alias("doc_id"))
    got = {
        r["s"]
        for r in df.select(
            hash_split_col(
                "doc_id", [("train", 1.0), ("x", 0.0)]
            ).alias("s")
        ).collect()
    }
    assert got == {"train"}


def test_temperature_fractions_exact():
    from html_to_document_spark.operators.mixture import (
        temperature_fractions,
    )

    # sqrt counts 100/25/4 -> ratios 10/5/2 -> fracs 0.2/0.4/1.0 exact
    assert temperature_fractions(
        {"a": 100, "b": 25, "c": 4}, alpha=0.5
    ) == {"a": 0.2, "b": 0.4, "c": 1.0}
    # alpha=1 keeps the natural distribution: nobody downsamples
    assert temperature_fractions(
        {"a": 100, "b": 7}, alpha=1.0
    ) == {"a": 1.0, "b": 1.0}
    # alpha=0 targets uniform: frac = n_min / n_k
    assert temperature_fractions(
        {"a": 100, "b": 25}, alpha=0.0
    ) == {"a": 0.25, "b": 1.0}
    # zero-count groups drop; empty input returns empty
    assert temperature_fractions({"a": 10, "z": 0}, alpha=0.5) == {
        "a": 1.0
    }
    assert temperature_fractions({}, alpha=0.5) == {}


def test_temperature_fractions_alpha_bounds():
    import pytest

    from html_to_document_spark.operators.mixture import (
        temperature_fractions,
    )

    with pytest.raises(ValueError):
        temperature_fractions({"a": 1}, alpha=-0.1)
    with pytest.raises(ValueError):
        temperature_fractions({"a": 1}, alpha=1.5)


def test_temperature_fraction_col_and_resample(spark):
    from pyspark.sql import functions as F

    from html_to_document_spark.operators.mixture import (
        resample_temperature,
        temperature_fraction_col,
    )

    rows = (
        [(i, "en") for i in range(100)]
        + [(i + 100, "fr") for i in range(25)]
        + [(i + 200, "zh") for i in range(4)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_fraction_col(df, group_col="lang", alpha=0.5)
    got = {
        r["lang"]: r["f"]
        for r in out.select(
            "lang", F.col("temp_keep_frac").alias("f")
        ).distinct().collect()
    }
    assert got == {"en": 0.2, "fr": 0.4, "zh": 1.0}

    kept = resample_temperature(df, group_col="lang", alpha=0.5, seed=7)
    by_lang = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang").agg(
            F.count("*").alias("n")
        ).collect()
    }
    # the binding group keeps everything (fraction exactly 1.0);
    # others are Bernoulli around n*frac
    assert by_lang["zh"] == 4
    assert 8 <= by_lang["en"] <= 35 and 3 <= by_lang["fr"] <= 18
    assert kept.columns == df.columns


def test_shuffle_shard_matches_naive_and_is_deterministic(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from html_to_document_spark.operators.mixture import (
        hash_split_col,
        shuffle_shard,
    )

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = shuffle_shard(df, n_shards=4, salt="s5", sub_hex=2)
    out.cache()
    try:
        # per-shard positions are a dense 0..n_k-1 permutation
        for r in out.groupBy("shard").agg(
            F.count("*").alias("n"),
            F.countDistinct("shard_pos").alias("d"),
            F.min("shard_pos").alias("mn"),
            F.max("shard_pos").alias("mx"),
        ).collect():
            assert r["d"] == r["n"] and r["mn"] == 0
            assert r["mx"] == r["n"] - 1
        # shards are near-equal (md5 uniformity at n=2000, 4 shards)
        sizes = [
            r["n"]
            for r in out.groupBy("shard").agg(
                F.count("*").alias("n")
            ).collect()
        ]
        assert len(sizes) == 4 and min(sizes) > 380
        # the histogram+window algorithm equals the naive global
        # row_number formulation (the oracle shape) exactly
        naive = (
            df.withColumn(
                "_d",
                F.md5(F.concat(F.lit("s5"), F.col("doc_id").cast("string"))),
            )
            .withColumn(
                "shard",
                hash_split_col(
                    "doc_id", [(str(i), 1.0) for i in range(4)], "s5"
                ).cast("int"),
            )
            .withColumn(
                "shard_pos",
                F.row_number().over(
                    Window.partitionBy("shard").orderBy("_d", "doc_id")
                )
                - 1,
            )
            .drop("_d")
        )
        assert out.select(*naive.columns).exceptAll(naive).count() == 0
        assert naive.exceptAll(out.select(*naive.columns)).count() == 0
        # deterministic under repartition (assignment + position both)
        again = shuffle_shard(
            df.repartition(7), n_shards=4, salt="s5", sub_hex=2
        )
        assert again.exceptAll(out).count() == 0
    finally:
        out.unpersist()


def test_shuffle_shard_single_shard_and_validation(spark):
    import pytest as _pytest

    from html_to_document_spark.operators.mixture import shuffle_shard

    df = spark.range(0, 50).withColumnRenamed("id", "doc_id")
    one = shuffle_shard(df, n_shards=1, salt="x", sub_hex=1)
    rows = one.select("shard", "shard_pos").collect()
    assert {r["shard"] for r in rows} == {0}
    assert sorted(r["shard_pos"] for r in rows) == list(range(50))
    with _pytest.raises(ValueError):
        shuffle_shard(df, n_shards=0)
    with _pytest.raises(ValueError):
        shuffle_shard(df, sub_hex=0)


def test_stratified_sample_exact_k_and_naive_parity(spark):
    import hashlib

    from html_to_document_spark.operators.mixture import stratified_sample

    rows = [(i, ["en", "es", "fr"][i % 3]) for i in range(90)]
    rows += [(1000 + i, "de") for i in range(2)]  # stratum smaller than k
    df = spark.createDataFrame(rows, "doc_id long, lang string")

    got = stratified_sample(df, "lang", k=7, salt="s").collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    assert {k_: len(v) for k_, v in by_lang.items()} == {
        "en": 7, "es": 7, "fr": 7, "de": 2,
    }

    # naive formulation parity: k smallest (md5('s'||id), id) per lang
    want = {}
    for did, lang in rows:
        want.setdefault(lang, []).append(
            (hashlib.md5(f"s{did}".encode()).hexdigest(), did)
        )
    for lang, lst in want.items():
        lst.sort()
        assert {d for _, d in lst[:7]} == by_lang[lang]

    # deterministic under repartitioning
    again = stratified_sample(df.repartition(13), "lang", k=7, salt="s")
    assert {(r.doc_id, r.lang) for r in again.collect()} == {
        (r.doc_id, r.lang) for r in got
    }


def test_stratified_sample_boundary_splits_bucket(spark):
    # sub_hex=1 forces multi-row sub-buckets so the boundary-bucket
    # window path actually runs (quota < count for some bucket)
    import hashlib

    from html_to_document_spark.operators.mixture import stratified_sample

    rows = [(i, "en") for i in range(64)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = sorted(
        r.doc_id
        for r in stratified_sample(df, "lang", k=10, salt="q",
                                   sub_hex=1).collect()
    )
    lst = sorted(
        (hashlib.md5(f"q{d}".encode()).hexdigest(), d) for d, _ in rows
    )
    assert got == sorted(d for _, d in lst[:10])


def test_stratified_sample_guards(spark):
    import pytest

    from html_to_document_spark.operators.mixture import stratified_sample

    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with pytest.raises(ValueError):
        stratified_sample(df, "lang", k=-1)
    with pytest.raises(ValueError):
        stratified_sample(df, "lang", k=1, sub_hex=0)
    assert stratified_sample(df, "lang", k=0).count() == 0


def test_stratified_sample_null_stratum_and_null_id(spark):
    # review r5c8 #1: NULL strata and NULL ids must participate
    import hashlib

    from html_to_document_spark.operators.mixture import stratified_sample

    rows = [(i, "en") for i in range(10)] + [
        (100 + i, None) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = stratified_sample(df, "lang", k=3, salt="s").collect()
    by = {}
    for r in got:
        by.setdefault(r.lang, set()).add(r.doc_id)
    assert len(by["en"]) == 3
    assert len(by[None]) == 3  # NULL stratum sampled like any other
    lst = sorted(
        (hashlib.md5(f"s{d}".encode()).hexdigest(), d)
        for d in range(100, 105)
    )
    assert by[None] == {d for _, d in lst[:3]}
    # NULL id: digest coalesces to md5(salt), row still sampleable
    df2 = spark.createDataFrame(
        [(None, "en"), (1, "en")], "doc_id long, lang string"
    )
    assert stratified_sample(df2, "lang", k=2).count() == 2


def test_stratified_sample_integer_stratum(spark):
    from html_to_document_spark.operators.mixture import stratified_sample

    df = spark.createDataFrame(
        [(i, i % 2) for i in range(20)], "doc_id long, bucket int"
    )
    got = stratified_sample(df, "bucket", k=4).collect()
    by = {}
    for r in got:
        by.setdefault(r.bucket, set()).add(r.doc_id)
    assert {k_: len(v) for k_, v in by.items()} == {0: 4, 1: 4}
