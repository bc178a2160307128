"""Pure-Python (Spark-free) document core: minify, tokenizer, DOM build,
mini-CSS cascade, span extraction, serializer.

Everything in this package is importable without a SparkSession so the
same code runs (a) inside Arrow-batched pandas UDFs on executors and
(b) directly in unit tests against the golden fixture corpus.
"""
