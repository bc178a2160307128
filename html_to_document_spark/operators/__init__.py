"""Spark-side operators: the extraction mapInPandas stage, lineage /
checkpoint-resume, and the large-scale training-data operators
(dedup, similarity search, text analysis, multimodal plumbing)."""
