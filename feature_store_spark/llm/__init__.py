"""LLM-training-data pipeline operators (SURVEY.md §2.12 extension
surface): text analysis, deduplication (exact / MinHash-LSH / SimHash /
n-gram Jaccard / embedding cosine), similarity search (brute-force +
LSH-bucketed ANN), multimodal column plumbing, and pretraining-corpus
preparation (train/eval decontamination, repetition quality rules,
PII scrubbing, temperature-weighted domain mixing, token-budget
sequence packing, exact-substring duplicate-span statistics,
vocabulary coverage curves).

All deterministic and cross-engine reproducible: hashing is md5-based
(identical in Spark and DuckDB), folds are explicit sequential
aggregates, and scores are rounded before any ranking that feeds a
top-k cut.
"""
