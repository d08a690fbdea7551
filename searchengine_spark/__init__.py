"""searchengine_spark — a PySpark-native URL-frontier + fetch-scheduler engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference crawler/search engine (taokayan/searchengine, studied at
/root/reference): URL frontier with per-host politeness + robots gating,
partitioned URL-seen set (bloom prefilter + exact anti-join), interleaved
text+media document store (`spans` arrays), link graph + PageRank,
tokenizer + sorted postings + multi-term search, plus the training-data
pipeline operators a 100 TB corpus needs (dedup families, ANN similarity,
text quality analysis, multimodal plumbing).

Design stance (SURVEY.md §7): everything is DataFrame/SQL declarative so
Catalyst owns the physical plan; the only Python on the hot path is
vectorized pandas/Arrow UDFs (span extraction, link extraction, URL
canonicalization twin). State lives in snapshot-versioned tables
(sources/statestore.py — parquet-backed locally, Iceberg drop-in at
production) so a crawl resumes from the last committed snapshot.
"""

__version__ = "0.1.0"
