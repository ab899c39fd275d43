"""Training-data operators for the 100 TB pipeline: dedup, similarity,
text analysis, multimodal plumbing.  Each operator is a Ray Data batch
transform (or a short composition ending in a small groupby) with a DuckDB
oracle in ``ops.contract`` where SQL-expressible."""
