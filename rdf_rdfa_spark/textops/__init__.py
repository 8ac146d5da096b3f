"""Training-data pipeline operations over the documents/embeddings
tables: deduplication, text quality/analysis, similarity search,
multimodal plumbing. All hot paths are JVM column expressions or
Arrow-vectorized pandas UDFs — no per-row Python.
"""
