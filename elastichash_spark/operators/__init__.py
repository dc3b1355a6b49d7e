"""Large-scale training-data pipeline operators built on the same Spark-first
primitives as the retrieval engine: exact/near deduplication, similarity
search over embeddings, text quality analysis, and multimodal column plumbing.
"""
