"""elastichash_spark — a PySpark-native inverted-index build + BM25 top-k query
engine over tables of multi-turn transcripts.

Structural transposition of umr-ds/ElasticHash (reference at /root/reference):

- ElasticHash's offline ES index build (``dh/tools/import_csv.py``) becomes a
  staged, resumable Spark job that tokenizes turns with vectorized Arrow UDFs
  and writes posting-list tables (delta+varbyte compressed blocks).
- The precomputed ``nbs`` neighbors index (``dh/tools/create_nbs_index.py``)
  becomes per-block max-BM25-impact metadata (block-max WAND upper bounds).
- The two-stage query (64-bit Hamming prefilter then 256-bit exact rerank,
  ``dh/app/templates/es_query.7.x.json``) becomes block-max WAND candidate
  pruning followed by exact BM25 rescoring of survivors.
- The ``es-long`` exact index used as evaluation oracle
  (``experiments/README.md:28-32``) becomes :mod:`elastichash_spark.oracle`,
  a brute-force exact BM25 scorer in plain DataFrame ops.
"""

__version__ = "0.1.0"
