"""tiny_search_engine_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch re-expression of the capabilities of
MarinYoung4596/tiny_search_engine (reference at /root/reference, C++11,
single-process, in-memory hash tables) as idiomatic PySpark dataflow:

- index build  = DataFrame pipeline: tokenize (Arrow-vectorized pandas UDF)
  → per-(doc,term) stats → salted repartition-by-term → compressed,
  doc-sharded posting lists with block-max skip metadata (numpy inside
  ``applyInPandas``) → parquet segment store with per-partition lineage.
- query        = batch query DataFrame joined against the segment store;
  exact parity path (reference semantics, incl. its quirks) and a
  block-max-WAND fast path over the compressed postings.

Nothing is ported: the reference tells us WHAT to compute
(tokenize → term stats → postings+idf → OR-recall → BM25/VSM features →
funnel → top-k); the HOW is Catalyst-optimized DataFrame ops plus
vectorized UDFs where Spark lacks the operator.
"""

__version__ = "0.1.0"
