"""Large-scale training-data pipeline operators over document tables.

Beyond the reference's own operator set (SURVEY.md §2), these are the ops a
100 TB corpus pipeline needs: deduplication (exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding cosine), similarity search (brute-force +
LSH-bucketed ANN), text analysis (language-ID, quality scoring, token
counting, fingerprinting), and multimodal column plumbing.

All hot paths are JVM-side ``pyspark.sql.functions`` expressions; every op
that is ANSI-SQL-expressible has a DuckDB oracle in __spark_entry__.py.
"""
