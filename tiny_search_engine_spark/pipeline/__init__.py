"""Large-scale training-data pipeline operators over document tables.

Beyond the reference's own operator set (SURVEY.md §2), these are the ops a
100 TB corpus pipeline needs: deduplication (exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding cosine, SemDeDup, ExactSubstr spans), similarity
search (brute-force, LSH / IVF / PQ ANN, feature-hashing embeddings, MMR),
text analysis (language-ID, quality + Gopher rules, token counting,
fingerprinting, unicode normalization, PII census/redaction, chunking,
significant terms), retrieval surfaces (phrase, boolean, suggest, spell,
hybrid fusion, facets, collapse, snippets, chunked dense retrieval), event
analytics (sessionization, windows, funnels, as-of/range joins,
transitions, bursts, cohorts), generic table profiling, sampling/mixing,
data selection (DSIR importance resampling, sketch-narrowed heavy
hitters, Bloom-pruned semi-joins, contrastive pair mining), data layout
(Z-order clustering for multi-column parquet pruning), BPE + packing +
training shards, and multimodal column plumbing.

All hot paths are JVM-side ``pyspark.sql.functions`` expressions; every op
that is ANSI-SQL-expressible has a DuckDB oracle in __spark_entry__.py.
"""
