"""honeywell_search_engine_spark — a PySpark-native full-text inverted-index
build + BM25 top-k query engine.

A from-scratch rebuild of the lexical search core of
mitran06/honeywell-search-engine (reference at /root/reference), re-expressed
Spark-first:

- analyzer kernel (clean / normalize / tokenize) reproducing the reference's
  text semantics (reference: backend/app/worker/tasks.py:64-71,120-133 and
  backend/app/routers/search.py:33-44) as vectorized Arrow UDFs;
- document / corpus statistics (doclen, avgdl, df, ctf) as DataFrame
  aggregates, broadcast for scoring;
- term-partitioned posting-list segments (docid deltas + varbyte block
  compression, per-block max-score metadata) built with salted
  repartition-and-sort to defeat head-term skew, with per-partition lineage
  manifests for checkpointed resume;
- BM25 top-k query engine: naive Catalyst-only path (broadcast term join +
  hash aggregate) and a segment path with block-max WAND pruning inside
  mapInPandas.

No per-row Python UDFs anywhere — only pandas_udf / applyInPandas /
mapInPandas over Arrow batches, plus built-in pyspark.sql.functions.
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75
