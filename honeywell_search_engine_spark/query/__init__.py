from honeywell_search_engine_spark.query.naive import bm25_topk_naive  # noqa: F401
