from honeywell_search_engine_spark.functions.analyzer import (  # noqa: F401
    STOPWORDS,
    analyze,
    clean_text,
    extract_text,
    normalize_text,
    tokenize,
)
