from honeywell_search_engine_spark.index.corpus import (  # noqa: F401
    docid_col,
    docs_from_pages,
    tokenized_docs,
)
from honeywell_search_engine_spark.index.stats import (  # noqa: F401
    CorpusStats,
    build_stats,
)
