from honeywell_search_engine_spark.sources.pages import (  # noqa: F401
    PAGES_SCHEMA,
    generate_pages_pdf,
    write_pages_table,
    write_pages_table_spark,
    read_pages,
    reference_queries,
)
