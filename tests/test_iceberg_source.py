"""Iceberg source branch (sources/pages.read_pages): runs for real when
the Iceberg Spark runtime jar is present (a real cluster), degrades to a
clean probe + error in this container (which ships without the jar)."""

import pytest

from honeywell_search_engine_spark.sources.pages import iceberg_available, read_pages


def test_probe_and_clean_error_without_jar(spark):
    if iceberg_available(spark):
        pytest.skip("Iceberg jar present — covered by the live test below")
    with pytest.raises(RuntimeError, match="Iceberg"):
        read_pages(spark, "iceberg:local.db.pages")


def test_iceberg_roundtrip_and_snapshot_fingerprint(spark, tmp_path):
    """With the runtime jar: write the pages corpus as an Iceberg table,
    read it through the same read_pages entry point, and check the build
    lineage fingerprint is the table's snapshot id."""
    if not iceberg_available(spark):
        pytest.skip("Iceberg Spark runtime jar not on the classpath")
    from honeywell_search_engine_spark.index.segments import input_fingerprint
    from honeywell_search_engine_spark.sources.pages import (
        PAGES_SCHEMA,
        generate_pages_pdf,
    )

    spark.conf.set("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.local.type", "hadoop")
    spark.conf.set("spark.sql.catalog.local.warehouse", str(tmp_path / "wh"))
    pdf = generate_pages_pdf(200)
    spark.createDataFrame(pdf, schema=PAGES_SCHEMA).writeTo(
        "local.db.pages"
    ).create()
    df = read_pages(spark, "iceberg:local.db.pages")
    assert df.count() == 200
    fp = input_fingerprint(spark, "iceberg:local.db.pages")
    assert fp.startswith("iceberg-snapshot:") and fp != "iceberg-snapshot:empty"
