from iq_to_hdl_migration_spark.catalog.fixture import (  # noqa: F401
    CATALOG_FIXTURE,
    duckdb_with_prefix,
    ensure_catalog_views,
)
