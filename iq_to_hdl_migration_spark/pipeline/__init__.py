from iq_to_hdl_migration_spark.pipeline.migrate import (  # noqa: F401
    MigrationStatus, migrate_table, migrate_tables)
