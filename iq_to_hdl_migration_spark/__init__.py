"""iq_to_hdl_migration_spark — a PySpark-native analytics/migration engine.

A from-scratch re-expression of the query and data-processing
capabilities of SAP-samples/iq-to-hdl-migration (studied read-only at
/root/reference) on Apache Spark: catalog snapshots become DataFrames,
extraction becomes partitioned reads, loads become DataFrame writes,
every introspection query becomes Spark SQL, and the DDL rule engine /
reconciliation layer live above Catalyst.

Beyond reference parity, the package ships the large-scale
training-data operators (dedup, similarity search, multimodal columns,
text analysis) designed for 100 TB operation.
"""

__version__ = "0.1.0"

from iq_to_hdl_migration_spark.session import get_spark  # noqa: F401
