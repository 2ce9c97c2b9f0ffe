from iq_to_hdl_migration_spark.schema.typemap import (  # noqa: F401
    iq_domain_to_spark, spark_struct_for_table)
from iq_to_hdl_migration_spark.schema.generate import (  # noqa: F401
    generate_spark_ddl)
from iq_to_hdl_migration_spark.schema.load import execute_ddl  # noqa: F401
