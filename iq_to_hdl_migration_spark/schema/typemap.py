"""IQ domain -> Spark type mapping (SURVEY §1.2).

Schemas are always catalog-derived (SYSCOLUMN ⋈ SYSDOMAIN joins,
migration.py:1520,2185), never inferred from data — `spark_struct_for_
table` builds the StructType straight from the catalog DataFrames.

Notable mappings (§1.2 table):
  * long varchar (CLOB) -> StringType — parquet holds large values
    inline, no BFILE side-files needed (S5/S6 collapse to identity).
  * long binary (BLOB)  -> BinaryType.
  * unsigned bigint     -> DecimalType(20,0) (Spark longs are signed;
    migration.py:1471 declares UNSIGNED BIGINT for row counts).
  * identity/autoincrement -> plain column + metadata flag (no native
    Spark identity; the flag drives identity_insert handling on load).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession
from pyspark.sql.types import (
    BinaryType, BooleanType, ByteType, DataType, DateType, DecimalType,
    DoubleType, FloatType, IntegerType, LongType, ShortType, StringType,
    StructField, StructType, TimestampType)

_SIMPLE = {
    "integer": IntegerType(), "int": IntegerType(),
    "bigint": LongType(), "smallint": ShortType(), "tinyint": ByteType(),
    "bit": BooleanType(),
    "char": StringType(), "varchar": StringType(),
    "long varchar": StringType(),
    "binary": BinaryType(), "varbinary": BinaryType(),
    "long binary": BinaryType(),
    "float": FloatType(), "real": FloatType(), "double": DoubleType(),
    "date": DateType(), "timestamp": TimestampType(),
    "datetime": TimestampType(), "time": StringType(),
    "unsigned bigint": DecimalType(20, 0),
}


def iq_domain_to_spark(domain_name: str, width: int = 0,
                       scale: int = 0) -> DataType:
    d = domain_name.strip().lower()
    if d in ("numeric", "decimal"):
        prec = max(1, min(38, width or 18))
        return DecimalType(prec, min(scale, prec))
    if d in _SIMPLE:
        return _SIMPLE[d]
    return StringType()  # conservative fallback, mirrors text round-trip


def spark_struct_for_table(spark: SparkSession, owner: str,
                           table: str) -> StructType:
    """StructType from the catalog views (J4 join), identity flagged
    in field metadata (F19 semantics, migration.py:1501-1507)."""
    rows = (spark.table("syscolumn")
            .join(spark.table("systable"), "table_id")
            .join(spark.table("sysuser"),
                  F.col("user_id") == F.col("creator"))
            .join(spark.table("sysdomain"), "domain_id")
            .where((F.col("user_name") == owner)
                   & (F.col("table_name") == table))
            .select("column_id", "column_name", "domain_name", "width",
                    "nulls", "col_default")
            .orderBy("column_id")
            .collect())
    fields = []
    for r in rows:
        identity = (r.col_default or "") in ("Identity/Autoincrement",
                                             "autoincrement")
        fields.append(StructField(
            r.column_name,
            iq_domain_to_spark(r.domain_name, r.width or 0),
            nullable=(r.nulls == "Y"),
            metadata={"identity": identity} if identity else {},
        ))
    return StructType(fields)
