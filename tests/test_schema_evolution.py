"""Schema evolution on the parquet layout: a table whose newer files
carry added columns must stay readable as ONE dataset — mergeSchema
unions the schemas and backfills nulls for pre-evolution rows. This is
the contract that lets a 100 TB table add feature columns without
rewriting history."""

from __future__ import annotations

import pyspark.sql.functions as F

from iq_to_hdl_migration_spark.sources.tables import load_table


def test_added_column_reads_as_one_dataset(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "evolving")

    v1 = ev.filter(F.to_date("ts") < "2024-01-15") \
           .select("event_id", "ts", "user_id", "event_type")
    v2 = ev.filter(F.to_date("ts") >= "2024-01-15") \
           .select("event_id", "ts", "user_id", "event_type",
                   F.lit(0.5).alias("quality"))
    v1.write.mode("overwrite").parquet(path)
    v2.write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"event_id", "ts", "user_id",
                                   "event_type", "quality"}
    assert merged.count() == ev.count()
    # pre-evolution rows: quality null; post-evolution: populated
    n_old = v1.count()
    assert merged.filter(F.col("quality").isNull()).count() == n_old
    assert merged.filter(F.col("quality") == 0.5).count() == (
        ev.count() - n_old)
    # aggregations over the evolved column ignore nulls (count semantics)
    assert merged.agg(F.count("quality")).first()[0] == ev.count() - n_old
