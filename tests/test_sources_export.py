"""S2-S6 export sinks, S11 listing reconcile, S13 rule tables."""

from __future__ import annotations

import gzip
from pathlib import Path

import pyspark.sql.functions as F

from iq_to_hdl_migration_spark.pipeline.migrate import listing_reconcile
from iq_to_hdl_migration_spark.sources.export import (
    export_chunked_parquet, export_gzip_csv)
from iq_to_hdl_migration_spark.sources.rule_tables import (
    load_login_policy_defaults, load_option_names, options_rules_df)
from iq_to_hdl_migration_spark.sources.tables import load_table


def test_chunked_parquet_caps_file_size(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    out = tmp_path / "chunks"
    export_chunked_parquet(li, str(out), max_records_per_file=1000,
                           num_partitions=2)
    files = list(out.glob("*.parquet"))
    assert len(files) >= li.count() // 1000  # chunk cap respected
    assert spark.read.parquet(str(out)).count() == li.count()


def test_gzip_csv_roundtrip_with_null_marker(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, None)], ["id", "v"])
    out = tmp_path / "gz"
    export_gzip_csv(df, str(out))
    gz_files = list(out.glob("*.csv.gz"))
    assert gz_files, "expected gzip members"
    text = "".join(gzip.decompress(f.read_bytes()).decode()
                   for f in gz_files)
    assert "NULL" in text  # NULL('NULL') convention (migration.py:2335)
    back = (spark.read.option("header", "true").option("nullValue", "NULL")
            .csv(str(out)))
    assert back.count() == 2
    assert back.where("v IS NULL").count() == 1


def test_lob_binary_roundtrip_inline(spark, tmp_path):
    """S5/S6 collapse: binary (BLOB) column round-trips inline."""
    rows = [(1, bytearray(b"\x00\x01\xffbinary-lob")), (2, None)]
    df = spark.createDataFrame(rows, "id int, blob binary")
    out = tmp_path / "lob"
    export_chunked_parquet(df, str(out))
    back = spark.read.parquet(str(out)).orderBy("id").collect()
    assert bytes(back[0].blob) == b"\x00\x01\xffbinary-lob"
    assert back[1].blob is None


def test_listing_reconcile_detects_drift(spark, tmp_path):
    src, tgt = tmp_path / "src", tmp_path / "tgt"
    for d in (src, tgt):
        d.mkdir()
    (src / "a.bin").write_bytes(b"x" * 100)
    (src / "b.bin").write_bytes(b"y" * 50)
    (tgt / "a.bin").write_bytes(b"x" * 100)
    (tgt / "b.bin").write_bytes(b"y" * 49)   # short copy
    (tgt / "c.bin").write_bytes(b"z")        # stray file
    by_path = {r.path: r.status
               for r in listing_reconcile(spark, str(src), str(tgt))
               .collect()}
    assert by_path == {"a.bin": "ok", "b.bin": "size_mismatch",
                       "c.bin": "extra_target"}


def test_rule_tables_load(spark):
    names = load_option_names()
    # full vendor dbopts list (109 names, packaged verbatim)
    assert "checkpoint_time" in names and len(names) == 109
    assert all("#" not in n for n in names)
    hos = load_option_names("hosparams_noncustomer.csv")
    assert "Append_Load" in hos and len(hos) == 664
    defaults = load_login_policy_defaults()
    assert defaults["locked"] == "OFF"
    df = options_rules_df(spark)
    assert df.count() == len(names)


def test_charset_resolution_remaps_reference_spelling():
    from iq_to_hdl_migration_spark.sources.export import resolve_charset
    assert (resolve_charset("Extended_UNIX_Code_Packed_Format_for_Japanese")
            == "EUC-JP")
    assert resolve_charset(None) == "UTF-8"
    assert resolve_charset("ISO-8859-1") == "ISO-8859-1"


def test_latin1_csv_roundtrip(spark, tmp_path):
    """A non-UTF8 source charset survives write -> raw bytes -> read
    (Common/common.py:342-347 charset plumbing, V10's checked property)."""
    from iq_to_hdl_migration_spark.sources.export import read_csv

    rows = [(1, "café"), (2, "Über"), (3, None)]
    df = spark.createDataFrame(rows, "id int, name string")
    out = tmp_path / "latin1"
    export_gzip_csv(df, str(out), charset="ISO-8859-1")

    raw = b"".join(gzip.decompress(f.read_bytes())
                   for f in sorted(out.glob("*.csv.gz")))
    assert "café".encode("latin-1") in raw      # true latin-1 bytes,
    assert "café".encode("utf-8") not in raw    # not utf-8

    back = read_csv(spark, str(out), schema="id int, name string",
                    charset="ISO-8859-1")
    got = {r.id: r.name for r in back.collect()}
    assert got == {1: "café", 2: "Über", 3: None}


def test_latin1_foreign_file_ingest(spark, tmp_path):
    """A latin-1 CSV produced outside Spark decodes correctly at
    ingest — the first thing a non-UTF8 migration touches."""
    from iq_to_hdl_migration_spark.sources.export import read_csv

    p = tmp_path / "legacy"
    p.mkdir()
    (p / "data.csv").write_bytes(
        "id,name\n1,sésame\n2,NULL\n".encode("latin-1"))
    back = read_csv(spark, str(p), schema="id int, name string",
                    charset="ISO-8859-1")
    got = {r.id: r.name for r in back.collect()}
    assert got == {1: "sésame", 2: None}


def test_permissive_ingest_error_ledger(spark, tmp_path):
    """Malformed rows go to the ledger, good rows load, nothing is
    silently dropped (good + bad == total data lines)."""
    from iq_to_hdl_migration_spark.sources.export import (
        read_csv_with_ledger)

    p = tmp_path / "dirty"
    p.mkdir()
    (p / "data.csv").write_text(
        "id,qty\n"
        "1,10\n"
        "2,not_a_number\n"
        "3,30\n"
        "oops_only_one_field_and_bad\n")
    good, bad = read_csv_with_ledger(spark, str(p), "id int, qty int")
    assert {(r.id, r.qty) for r in good.collect()} == {(1, 10), (3, 30)}
    bad_lines = [r.raw_line for r in bad.collect()]
    assert len(bad_lines) == 2
    assert any("not_a_number" in b for b in bad_lines)
    assert good.count() + bad.count() == 4


def test_jsonl_sharded_roundtrip_and_manifest(spark, sf_dir, tmp_path):
    from iq_to_hdl_migration_spark.sources.export import export_jsonl_sharded
    from iq_to_hdl_migration_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_jsonl")
    manifest = export_jsonl_sharded(docs, out, max_records_per_file=7,
                                    num_partitions=2, compression=None)
    m = manifest.collect()
    assert all(r.n_rows <= 7 for r in m)
    assert sum(r.n_rows for r in m) == docs.count()
    assert all(r.n_bytes > 0 for r in m)
    # round-trip: schema and content survive JSONL
    back = spark.read.json(out)
    assert back.count() == docs.count()
    a = {r.doc_id: r.text for r in docs.collect()}
    b = {r.doc_id: r.text for r in back.collect()}
    assert a == b


def test_orc_roundtrip_and_chunking(spark, sf_dir, tmp_path):
    """ORC sink: values round-trip bit-identically (including decimals
    and dates) and maxRecordsPerFile caps output files like the
    parquet exporter."""
    import os

    from iq_to_hdl_migration_spark.sources.export import export_orc
    from iq_to_hdl_migration_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").limit(500)
    dst = str(tmp_path / "li_orc")
    export_orc(li, dst, max_records_per_file=100, num_partitions=2)
    files = [f for f in os.listdir(dst) if f.endswith(".orc")]
    assert len(files) >= 5, "maxRecordsPerFile did not cap ORC files"
    back = spark.read.orc(dst)
    assert back.schema == li.schema
    assert (sorted(map(tuple, back.collect()))
            == sorted(map(tuple, li.collect())))


def test_hive_partitioned_export_prunes_partitions(spark, sf_dir,
                                                   tmp_path):
    """Partitioned layout round-trips AND actually prunes: a filter on
    the partition column must reach the scan as a PartitionFilter with
    only the matching directory's files read."""
    import os

    from iq_to_hdl_migration_spark.sources.export import (
        export_hive_partitioned)
    from iq_to_hdl_migration_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    dst = str(tmp_path / "docs_part")
    export_hive_partitioned(docs, dst, ["lang"])
    langs = {d for d in os.listdir(dst) if d.startswith("lang=")}
    assert len(langs) >= 2, "expected one directory per lang"

    back = spark.read.parquet(dst)
    one = back.where(F.col("lang") == "en")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "lang" in plan.split("PartitionFilters:")[1][:200], (
        "lang filter did not reach the partition pruner")
    # values round-trip (partition column comes back from the path)
    want = sorted(tuple(r) for r in
                  docs.where(F.col("lang") == "en")
                  .select("doc_id", "lang").collect())
    got = sorted(tuple(r) for r in one.select("doc_id", "lang").collect())
    assert got == want
