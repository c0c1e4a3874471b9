"""Physical-layout sink tests: partition pruning, file rolling,
round-trip fidelity."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from env_data_pipeline_spark.sources.sinks import write_dataset


def test_write_dataset_partitioned_layout_and_roundtrip(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "docs_by_lang")
    write_dataset(
        docs,
        out,
        partition_by=("lang",),
        max_records_per_file=100,
        sort_within=("doc_id",),
    )
    # hive-style partition directories exist, one per language
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    dirs = {os.path.basename(d) for d in glob.glob(f"{out}/lang=*")}
    assert dirs == {f"lang={lang}" for lang in langs}
    # file rolling: no file holds more than max_records_per_file rows
    back = spark.read.parquet(out)
    per_file = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert per_file <= 100
    # full-fidelity round trip
    assert back.count() == docs.count()
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == {
        r["doc_id"] for r in docs.select("doc_id").collect()
    }


def test_write_dataset_partition_pruning_in_plan(spark, sf_dir, tmp_path):
    """A reader filtering on the partition column must scan only the
    matching directory: the plan carries PartitionFilters and the
    scanned files all live under that partition."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "docs_pruned")
    write_dataset(docs, out, partition_by=("lang",))
    back = spark.read.parquet(out).filter(F.col("lang") == "en")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = back._jdf.queryExecution().explainString(mode)
    assert "PartitionFilters" in plan and "lang" in plan
    files = {
        r["f"]
        for r in back.withColumn("f", F.input_file_name()).select("f").collect()
    }
    assert files and all("lang=en" in f for f in files)
