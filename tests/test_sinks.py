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


def test_compact_dataset_merges_small_files(spark, tmp_path):
    """1000 rows scattered over ~50 tiny files compact into the
    row-count-derived file number; rows and values survive exactly."""
    from env_data_pipeline_spark.sources.sinks import compact_dataset

    path = str(tmp_path / "frag")
    df = spark.range(1000).withColumnRenamed("id", "k")
    df.repartition(50).write.parquet(path)
    import os

    before = len([f for f in os.listdir(path) if f.startswith("part-")])
    assert before >= 40  # genuinely fragmented

    n_files = compact_dataset(spark, path, target_records_per_file=500)
    assert n_files == 2
    got = spark.read.parquet(path)
    assert got.count() == 1000
    assert got.agg({"k": "sum"}).first()[0] == 499500


def test_compact_dataset_range_clustering_prunes(spark, tmp_path):
    """cluster_by writes disjoint key ranges per file: a point/range
    predicate then reads fewer files than the total (file-level
    min/max pruning)."""
    from env_data_pipeline_spark.sources.sinks import compact_dataset

    path = str(tmp_path / "clust")
    spark.range(10_000).withColumnRenamed("id", "k").repartition(20).write.parquet(
        path
    )
    n_files = compact_dataset(
        spark, path, target_records_per_file=2500, cluster_by=("k",)
    )
    assert n_files == 4
    # each output file covers a disjoint quarter of the key range
    import glob as _g

    import pyarrow.parquet as pq

    spans = []
    for f in sorted(_g.glob(path + "/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        col = md.row_group(0).column(0).statistics
        spans.append((col.min, col.max))
    spans.sort()
    for (lo_a, hi_a), (lo_b, hi_b) in zip(spans, spans[1:]):
        assert hi_a < lo_b, spans


def test_compact_dataset_preserves_hive_partitioning(spark, tmp_path):
    """Compacting a hive-partitioned dataset must keep the partition
    LAYOUT (pruning survives) and the raw partition VALUES — type
    inference would re-read bucket '01' as int 1 and an unpartitioned
    rewrite would bake that re-typed value in as a data column."""
    from env_data_pipeline_spark.sources.sinks import compact_dataset

    path = str(tmp_path / "hive")
    df = spark.range(400).select(
        F.col("id").alias("k"),
        F.format_string("%02d", (F.col("id") % 3).cast("int")).alias("bucket"),
    )
    df.repartition(10).write.partitionBy("bucket").parquet(path)
    assert sorted(os.path.basename(d) for d in glob.glob(path + "/bucket=*")) == [
        "bucket=00",
        "bucket=01",
        "bucket=02",
    ]

    compact_dataset(spark, path, target_records_per_file=200)

    # layout preserved: same hive directories, zero-padded values intact
    assert sorted(os.path.basename(d) for d in glob.glob(path + "/bucket=*")) == [
        "bucket=00",
        "bucket=01",
        "bucket=02",
    ]
    # data survives exactly; the partition column reads back with its
    # original values (inference maps '01'->1, so compare as strings)
    back = spark.read.option(
        "basePath", path
    ).parquet(path)
    assert back.count() == 400
    assert back.agg(F.sum("k")).first()[0] == sum(range(400))
    # pruning still works after compaction
    pruned = spark.read.parquet(path).filter(F.col("bucket") == 1)
    files = {
        r["f"]
        for r in pruned.withColumn("f", F.input_file_name()).select("f").collect()
    }
    assert files and all("bucket=01" in f for f in files)


def test_compact_dataset_clusters_within_hive_partitions(spark, tmp_path):
    """The COMBINED layout (r4 verdict item 8): a hive-partitioned
    dataset compacted with cluster_by must keep the partition
    directories AND write disjoint cluster-key ranges per file WITHIN
    each partition — so directory pruning and file-level min/max
    pruning compose. The range partitioner cuts on (partition cols,
    cluster cols), so a partition's rows can split across adjacent
    tasks only at a cluster-key boundary; overlapping file spans
    inside one directory would break the invariant."""
    import pyarrow.parquet as pq

    from env_data_pipeline_spark.sources.sinks import compact_dataset

    path = str(tmp_path / "hive_clust")
    df = spark.range(6000).select(
        F.col("id").alias("k"),
        F.format_string("%02d", (F.col("id") % 3).cast("int")).alias("bucket"),
    )
    df.repartition(24).write.partitionBy("bucket").parquet(path)

    compact_dataset(spark, path, target_records_per_file=1000, cluster_by=("k",))

    # partition layout survives
    dirs = sorted(os.path.basename(d) for d in glob.glob(path + "/bucket=*"))
    assert dirs == ["bucket=00", "bucket=01", "bucket=02"]
    # each partition holds multiple files with DISJOINT k-ranges
    multi_file_dirs = 0
    for d in dirs:
        spans = []
        for f in sorted(glob.glob(os.path.join(path, d, "part-*.parquet"))):
            md = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(0).statistics
                mins.append(st.min)
                maxs.append(st.max)
            spans.append((min(mins), max(maxs)))
        if len(spans) > 1:
            multi_file_dirs += 1
        spans.sort()
        for (lo_a, hi_a), (lo_b, hi_b) in zip(spans, spans[1:]):
            assert hi_a < lo_b, (d, spans)
    # degenerate layouts (one file per dir) would vacuously pass —
    # require that the clustering invariant was actually exercised
    assert multi_file_dirs >= 1
    # contents survive exactly
    back = spark.read.parquet(path)
    assert back.count() == 6000
    assert back.agg(F.sum("k")).first()[0] == sum(range(6000))


def test_compact_dataset_zorder_prunes_both_dimensions(spark, tmp_path):
    """Z-order clustering must make file-level min/max stats selective
    on EVERY participating column: a narrow slice on x OR on y each
    overlaps only a minority of files. Linear cluster_by on (x, y) is
    the contrast case — it prunes x but every file spans ~the full y
    range. This is the property that justifies Morton interleaving at
    100 TB: one physical layout serves two filter columns."""
    import pyarrow.parquet as pq

    from env_data_pipeline_spark.sources.sinks import (
        compact_dataset,
        compact_dataset_zorder,
    )

    def overlap_fraction(path, col_idx, lo, hi):
        files = sorted(glob.glob(path + "/part-*.parquet"))
        n_overlap = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col_idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            if min(mins) <= hi and max(maxs) >= lo:
                n_overlap += 1
        return n_overlap / len(files), len(files)

    # deterministic pseudo-uniform 2-D points, x and y independent
    base = spark.range(20_000).select(
        (F.col("id") * 2654435761 % 100_000).alias("x"),
        (F.col("id") * 40503 % 100_000).alias("y"),
    )

    zpath = str(tmp_path / "zorder")
    base.repartition(8).write.parquet(zpath)
    # 64 files -> 6 z-prefix bits -> an 8x8 (x, y) grid of files; a
    # narrow slice on either dim then touches ~1 row/column of the grid
    n_z = compact_dataset_zorder(
        spark, zpath, zorder_by=("x", "y"), target_records_per_file=313
    )
    assert n_z == 64

    lpath = str(tmp_path / "linear")
    base.repartition(8).write.parquet(lpath)
    compact_dataset(spark, lpath, target_records_per_file=313, cluster_by=("x", "y"))

    # a 5%-wide slice on each dimension
    fx_z, _ = overlap_fraction(zpath, 0, 40_000, 45_000)
    fy_z, _ = overlap_fraction(zpath, 1, 40_000, 45_000)
    fx_l, _ = overlap_fraction(lpath, 0, 40_000, 45_000)
    fy_l, _ = overlap_fraction(lpath, 1, 40_000, 45_000)
    # z-order: both dims prune to a minority of files
    assert fx_z <= 0.4, fx_z
    assert fy_z <= 0.4, fy_z
    # linear: x prunes harder than z-order ever can, y not at all
    assert fx_l <= fx_z
    assert fy_l == 1.0, fy_l
    # rows survive the rewrite exactly
    back = spark.read.parquet(zpath)
    assert back.count() == 20_000
    assert back.agg(F.sum("x"), F.sum("y")).first() == base.agg(
        F.sum("x"), F.sum("y")
    ).first()


def test_json_sink_doubles_stay_in_jd_covered_families(spark):
    """Tripwire for the byte-identical JSON oracle: _jd
    (plans/collect.py) formats doubles for exactly three families —
    0.0, plain decimals in [1e-3, 1e7), and round(,4)-quantized
    sub-milli values k*1e-4. A testdata refresh that pushes any
    numeric field outside those families (e.g. an unrounded latitude
    of 1.2345e-4, or a value >= 1e7 where Java switches to
    E-notation) would fail oracle parity as an opaque text mismatch;
    this test names the offending value instead. Same enforcement
    pattern as the events hour-alignment tripwire."""
    import json
    import re

    from env_data_pipeline_spark.plans import registry

    registry.load_all()
    num_re = re.compile(r'(?<=[:,\[])-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?')
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = registry.QUERIES["collect_json_sink"](spark, sf)
        (json_col,) = [c for c in docs.columns if "json" in c.lower()] or [
            docs.columns[-1]
        ]
        for row in docs.select(json_col).toLocalIterator():
            for tok in num_re.findall(row[0]):
                if "." not in tok and "e" not in tok.lower():
                    continue  # integer field
                v = abs(float(tok))
                ok = (
                    v == 0.0
                    or (1e-3 <= v < 1e7)
                    # sub-milli band must sit on the round(,4) grid
                    or (v < 1e-3 and abs(v * 1e4 - round(v * 1e4)) < 1e-9)
                )
                assert ok, (
                    f"{sf}: JSON double {tok!r} outside _jd's covered "
                    "families — extend _jd or re-round the producing column"
                )


def test_orc_roundtrip_matches_parquet(spark, sf_dir, tmp_path):
    """Format interchange: the engine's tables round-trip through ORC
    (the other mainstream columnar format, builtin to Spark) with
    identical contents — a 100 TB estate usually has both formats in
    play, and the operators must not care which one fed them."""
    from pyspark.sql import functions as F

    from env_data_pipeline_spark.catalog import table

    docs = table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_orc")
    docs.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.count() == docs.count()
    assert dict(back.dtypes) == dict(docs.dtypes)
    digest = lambda df: df.select(
        F.md5(F.concat_ws("|", *sorted(df.columns))).alias("h")
    ).agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("bigint"))).first()[0]
    assert digest(back) == digest(docs)


def test_write_shuffled_shards_order_and_balance(spark, sf_dir, tmp_path):
    """The seeded shard writer must (a) reproduce exactly the
    manifest's (shard, count) assignment, (b) lay every shard out in
    seeded hash order on disk (reading a shard back yields
    non-decreasing _h — the global-permutation-replay contract), and
    (c) stay balanced: no shard more than 3x the ideal share at 64
    shards on the test corpus."""
    from pyspark.sql import functions as F

    from env_data_pipeline_spark.catalog import table
    from env_data_pipeline_spark.plans.llmops import (
        _N_SHARDS,
        _SHUFFLE_SEED,
        corpus_shuffle_shards,
    )
    from env_data_pipeline_spark.sources.sinks import write_shuffled_shards

    docs = table(spark, sf_dir, "documents")
    out = str(tmp_path / "shards")
    write_shuffled_shards(docs, out, _N_SHARDS, _SHUFFLE_SEED)
    back = spark.read.parquet(out)
    manifest = {
        r.shard_id: r.n_docs
        for r in corpus_shuffle_shards(spark, sf_dir).collect()
    }
    got = {
        r.shard_id: r.cnt
        for r in back.groupBy("shard_id").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == manifest
    # within-shard on-disk order: read each shard directory with
    # pyarrow (physical file row order, no Spark re-ordering) and
    # assert _h is sorted — the global-permutation-replay contract
    import os

    import pyarrow.parquet as pq

    checked = 0
    for d in sorted(os.listdir(out)):
        if not d.startswith("shard_id="):
            continue
        hs = pq.read_table(os.path.join(out, d), columns=["_h"])["_h"].to_pylist()
        assert hs == sorted(hs), d
        checked += 1
    assert checked == len(manifest)
    n = docs.count()
    ideal = n / _N_SHARDS
    assert max(got.values()) <= 3 * ideal


def test_write_shuffled_shards_single_exchange(spark, sf_dir):
    """The shuffle+shard plan is pinned to ONE exchange (the
    shard_id repartition); the order sort is within partitions."""
    from pyspark.sql import functions as F

    from env_data_pipeline_spark.catalog import table
    from env_data_pipeline_spark.extensions.text import md5_prefix_hash
    from env_data_pipeline_spark.plans.llmops import _N_SHARDS, _SHUFFLE_SEED

    docs = table(spark, sf_dir, "documents")
    keyed = docs.withColumn(
        "_h",
        md5_prefix_hash(
            F.concat(F.lit(f"{_SHUFFLE_SEED}:"), F.col("doc_id").cast("string"))
        ),
    ).withColumn("shard_id", (F.col("_h") % _N_SHARDS).cast("int"))
    staged = keyed.repartition(_N_SHARDS, "shard_id").sortWithinPartitions(
        "shard_id", "_h", "doc_id"
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = staged._jdf.queryExecution().explainString(mode)
    import re

    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert "Sort" in plan
