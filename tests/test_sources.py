"""Sources: SAS label parsing, CSV/in-memory readers, partition guard."""

import warnings

from udacity_data_engineering_capstone_project_spark.sources.readers import (
    from_records,
    parse_sas_labels,
    read_csv,
    read_table,
)
from udacity_data_engineering_capstone_project_spark.sources.writers import (
    write_parquet,
)

LABELS = """
value i94model
   1 = 'Air'
   2 = 'Sea'
;
value i94prtl
   'ALC'\t=\t'ALCAN, AK'
;
"""


def test_parse_sas_labels_blocks():
    assert parse_sas_labels(LABELS, "i94model") == {"1": "Air", "2": "Sea"}
    assert parse_sas_labels(LABELS, "i94prtl") == {"ALC": "ALCAN, AK"}
    assert parse_sas_labels(LABELS, "missing") == {}


def test_from_records_schema(spark):
    df = from_records(spark, [(1, "a")], "id int, name string")
    assert df.columns == ["id", "name"]
    assert df.schema["id"].dataType.simpleString() == "int"


def test_read_csv_with_schema(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("a;b\n1;x\n2;y\n")
    df = read_csv(spark, str(p), schema="a int, b string", sep=";")
    assert {(r.a, r.b) for r in df.collect()} == {(1, "x"), (2, "y")}


def test_events_read_converts_nanos(spark, sf_dir):
    df = read_table(spark, sf_dir, "events")
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    assert df.count() == 1000


def test_partition_guard_warns(spark, tmp_path):
    from pyspark.sql import functions as F

    # needs a non-partition column: partitioning by every column is disallowed
    df = spark.range(100).withColumnRenamed("id", "k").withColumn("payload", F.lit(0))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        write_parquet(
            df, str(tmp_path / "out"), partition_by=["k"],
            max_partitions=10, check_cardinality=True,
        )
    assert any("100 directories" in str(x.message) for x in w)


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    from pyspark.sql import functions as F

    from udacity_data_engineering_capstone_project_spark.sources.writers import (
        write_bucketed,
    )

    a = spark.range(0, 1000).withColumnRenamed("id", "k").withColumn(
        "va", F.col("k") * 2
    )
    b = spark.range(0, 1000).withColumnRenamed("id", "k").withColumn(
        "vb", F.col("k") * 3
    )
    write_bucketed(a, "bkt_a", "k", n_buckets=4, sort_by="k")
    write_bucketed(b, "bkt_b", "k", n_buckets=4, sort_by="k")
    try:
        # disable broadcast so the co-location (not a broadcast) is tested
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        assert joined.count() == 1000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # bucketing replaced the shuffle
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_salted_join_equals_plain_join(spark):
    from udacity_data_engineering_capstone_project_spark.operators.joins import (
        salted_join,
    )

    # skewed left: one hot key
    left = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, 0), (3, 1)], "k int, v int"
    )
    right = spark.createDataFrame([(1, "a"), (2, "b"), (4, "d")], "k int, name string")
    got = salted_join(left, right, "k")
    want = left.join(right, "k")
    assert got.count() == want.count() == 501  # 500 hot k=1 rows + k=2
    assert sorted((r.k, r.v, r.name) for r in got.collect()) == sorted(
        (r.k, r.v, r.name) for r in want.collect()
    )


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    from udacity_data_engineering_capstone_project_spark.sources.readers import (
        read_jsonl,
        read_table,
    )
    from udacity_data_engineering_capstone_project_spark.sources.writers import (
        write_jsonl,
    )

    docs = read_table(spark, sf_dir, "documents").limit(50)
    path = str(tmp_path / "docs.jsonl")
    write_jsonl(docs, path)
    back = read_jsonl(
        spark, path,
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )
    assert back.count() == 50
    a = {r.doc_id: r.text for r in docs.collect()}
    b = {r.doc_id: r.text for r in back.collect()}
    assert a == b


def test_compact_parquet_reduces_files(spark, tmp_path):
    from udacity_data_engineering_capstone_project_spark.sources.writers import (
        compact_parquet,
    )

    path = str(tmp_path / "frag")
    spark.range(0, 10000).repartition(50).write.parquet(path)
    import glob

    assert len(glob.glob(f"{path}/*.parquet")) == 50
    n = compact_parquet(spark, path, target_file_mb=256)
    assert n == 1
    assert len(glob.glob(f"{path}/*.parquet")) == 1
    assert spark.read.parquet(path).count() == 10000


def test_compact_parquet_preserves_partitioning(spark, tmp_path):
    """A Hive-partitioned dataset stays partitioned (and its old copy
    survives until the swap completes) through compaction."""
    import glob

    from pyspark.sql import functions as F

    from udacity_data_engineering_capstone_project_spark.sources.writers import (
        compact_parquet,
    )

    path = str(tmp_path / "parts")
    df = spark.range(0, 1000).withColumn("bucket", F.col("id") % 4)
    df.repartition(10).write.partitionBy("bucket").parquet(path)
    assert len(glob.glob(f"{path}/bucket=*/")) == 4
    compact_parquet(spark, path, target_file_mb=256)
    # layout preserved: still 4 partition dirs, fewer files inside
    assert len(glob.glob(f"{path}/bucket=*/")) == 4
    assert not glob.glob(f"{path}/*.old") and not glob.glob(f"{path}.old")
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert set(back.columns) == {"id", "bucket"}
    assert back.groupBy().agg(F.countDistinct("bucket").alias("n")).collect()[0].n == 4


def test_incremental_write_replaces_only_touched_partition(spark, tmp_path):
    from pyspark.sql import functions as F

    from udacity_data_engineering_capstone_project_spark.sources.writers import (
        write_parquet_incremental,
    )

    path = str(tmp_path / "inc")
    full = spark.createDataFrame(
        [("2024-01-01", 1), ("2024-01-01", 2), ("2024-01-02", 3)], "day string, v int"
    )
    write_parquet_incremental(full, path, ["day"])
    # re-load day 2 only, with different content
    day2 = spark.createDataFrame([("2024-01-02", 99)], "day string, v int")
    write_parquet_incremental(day2, path, ["day"])
    # partition-value inference turns the day strings into dates
    got = {(str(r.day), r.v) for r in spark.read.parquet(path).collect()}
    assert got == {("2024-01-01", 1), ("2024-01-01", 2), ("2024-01-02", 99)}


def test_range_sorted_write_gives_disjoint_file_ranges(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from udacity_data_engineering_capstone_project_spark.sources.writers import (
        write_range_sorted,
    )

    path = str(tmp_path / "sorted")
    df = spark.range(0, 10000).withColumnRenamed("id", "k")
    write_range_sorted(df, path, "k", n_files=4)
    ranges = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        stats = md.row_group(0).column(0).statistics
        lo, hi = stats.min, stats.max
        for rg in range(md.num_row_groups):
            s = md.row_group(rg).column(0).statistics
            lo, hi = min(lo, s.min), max(hi, s.max)
        ranges.append((lo, hi))
    ranges.sort()
    assert len(ranges) == 4
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # file ranges are disjoint -> min/max skipping works


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    from udacity_data_engineering_capstone_project_spark.sources.readers import (
        read_orc,
        read_table,
    )
    from udacity_data_engineering_capstone_project_spark.sources.writers import write_orc

    src = read_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert back.schema == src.schema
    assert sorted(r.n_nationkey for r in back.collect()) == sorted(
        r.n_nationkey for r in src.collect()
    )
    # predicate reaches the ORC scan
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.filter("n_nationkey = 3").explain("formatted")
    assert "PushedFilters" in buf.getvalue()
    assert "n_nationkey" in buf.getvalue().split("PushedFilters")[1][:200]


def test_zorder_value_interleaves_bits(spark):
    from pyspark.sql import functions as F

    from udacity_data_engineering_capstone_project_spark.sources.writers import (
        zorder_value,
    )

    df = spark.createDataFrame([(0b101, 0b011)], "a int, b int").select(
        zorder_value(F.col("a"), F.col("b"), bits=3).alias("z")
    )
    # a bits -> even positions (1,0,1), b bits -> odd (0,1,1):
    # z = b2 a2 b1 a1 b0 a0 = 0 1 1 0 1 1 = 0b011011
    assert df.collect()[0].z == 0b011011


def test_zordered_write_skips_on_both_dims(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from udacity_data_engineering_capstone_project_spark.sources.readers import (
        read_table,
    )
    from udacity_data_engineering_capstone_project_spark.sources.writers import (
        write_zordered,
    )

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey"
    )
    # normalize both dims into [0, 1024) — z-order interleaves raw
    # bits, so comparable scales are the caller's contract
    b = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_orderkey"), F.max("l_orderkey"),
    ).collect()[0]
    pk0, pk1, ok0, ok1 = b
    scaled = li.select(
        ((F.col("l_partkey") - pk0) * 1023 / (pk1 - pk0))
        .cast("int")
        .alias("pk_n"),
        ((F.col("l_orderkey") - ok0) * 1023 / (ok1 - ok0))
        .cast("int")
        .alias("ok_n"),
    )
    path = str(tmp_path / "li_z")
    write_zordered(scaled, path, "pk_n", "ok_n", n_files=8, bits=10)

    per_file = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("pk_n") - F.min("pk_n")).alias("pk_span"),
            (F.max("ok_n") - F.min("ok_n")).alias("ok_span"),
        )
        .collect()
    )
    assert len(per_file) >= 4
    # z-clustering: the AVERAGE file is narrow on BOTH dimensions —
    # a single-column sort would leave the other dim at ~full (1023)
    avg_pk = sum(r.pk_span for r in per_file) / len(per_file)
    avg_ok = sum(r.ok_span for r in per_file) / len(per_file)
    assert avg_pk < 0.7 * 1023
    assert avg_ok < 0.7 * 1023


def test_parquet_schema_evolution_merge(spark, tmp_path):
    from udacity_data_engineering_capstone_project_spark.sources.readers import (
        read_parquet_evolved,
    )

    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v string").write.mode(
        "append"
    ).parquet(path)
    # later batch gains a column
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.mode("append").parquet(path)

    got = {r.id: (r.v, r.score) for r in read_parquet_evolved(spark, path).collect()}
    assert got == {1: ("a", None), 2: ("b", 9.5)}


def test_jsonl_malformed_rows_quarantined_not_fatal(spark, tmp_path):
    """Dirty-ingest discipline: malformed JSON lines must land in
    _corrupt_record (PERMISSIVE) for quarantine instead of killing a
    100 TB job; clean rows parse normally alongside them."""
    from udacity_data_engineering_capstone_project_spark.sources.readers import (
        read_jsonl,
    )

    from pyspark.sql import functions as F

    p = tmp_path / "dirty.jsonl"
    p.write_text(
        '{"id": 1, "v": "a"}\n'
        "{not json at all}\n"
        '{"id": 2, "v": "b"}\n'
        '{"id": "not-an-int", "v": "c"}\n'
    )
    df = read_jsonl(
        spark, str(p), "id long, v string, _corrupt_record string"
    ).cache()  # cache: corrupt-record queries need the full row context
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert {(r.id, r.v) for r in good.collect()} == {(1, "a"), (2, "b")}
    assert bad.count() == 2  # syntax error + type mismatch both quarantined
    df.unpersist()


def test_csv_dropmalformed_mode(spark, tmp_path):
    p = tmp_path / "dirty.csv"
    p.write_text("id,v\n1,a\nnot-an-int,b\n2,c\n")
    strict = (
        spark.read.option("header", "true")
        .option("mode", "DROPMALFORMED")
        .schema("id int, v string")
        .csv(str(p))
    )
    assert {(r.id, r.v) for r in strict.collect()} == {(1, "a"), (2, "c")}


def test_hashrange_pyds_partitions_and_values(spark):
    """Custom Python DataSource contract: all n rows arrive across the
    requested partitions, i is a complete range, and h matches the
    local md5 recipe for spot rows."""
    from udacity_data_engineering_capstone_project_spark.sources.pyds import (
        _hash14,
        register_hashrange,
    )

    register_hashrange(spark)
    df = (
        spark.read.format("hashrange")
        .option("n", 257)
        .option("parts", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    rows = {r.i: r.h for r in df.collect()}
    assert sorted(rows) == list(range(257))
    for i in (0, 1, 100, 256):
        assert rows[i] == _hash14(i)


def test_targeted_delete_rewrites_only_affected_files(spark, tmp_path):
    """Copy-on-write deletion: only part-files containing a target key
    are rewritten; rows gone, everything else byte-identical."""
    import os

    from pyspark.sql import functions as F

    from udacity_data_engineering_capstone_project_spark.sources.writers import (
        targeted_delete,
    )

    path = str(tmp_path / "docs")
    # 8 files, keys clustered so targets live in exactly 2 files
    df = spark.range(0, 800).select(F.col("id").alias("doc_id"))
    df.repartitionByRange(8, "doc_id").sortWithinPartitions(
        "doc_id"
    ).write.parquet(path)
    before = {
        f: os.path.getmtime(os.path.join(path, f))
        for f in os.listdir(path)
        if f.startswith("part-")
    }
    targets = spark.createDataFrame([(5,), (7,), (205,)], "doc_id long")

    stats = targeted_delete(spark, path, targets, "doc_id")
    assert stats["rows_deleted"] == 3
    assert stats["files_rewritten"] == 2
    assert stats["files_total"] == 8

    after = spark.read.parquet(path)
    assert after.count() == 797
    assert after.filter(F.col("doc_id").isin([5, 7, 205])).count() == 0
    # the 6 untouched files are still there, untouched
    survivors = [
        f
        for f in os.listdir(path)
        if f.startswith("part-")
    ]
    assert len(survivors) == 6
    for f in survivors:
        assert before[f] == os.path.getmtime(os.path.join(path, f))

    # idempotent: re-running deletes nothing and rewrites nothing
    stats2 = targeted_delete(spark, path, targets, "doc_id")
    assert stats2["rows_deleted"] == 0 and stats2["files_rewritten"] == 0


def test_targeted_delete_string_keys(spark, tmp_path):
    """String doc-ids must match on their native type — the ADVICE r6
    regression: casting both sides to long nulled every string key and
    the takedown silently no-opped with rows_deleted=0."""
    from pyspark.sql import functions as F

    from udacity_data_engineering_capstone_project_spark.sources.writers import (
        targeted_delete,
    )

    path = str(tmp_path / "sdocs")
    df = spark.range(0, 100).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id")
    )
    df.repartition(4).write.parquet(path)
    targets = spark.createDataFrame([("doc-5",), ("doc-77",)], "doc_id string")

    stats = targeted_delete(spark, path, targets, "doc_id")
    assert stats["rows_deleted"] == 2
    after = spark.read.parquet(path)
    assert after.count() == 98
    assert after.filter(F.col("doc_id").isin(["doc-5", "doc-77"])).count() == 0


def test_targeted_delete_uncastable_keys_raise(spark, tmp_path):
    """Target keys that null out under the cast to the dataset's key
    type must raise, never silently delete nothing."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from udacity_data_engineering_capstone_project_spark.sources.writers import (
        targeted_delete,
    )

    path = str(tmp_path / "ldocs")
    spark.range(0, 50).select(F.col("id").alias("doc_id")).write.parquet(path)
    targets = spark.createDataFrame([("not-a-number",)], "doc_id string")
    with _pytest.raises(ValueError, match="do not cast"):
        targeted_delete(spark, path, targets, "doc_id")


def test_targeted_delete_manifest_heals_duplicate_window(spark, tmp_path):
    """A crash between moving rewritten parts in and deleting the
    originals duplicates kept rows; the pending-delete manifest written
    at the commit point lets the next call heal before reading."""
    import glob
    import json
    import os

    from pyspark.sql import functions as F

    from udacity_data_engineering_capstone_project_spark.sources.writers import (
        targeted_delete,
    )

    path = str(tmp_path / "hdocs")
    df = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    df.repartitionByRange(4, "doc_id").write.parquet(path)
    # simulate the torn state: manually run a delete, then RESTORE one
    # original alongside its rewrite and re-create its manifest entry
    parts_before = sorted(
        f for f in os.listdir(path) if f.startswith("part-")
    )
    victim = os.path.join(path, parts_before[0])
    backup = str(tmp_path / "victim.bak")  # outside the dataset dir
    import shutil

    shutil.copy(victim, backup)
    targets = spark.createDataFrame([(1,)], "doc_id long")
    stats = targeted_delete(spark, path, targets, "doc_id")
    assert stats["rows_deleted"] == 1
    # tear: original back in place (duplicating its kept rows), with a
    # manifest pointing at it — exactly the mid-swap crash state
    shutil.copy(backup, victim)
    with open(os.path.join(path, "_pending_delete_test.json"), "w") as fh:
        json.dump([victim], fh)
    assert spark.read.parquet(path).count() > 199  # duplicates visible raw

    stats2 = targeted_delete(
        spark, path, spark.createDataFrame([(2,)], "doc_id long"), "doc_id"
    )
    assert stats2["rows_deleted"] == 1
    assert not glob.glob(os.path.join(path, "_pending_delete_*.json"))
    after = spark.read.parquet(path)
    assert after.count() == 198  # healed: no duplicates, both keys gone
    assert after.filter(F.col("doc_id").isin([1, 2])).count() == 0
    os.remove(backup)


def test_targeted_delete_manifest_heals_loss_window(spark, tmp_path):
    """The worse tear: manifest committed but rewritten parts still in
    the Spark-invisible _rewrite_* staging dir and originals still in
    place. A delete-first heal would remove the originals while the
    kept rows stay stranded invisible — silent loss. The heal loop
    must replay the moves FIRST, then the deletions."""
    import glob
    import json
    import os

    from pyspark.sql import functions as F

    from udacity_data_engineering_capstone_project_spark.sources.writers import (
        targeted_delete,
    )

    path = str(tmp_path / "ldocs")
    df = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    df.repartitionByRange(4, "doc_id").write.parquet(path)
    parts = sorted(f for f in os.listdir(path) if f.startswith("part-"))
    victim = os.path.join(path, parts[0])
    victim_keys = {
        r["doc_id"]
        for r in spark.read.parquet(victim).select("doc_id").collect()
    }
    target_key = min(victim_keys)
    # stage the rewrite (victim minus the target) exactly as a crashed
    # call would have left it: parts inside _rewrite_*, not yet moved
    staging_src = str(tmp_path / "stage_src")
    (
        spark.read.parquet(victim)
        .filter(F.col("doc_id") != target_key)
        .coalesce(1)
        .write.parquet(staging_src)
    )
    tmp_out = os.path.join(path, "_rewrite_tearloss")
    os.makedirs(tmp_out)
    staged_name = next(
        f for f in os.listdir(staging_src) if f.startswith("part-")
    )
    os.replace(
        os.path.join(staging_src, staged_name),
        os.path.join(tmp_out, staged_name),
    )
    manifest = {
        "moves": [
            [
                os.path.join(tmp_out, staged_name),
                os.path.join(path, f"deleted-tearloss-{staged_name}"),
            ]
        ],
        "delete": [victim],
        "tmp_dir": tmp_out,
    }
    with open(os.path.join(path, "_pending_delete_tear.json"), "w") as fh:
        json.dump(manifest, fh)
    # the torn state is invisible-but-recoverable: raw read still shows
    # the original (duplicate-free, pre-delete) data
    assert spark.read.parquet(path).count() == 200

    other_key = 199 if target_key != 199 else 198
    stats = targeted_delete(
        spark,
        path,
        spark.createDataFrame([(other_key,)], "doc_id long"),
        "doc_id",
    )
    assert stats["rows_deleted"] == 1
    assert not glob.glob(os.path.join(path, "_pending_delete_*"))
    assert not glob.glob(os.path.join(path, "_rewrite_*"))
    after = spark.read.parquet(path)
    # both the healed delete and the new one applied; nothing stranded
    assert after.count() == 198
    assert (
        after.filter(F.col("doc_id").isin([target_key, other_key])).count()
        == 0
    )


def test_targeted_delete_cleans_orphan_staging(spark, tmp_path):
    """A crash BEFORE the manifest commit leaves only garbage: a
    _rewrite_* dir and possibly a half-written .json.tmp manifest.
    Originals are intact, so the next call removes both and proceeds."""
    import glob
    import os

    from pyspark.sql import functions as F

    from udacity_data_engineering_capstone_project_spark.sources.writers import (
        targeted_delete,
    )

    path = str(tmp_path / "odocs")
    df = spark.range(0, 100).select(F.col("id").alias("doc_id"))
    df.repartitionByRange(2, "doc_id").write.parquet(path)
    os.makedirs(os.path.join(path, "_rewrite_orphan"))
    with open(
        os.path.join(path, "_pending_delete_x.json.tmp"), "w"
    ) as fh:
        fh.write('{"moves": [')  # torn mid-write
    stats = targeted_delete(
        spark, path, spark.createDataFrame([(5,)], "doc_id long"), "doc_id"
    )
    assert stats["rows_deleted"] == 1
    assert not glob.glob(os.path.join(path, "_rewrite_*"))
    assert not glob.glob(os.path.join(path, "_pending_delete_*"))
    assert spark.read.parquet(path).count() == 99
