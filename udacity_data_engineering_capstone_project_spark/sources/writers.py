"""Sink operators (SURVEY.md §2.1 S6-S8): partitioned parquet writes.

The reference partitions some outputs by near-unique keys (``sasdate``
-> 187 dirs is fine; ``ident`` -> 55,075 dirs is a small-files
explosion, SURVEY.md §4.3). We keep the idea — write-side partitioning
for read-time pruning — and guard against pathological keys.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame

#: Refuse-by-default threshold for distinct partition values. At 100 TB a
#: partition column with >10k values produces millions of small files.
MAX_PARTITIONS_GUARD = 10_000


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_partitions: int = MAX_PARTITIONS_GUARD,
    check_cardinality: bool = False,
) -> None:
    """S6-S8: parquet sink, optionally hash-partitioned by column(s).

    ``check_cardinality=True`` counts distinct partition keys first and
    warns (but still writes) past ``max_partitions`` — an explicit,
    opt-in version of the check the reference lacked when it partitioned
    airports by ``ident`` (55,075 dirs).
    """
    writer = df.write.mode(mode)
    if partition_by:
        if check_cardinality:
            n = df.select(*partition_by).distinct().count()
            if n > max_partitions:
                warnings.warn(
                    f"partitioning {path} by {partition_by} creates {n} "
                    f"directories (> {max_partitions}); consider a coarser key",
                    stacklevel=2,
                )
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    n_buckets: int = 8,
    sort_by: str | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed parquet table (saveAsTable — bucketing metadata lives
    in the catalog): pre-shuffles the data into ``n_buckets`` files by
    ``hash(bucket_by)``, optionally sorted within buckets.

    The 100 TB payoff: two tables bucketed by the same key and count
    join WITHOUT a shuffle (and with ``sort_by``, without a sort) —
    the shuffle is paid once at write time instead of on every join.
    The co-location test asserts the joined plan contains zero
    Exchange operators.

    ``path`` makes it an EXTERNAL table at that location. Use a fresh
    per-process path for scratch tables: a managed table's warehouse
    directory outlives the in-memory catalog, so a NEW process hits
    LOCATION_ALREADY_EXISTS on the leftover dir (overwrite can't help
    — the fresh catalog has no table to overwrite).

    The keyed ``repartition`` before the write guarantees ONE file per
    bucket (repartition's HashPartitioning and the bucket id share the
    same murmur3-mod expression, so each task holds exactly one
    bucket's rows): without it every write task emits a file into
    every bucket it touches — tasks x buckets files — and, decisively,
    Spark only trusts a bucketed scan's ``sortBy`` order when each
    bucket is a single file (SPARK-28595 +
    ``spark.sql.legacy.bucketedTableScan.outputOrdering``, set in
    session.py). Multi-file buckets re-SORT both sides inside every
    downstream SMJ — the r10 1000x run measured the bucketed star
    join 1.8x SLOWER than the plain plan before this (120 s vs 66 s):
    exchange-free is not sort-free.
    """
    from pyspark.sql import functions as F

    writer = (
        df.repartition(n_buckets, F.col(bucket_by))
        .write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, bucket_by)
    )
    if sort_by:
        writer = writer.sortBy(sort_by)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = "gzip",
) -> None:
    """JSON-lines sink (one JSON object per line, optionally gzipped
    per part-file — splittable formats beat one giant .gz at scale;
    prefer zstd where the cluster has the codec)."""
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def compact_parquet(
    spark,
    path: str,
    target_file_mb: int = 256,
) -> int:
    """Small-file compaction: rewrite a parquet dataset into files of
    ~``target_file_mb`` each. The 100 TB hygiene op — streaming
    ingests and over-partitioned writes leave thousands of KB-sized
    files whose per-file open/footer cost dominates scans. Sizing is
    estimated from the CURRENT on-disk bytes (compressed), then the
    data is rewritten through a single coalesce-style repartition.
    Returns the number of output files.

    A Hive-partitioned input (``col=val`` directories) is rewritten
    with the SAME ``partitionBy`` layout — partition columns stay
    directory-encoded, and ``n_files`` becomes files-per-partition.

    Crash-safe swap: the rewrite lands at ``path + '.compact'``, the
    old dataset is renamed aside to ``path + '.old'``, the rewrite is
    renamed into place, and only then is ``.old`` deleted — at no
    point is ``path`` the only copy missing. (At scale use a
    transactional table format; the rename dance keeps the demo
    self-contained and never loses data to a mid-swap crash.)
    """
    import math
    import os
    import re
    import shutil

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))

    # Detect Hive partition columns from the directory layout so the
    # rewrite preserves it (else partition cols silently become data
    # cols and the dataset layout changes under the caller).
    part_cols: list[str] = []
    probe = path
    while True:
        subdirs = [
            d
            for d in os.listdir(probe)
            if os.path.isdir(os.path.join(probe, d))
            and re.fullmatch(r"[^=]+=[^=]*", d)
        ]
        if not subdirs:
            break
        part_cols.append(subdirs[0].split("=", 1)[0])
        probe = os.path.join(probe, subdirs[0])

    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".compact"
    writer = df.repartition(n_files, *part_cols) if part_cols else df.repartition(n_files)
    w = writer.write.mode("overwrite")
    if part_cols:
        w = w.partitionBy(*part_cols)
    w.parquet(tmp)

    old = path.rstrip("/") + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)  # old data set aside, still intact
    os.rename(tmp, path)  # rewrite becomes live
    shutil.rmtree(old)  # only now is the original deleted
    return n_files


def write_parquet_incremental(
    df: DataFrame,
    path: str,
    partition_by: list[str],
) -> None:
    """Dynamic partition overwrite: replace ONLY the partitions present
    in ``df``, leaving the rest of the dataset untouched — the
    incremental-ETL write mode (daily loads replace yesterday's
    partition without rewriting years of history; a full static
    overwrite at 100 TB would drop the whole table first)."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_col: str,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Range-partitioned, within-file-sorted parquet: rows are range-
    split on ``sort_col`` across files and sorted inside each, so
    every file (and row group) covers a DISJOINT narrow range of the
    column. Point/range filters then skip whole files via parquet
    min/max stats — the poor man's clustering index, and the single
    highest-leverage layout choice for a 100 TB time- or key-ordered
    scan pattern."""
    (
        df.repartitionByRange(n_files, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode(mode)
        .parquet(path)
    )


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "zlib",
) -> None:
    """ORC sink — columnar alternative for Hive-standardized lakes;
    same partitioned-layout rules as :func:`write_parquet`."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def zorder_value(c1, c2, bits: int = 16):
    """Morton (Z-order) value of two non-negative int columns: their
    low ``bits`` bits interleaved into one long. Rows close in Z-value
    are close in BOTH dimensions, so range-splitting on it gives files
    whose parquet min/max stats are narrow on both columns at once —
    multi-dimensional data skipping where a single-column sort can
    only serve one predicate. Pure JVM bit arithmetic (shift/and/or),
    whole-stage codegen friendly. Callers normalize values into
    [0, 2^bits) first (rank or min/max scale)."""
    from pyspark.sql import functions as F

    a = c1.cast("long")
    b = c2.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col1: str,
    col2: str,
    n_files: int = 8,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet: range-split + sort on the Morton
    value of (col1, col2), so point/range filters on EITHER column
    skip most files via footer min/max — :func:`write_range_sorted`
    generalized to two dimensions. One extra range shuffle at write
    time buys every later scan its skipping."""
    z = zorder_value(df[col1], df[col2], bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def targeted_delete(
    spark,
    path: str,
    targets: DataFrame,
    key_col: str,
) -> dict:
    """Right-to-be-forgotten / takedown deletion over an immutable
    parquet dataset: remove every row whose ``key_col`` appears in
    ``targets`` by rewriting ONLY the part-files that actually contain
    a target row — the copy-on-write shape transactional table formats
    (Delta/Iceberg/Hudi) use, self-contained here on plain parquet.

    Why not ``read -> filter -> overwrite``: at 100 TB that rewrites
    the entire dataset to delete a handful of rows. Deletes cluster
    (a user's docs, one ingest batch), so the affected-file set is a
    sliver; everything else is untouched bytes.

    Dataflow: one pruned scan of (key, input_file_name) semi-joined to
    the broadcast target keys yields the affected file list (driver
    state: file PATHS only, bounded by the file count); those files
    are re-read as their own dataset, anti-joined on the key, and
    rewritten into fresh uniquely-named part-files; only then are the
    old files deleted.

    Crash-safety contract: the commit point is one atomic rename of a
    manifest recording the WHOLE swap — the (src, dst) move of every
    rewritten part out of the Spark-invisible ``_rewrite_*`` staging
    dir AND the originals to delete. The manifest is written to a
    ``.tmp`` name, fsync'd, then ``os.replace``'d into
    ``_pending_delete_*.json`` (so a torn write can never leave a
    parseable-but-wrong or truncated manifest behind).
    - Crash BEFORE the manifest rename: nothing changed — originals
      intact, staged parts invisible; the next call garbage-collects
      orphan ``_rewrite_*`` dirs and re-running the delete is a no-op
      duplicate of work, never a correctness event.
    - Crash AFTER the rename (mid-moves or mid-deletes): the next
      call's heal loop replays the manifest in order — moves FIRST
      (``os.replace`` is idempotent: already-moved parts are skipped),
      THEN the original deletions — before anything reads the dataset.
      Kept rows are therefore never stranded invisible while their
      originals get deleted: the dataset is never missing rows it
      shouldn't be, in any window.

    Keys are matched on the dataset column's NATIVE type: the targets'
    key is cast to it and the cast is validated — any target key the
    cast nulls out (e.g. a non-numeric string against a long column)
    raises instead of silently matching nothing.

    Returns {"files_total", "files_rewritten", "rows_deleted"}.
    """
    import glob
    import json
    import os
    import uuid

    from pyspark.sql import functions as F

    import shutil

    # Heal any interrupted prior delete BEFORE reading: replay each
    # manifest's moves first (stranded staged parts become visible),
    # THEN its original-file deletions — so neither the lost-rows nor
    # the duplicate-rows window can surface to this or a later reader.
    for manifest in glob.glob(os.path.join(path, "_pending_delete_*.json")):
        with open(manifest) as fh:
            m = json.load(fh)
        if isinstance(m, list):  # legacy delete-only manifest shape
            moves, deletes, tmp_dir = [], m, None
        else:
            moves, deletes, tmp_dir = m["moves"], m["delete"], m.get("tmp_dir")
        for src, dst in moves:
            if os.path.exists(src):
                os.replace(src, dst)
        for local in deletes:
            if os.path.exists(local):
                os.remove(local)
        if tmp_dir:
            shutil.rmtree(tmp_dir, ignore_errors=True)
        os.remove(manifest)
    # Orphans from a crash before the commit rename: half-written
    # manifests and staging dirs no (processed) manifest references.
    # Originals are still intact in that window, so both are garbage.
    for stray in glob.glob(os.path.join(path, "_pending_delete_*.json.tmp")):
        os.remove(stray)
    for stray in glob.glob(os.path.join(path, "_rewrite_*")):
        shutil.rmtree(stray, ignore_errors=True)

    base = spark.read.parquet(path)
    key_type = base.schema[key_col].dataType
    t_cast = targets.select(
        F.col(key_col).alias("__k_raw"),
        # try_cast: under ANSI mode a plain cast would throw a raw
        # NumberFormatException mid-job; we want the validated raise
        F.col(key_col).try_cast(key_type).alias("__k"),
    ).distinct()
    n_lost = t_cast.filter(
        F.col("__k").isNull() & F.col("__k_raw").isNotNull()
    ).count()
    if n_lost:
        raise ValueError(
            f"targeted_delete: {n_lost} target key(s) do not cast to the "
            f"dataset's {key_col} type {key_type.simpleString()}; refusing "
            "to silently no-op a takedown."
        )
    t = F.broadcast(t_cast.select("__k").distinct())
    tagged = base.select(
        F.col(key_col).alias("__k"),
        F.input_file_name().alias("__file"),
    )
    hit = tagged.join(t, "__k")
    affected = [r["__file"] for r in hit.select("__file").distinct().collect()]
    n_deleted = hit.count()
    all_files = [
        r["__file"]
        for r in tagged.select("__file").distinct().collect()
    ]
    if not affected:
        return {
            "files_total": len(all_files),
            "files_rewritten": 0,
            "rows_deleted": 0,
        }

    kept = (
        spark.read.parquet(*affected)
        .join(t, F.col(key_col) == F.col("__k"), "left_anti")
    )
    tmp_out = os.path.join(path, f"_rewrite_{uuid.uuid4().hex[:12]}")
    kept.write.mode("overwrite").parquet(tmp_out)
    affected_local = [f.replace("file://", "") for f in affected]
    # Plan the whole swap up front with destination names fixed NOW, so
    # a replay after a crash lands the same files in the same places.
    moves = [
        (
            os.path.join(tmp_out, name),
            os.path.join(path, f"deleted-{uuid.uuid4().hex[:8]}-{name}"),
        )
        for name in sorted(os.listdir(tmp_out))
        if name.startswith("part-")
    ]
    # Commit point: the full swap plan (moves + originals-to-delete)
    # goes durable in ONE atomic rename — temp write + fsync +
    # os.replace — before any part moves. The heal loop above replays
    # it to completion (moves first, then deletes) after any crash.
    manifest_path = os.path.join(
        path, f"_pending_delete_{uuid.uuid4().hex[:12]}.json"
    )
    with open(manifest_path + ".tmp", "w") as fh:
        json.dump(
            {"moves": moves, "delete": affected_local, "tmp_dir": tmp_out}, fh
        )
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(manifest_path + ".tmp", manifest_path)
    # move rewritten parts up beside the survivors, then drop originals
    for src, dst in moves:
        os.replace(src, dst)
    for local in affected_local:
        if os.path.exists(local):
            os.remove(local)
    shutil.rmtree(tmp_out, ignore_errors=True)
    os.remove(manifest_path)
    return {
        "files_total": len(all_files),
        "files_rewritten": len(affected),
        "rows_deleted": int(n_deleted),
    }
