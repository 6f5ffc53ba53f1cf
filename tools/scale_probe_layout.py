"""Layout-tier scaling probe: bucketed co-located join + Z-order box.

Converts the two round-6 layout claims from plan-reading into
measurement (the same discipline as scale_probe_trigram):

- Bucketed join: ``bkt_build_s`` is the one-time double bucketBy write
  (the shuffle paid at ingest); ``bkt_serve_s`` is min-of-3 of the
  exchange-free SMJ rollup over the bucketed tables; ``shuffle_s`` is
  the same join/rollup over plain parquet (both sides exchange per
  query). Pass criterion: serve beats shuffle at every scale and the
  GAP grows with data — the avoided exchange is the linearly-growing
  term.

- Z-order box: ``z_build_s`` is the one-time clustered rewrite;
  ``z_serve_s`` is min-of-3 of the 2-D box rollup on the clustered
  copy; ``plain_s`` is the same box on the original layout. The
  replicas offset all keys EXCEPT replica 0's, so the box's match set
  stays ~constant while the corpus grows k-fold: the clustered copy
  reads ~constant bytes (row-group min/max skipping on both
  dimensions), the plain layout's scan grows linearly.

Usage: python tools/scale_probe_layout.py [sf_dir ...]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def _timed(mk, iters=3):
    mk().write.mode("overwrite").format("noop").save()  # warm-up
    samples = []
    for _ in range(iters):
        t = time.time()
        mk().write.mode("overwrite").format("noop").save()
        samples.append(time.time() - t)
    return round(min(samples), 3)


def probe(sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from udacity_data_engineering_capstone_project_spark.session import get_spark
    from udacity_data_engineering_capstone_project_spark.sources.writers import (
        write_bucketed,
        write_zordered,
    )

    spark = get_spark("scale-probe-layout")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    oo = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )

    def rollup(l, o):
        j = l.hint("merge").join(o, l.l_orderkey == o.o_orderkey)
        return j.groupBy("o_orderpriority").agg(
            F.count("*").alias("n_lines"),
            F.sum("l_quantity").alias("sum_qty"),
        )

    tmp = tempfile.mkdtemp(prefix="layout_probe_")
    out: dict = {"sf_dir": sf_dir, "n_lineitem": li.count()}
    try:
        t0 = time.time()
        write_bucketed(li, "probe_bkt_li", "l_orderkey", n_buckets=32,
                       sort_by="l_orderkey", path=f"{tmp}/bkt_li")
        write_bucketed(oo, "probe_bkt_oo", "o_orderkey", n_buckets=32,
                       sort_by="o_orderkey", path=f"{tmp}/bkt_oo")
        out["bkt_build_s"] = round(time.time() - t0, 3)
        bl, bo = spark.table("probe_bkt_li"), spark.table("probe_bkt_oo")
        out["bkt_serve_s"] = _timed(lambda: rollup(bl, bo))
        out["shuffle_s"] = _timed(lambda: rollup(li, oo))

        zli = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_partkey", "l_suppkey", "l_returnflag", "l_quantity"
        )

        lo1, hi1, lo2, hi2 = 40, 90, 3, 12

        def box(src):
            return (
                src.filter(
                    (F.col("l_partkey").between(lo1, hi1))
                    & (F.col("l_suppkey").between(lo2, hi2))
                )
                .groupBy("l_returnflag")
                .agg(F.count("*").alias("n_rows"), F.sum("l_quantity").alias("sum_qty"))
            )

        # bits must cover the ACTUAL key domain: the replica dirs
        # offset keys per replica (max partkey ~1e7 at 100x), and the
        # Morton interleave drops bits above `bits` — a wrapped
        # z-value destroys the clustering (measured: the first 100x
        # run used bits=16 and served 7x slower than bits sized to
        # the domain). This is the writer docstring's normalize-first
        # rule, applied.
        hi = zli.agg(
            F.max("l_partkey").alias("p"), F.max("l_suppkey").alias("s")
        ).collect()[0]
        bits = max(int(hi.p).bit_length(), int(hi.s).bit_length())
        n_files = max(64, out["n_lineitem"] // 500_000)
        t0 = time.time()
        write_zordered(zli, f"{tmp}/li_z", "l_partkey", "l_suppkey",
                       n_files=n_files, bits=bits)
        out["z_build_s"] = round(time.time() - t0, 3)
        out["z_bits"], out["z_files"] = bits, n_files
        zread = spark.read.parquet(f"{tmp}/li_z")
        out["z_serve_s"] = _timed(lambda: box(zread))
        # the fixture/replica layout is ACCIDENTALLY clustered by
        # partkey (per-replica key offsets put each replica's rows in
        # contiguous files), so "plain" already skips on one dim; the
        # honest unclustered baseline is a hash-scattered rewrite —
        # every file spans the full key domain, min/max stats prune
        # nothing.
        # hash-partitioning on partkey scatters: each file holds a
        # pseudo-random partkey SUBSET spanning the full domain
        zli.repartition(n_files, "l_partkey").write.mode("overwrite").parquet(
            f"{tmp}/li_rand"
        )
        rnd = spark.read.parquet(f"{tmp}/li_rand")
        out["plain_s"] = _timed(lambda: box(zli))
        out["scattered_s"] = _timed(lambda: box(rnd))
        out["box_rows"] = box(zread).agg(F.sum("n_rows")).collect()[0][0]

        # Wall times at this fixture width sit in the noise floor (a
        # 4-int-column scan of even 60M rows is sub-second on 32
        # cores), so ALSO report the layout-explicit quantity the
        # reader's pruning actually uses: how many FILES have
        # [min,max] intervals intersecting the box on both dims —
        # file-level skipping, which row-group skipping then refines.
        def files_hit(src):
            stats = (
                src.groupBy(F.input_file_name().alias("f"))
                .agg(
                    F.min("l_partkey").alias("p_lo"),
                    F.max("l_partkey").alias("p_hi"),
                    F.min("l_suppkey").alias("s_lo"),
                    F.max("l_suppkey").alias("s_hi"),
                )
            )
            hit = stats.filter(
                (F.col("p_lo") <= hi1) & (F.col("p_hi") >= lo1)
                & (F.col("s_lo") <= hi2) & (F.col("s_hi") >= lo2)
            )
            return hit.count(), stats.count()

        out["z_files_hit"], out["z_files_total"] = files_hit(zread)
        out["scattered_files_hit"], out["scattered_files_total"] = files_hit(rnd)
        return out
    finally:
        for t in ("probe_bkt_li", "probe_bkt_oo"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    out = [probe(d) for d in dirs]
    print(json.dumps({"metric": "layout_scaling", "runs": out}))


if __name__ == "__main__":
    main()
