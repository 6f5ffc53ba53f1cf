"""Phase-isolated adjudication of tpch_q9_profit's decade ratio
(VERDICT r11 next #1: 10.2x/decade on the quiet r11 fold — the board's
worst row and the only >9x one without a written causal breakdown).

The query is a 5-way join: lineitem joins part (LIKE-filtered),
supplier, orders, nation, then aggregates profit by (nation, year).
At 1000x the two structurally-large edges are lineitem x part
(part's ``%red%`` filter is non-prefix, so static pruning can't help;
whether the filtered side broadcasts decides one full lineitem
shuffle) and lineitem x orders (both sides huge — the canonical
fact-fact shuffle). The probe isolates:

- ``scan_s``            projected lineitem scan, noop sink
- ``join_part_s``       lineitem  x filtered part (amount columns)
- ``join_part_orders_s`` + orders (adds the fact-fact shuffle)
- ``full_512_s``        the registry query end-to-end at the 1000x pin
- ``full_32_s``         same at the 100x default (pin-sensitivity,
                        the r8 catch-#3 class: a pin sized for one
                        tier can starve or flood the other)
- ``part_filtered_rows`` / ``part_filtered_mb_est`` — is the filtered
  build side broadcastable at this tier?
- ``stages_top``        per-stage executorRunTime / shuffle read+write
  / memory+disk spill for the full-run stages (REST API), so a
  superlinear phase or a spill cliff is named, not guessed.

Usage: python tools/scale_probe_q9.py [sf_dir ...]
Emits one JSON line per sf_dir.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def _timed(mk, iters=3):
    mk().write.mode("overwrite").format("noop").save()  # warm
    best = None
    for _ in range(iters):
        t = time.time()
        mk().write.mode("overwrite").format("noop").save()
        dt = time.time() - t
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def _stages(spark):
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as r:
        return {s["stageId"]: s for s in json.load(r)}


def probe(sf_dir: str, iters: int = 3, pin: int = 512) -> dict:
    from pyspark.sql import functions as F

    from udacity_data_engineering_capstone_project_spark.plans.queries_sql import (
        SQL_QUERIES,
    )
    from udacity_data_engineering_capstone_project_spark.session import get_spark
    from udacity_data_engineering_capstone_project_spark.sources.readers import (
        read_table,
    )

    out = {"sf_dir": sf_dir}
    fn = SQL_QUERIES["tpch_q9_profit"][0]

    spark = get_spark(
        f"q9-probe-{pin}",
        shuffle_partitions=pin,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.conf.set("spark.sql.shuffle.partitions", str(pin))

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    part_f = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )

    # build-side size facts: decides whether the part edge broadcasts
    n_part = part_f.count()
    out["part_filtered_rows"] = n_part
    out["part_filtered_mb_est"] = round(n_part * 16 / (1 << 20), 1)

    out["scan_s"] = _timed(lambda: li, iters)

    def jp():
        return li.join(part_f, F.col("p_partkey") == F.col("l_partkey")).select(
            "l_suppkey", "l_orderkey",
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
            ).alias("amount"),
        )

    out["join_part_s"] = _timed(jp, iters)

    def jpo():
        return jp().join(
            orders, F.col("o_orderkey") == F.col("l_orderkey")
        ).select("l_suppkey", "amount", F.year("o_orderdate").alias("o_year"))

    out["join_part_orders_s"] = _timed(jpo, iters)

    # full query, stage-bracketed: one timed run between two REST
    # snapshots so the per-stage table covers exactly one execution
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
    before = _stages(spark)
    t0 = time.time()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    one_run = round(time.time() - t0, 3)
    after = _stages(spark)
    new = [s for sid, s in after.items() if sid not in before]
    new.sort(key=lambda s: -s.get("executorRunTime", 0))
    out["stages_top"] = [
        {
            "run_ms": s.get("executorRunTime"),
            "tasks": s.get("numCompleteTasks"),
            "shuf_read_mb": round(s.get("shuffleReadBytes", 0) / (1 << 20), 1),
            "shuf_write_mb": round(s.get("shuffleWriteBytes", 0) / (1 << 20), 1),
            "spill_mem_mb": round(s.get("memoryBytesSpilled", 0) / (1 << 20), 1),
            "spill_disk_mb": round(s.get("diskBytesSpilled", 0) / (1 << 20), 1),
            "name": (s.get("name") or "")[:80],
        }
        for s in new[:8]
    ]
    # min over the bracketed run + (iters-1) more
    best = one_run
    for _ in range(max(0, iters - 1)):
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = min(best, round(time.time() - t0, 3))
    out[f"full_{pin}_s"] = best
    spark.stop()

    # pin sensitivity: the same query at the 100x default
    spark = get_spark("q9-probe-32", shuffle_partitions=32)
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    out["full_32_s"] = _timed(lambda: fn(spark, sf_dir), iters)
    spark.stop()
    return out


if __name__ == "__main__":
    for d in sys.argv[1:] or ["/root/testdata/sf0.1"]:
        print(json.dumps(probe(d)), flush=True)
