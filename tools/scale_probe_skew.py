"""Skew-decision probe: measure the three join strategies end-to-end
on a deliberately hot-keyed fact table (VERDICT r6 next-steps #5).

``join_key_skew_audit`` emits the DECISION INPUT (skew_ratio_x100 =
max-key-rows * n_keys * 100 / total-rows); ``salted_join`` is the
manual fix; AQE skew splitting is the runtime fix. This probe builds a
fact table where one key owns ``HOT_FRAC`` of all rows (the "one viral
user / one boilerplate document" shape), joins it to a
too-big-to-broadcast dim, and times:

- ``plain_smj_s``: shuffle SMJ, AQE skew split OFF — the straggler
  baseline: every hot-key row lands in ONE reduce task.
- ``aqe_skew_s``: AQE skew split ON. The fixture's hot partition is
  MBs, not the 256 MB production default, so the probe lowers
  ``skewedPartitionThresholdInBytes``/``advisoryPartitionSizeInBytes``
  to scale-representative values — at 100 TB the defaults trigger on
  their own; the probe demonstrates the MECHANISM (split + replicate)
  at fixture scale.
- ``salted_s``: operators.joins.salted_join (salt=32), AQE skew OFF —
  the write-side fix that also balances every DOWNSTREAM stage keyed
  on the salted column, which AQE (a per-join runtime patch) cannot.

Broadcast is disabled throughout: at the scales where skew hurts, the
dim side no longer fits an executor (else broadcast would be the
answer and no skew decision exists).

Usage: python tools/scale_probe_skew.py [sf_dir] [hot_frac_pct]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

HOT_KEY = 1


def main() -> None:
    from pyspark.sql import functions as F

    from udacity_data_engineering_capstone_project_spark.operators.joins import (
        salted_join,
    )
    from udacity_data_engineering_capstone_project_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf10f"
    hot_pct = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    # dim_keep_pct shrinks the dim (keyed modulo, hot key preserved) to
    # probe the salting win region: salt replicates the WHOLE dim, so
    # the manual fix only pays off when salt * |dim| stays small next
    # to the straggler it removes.
    dim_keep_pct = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    salt = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    spark = get_spark("scale-probe-skew")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # hot-key construction: hot_pct% of fact rows remapped to ONE key
    fact = o.select(
        F.when(F.pmod(F.col("o_orderkey"), 100) < hot_pct, F.lit(HOT_KEY))
        .otherwise(F.col("o_custkey"))
        .alias("o_custkey"),
        "o_orderpriority",
        "o_totalprice",
    ).persist()
    dim = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.pmod(F.col("c_custkey"), 100) < dim_keep_pct)
        .select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
        .persist()
    )
    n_fact, n_dim = fact.count(), dim.count()

    # the decision input: the audit's skew ratio on this fact
    per_key = fact.groupBy("o_custkey").agg(F.count("*").alias("n"))
    a = per_key.agg(
        F.sum("n").alias("total"), F.count("*").alias("keys"), F.max("n").alias("mx")
    ).first()
    skew_ratio_x100 = int(a["mx"] * a["keys"] * 100 // a["total"])

    def run_join(mk, iters=3):
        samples = []
        for _ in range(iters):
            t0 = time.time()
            mk().write.mode("overwrite").format("noop").save()
            samples.append(time.time() - t0)
        return round(min(samples), 3)

    def plain():
        return (
            fact.join(dim, "o_custkey")
            .groupBy("o_orderpriority", "c_mktsegment")
            .agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("s"))
        )

    def salted():
        return (
            salted_join(fact, dim, "o_custkey", salt=salt)
            .groupBy("o_orderpriority", "c_mktsegment")
            .agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("s"))
        )

    results = {}
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    results["plain_smj_s"] = run_join(plain)

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    # fixture-scale thresholds (production defaults: 256 MB / factor 5
    # — they trigger unaided at 100 TB partition sizes)
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    results["aqe_skew_s"] = run_join(plain)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.unset("spark.sql.adaptive.forceOptimizeSkewedJoin")

    results["salted_s"] = run_join(salted)

    print(
        json.dumps(
            {
                "metric": "skew_join_decision",
                "sf_dir": sf_dir,
                "hot_frac_pct": hot_pct,
                "dim_keep_pct": dim_keep_pct,
                "salt": salt,
                "n_fact": n_fact,
                "n_dim": n_dim,
                "skew_ratio_x100": skew_ratio_x100,
                **results,
            }
        )
    )


if __name__ == "__main__":
    main()
