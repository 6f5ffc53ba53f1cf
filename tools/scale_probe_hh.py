"""Phase-isolated adjudication of heavy_hitter_tokens' decade ratio
(VERDICT r10 next #2: 12.3x/decade at the r10 fold, just above the
<=12 heuristic, on an episode-suspect base).

The operator is structurally two passes over the DERIVED token stream
(regex tokenize + explode): a per-batch Misra-Gries candidate sketch,
then an exact broadcast-semi recount. Neither pass shuffles the key
space, so the expected slope is ~2x the tokenize cost — linear. The
probe times each phase separately so a superlinear fold can be pinned
to a phase (or to base inflation) instead of hand-waved:

- ``tokenize_s``     one pass: explode + filter, noop sink
- ``sketch_s``       pass 1: mapInPandas candidates + tiny groupBy
- ``recount_s``      pass 2: broadcast semi join + exact groupBy
- ``full_s``         the registry query end-to-end

Usage: python tools/scale_probe_hh.py [sf_dir ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def probe(sf_dir: str, iters: int = 3) -> dict:
    import pandas as pd
    from pyspark.sql import functions as F

    from udacity_data_engineering_capstone_project_spark.functions.textnorm import (
        tokens_col,
    )
    from udacity_data_engineering_capstone_project_spark.operators.aggregates import (
        heavy_hitters,
    )
    from udacity_data_engineering_capstone_project_spark.session import get_spark

    spark = get_spark("hh-probe")

    def toks():
        return (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select(F.explode(tokens_col("text")).alias("token"))
            .filter(F.col("token") != "")
        )

    def timed(mk, sink="noop"):
        best = None
        for i in range(iters + 1):  # +1 warm-up
            t = time.time()
            if sink == "noop":
                mk().write.mode("overwrite").format("noop").save()
            else:
                mk()
            dt = time.time() - t
            if i:  # skip warm-up
                best = dt if best is None else min(best, dt)
        return round(best, 3)

    out = {"sf_dir": sf_dir}
    out["tokenize_s"] = timed(toks)

    def sketch():
        def batch_candidates(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                vc = pdf["token"].value_counts()
                keep = vc[vc * 100 >= len(pdf)]
                yield pd.DataFrame(
                    {
                        "value": list(keep.index) + [None],
                        "batch_rows": [0] * len(keep) + [len(pdf)],
                    }
                )

        return (
            toks()
            .mapInPandas(batch_candidates, "value string, batch_rows long")
            .groupBy("value")
            .agg(F.sum("batch_rows").alias("rows"))
            .collect()
        )

    out["sketch_s"] = timed(sketch, sink="collect")

    summary = sketch()
    cand = [(r.value,) for r in summary if r.value is not None] or [(None,)]
    total = sum(r.rows for r in summary if r.value is None)
    cand_df = spark.createDataFrame(cand, "value string")

    def recount():
        return (
            toks()
            .join(F.broadcast(cand_df), F.col("token") == F.col("value"), "left_semi")
            .groupBy("token")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") * 100 >= total)
        )

    out["recount_s"] = timed(recount)

    from udacity_data_engineering_capstone_project_spark.plans.queries_llm import (
        LLM_QUERIES,
    )

    out["full_s"] = timed(lambda: LLM_QUERIES["heavy_hitter_tokens"][0](spark, sf_dir))
    return out


if __name__ == "__main__":
    for d in sys.argv[1:] or ["/root/testdata/sf0.1"]:
        print(json.dumps(probe(d)), flush=True)
