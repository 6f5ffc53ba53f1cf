"""Build a ~10x replica of an existing fixture SF for SCALING BENCH runs.

Measurement infrastructure ONLY — correctness always runs against the
driver-shipped fixtures untouched. This tool exists to convert the
"survives 100x" argument from plan-reading into measurement (VERDICT r1
#5): replicate sf0.1 k times with key offsets into ./.scratch/sf1, then
`SPARK_GRAFT_SF_DIR=.scratch/sf1 python bench.py`.

Replication rules (semantics-preserving at k-times scale):

- region/nation: fixed-size dims in TPC-H — NOT replicated.
- customer/supplier/part/orders/lineitem/events/embeddings: keys get a
  per-replica offset (key + r * ceil_pow10(max_key)) so FK joins keep
  exactly the original fan-out — a join's matches per key do not
  change, only the number of keys, which is precisely what a bigger SF
  means.
- documents.text: every word gets a PER-REPLICA suffix (a bijective
  per-replica vocabulary mapping, w -> w || 'xr<r>'). Verbatim
  replication would make every doc a k-way exact dup and blow the
  near-dup pair count up quadratically (k^2 per group) — a different
  WORKLOAD, not a bigger one. A bijective word mapping is the
  artifact-free construction: every n-gram is replica-qualified
  (cross-replica Jaccard exactly 0), within-replica shingle identity
  is untouched (two docs share a mapped shingle iff they shared the
  original), so the per-replica shingle DF DISTRIBUTION is exactly
  the base corpus's and base near-dup pairs survive exactly k-fold
  (linear) — the honest "k times more of the same workload". Three
  earlier designs failed in distinct ways: every-4th-word tag
  interleave left 2/5 of shingles untagged (cross-replica df
  inflated k-fold -> quadratic inverted-index artifact);
  per-(doc, replica) tags qualified every shingle by doc id (ALL
  near-dup pairs destroyed -> zero verification work to scale);
  every-2nd-word tag interleave zeroed cross-replica overlap but
  COLLAPSED 3-gram entropy to the 2 flanking words (the constant tag
  adds none), which on a small-vocabulary corpus inflated
  within-replica shingle df ~vocab-fold (sum df^2 grew 206x for 10x
  docs — measured while probing the prefix-filter join, round 3).
- embeddings.embedding: per-replica dimension ROTATION. A rotated
  vector is ~orthogonal to its source (random high-dim cosine), so
  ANN/SRP workloads see k-times more points, not k-times copies of
  the same point.

Usage: python tools/scale_data.py [src_sf_dir] [dest_dir] [k]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def _offset(maxval: int) -> int:
    """Next power of ten above maxval: replica keys stay readable
    (replica index in the high digits) and never collide."""
    return 10 ** (int(math.log10(max(maxval, 1))) + 1)


def replicate(spark, src: str, dest: str, k: int = 10, tables=None) -> None:
    """``tables``: optional iterable restricting which fact tables are
    replicated (e.g. {"documents", "embeddings"} for a dedup-family
    scaling probe) — region/nation dims are always copied."""
    read = lambda t: spark.read.parquet(f"{src}/{t}.parquet")  # noqa: E731

    for t in ("region", "nation"):
        read(t).write.mode("overwrite").parquet(f"{dest}/{t}.parquet")

    key_cols = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
        "embeddings": ["vec_id"],
        "documents": ["doc_id"],
    }
    # one offset per logical key DOMAIN so FKs stay consistent
    domain_of = {
        "c_custkey": "cust", "o_custkey": "cust",
        "o_orderkey": "ord", "l_orderkey": "ord",
        "p_partkey": "part", "l_partkey": "part",
        "s_suppkey": "supp", "l_suppkey": "supp",
        "event_id": "event", "user_id": "user",
        "vec_id": "vec", "doc_id": "doc",
    }
    if tables is not None:
        key_cols = {t: c for t, c in key_cols.items() if t in set(tables)}
    dmax: dict[str, int] = {}
    for t, cols in key_cols.items():
        df = read(t)
        row = df.agg(*[F.max(c).alias(c) for c in cols]).collect()[0]
        for c in cols:
            d = domain_of[c]
            dmax[d] = max(dmax.get(d, 0), int(row[c]))
    off = {d: _offset(m) for d, m in dmax.items()}

    for t, cols in key_cols.items():
        df = read(t)
        parts = []
        for r in range(k):
            rep = df
            for c in cols:
                rep = rep.withColumn(c, F.col(c) + F.lit(r * off[domain_of[c]]))
            if t == "documents":
                # bijective per-replica vocabulary mapping: every word
                # carries the replica suffix, so cross-replica Jaccard
                # is 0 while the within-replica shingle df distribution
                # is EXACTLY the base corpus's (see module docstring)
                rep = rep.withColumn(
                    "text",
                    F.expr(
                        "array_join(transform(split(text, ' '),"
                        f" w -> concat(w, 'xr{r}')), ' ')"
                    ),
                )
            if t == "embeddings" and r > 0:
                # rotate dimensions by r AND sign-flip per (dim, r):
                # rotation alone yields only `dim` distinct transforms,
                # so k > dim replicas would plant exact-duplicate
                # vectors; the deterministic hash-based sign flips make
                # every replica's transform distinct and keep replicas
                # ~orthogonal to their source (random high-dim cosine)
                rep = rep.withColumn(
                    "embedding",
                    F.expr(
                        "transform(sequence(0, size(embedding) - 1),"
                        f" i -> CASE WHEN pmod(hash(i, {r}), 2) = 0 "
                        "THEN CAST(1.0 AS FLOAT) ELSE CAST(-1.0 AS FLOAT) END"
                        f" * embedding[(i + {r}) % size(embedding)])"
                    ),
                )
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{dest}/{t}.parquet")
        print(f"[scale_data] {t}: {k}x written")


def main() -> int:
    from udacity_data_engineering_capstone_project_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dest = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    tables = sys.argv[4].split(",") if len(sys.argv) > 4 else None
    spark = get_spark("scale-data")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    replicate(spark, src, dest, k, tables=tables)
    return 0


if __name__ == "__main__":
    sys.exit(main())
