"""Join operators (SURVEY.md §2.3 J1-J5) plus an as-of join the
reference lacks.

Scale notes (100 TB):
- Dimension sides of a star join are broadcast explicitly
  (``F.broadcast``) — never rely on a size estimate that may be stale
  for a freshly-derived dim. A broadcast join is shuffle-free on the
  fact side.
- The as-of join is implemented as union + window (sort within key),
  NOT a per-row range probe: one shuffle on the key, no quadratic
  blowup, no driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """J1-J3: equi-join by column list or expression. ``how`` is
    normalized to lowercase (the reference passes ``"Left"``,
    etl.py:204 — Spark tolerates it; we don't propagate the quirk)."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on, how.lower())


def star_join(
    fact: DataFrame,
    dims: list[tuple[DataFrame, Column, str]],
    broadcast_dims: bool | list[bool] = True,
) -> DataFrame:
    """J4: chain fact -> dim joins (the reference's 5-way star,
    ipynb cell 82: 1 inner date join + 4 left dim joins).

    ``dims``: list of (dim_df, join_cond, how). ``broadcast_dims``
    pins the broadcast hint per dim: a single bool applies to all, a
    list gives per-dim control. Pin True ONLY for dims BOUNDED by the
    data model (lookup tables, date dims — at 100 TB the fact side
    must never shuffle for a few-hundred-row dimension); leave False
    for any relation that GROWS with the fact (orders, customer) so
    AQE decides at runtime — it broadcasts small actual sizes and
    falls back to a shuffle join past the threshold. A pinned
    broadcast of a scale-growing relation is the dial class the
    round-8 1000x run caught here: the hint overrides AQE
    unconditionally, and the driver-side collect of a 150M-row orders
    build blew spark.driver.maxResultSize in warm-up.
    """
    flags = (
        broadcast_dims
        if isinstance(broadcast_dims, list)
        else [broadcast_dims] * len(dims)
    )
    if len(flags) != len(dims):
        # zip would silently TRUNCATE: a short flag list drops trailing
        # dim joins entirely (wrong results, not an error) — ADVICE r8
        raise ValueError(
            f"star_join: broadcast_dims has {len(flags)} flags for "
            f"{len(dims)} dims; pass one flag per dim (or a single bool)"
        )
    out = fact
    for (dim, cond, how), bc in zip(dims, flags):
        d = F.broadcast(dim) if bc else dim
        out = out.join(d, cond, how.lower())
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: list[str] | None = None,
    tie_break: str | None = None,
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` (``direction='backward'``, default) or the
    earliest right row with ``right_ts >= left_ts``
    (``direction='forward'``) within the same ``on`` key.

    Implementation is the scalable union+window pattern: tag both
    inputs, union, sort within key by (ts, side) — descending for
    forward — and carry the last seen right values with
    ``last(..., ignorenulls=True)``. One shuffle on ``on``; no
    range-probe, no crossJoin. Right rows at exactly ``left_ts`` are
    considered visible (inclusive; right sorts first on ties in both
    directions).

    ``tolerance_seconds`` bounds the match age (pandas ``merge_asof``
    semantics): matches farther than the tolerance become NULL. The
    matched right timestamp rides along in the same window pass, so
    the bound costs one comparison, not another join. Timestamp
    columns only.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right_value_cols = right_value_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    lcols = [c for c in left.columns]

    tagged_r = right.select(
        F.col(on).alias(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),  # right first on ties -> inclusive
        F.col(right_ts).alias("__rts"),  # matched-ts carrier (tolerance)
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != on],
    )
    tagged_l = left.select(
        F.col(on).alias(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_value_cols],
        *[F.col(c) for c in lcols if c != on],
    )
    ts_order = F.col("__ts") if direction == "backward" else F.col("__ts").desc()
    order = [ts_order, F.col("__side")]
    if tie_break:
        order.append(F.col(tie_break))
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_r.unionByName(tagged_l)
    for c in right_value_cols:
        carried = carried.withColumn(f"__r_{c}", F.last(f"__r_{c}", ignorenulls=True).over(w))
    carried = carried.withColumn("__rts", F.last("__rts", ignorenulls=True).over(w))
    if tolerance_seconds is not None:
        in_tol = (
            F.abs(F.unix_micros("__ts") - F.unix_micros("__rts"))
            <= F.lit(int(tolerance_seconds) * 1_000_000)
        )
        for c in right_value_cols:
            carried = carried.withColumn(
                f"__r_{c}", F.when(in_tol, F.col(f"__r_{c}"))
            )
    return carried.filter(F.col("__side") == 1).select(
        on,
        F.col("__ts").alias(left_ts),
        *[c for c in lcols if c not in (on, left_ts)],
        *[F.col(f"__r_{c}").alias(f"{c}_asof") for c in right_value_cols],
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join for a hot-key ``left`` side.

    The classic salting pattern: the skewed side gets a deterministic
    per-row salt (``hash(all left columns) pmod salt``), the other
    side is replicated ``salt`` times (explode of a literal range),
    and the join runs on (key, salt) — a hot key's rows now spread
    over ``salt`` reducers instead of melting one. For ``inner`` and
    ``left`` joins the result equals the plain join exactly; those are
    the ONLY ``how`` values accepted — with the right side replicated
    ``salt`` times, a right/full outer join would emit each unmatched
    right row ``salt`` times, so such requests raise rather than
    silently multiply rows.

    Use when a specific known-skewed join still overwhelms AQE's
    runtime skew splitting (AQE splits oversized partitions, but only
    after materializing the map side); salt the ingest once and every
    downstream join on that key is balanced. Replication multiplies
    the small side by ``salt`` — keep it for dim-sized right sides.
    """
    if how.lower() not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' only, got {how!r}: "
            "the replicated right side would duplicate unmatched right "
            "rows under right/full outer semantics"
        )
    lsalt = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(salt))
    l_salted = left.withColumn("__salt", lsalt)
    r_salted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l_salted.join(r_salted, [on, "__salt"], how.lower()).drop("__salt")


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_sql: str,
    max_distance: int = 1,
) -> DataFrame:
    """Entity-resolution fuzzy self-join: equality blocking + edit-
    distance verification. ``block_sql`` is a SQL expression over the
    aliased columns ``id``/``nm`` (e.g. ``concat(length(nm), '|',
    substr(nm, 1, 4))``) that buckets candidate matches; only pairs
    sharing a block key are compared with ``levenshtein``, so the cost
    is sum(block_size^2)/2, never n^2.

    Output: (id_a, id_b, dist) with id_a < id_b, dist <= max_distance.

    Scale: the blocked self-join shuffles on the block key; choose
    blocks so the largest stays executor-sized (the same df-capping
    discipline as jaccard_pairs). Edit distance runs JVM-side
    (``levenshtein`` is a built-in), no Python anywhere.
    """
    side = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("nm")
    ).withColumn("blk", F.expr(block_sql))
    a = side.select(
        F.col("id").alias("id_a"), F.col("nm").alias("nm_a"), "blk"
    )
    b = side.select(
        F.col("id").alias("id_b"), F.col("nm").alias("nm_b"), "blk"
    )
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("nm_a", "nm_b"))
        .filter(F.col("dist") <= max_distance)
        .select("id_a", "id_b", "dist")
    )
