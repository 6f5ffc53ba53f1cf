"""Corpus-curation operators for LLM training-data pipelines.

Beyond-reference (BASELINE.json north star): benchmark decontamination,
sequence packing for training batches, domain-mixture sampling, and
intra-document repetition scoring. Everything is built from built-in
column expressions and bounded-size driver state (no row-wise Python,
no O(corpus) collect), so the same plans run at 100 TB:

- decontamination is an inverted-index semi-join on 60-bit shingle
  digests (the benchmark side is tiny and broadcast);
- sequence packing is a distributed prefix sum — per-partition totals
  (O(#partitions) driver state, the same trick as RDD.zipWithIndex)
  plus a partition-local window, never a single global sort task;
- mixture sampling and repetition scoring are pure window/agg plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import spark_hex_to_long
from ..functions.textnorm import tokens_col
from .dedup import hashed_shingle_table


def benchmark_decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 5,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Flag training documents whose word ``n``-gram shingles overlap a
    benchmark/eval corpus (train-test contamination check).

    Returns (doc, n_shingles, n_matched, contaminated) where
    ``contaminated`` is the integer test
    ``n_matched * threshold_den >= n_shingles * threshold_num``
    (no float ratio — exact in any engine).

    Scale: both sides are reduced to 60-bit digests before any join, so
    text never crosses a shuffle. The benchmark side (eval sets are
    ~1e3-1e6 n-grams) is deduplicated then broadcast; each train doc's
    match count is a map-side hash probe + one groupBy on ``doc`` that
    reuses the shingle table's existing partitioning. With
    ``broadcast_benchmark=False`` the probe becomes a shuffled semi-ish
    inner join for benchmark sets too big to broadcast.
    """
    train_sh = hashed_shingle_table(train, id_col, text_col, n)
    bench_h = hashed_shingle_table(benchmark, id_col, text_col, n).select(
        "h"
    ).distinct()
    if broadcast_benchmark:
        bench_h = F.broadcast(bench_h)
    sizes = train_sh.groupBy("doc").agg(F.count("*").alias("n_shingles"))
    matched = (
        train_sh.join(bench_h, "h")
        .groupBy("doc")
        .agg(F.count("*").alias("n_matched"))
    )
    joined = sizes.join(matched, "doc", "left").select(
        "doc",
        "n_shingles",
        F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
    )
    return joined.withColumn(
        "contaminated",
        (
            F.col("n_matched") * threshold_den
            >= F.col("n_shingles") * threshold_num
        ).cast("int"),
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    tok_col: str = "n_tokens",
    num_partitions: int = 32,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are concatenated in
    ascending ``id_col`` order and the token stream is chunked into
    fixed ``seq_len`` windows; each document is assigned the sequence
    its FIRST token lands in. Returns
    (id, n_tokens, tok_start, seq_id) with ``tok_start`` the document's
    global token offset.

    This is the standard packed-pretraining layout (documents
    concatenated, fixed-length sequences cut across document
    boundaries); the deterministic id order makes the packing a pure
    function of the data — reproducible across runs and cluster
    layouts.

    Scale: the global running sum is a DISTRIBUTED PREFIX SUM, not a
    single-task global window. Range-partition by id, take each
    partition's token total (one O(#partitions) driver collect — same
    bounded state as ``RDD.zipWithIndex``), broadcast the exclusive
    partition offsets back as a literal map, and add a
    partition-LOCAL window cumsum. Every task touches only its own
    range; no stage ever serializes the corpus through one task. The
    output is identical for any partition count.
    """
    ranged = df.repartitionByRange(num_partitions, F.col(id_col)).select(
        F.col(id_col).alias("id"),
        F.col(tok_col).alias("n_tokens"),
        F.spark_partition_id().alias("__pid"),
    )
    totals = {
        r["__pid"]: r["t"]
        for r in ranged.groupBy("__pid")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    offsets, running = {}, 0
    for pid in sorted(totals):
        offsets[pid] = running
        running += totals[pid]
    off_expr = F.create_map(
        *[F.lit(x) for pid in offsets for x in (pid, offsets[pid])]
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = (
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        + F.coalesce(off_expr[F.col("__pid")], F.lit(0))
    ).cast("long")
    return ranged.select(
        F.col("id").alias(id_col),
        "n_tokens",
        start.alias("tok_start"),
    ).withColumn("seq_id", F.expr(f"tok_start DIV {int(seq_len)}"))


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    total: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic domain-mixture downsample: from each domain keep
    the first ``round(weights[domain] * total)`` documents by md5-hash
    rank (ties broken by id). Domains absent from ``weights`` are
    dropped; a domain with fewer rows than its target keeps everything
    it has.

    The selection is a pure function of (id, domain, weights) —
    independent of partitioning, cluster size, and run order, unlike
    ``sample()``/``TABLESAMPLE`` — which is what reproducible data
    mixtures for training runs require.

    Scale: one window over ``domain_col`` (the natural shuffle key; a
    heavily-skewed mega-domain can pre-filter on the hash before
    ranking) and a broadcast literal target map. No collect.
    """
    targets = {d: int(round(w * total)) for d, w in weights.items()}
    target_expr = F.create_map(
        *[F.lit(x) for d in sorted(targets) for x in (d, targets[d])]
    )
    h = F.expr(spark_hex_to_long(f"md5(CAST({id_col} AS STRING))", 15))
    w = Window.partitionBy(domain_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .withColumn("__target", target_expr[F.col(domain_col)])
        .filter(F.col("__rk") <= F.coalesce(F.col("__target"), F.lit(0)))
        .drop("__rk", "__target")
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    scale: int = 1000,
) -> DataFrame:
    """Intra-document repetition score: total vs distinct word
    ``n``-grams per document, and the duplicated-gram fraction in
    integer fixed-point (``rep_permille`` for the default scale).
    Boilerplate/spam detection signal: natural text repeats few
    n-grams; templated or looping text repeats many.

    Scale: per-row array expressions only (``size`` vs
    ``size(array_distinct(...))``) — no explode, no shuffle, whole
    plan stays inside codegen. Documents shorter than ``n`` tokens get
    0 total / 0 distinct / 0 score.
    """
    items = ", ".join(f"toks[i+{j}]" for j in range(n))
    grams = F.expr(
        f"transform(sequence(0, size(toks) - {n}), i -> concat_ws(' ', {items}))"
    )
    short = F.size("toks") < n
    return (
        df.select(
            F.col(id_col),
            tokens_col(text_col).alias("toks"),
        )
        .withColumn(
            "__g",
            F.when(short, F.array().cast("array<string>")).otherwise(grams),
        )
        .select(
            id_col,
            F.size("__g").cast("long").alias("n_grams"),
            F.size(F.array_distinct("__g")).cast("long").alias("n_distinct"),
        )
        .withColumn(
            "rep_score",
            F.when(F.col("n_grams") == 0, F.lit(0).cast("long")).otherwise(
                # integer DIV, not float /: bit-identical in any engine
                F.expr(f"(n_grams - n_distinct) * {int(scale)} DIV n_grams")
            ),
        )
    )


# --------------------------------------------------------------------------
# PII redaction

#: Redaction patterns, shared verbatim by the Spark operator and the
#: DuckDB oracle — restricted to the Java-regex ∩ RE2 common dialect
#: (no backrefs, no lookaround), so both engines match identically.
PII_PATTERNS = {
    "email": r"[a-z0-9._%+\-]+@[a-z0-9.\-]+\.[a-z]{2,}",
    "phone": r"\+?\d{3}[- ]\d{3}[- ]\d{4}",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Scrub emails / phone numbers / IPv4s from ``text_col``.

    Adds ``n_<kind>`` match counts and ``out_col`` with each match
    replaced by ``<KIND>``. Replacement order is fixed (email, phone,
    ip) and each kind's count is taken on the text AFTER the previous
    kinds' replacements — so ``n_<kind>`` equals the number of
    ``<KIND>`` tokens that stage actually emitted, even when patterns
    overlap (e.g. a phone-looking local part inside an email is
    consumed by the email stage and NOT double-counted as a phone).
    Pure per-row JVM expressions — no shuffle, no Python; at 100 TB
    this is a map-only pass that pipelines into whatever scan feeds
    it.
    """
    out = df
    red = F.col(text_col)
    for kind, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{kind}", F.size(F.regexp_extract_all(red, F.lit(pat), F.lit(0)))
        )
        red = F.regexp_replace(red, pat, f"<{kind.upper()}>")
    return out.withColumn(out_col, red)
