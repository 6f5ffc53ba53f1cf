"""Deduplication operators for large-scale text corpora.

Beyond-reference (BASELINE.json north star): the reference's only dedup
is full-row ``dropDuplicates`` (SURVEY.md P7). A training-data pipeline
needs content-level near-dup detection that survives 100 TB:

- exact_dedup          hash-groupBy on md5(text): one shuffle on a
                       128-bit key, never on the text payload itself.
- shingle_table        doc -> distinct word n-gram shingles (strings;
                       used where the shingle text itself is output).
- hashed_shingle_table doc -> distinct 60-bit shingle digests: the
                       substrate for Jaccard/MinHash. Only 16-byte
                       (long, long) rows ever cross a shuffle.
- jaccard_pairs        exact all-pairs similarity via an inverted index
                       (digest self-join), not an O(n^2) cross join.
- minhash_lsh_pairs    MinHash signatures + banded LSH candidates +
                       exact verification: the scale path. Work is
                       linear in corpus size + candidate count.
- simhash              60-bit fingerprints via token-hash bit voting;
                       identical fingerprints => near-dups.

Every hash is md5-derived (functions/hashing.py) so the DuckDB oracle
can reproduce values bit-for-bit; the oracle works on shingle STRINGS
(the semantic ground truth) while the engine works on their 60-bit
digests — collision-equivalent (P[any collision] ~ n^2/2^61), and the
per-round oracle gate verifies the equivalence on real data.
Similarities are reported as integer (intersection, union) pairs — no
float in comparison paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.hashing import (
    MINHASH_PRIME,
    minhash_coefficients,
    spark_hex_to_long,
)
from ..functions.textnorm import tokens_col


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup groups: md5(text) -> (hash, keeper id, group size).

    Grouping on the digest, not the raw text, keeps shuffle rows narrow
    (16 bytes vs document bodies) — at 100 TB the text never crosses
    the wire. md5 collisions are ~2^-64 at corpus scale; acceptable for
    dedup (and required for oracle parity).
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("text_md5"), F.col(id_col).alias("doc"))
        .groupBy("text_md5")
        .agg(F.min("doc").alias("keep_id"), F.count("*").alias("n_copies"))
    )


def _gram_expr(n: int):
    items = ", ".join(f"toks[i+{j}]" for j in range(n))
    return F.expr(
        f"transform(sequence(0, size(toks) - {n}), i -> concat_ws(' ', {items}))"
    )


def shingle_table(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(doc, shingle) pairs: distinct word ``n``-grams of normalized
    text. Docs shorter than ``n`` tokens contribute no rows. Use
    :func:`hashed_shingle_table` unless the shingle text itself is
    needed — string rows are 2-4x wider on the distinct shuffle."""
    return (
        df.select(F.col(id_col).alias("doc"), tokens_col(text_col).alias("toks"))
        .filter(F.size("toks") >= n)
        .select("doc", F.explode(_gram_expr(n)).alias("shingle"))
        .distinct()
    )


def hashed_shingle_table(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(doc, h) pairs: distinct 60-bit digests (first 15 hex chars of
    md5, big-endian) of the word ``n``-gram shingles.

    Hashing BEFORE the distinct means the dedup shuffle carries two
    longs per row instead of (long, ~25-byte string) — and every
    downstream join/aggregate compares 8-byte integers. The top 28
    bits double as the MinHash base hash (same bits as a 7-hex-char
    digest prefix), so one md5 serves both Jaccard and MinHash.
    """
    return (
        df.select(F.col(id_col).alias("doc"), tokens_col(text_col).alias("toks"))
        .filter(F.size("toks") >= n)
        .select("doc", F.explode(_gram_expr(n)).alias("shingle"))
        .select("doc", F.expr(spark_hex_to_long("md5(shingle)", 15)).alias("h"))
        .distinct()
    )


def jaccard_pairs(
    shingles: DataFrame,
    threshold_num: int = 4,
    threshold_den: int = 5,
    max_shingle_freq: int | None = None,
    persist: bool = True,
) -> DataFrame:
    """Exact near-dup pairs with Jaccard >= num/den, via inverted index
    over a :func:`hashed_shingle_table` (columns ``doc``, ``h``).

    Self-join on the digest column: cost is sum over shingles of
    freq^2, not corpus^2. The threshold compare is integer arithmetic
    (``inter * den >= union * num``) — exact in every engine.

    ``max_shingle_freq`` drops ubiquitous shingles before the join (the
    standard skew guard at scale: a stop-shingle appearing in 1M docs
    contributes 10^12 candidate pairs). Leave ``None`` for exact
    results; at high thresholds dropping only ultra-frequent shingles
    rarely loses a true pair, but it is a recall trade-off — hence
    opt-in.
    """
    if max_shingle_freq is not None:
        ok = (
            shingles.groupBy("h")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_shingle_freq)
            .select("h")
        )
        shingles = shingles.join(ok, "h")
    if persist:
        # the shingle table feeds three subtrees (self-join x2 + sizes);
        # without persistence the tokenize/explode/distinct pipeline
        # recomputes per subtree (~35% wall at sf0.1). Spill-safe level;
        # evicted LRU when memory is needed.
        shingles = shingles.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = shingles.groupBy("doc").agg(F.count("*").alias("n_sh"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    inter = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").alias("inter_size"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc"))
        .join(sb, F.col("doc_b") == F.col("sb.doc"))
        .select(
            "doc_a",
            "doc_b",
            "inter_size",
            (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("inter_size")).alias("union_size"),
        )
        .filter(
            F.col("inter_size") * threshold_den >= F.col("union_size") * threshold_num
        )
    )


def minhash_signatures(
    shingles: DataFrame, n_hashes: int = 64
) -> DataFrame:
    """(doc, mh0..mh{n-1}) MinHash signature in ONE aggregation pass
    over a :func:`hashed_shingle_table`: the top 28 bits of each
    60-bit shingle digest are expanded through an affine family
    ``(a*h + b) mod P`` as ``n_hashes`` min-aggregates — map-side
    partial aggregation, a single shuffle on doc, no row blowup."""
    coeffs = minhash_coefficients(n_hashes)
    # h >> 32 == big-endian value of the digest's first 7 hex chars:
    # the same 28-bit base hash as md5 prefix hashing, for free
    hashed = shingles.select("doc", F.shiftright("h", 32).alias("h28"))
    aggs = [
        F.min((F.lit(a) * F.col("h28") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"mh{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    return hashed.groupBy("doc").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    n_hashes: int = 64,
    bands: int = 16,
    threshold_num: int = 4,
    threshold_den: int = 5,
) -> DataFrame:
    """Near-dup pairs at Jaccard >= num/den via MinHash + banded LSH +
    exact verification.

    Pipeline: hashed shingles -> 64-hash signature -> 16 bands x 4 rows
    -> band-bucket self-join (candidates) -> exact Jaccard on candidate
    pairs via array_intersect of the per-doc digest sets. With b=16,
    r=4 the false-negative rate at j=0.8 is (1 - 0.8^4)^16 ~= 2e-4 and
    vanishes as j -> 1, so verified output matches the exact-Jaccard
    oracle; false positives are removed by verification.

    Scale properties: band keys are single xxhash64 longs (a band-key
    collision only adds a candidate, which verification then rejects —
    correctness is unaffected); the per-doc digest sets are ~8 bytes
    per shingle; candidate verification is two hash joins of the
    (small, post-LSH) candidate list against the doc-set table — no
    re-shuffle of the full inverted index.
    """
    assert n_hashes % bands == 0
    rows = n_hashes // bands
    # reused by signatures and the verification doc-set table
    sh = hashed_shingle_table(df, id_col, text_col, n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sig = minhash_signatures(sh, n_hashes)

    band_keys = F.array(
        *[
            F.xxhash64(
                F.lit(j), *[F.col(f"mh{j * rows + k}") for k in range(rows)]
            )
            for j in range(bands)
        ]
    )
    bands_df = sig.select("doc", F.explode(band_keys).alias("band_key"))
    x = bands_df.alias("x")
    y = bands_df.alias("y")
    candidates = (
        x.join(
            y,
            (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.doc") < F.col("y.doc")),
        )
        .select(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
        .distinct()
    )

    # one row per doc: its digest set + size (size comes free)
    sets = sh.groupBy("doc").agg(F.collect_list("h").alias("hs"))
    sa = sets.alias("sa")
    sb = sets.alias("sb")
    return (
        candidates.join(sa, F.col("doc_a") == F.col("sa.doc"))
        .join(sb, F.col("doc_b") == F.col("sb.doc"))
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sa.hs", "sb.hs")).cast("long").alias("inter_size"),
            (F.size("sa.hs") + F.size("sb.hs")).alias("sum_sizes"),
        )
        .select(
            "doc_a",
            "doc_b",
            "inter_size",
            (F.col("sum_sizes") - F.col("inter_size")).cast("long").alias("union_size"),
        )
        .filter(
            F.col("inter_size") * threshold_den >= F.col("union_size") * threshold_num
        )
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 60) -> DataFrame:
    """(doc, simhash) 60-bit SimHash fingerprints.

    Each distinct token hashes to a 60-bit md5-derived integer; bit p of
    the fingerprint is 1 iff more than half the tokens have bit p set
    (strict majority — ties round to 0, deterministically). Tokens are
    hashed BEFORE the distinct, so the dedup shuffle carries (long,
    long) rows; the vote executes as ``bits`` conditional sums in ONE
    groupBy pass — no per-bit row explosion, single shuffle on doc.
    """
    tv = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(tokens_col(text_col)).alias("token"),
        )
        .filter(F.col("token") != "")
        .select("doc", F.expr(spark_hex_to_long("md5(token)", 15)).alias("v"))
        .distinct()
    )
    aggs = [
        F.sum(F.shiftright(F.col("v"), p).bitwiseAND(F.lit(1))).alias(f"ones{p}")
        for p in range(bits)
    ] + [F.count("*").alias("n_tok")]
    per_doc = tv.groupBy("doc").agg(*aggs)
    fingerprint = None
    for p in range(bits):
        bit = (F.col(f"ones{p}") * 2 > F.col("n_tok")).cast("long") * F.lit(1 << p)
        fingerprint = bit if fingerprint is None else fingerprint + bit
    return per_doc.select(F.col("doc").alias(id_col), fingerprint.alias("simhash"))
