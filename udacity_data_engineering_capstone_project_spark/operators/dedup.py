"""Deduplication operators for large-scale text corpora.

Beyond-reference (BASELINE.json north star): the reference's only dedup
is full-row ``dropDuplicates`` (SURVEY.md P7). A training-data pipeline
needs content-level near-dup detection that survives 100 TB:

- exact_dedup        hash-groupBy on md5(text): one shuffle on a 128-bit
                     key, never on the text payload itself.
- shingle_table      doc -> distinct word n-gram shingles (the shared
                     substrate for Jaccard/MinHash).
- jaccard_pairs      exact all-pairs similarity via an inverted index
                     (shingle self-join), not an O(n^2) cross join.
- minhash_lsh_pairs  MinHash signatures + banded LSH candidates +
                     exact verification: the scale path. Work is linear
                     in corpus size + candidate count.
- simhash            64-bit-ish (60-bit) fingerprints via token-hash
                     bit voting; identical fingerprints => near-dups.

Every hash is md5-derived (functions/hashing.py) so the DuckDB oracle
can reproduce values bit-for-bit. Similarities are reported as integer
(intersection, union) pairs — no float in comparison paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.hashing import (
    MINHASH_PRIME,
    minhash_coefficients,
    sql_hex_to_long,
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


def shingle_table(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(doc, shingle) pairs: distinct word ``n``-grams of normalized
    text. Docs shorter than ``n`` tokens contribute no rows."""
    items = ", ".join(f"toks[i+{j}]" for j in range(n))
    grams = F.expr(
        f"transform(sequence(0, size(toks) - {n}), i -> concat_ws(' ', {items}))"
    )
    return (
        df.select(F.col(id_col).alias("doc"), tokens_col(text_col).alias("toks"))
        .filter(F.size("toks") >= n)
        .select("doc", F.explode(grams).alias("shingle"))
        .distinct()
    )


def jaccard_pairs(
    shingles: DataFrame,
    threshold_num: int = 4,
    threshold_den: int = 5,
    max_shingle_freq: int | None = None,
    persist: bool = True,
) -> DataFrame:
    """Exact near-dup pairs with Jaccard >= num/den, via inverted index.

    Self-join on the shingle column: cost is sum over shingles of
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
            shingles.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_shingle_freq)
            .select("shingle")
        )
        shingles = shingles.join(ok, "shingle")
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
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
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
    """(doc, mh0..mh{n-1}) MinHash signature in ONE aggregation pass:
    the base 28-bit md5 hash of each shingle is expanded through an
    affine family ``(a*h + b) mod P`` as ``n_hashes`` min-aggregates —
    map-side partial aggregation, a single shuffle on doc, no row
    blowup."""
    coeffs = minhash_coefficients(n_hashes)
    # materialize the digest once, then the hex->int polynomial reads
    # it 7 times — inlining md5 into the polynomial would recompute
    # the digest per term (no common-subexpression elimination there)
    hashed = shingles.select("doc", F.md5("shingle").alias("d")).select(
        "doc", F.expr(sql_hex_to_long("d", 7)).alias("h")
    )
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"mh{i}")
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

    Pipeline: shingle -> 64-hash signature -> 16 bands x 4 rows ->
    band-bucket self-join (candidates) -> exact Jaccard on candidates
    only. With b=16, r=4 the false-negative rate at j=0.8 is
    (1 - 0.8^4)^16 ~= 2e-4 and vanishes as j -> 1, so verified output
    matches the exact-Jaccard oracle; false positives are removed by
    verification. Candidate verification joins shingles twice but only
    for candidate docs — linear-ish at scale vs the exact quadratic
    inverted-index cost.
    """
    assert n_hashes % bands == 0
    rows = n_hashes // bands
    # reused by signatures, candidate verification (x2), and sizes
    sh = shingle_table(df, id_col, text_col, n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sig = minhash_signatures(sh, n_hashes)

    band_structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("band_id"),
                F.concat_ws(
                    "_", *[F.col(f"mh{j * rows + k}") for k in range(rows)]
                ).alias("band_key"),
            )
            for j in range(bands)
        ]
    )
    bands_df = sig.select("doc", F.explode(band_structs).alias("b")).select(
        "doc", F.col("b.band_id").alias("band_id"), F.col("b.band_key").alias("band_key")
    )
    x = bands_df.alias("x")
    y = bands_df.alias("y")
    candidates = (
        x.join(
            y,
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.doc") < F.col("y.doc")),
        )
        .select(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
        .distinct()
    )

    sizes = sh.groupBy("doc").agg(F.count("*").alias("n_sh"))
    sha = sh.alias("sha")
    shb = sh.alias("shb")
    inter = (
        candidates.join(sha, F.col("doc_a") == F.col("sha.doc"))
        .join(
            shb,
            (F.col("doc_b") == F.col("shb.doc"))
            & (F.col("sha.shingle") == F.col("shb.shingle")),
        )
        .groupBy("doc_a", "doc_b")
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


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 60) -> DataFrame:
    """(doc, simhash) 60-bit SimHash fingerprints.

    Each distinct token hashes to a 60-bit md5-derived integer; bit p of
    the fingerprint is 1 iff more than half the tokens have bit p set
    (strict majority — ties round to 0, deterministically). Executed as
    ``bits`` conditional sums in ONE groupBy pass over (doc, token):
    no per-bit row explosion, single shuffle on doc.
    """
    tok = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(tokens_col(text_col)).alias("token"),
        )
        .filter(F.col("token") != "")
        .distinct()
    )
    tv = tok.select("doc", F.md5("token").alias("d")).select(
        "doc", F.expr(sql_hex_to_long("d", 15)).alias("v")
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
