"""Curation-tier operator semantics: decontamination, sequence
packing (partition independence of the distributed prefix sum),
mixture sampling (determinism, capped targets), repetition scoring."""

from pyspark.sql import functions as F

from udacity_data_engineering_capstone_project_spark.operators.curation import (
    benchmark_decontaminate,
    mixture_sample,
    pack_sequences,
    repetition_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_overlapping_docs(spark):
    train = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon"),  # shares 'alpha beta gamma'
            (2, "one two three four five six"),  # no overlap
        ],
    )
    bench = _docs(spark, [(100, "alpha beta gamma zeta")])
    out = {
        r["doc"]: r.asDict()
        for r in benchmark_decontaminate(
            train, bench, threshold_num=1, threshold_den=5
        ).collect()
    }
    # doc 1: 3 shingles, 1 matched (alpha beta gamma) -> 1*5 >= 3*1
    assert out[1]["n_shingles"] == 3
    assert out[1]["n_matched"] == 1
    assert out[1]["contaminated"] == 1
    assert out[2]["n_matched"] == 0
    assert out[2]["contaminated"] == 0


def test_decontaminate_self_is_fully_contaminated(spark):
    docs = _docs(spark, [(i, f"w{i} x{i} y{i} z{i}") for i in range(5)])
    out = benchmark_decontaminate(docs, docs).collect()
    assert all(r["contaminated"] == 1 and r["n_matched"] == r["n_shingles"] for r in out)


def test_pack_sequences_partition_independent(spark):
    rows = [(i, (i * 37) % 90 + 10) for i in range(200)]  # 10..99 tokens
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    a = {
        r["doc_id"]: (r["tok_start"], r["seq_id"])
        for r in pack_sequences(df, 128, num_partitions=1).collect()
    }
    b = {
        r["doc_id"]: (r["tok_start"], r["seq_id"])
        for r in pack_sequences(df, 128, num_partitions=32).collect()
    }
    assert a == b
    # exact prefix-sum semantics: tok_start is the cumsum of all
    # smaller ids, seq is its 128-chunk
    cum = 0
    for i in range(200):
        assert a[i] == (cum, cum // 128)
        cum += (i * 37) % 90 + 10


def test_mixture_sample_targets_and_determinism(spark):
    rows = [(i, "a" if i < 40 else "b" if i < 60 else "c") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    # a: 40 avail, target 10; b: 20 avail, target 30 -> capped at 20;
    # c: unlisted -> dropped
    kept = mixture_sample(
        df, weights={"a": 0.25, "b": 0.75}, total=40, id_col="doc_id"
    )
    counts = {r["source"]: r["n"] for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 10, "b": 20}
    ids1 = sorted(r["doc_id"] for r in kept.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in mixture_sample(
            df.repartition(7), weights={"a": 0.25, "b": 0.75}, total=40
        ).collect()
    )
    assert ids1 == ids2  # partition-layout independent


def test_repetition_stats_hand_computed(spark):
    docs = _docs(
        spark,
        [
            (1, "a b a b a"),  # 2-grams: ab ba ab ba -> 4 total, 2 distinct
            (2, "x y z"),  # xy yz -> 2 total, 2 distinct
            (3, "solo"),  # < 2 tokens -> zeros
        ],
    )
    out = {r["doc_id"]: r.asDict() for r in repetition_stats(docs, n=2).collect()}
    assert out[1] == {"doc_id": 1, "n_grams": 4, "n_distinct": 2, "rep_score": 500}
    assert out[2] == {"doc_id": 2, "n_grams": 2, "n_distinct": 2, "rep_score": 0}
    assert out[3] == {"doc_id": 3, "n_grams": 0, "n_distinct": 0, "rep_score": 0}


def test_redact_pii_counts_and_output(spark):
    from udacity_data_engineering_capstone_project_spark.operators.curation import (
        redact_pii,
    )

    rows = [
        (1, "mail a@b.io and c.d@e-f.org call 555 123 4567"),
        (2, "from 10.0.0.1 to 192.168.1.255 ok"),
        (3, "clean text only"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {r.id: r for r in redact_pii(df, "text").collect()}
    assert (got[1].n_email, got[1].n_phone, got[1].n_ip) == (2, 1, 0)
    assert got[1].redacted == "mail <EMAIL> and <EMAIL> call <PHONE>"
    assert (got[2].n_email, got[2].n_phone, got[2].n_ip) == (0, 0, 2)
    assert got[2].redacted == "from <IP> to <IP> ok"
    assert got[3].redacted == "clean text only"


def test_redact_pii_is_map_only(spark):
    """No shuffle, no Python eval — redaction must pipeline into the scan."""
    import re

    from udacity_data_engineering_capstone_project_spark.operators.curation import (
        redact_pii,
    )

    df = spark.createDataFrame([(1, "x")], "id int, text string")
    plan = redact_pii(df, "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert not re.search(r"BatchEvalPython|ArrowEvalPython", plan)


def test_bloom_decontaminate_is_lossless(spark):
    """Bloom prefilter result == exact path on shared columns, FPs
    visible but never lost matches; a deliberately saturated (tiny)
    filter still confirms exactly."""
    from udacity_data_engineering_capstone_project_spark.functions.hashing import (
        spark_hex_to_long,
    )
    from udacity_data_engineering_capstone_project_spark.operators.curation import (
        benchmark_decontaminate,
        bloom_decontaminate,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    b = F.expr(spark_hex_to_long("md5(CAST(doc_id AS STRING))", 7)) % 100
    train, bench = docs.filter(b < 80), docs.filter(b >= 90)
    exact = {
        r["doc"]: (r["n_shingles"], r["n_matched"], r["contaminated"])
        for r in benchmark_decontaminate(train, bench).collect()
    }
    for m_bits in (1 << 14, 1 << 8):  # default and a saturated filter
        got = bloom_decontaminate(train, bench, m_bits=m_bits).collect()
        assert len(got) == len(exact)
        for r in got:
            n_sh, n_m, cont = exact[r["doc"]]
            assert (r["n_shingles"], r["n_matched"], r["contaminated"]) == (
                n_sh, n_m, cont,
            )
            # Bloom admits supersets only: candidates >= true matches
            assert n_m <= r["n_candidates"] <= r["n_shingles"]


def test_bloom_bitset_is_fixed_size(spark):
    """The broadcast filter is m_bits/32 words max, independent of the
    key count — the whole point vs broadcasting the digest set."""
    from udacity_data_engineering_capstone_project_spark.operators.curation import (
        bloom_bitset,
    )
    from pyspark.sql import functions as F

    keys = spark.range(5000).select(F.col("id").alias("h"))
    bs = bloom_bitset(keys, m_bits=1 << 10)
    assert bs.count() <= (1 << 10) // 32


def test_bloom_decontaminate_accepts_materialized_shingles(spark, tmp_path):
    """A caller-materialized (doc, h) shingle table produces the same
    result as the internal tokenize path — the pay-the-scan-once
    production shape."""
    from udacity_data_engineering_capstone_project_spark.functions.hashing import (
        spark_hex_to_long,
    )
    from udacity_data_engineering_capstone_project_spark.operators.curation import (
        bloom_decontaminate,
    )
    from udacity_data_engineering_capstone_project_spark.operators.dedup import (
        hashed_shingle_table,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    b = F.expr(spark_hex_to_long("md5(CAST(doc_id AS STRING))", 7)) % 100
    train, bench = docs.filter(b < 80), docs.filter(b >= 90)
    p = str(tmp_path / "train_sh")
    hashed_shingle_table(train, "doc_id", "text", 3).write.parquet(p)
    via_table = bloom_decontaminate(
        train, bench, train_shingles=spark.read.parquet(p)
    ).orderBy("doc").collect()
    inline = bloom_decontaminate(train, bench).orderBy("doc").collect()
    assert via_table == inline and len(inline) > 0
