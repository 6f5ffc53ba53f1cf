"""Unit coverage for column-expression helpers (functions/)."""

import datetime

from pyspark.sql import functions as F

from udacity_data_engineering_capstone_project_spark.functions.dates import (
    date_to_sas,
    is_weekend_expr,
    sas_to_date,
    season_expr,
)
from udacity_data_engineering_capstone_project_spark.functions.hashing import (
    minhash_coefficients,
    sql_hex_to_long,
)
from udacity_data_engineering_capstone_project_spark.functions.rounding import (
    round_fixed,
)
from udacity_data_engineering_capstone_project_spark.functions.textnorm import (
    tokens_col,
)


def test_sas_date_roundtrip_and_null(spark):
    # reference epoch: days since 1960-01-01 (etl.py:39); 20574 is an
    # April-2016 value from the reference's own data (ipynb cell 25)
    df = spark.createDataFrame([(0,), (20574,), (None,)], "d int")
    rows = df.select(
        sas_to_date("d").alias("iso"), date_to_sas(sas_to_date("d")).alias("back")
    ).collect()
    assert rows[0].iso == datetime.date(1960, 1, 1)
    assert rows[1].iso == datetime.date(2016, 4, 30)
    assert rows[1].back == 20574
    assert rows[2].iso is None and rows[2].back is None


def test_season_mapping_matches_reference(spark):
    # etl.py:63-79: 12/1/2 Winter, 3/4/5 Spring, 6/7/8 Summer, else Autumn
    df = spark.createDataFrame([(m,) for m in range(1, 13)] + [(None,)], "m int")
    got = {r.m: r.s for r in df.select("m", season_expr("m").alias("s")).collect()}
    assert got[12] == got[1] == got[2] == "Winter"
    assert got[3] == got[4] == got[5] == "Spring"
    assert got[6] == got[7] == got[8] == "Summer"
    assert got[9] == got[10] == got[11] == "Autumn"
    assert got[None] is None


def test_weekend_flag_is_sunday_saturday(spark):
    # dayofweek: 1=Sunday..7=Saturday; weekend={1,7} (etl.py:429)
    df = spark.createDataFrame([(d,) for d in range(1, 8)], "d int")
    got = {r.d: r.w for r in df.select("d", is_weekend_expr("d").alias("w")).collect()}
    assert got == {1: 1, 2: 0, 3: 0, 4: 0, 5: 0, 6: 0, 7: 1}


def test_hex_to_long_matches_python(spark):
    df = spark.createDataFrame([("deadbeef",), ("0000001",), ("fffffff",)], "h string")
    rows = df.select(F.expr(sql_hex_to_long("h", 7)).alias("v"), "h").collect()
    for r in rows:
        assert r.v == int(r.h[:7], 16)


def test_minhash_coefficients_deterministic():
    assert minhash_coefficients(8) == minhash_coefficients(8)
    assert len(set(minhash_coefficients(64))) == 64


def test_round_fixed_half_up(spark):
    df = spark.createDataFrame([(0.125,), (2.675,), (1.0,)], "x double")
    rows = df.select(round_fixed(F.col("x"), 2).alias("r")).collect()
    # 0.125 is binary-exact -> floor(12.5 + 0.5) = 13
    assert rows[0].r == 0.13
    # 2.675*100 + 0.5 lands on an IEEE midpoint and rounds to exactly
    # 268.0 -> 2.68. Direction matters less than being identical in
    # every IEEE engine (Python/Spark/DuckDB all agree).
    assert rows[1].r == 2.68
    assert rows[2].r == 1.0


def test_tokens_normalize_punctuation(spark):
    df = spark.createDataFrame([("Hello, WORLD!  foo-bar",)], "t string")
    assert df.select(tokens_col("t").alias("x")).first().x == [
        "hello", "world", "foo", "bar",
    ]


def test_subword_stats_integers(spark):
    from udacity_data_engineering_capstone_project_spark.operators.textops import (
        subword_stats,
    )

    df = spark.createDataFrame(
        [(1, "Hello, world!"), (2, "abcdefgh 12")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_runs, r.n_subwords, r.n_chars_tok)
           for r in subword_stats(df).collect()}
    # "hello" "," "world" "!" -> 4 runs; ceil(5/4)*2 + 1 + 1 = 6 subwords
    assert got[1] == (4, 6, 12)
    # "abcdefgh" "12" -> 2 runs; ceil(8/4) + ceil(2/4) = 3
    assert got[2] == (2, 3, 10)


def test_winnow_shared_substring_guarantee(spark):
    from udacity_data_engineering_capstone_project_spark.operators.textops import (
        winnow_fingerprints,
    )

    shared = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [(1, "PREFIX one " + shared), (2, shared + " SUFFIX two"),
         (3, "completely unrelated text body with different words")],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(df).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc, set()).add(r.fp)
    # winnowing guarantee: docs sharing a >= k+w-1 char substring share a fp
    assert by_doc[1] & by_doc[2]
    assert not (by_doc[1] & by_doc[3] & by_doc[2])
