"""Golden-number parity against the reference's OWN published outputs
(BASELINE.md), computed from the reference's actual I94 parquet input
(`/root/reference/sas_data`, 3,096,313 rows — read-only).

These are the numbers the reference notebook captured on its Udacity
workspace (ipynb cells 73/83/90/91 outputs); our builders must
reproduce them exactly from the same input.
"""

import os

import pytest
from pyspark.sql import functions as F

from udacity_data_engineering_capstone_project_spark.plans import model

SAS_DATA = "/root/reference/sas_data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SAS_DATA), reason="reference sas_data not present"
)


@pytest.fixture(scope="module")
def fact(spark):
    i94 = spark.read.load(SAS_DATA)
    assert i94.count() == 3_096_313  # ipynb cell 11 output
    f = model.build_fact(i94).cache()
    yield f
    f.unpersist()


def test_fact_row_count_matches_reference(fact):
    assert fact.count() == 2_493_086  # ipynb cell 73 output


def test_date_dim_cardinality_matches_reference(fact):
    assert model.build_date_dim(fact).count() == 187  # ipynb cell 73


def test_stay_calculation_matches_reference_spot(fact):
    # ipynb cell 25 output: dep 20582 - arr 20574 = 8
    r = fact.filter("cicid = 5748517").select("arrdate", "depdate", "stay").first()
    assert (r.arrdate, r.depdate, r.stay) == (20574, 20582, 8)


def test_season_counts_match_reference_golden(fact):
    dd = model.build_date_dim(fact)
    # Q-SEASON-ARR (ipynb cell 90): all arrivals are Spring (April data)
    arr = (
        fact.join(dd, fact.arrdate == dd.sasdate)
        .groupBy("season")
        .count()
        .collect()
    )
    assert {r.season: r["count"] for r in arr} == {"Spring": 2_493_086}
    # Q-SEASON-DEP (ipynb cell 91): exact golden counts
    dep = (
        fact.join(dd, fact.depdate == dd.sasdate)
        .groupBy("season")
        .count()
        .collect()
    )
    assert {r.season: r["count"] for r in dep} == {
        "Spring": 2_223_705,
        "Summer": 147_698,
        "Autumn": 13_531,
        "Winter": 1,
    }
