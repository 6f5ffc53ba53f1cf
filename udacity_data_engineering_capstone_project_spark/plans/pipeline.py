"""The full star-schema ETL, end to end — the reference's ``main()``
(etl.py:561-591) as a library function.

Given the four reference inputs (I94 parquet, SAS labels text,
demographics CSV, temperatures CSV) it builds all model tables, writes
them as partitioned parquet, and returns the data-quality report as a
DataFrame (structured, not printed).

Differences from the reference, all deliberate (SURVEY.md §4.3):
- the fact DataFrame is cached before its multiple consumers (the
  reference recomputed the whole fact lineage for every count());
- partition keys are bounded: the date dim is partitioned by ``year``
  (a handful of dirs), not by ``sasdate`` (187 dirs), and the port dim
  by ``state_code``; nothing partitions by a near-unique key;
- quality checks run as ONE Spark job over a unioned lazy report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import read_csv
from ..sources.writers import write_parquet
from . import model
from .quality import (
    nonempty_check,
    predicate_absent_check,
    quality_suite,
    unique_key_check,
)


def run_pipeline(
    spark: SparkSession,
    i94_path: str,
    labels_text: str,
    demographics_csv: str,
    temperatures_csv: str,
    output_dir: str,
    airports_csv: str | None = None,
) -> DataFrame:
    """Build + persist the whole model; returns the quality report."""
    i94 = spark.read.parquet(i94_path)
    demos = read_csv(spark, demographics_csv, sep=";")
    temps = read_csv(spark, temperatures_csv)

    visa = model.build_visa_dim(spark)
    mode = model.build_mode_dim(spark, labels_text)
    addr = model.build_addr_dim(spark, labels_text)
    port = model.build_port_dim(spark, labels_text)
    codes = model.build_country_codes(spark, labels_text)
    country = model.build_country_dim(codes, temps)
    demographics = model.build_demographics_dim(demos, addr)

    fact = model.build_fact(i94).cache()  # consumed by write + dates + checks
    date_dim = model.build_date_dim(fact).withColumn(
        "part_year", F.col("year")
    )

    write_parquet(fact, f"{output_dir}/fact_i94.parquet")
    write_parquet(visa, f"{output_dir}/dim_i94visa.parquet", partition_by=["id"])
    write_parquet(mode, f"{output_dir}/dim_i94mode.parquet", partition_by=["id"])
    write_parquet(port, f"{output_dir}/dim_i94port.parquet", partition_by=["state_code"])
    write_parquet(country, f"{output_dir}/dim_country.parquet")
    write_parquet(
        demographics, f"{output_dir}/dim_demographics.parquet", partition_by=["state_code"]
    )
    write_parquet(date_dim, f"{output_dir}/dim_date.parquet", partition_by=["part_year"])
    if airports_csv is not None:
        # partitioned by airport type (a handful of values), NOT by the
        # near-unique ident the reference used (55k dirs, ipynb cell 77)
        airport = model.build_airport_dim(read_csv(spark, airports_csv))
        write_parquet(
            airport, f"{output_dir}/dim_airport.parquet", partition_by=["type"]
        )

    report = quality_suite(
        [
            nonempty_check(fact, "fact_nonempty"),
            nonempty_check(date_dim, "date_nonempty"),
            nonempty_check(country, "country_nonempty"),
            nonempty_check(demographics, "demographics_nonempty"),
            unique_key_check(fact, ["cicid"], "fact_pk_unique"),
            unique_key_check(date_dim, ["sasdate"], "date_pk_unique"),
            unique_key_check(country, ["code"], "country_pk_unique"),
            unique_key_check(port, ["code"], "port_pk_unique"),
            unique_key_check(mode, ["id"], "mode_pk_unique"),
            unique_key_check(visa, ["id"], "visa_pk_unique"),
            unique_key_check(
                demographics, ["state", "city"], "demographics_composite_unique"
            ),
            predicate_absent_check(
                country,
                F.lower(F.col("country")).contains("invalid")
                | F.lower(F.col("country")).contains("country")
                | F.lower(F.col("country")).contains("not show"),
                "country_cleansing_persisted",
            ),
        ]
    )
    return report
