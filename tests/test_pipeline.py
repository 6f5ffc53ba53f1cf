"""End-to-end pipeline: reference-shaped inputs -> written star schema
-> all quality checks green."""

from udacity_data_engineering_capstone_project_spark.plans.pipeline import run_pipeline
from tests.test_model import LABELS


def test_pipeline_end_to_end(spark, tmp_path):
    i94_rows = [
        (1.0, 2016.0, 4.0, 236.0, 236.0, "ANC", 20574.0, 20582.0, 1.0, "AK",
         30.0, 2.0, 1.0, "20160430", None, None, "G", "O", None, "M", 1986.0,
         "10292016", "M", None, "UA", 1.0, "UA100", "B2"),
        (2.0, 2016.0, 4.0, 101.0, 101.0, "NYC", 20560.0, 20660.0, 1.0, "NY",
         40.0, 1.0, 1.0, "20160416", None, None, "G", "O", None, "M", 1976.0,
         "10152016", "F", None, "DL", 2.0, "DL200", "B1"),
    ]
    cols = (
        "cicid double, i94yr double, i94mon double, i94cit double, i94res double, "
        "i94port string, arrdate double, depdate double, i94mode double, "
        "i94addr string, i94bir double, i94visa double, count double, "
        "dtadfile string, visapost string, occup string, entdepa string, "
        "entdepd string, entdepu string, matflag string, biryear double, "
        "dtaddto string, gender string, insnum string, airline string, "
        "admnum double, fltno string, visatype string"
    )
    i94_path = str(tmp_path / "i94")
    spark.createDataFrame(i94_rows, cols).write.parquet(i94_path)

    demo_csv = tmp_path / "demo.csv"
    demo_csv.write_text(
        "City;State;Median Age;Male Population;Female Population;Total Population;"
        "Number of Veterans;Foreign-born;Average Household Size;State Code;Race;Count\n"
        "Anchorage;Alaska;32.5;150;140;290;20;30;2.5;AK;White;200\n"
        "Anchorage;Alaska;32.5;150;140;290;20;30;2.5;AK;Asian;50\n"
    )
    temps_csv = tmp_path / "temps.csv"
    temps_csv.write_text(
        "dt,AverageTemperature,AverageTemperatureUncertainty,City,Country,Latitude,Longitude\n"
        "2000-01-01,10.0,0.1,Kabul,Afghanistan,34.5N,69.2E\n"
    )

    out = str(tmp_path / "model")
    report = run_pipeline(
        spark, i94_path, LABELS, str(demo_csv), str(temps_csv), out
    )
    rows = {r.check_name: r for r in report.collect()}
    assert len(rows) == 12
    assert all(r.passed == 1 for r in rows.values()), {
        k: (v.metric, v.passed) for k, v in rows.items() if v.passed == 0
    }
    # written model is readable and partition-pruned reads work
    dd = spark.read.parquet(f"{out}/dim_date.parquet")
    assert dd.filter(dd.part_year == 2016).count() == dd.count()
    assert spark.read.parquet(f"{out}/fact_i94.parquet").count() == 2


def test_llm_curation_pipeline_end_to_end(spark, sf_dir):
    """The full curation pipeline composes: survivor funnel is monotone
    non-increasing, the packed layout conserves the final corpus's
    token mass, and every epoch's shards partition the final corpus."""
    from pyspark.sql import functions as F
    from udacity_data_engineering_capstone_project_spark.plans.pipeline_llm import (
        curate_corpus,
    )

    out = curate_corpus(spark, sf_dir)
    report = sorted(
        ((r["stage_no"], r["stage"], r["n_docs"], r["n_tokens"])
         for r in out["report"].collect())
    )
    assert [r[1] for r in report] == [
        "ingest", "lang_quality_gate", "exact_dedup", "near_dedup",
        "decontaminate", "pii_redact", "mixture",
    ]
    for (_, _, d0, t0), (_, _, d1, t1) in zip(report, report[1:]):
        assert d1 <= d0 and t1 <= t0
    assert report[-1][2] > 0  # something survives

    n_final = out["corpus"].count()
    tok_final = out["corpus"].select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+")))
    ).collect()[0][0]
    packed = out["packed"]
    assert packed.count() == n_final  # one row per surviving doc
    shard_rows = out["shards"].collect()
    for e in (0, 1):
        assert sum(r["n_docs"] for r in shard_rows if r["epoch"] == e) == n_final
    # packing conserves the (tokenizer's) token mass
    tok_packed = packed.agg(F.sum("n_tokens")).collect()[0][0]
    rep_tok = report[-1][3]
    assert tok_packed == rep_tok
