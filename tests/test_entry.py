"""Driver-contract checks on __spark_entry__."""

import __spark_entry__ as entry_mod


def test_entry_runs_and_has_stable_schema(spark):
    df = entry_mod.entry(spark)
    assert df.columns == ["r_name", "n_name", "n_items", "revenue_r"]
    assert df.count() > 0


def test_every_query_has_oracle_except_streaming(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert set(qs) - set(oracles) == {
        "stream_hourly_counts",
        "stream_user_totals",
        "kmeans_assign",
        "ivf_trained_recall",
    }
    assert len(qs) >= 39


def test_queries_run_at_smoke_sf(spark, sf_dir):
    # spot-run a representative subset through the public contract
    qs = entry_mod.queries()
    for name in ["tpch_q1", "star_join_agg", "date_dim", "quality_checks"]:
        assert qs[name](spark, sf_dir).count() > 0
