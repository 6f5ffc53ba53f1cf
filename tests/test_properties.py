"""Property-based tests (hypothesis): the cross-engine determinism
contracts that the oracle gate relies on, checked over generated
inputs rather than fixtures."""

import datetime
import hashlib

import duckdb
from hypothesis import given, settings, strategies as st

from udacity_data_engineering_capstone_project_spark.functions.hashing import (
    sql_hex_to_long,
)
from udacity_data_engineering_capstone_project_spark.functions.rounding import (
    sql_round_fixed,
)

settings.register_profile("fast", max_examples=25, deadline=None)
settings.load_profile("fast")


@given(st.text(min_size=0, max_size=50))
def test_hex_polynomial_matches_python_int(s):
    """The DuckDB-dialect instr/substr polynomial decodes md5 prefixes
    exactly like int(hex, 16) — the ground the minhash family stands on."""
    digest = hashlib.md5(s.encode()).hexdigest()
    for nchars in (7, 15):
        want = int(digest[:nchars], 16)
        got = duckdb.sql(
            f"SELECT {sql_hex_to_long(repr(digest), nchars)}"
        ).fetchone()[0]
        assert got == want


@given(
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ),
    st.integers(min_value=0, max_value=6),
)
def test_round_fixed_sql_is_engine_stable(x, d):
    """floor(x*10^d + 0.5)/10^d evaluates identically in DuckDB and
    plain IEEE Python — same ops, same order."""
    import math

    # cast: a bare numeric literal parses as DECIMAL in DuckDB; the
    # engine only ever feeds this formula DOUBLE columns
    got = duckdb.sql(
        f"SELECT {sql_round_fixed(f'CAST({x!r} AS DOUBLE)', d)}"
    ).fetchone()[0]
    want = math.floor(x * 10**d + 0.5) / 10**d
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),  # user
            st.integers(min_value=0, max_value=10_000),  # seconds offset
        ),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
@settings(max_examples=10, deadline=None)
def test_sessionize_matches_reference_model(spark_global, events):
    """sessionize == the obvious single-machine model: sort each user's
    times, a session break wherever the gap exceeds the threshold."""
    from udacity_data_engineering_capstone_project_spark.operators.windows import (
        sessionize,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (u, base + datetime.timedelta(seconds=s), i)
        for i, (u, s) in enumerate(events)
    ]
    df = spark_global.createDataFrame(rows, "user_id int, ts timestamp, event_id int")
    out = sessionize(df, "user_id", "ts", gap_seconds=600, tie_break="event_id")
    got_sessions = (
        out.groupBy("user_id").agg({"session_id": "max"}).collect()
    )
    got = {r["user_id"]: r["max(session_id)"] for r in got_sessions}

    want = {}
    per_user = {}
    for u, s in events:
        per_user.setdefault(u, []).append(s)
    for u, ss in per_user.items():
        ss.sort()
        sessions = 1
        for a, b in zip(ss, ss[1:]):
            if b - a > 600:
                sessions += 1
        want[u] = sessions
    assert got == want
