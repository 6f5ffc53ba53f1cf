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


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),   # key
            st.integers(min_value=0, max_value=50),  # version
            st.integers(min_value=-100, max_value=100),  # payload
        ),
        min_size=0,
        max_size=20,
    ),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=51, max_value=99),  # updates strictly newer
            st.integers(min_value=-100, max_value=100),
        ),
        min_size=0,
        max_size=20,
    ),
)
@settings(max_examples=15, deadline=None)
def test_merge_upsert_equals_latest_per_key(spark_global, target_rows, update_rows):
    """merge_upsert(target, updates) == latest row per key over the
    union, ordered by (is_update, version, payload) — the MERGE
    contract, for any batch contents including dup keys and empties."""
    from udacity_data_engineering_capstone_project_spark.operators.cdc import (
        merge_upsert,
    )

    schema = "k long, ver long, payload long"
    target = spark_global.createDataFrame(target_rows, schema) if target_rows else \
        spark_global.createDataFrame([], schema)
    updates = spark_global.createDataFrame(update_rows, schema) if update_rows else \
        spark_global.createDataFrame([], schema)
    got = {
        r.k: (r.ver, r.payload)
        for r in merge_upsert(target, updates, ["k"], ["ver", "payload"]).collect()
    }

    want = {}
    for src, rows in ((0, target_rows), (1, update_rows)):
        for k, ver, payload in rows:
            cur = want.get(k)
            if cur is None or (src, ver, payload) > cur:
                want[k] = (src, ver, payload)
    assert got == {k: (v[1], v[2]) for k, v in want.items()}


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),   # key
            st.integers(min_value=-50, max_value=50),  # measure
            st.booleans(),                            # goes to delta?
        ),
        min_size=0,
        max_size=30,
    ),
)
@settings(max_examples=15, deadline=None)
def test_merge_partial_aggs_equals_full_recompute(spark_global, rows):
    """Splitting the input arbitrarily, aggregating the parts, and
    merging MUST equal aggregating everything at once (count/sum are
    decomposable) — the incremental-MV maintenance contract."""
    from pyspark.sql import functions as F

    from udacity_data_engineering_capstone_project_spark.operators.cdc import (
        merge_partial_aggs,
    )

    schema = "k long, m long"
    old_rows = [(k, m) for k, m, d in rows if not d]
    delta_rows = [(k, m) for k, m, d in rows if d]

    def agg(data):
        df = spark_global.createDataFrame(data, schema) if data else \
            spark_global.createDataFrame([], schema)
        return df.groupBy("k").agg(
            F.count("*").alias("n"), F.sum("m").alias("s")
        )

    merged = merge_partial_aggs(agg(old_rows), agg(delta_rows), ["k"], ["n", "s"])
    got = {r.k: (r.n, r.s) for r in merged.collect()}

    want = {}
    for k, m in old_rows + delta_rows:
        n, s = want.get(k, (0, 0))
        want[k] = (n + 1, s + m)
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),    # day offset
            st.integers(min_value=0, max_value=200),  # user id
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=10, deadline=None)
def test_bitmap_rolling_distinct_matches_reference_model(spark_global, events):
    """Bitmap OR + popcount == brute-force set model for arbitrary
    (day, user) multisets — including idle days inside the window."""
    from udacity_data_engineering_capstone_project_spark.operators.aggregates import (
        bitmap_rolling_distinct,
    )

    base = datetime.datetime(2024, 3, 1)
    rows = [
        (base + datetime.timedelta(days=d), u) for d, u in events
    ]
    df = spark_global.createDataFrame(rows, "ts timestamp, user_id long")
    got = {
        r["day"]: (r["users_1d"], r["users_3d"])
        for r in bitmap_rolling_distinct(df, "ts", "user_id", 3).collect()
    }
    days = sorted({d for d, _ in events})
    for d in days:
        day = (base + datetime.timedelta(days=d)).date()
        one = {u for dd, u in events if dd == d}
        three = {u for dd, u in events if d - 2 <= dd <= d}
        assert got[day] == (len(one), len(three))


@given(
    st.sets(
        st.integers(min_value=0, max_value=(1 << 60) - 1), min_size=1, max_size=50
    ),
    st.sets(st.integers(min_value=0, max_value=(1 << 60) - 1), max_size=50),
)
@settings(max_examples=10, deadline=None)
def test_bloom_no_false_negatives(spark_global, members, probes):
    """Every true member passes the filter (no false negatives), for
    arbitrary 60-bit keys and a deliberately tiny (collision-prone)
    filter."""
    from udacity_data_engineering_capstone_project_spark.operators.curation import (
        bloom_bitset,
        bloom_member_keys,
    )

    keys = spark_global.createDataFrame([(h,) for h in sorted(members)], "h long")
    bloom = bloom_bitset(keys, "h", m_bits=1 << 8)
    probe = spark_global.createDataFrame(
        [(h,) for h in sorted(members | probes)], "h long"
    )
    passed = {
        r["h"] for r in bloom_member_keys(probe, bloom, "h", m_bits=1 << 8).collect()
    }
    assert members <= passed


@given(
    st.lists(
        st.floats(min_value=0.0, max_value=1000.0, allow_nan=False),
        min_size=1,
        max_size=80,
    )
)
@settings(max_examples=10, deadline=None)
def test_histogram_quantile_error_bound(spark_global, values):
    """The histogram estimate is always within one bin width of the
    exact nearest-rank value, for arbitrary value distributions
    (including everything-in-one-bin and out-of-range clamping)."""
    from udacity_data_engineering_capstone_project_spark.operators.aggregates import (
        histogram_quantiles,
    )

    df = spark_global.createDataFrame(
        [("a", v) for v in values], "shard string, v double"
    )
    rows = histogram_quantiles(
        df, "shard", "v", bin_width=8, n_bins=128, probs_x100=(50, 99)
    ).collect()
    assert len(rows) == 4  # shard 'a' + 'ALL', two probs each
    for r in rows:
        assert r["within_bin"] == 1
        n = len(values)
        t = -(-r["p"] * n // 100)  # ceil
        exact = sorted(min(v, 8 * 128 - 1e-9) for v in values)[t - 1]
        assert abs(r["exact_x100"] - int(exact * 100 + 0.5)) <= 1


@given(
    st.lists(
        st.integers(min_value=1, max_value=120),  # doc token counts
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=10, deadline=None)
def test_chunk_windows_tile_exactly(spark_global, lens):
    """For arbitrary document lengths: chunks start at stride
    multiples, cover every token exactly once per its containing
    windows, the last chunk ends at the doc length, and a doc shorter
    than one window yields exactly one chunk."""
    from udacity_data_engineering_capstone_project_spark.operators.textops import (
        chunk_windows,
    )

    rows = [(i, " ".join(f"w{j}" for j in range(n))) for i, n in enumerate(lens)]
    df = spark_global.createDataFrame(rows, "doc_id long, text string")
    out = chunk_windows(df, "doc_id", "text", chunk_len=16, stride=12)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc"], []).append(r)
    assert set(by_doc) == set(range(len(lens)))
    for i, n in enumerate(lens):
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_id"])
        assert [c["tok_start"] for c in chunks] == [12 * k for k in range(len(chunks))]
        assert chunks[-1]["tok_start"] + chunks[-1]["n_chunk_tokens"] == n
        for c in chunks[:-1]:
            assert c["n_chunk_tokens"] == 16
        if n <= 16:
            assert len(chunks) == 1
