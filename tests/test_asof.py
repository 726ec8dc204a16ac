"""As-of join operator: handwritten semantics cases + property equivalence
against pandas ``merge_asof`` (the single-node reference implementation of
the same operator) + plan-shape guard (one shuffle, no range join)."""

from datetime import datetime

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _ts(s):
    return datetime(2025, 1, 1, 0, 0, s)


def test_asof_join_semantics(spark):
    from table_ocr_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            (1, "u1", _ts(5)),   # after mark@3 → 30.0
            (2, "u1", _ts(3)),   # equal ts → tie includes the mark (<=)
            (3, "u1", _ts(2)),   # before any mark → NULL
            (4, "u2", _ts(9)),   # u2's latest ≤9 is mark@7
            (5, "u3", _ts(1)),   # key with no marks at all → NULL
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(3), 30.0),
            ("u2", _ts(4), 40.0),
            ("u2", _ts(7), 70.0),
        ],
        "user_id string, ts timestamp, value double",
    )
    got = {
        r.event_id: r.asof_value
        for r in asof_join(left, right, key="user_id").collect()
    }
    assert got == {1: 30.0, 2: 30.0, 3: None, 4: 70.0, 5: None}


@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 30)), min_size=1, max_size=25
    ),
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 30), st.integers(-99, 99)),
        max_size=25,
    ),
)
@settings(max_examples=20, deadline=None)
def test_asof_join_matches_pandas_merge_asof(spark, lefts, rights):
    """Union+window plan == pandas merge_asof(direction='backward',
    allow_exact_matches=True) per key, for arbitrary key/ts mixes."""
    from table_ocr_spark.operators.asof import asof_join

    # right side must be unique per (key, ts) — the operator's contract
    rmap = {}
    for k, t, v in rights:
        rmap[(k, t)] = v
    rrows = [(f"k{k}", _ts(t), float(v)) for (k, t), v in sorted(rmap.items())]
    lrows = [(i, f"k{k}", _ts(t)) for i, (k, t) in enumerate(lefts)]

    left = spark.createDataFrame(lrows, "event_id long, user_id string, ts timestamp")
    right = spark.createDataFrame(
        rrows or [("zz", _ts(0), 0.0)], "user_id string, ts timestamp, value double"
    )
    if not rrows:
        right = right.filter(F.lit(False))
    got = {
        r.event_id: r.asof_value
        for r in asof_join(left, right, key="user_id").collect()
    }

    lp = pd.DataFrame(lrows, columns=["event_id", "user_id", "ts"]).sort_values("ts", kind="mergesort")
    rp = pd.DataFrame(rrows, columns=["user_id", "ts", "value"]).sort_values("ts", kind="mergesort")
    if rrows:
        merged = pd.merge_asof(
            lp, rp, on="ts", by="user_id", direction="backward", allow_exact_matches=True
        )
        want = {
            int(r.event_id): (None if pd.isna(r.value) else float(r.value))
            for r in merged.itertuples()
        }
    else:
        want = {int(i): None for i, _, _ in lrows}
    assert got == want


def test_asof_join_plan_single_shuffle(spark):
    """The plan must be the union+window form: exactly one key Exchange,
    and NO nested-loop/cartesian range join."""
    from table_ocr_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, "a", _ts(1))], "event_id long, user_id string, ts timestamp")
    right = spark.createDataFrame([("a", _ts(0), 1.0)], "user_id string, ts timestamp, value double")
    plan = asof_join(left, right, key="user_id")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_join_null_semantics(spark):
    """ASOF reference-engine NULL semantics: (1) a matched right row with
    a NULL value yields NULL — it must not resurrect an older mark; (2) a
    NULL right timestamp matches nothing; (3) a NULL left timestamp
    matches nothing; (4) an existing out_col name is rejected."""
    import pytest as _pytest

    from table_ocr_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "u1", _ts(5)), (2, "u2", _ts(5)), (3, "u3", None)],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(1), 5.0),
            ("u1", _ts(2), None),   # latest ≤5 for u1 — value is genuinely NULL
            ("u2", None, 7.0),      # NULL ts: matches nothing
            ("u3", _ts(1), 9.0),    # left ts NULL: matches nothing
        ],
        "user_id string, ts timestamp, value double",
    )
    got = {r.event_id: r.asof_value for r in asof_join(left, right, key="user_id").collect()}
    assert got == {1: None, 2: None, 3: None}

    with _pytest.raises(ValueError, match="already exists"):
        asof_join(left.withColumnRenamed("event_id", "asof_value"), right, key="user_id")


def test_asof_join_null_key_semantics(spark):
    """(5) NULL equality keys never match — neither NULL-key left rows
    picking up NULL-key right marks (Window.partitionBy would group them)
    nor NULL-key right marks leaking into any partition.  Cross-checked
    against DuckDB's native ASOF JOIN on the identical rows."""
    import duckdb

    from table_ocr_spark.operators.asof import asof_join

    lrows = [(1, None, _ts(5)), (2, "u1", _ts(5)), (3, None, _ts(9))]
    rrows = [(None, _ts(1), 11.0), (None, _ts(7), 13.0), ("u1", _ts(2), 5.0)]
    left = spark.createDataFrame(lrows, "event_id long, user_id string, ts timestamp")
    right = spark.createDataFrame(rrows, "user_id string, ts timestamp, value double")
    got = {r.event_id: r.asof_value for r in asof_join(left, right, key="user_id").collect()}
    assert got == {1: None, 2: 5.0, 3: None}

    con = duckdb.connect()
    con.execute("CREATE TABLE l(event_id BIGINT, user_id VARCHAR, ts TIMESTAMP)")
    con.execute("CREATE TABLE r(user_id VARCHAR, ts TIMESTAMP, value DOUBLE)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", lrows)
    con.executemany("INSERT INTO r VALUES (?,?,?)", rrows)
    want = dict(
        con.execute(
            "SELECT l.event_id, r.value FROM l ASOF LEFT JOIN r"
            " ON l.user_id = r.user_id AND l.ts >= r.ts"
        ).fetchall()
    )
    assert got == want
