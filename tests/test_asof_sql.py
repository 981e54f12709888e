"""ASOF JOIN through the SQL front door: local window-op compile,
native DuckDB pushdown, non-ASOF dialects forced local, and loud
refusals for shapes the compile cannot express faithfully."""

from __future__ import annotations

import pytest

from tests.conftest import TESTDATA

SQL = """
SELECT a.user_id, a.event_id, click_id
FROM (SELECT user_id, ts, event_id FROM events
      WHERE event_type = 'purchase') a
ASOF LEFT JOIN (SELECT user_id, ts, event_id AS click_id FROM events
                WHERE event_type = 'click') b
  ON a.user_id = b.user_id AND a.ts >= b.ts
"""


@pytest.fixture()
def local_engine(spark):
    from datafusion_federation_spark.engine import FederationEngine
    eng = FederationEngine(spark)
    eng.register_local_parquet("events", f"{TESTDATA}/events.parquet")
    return eng


@pytest.fixture()
def duck_engine(spark):
    from datafusion_federation_spark.engine import FederationEngine
    from datafusion_federation_spark.sources.provider import (
        DuckDBExecutor, SQLProvider)
    ex = DuckDBExecutor(name="duck_asof", compute_context="asof")
    ex.register_parquet("events", f"{TESTDATA}/events.parquet")
    eng = FederationEngine(spark)
    eng.register_remote(SQLProvider(ex), "events")
    return eng, ex


def _rows(df):
    return sorted((r.user_id, r.event_id, r.click_id)
                  for r in df.collect())


def test_local_matches_duckdb_direct(local_engine):
    import duckdb
    got = _rows(local_engine.sql(SQL))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{TESTDATA}/events.parquet')")
    want = sorted(
        (int(a), int(b), None if c is None else int(c))
        for a, b, c in con.execute(SQL).fetchall())
    con.close()
    assert got == want and got


def test_local_plan_is_join_free(local_engine):
    plan = local_engine.sql(SQL)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Join" not in plan


def test_federated_collapses_to_native_asof(duck_engine):
    eng, ex = duck_engine
    got = _rows(eng.sql(SQL))
    m = ex.metrics()
    assert "ASOF LEFT JOIN" in m.get("last_sql", "")
    # equality with the local arm
    assert got  # non-vacuous; value equality pinned cross-engine below


def test_federated_equals_local(local_engine, duck_engine):
    eng, _ = duck_engine
    assert _rows(eng.sql(SQL)) == _rows(local_engine.sql(SQL))


def test_inner_asof_drops_unmatched(local_engine):
    inner = SQL.replace("ASOF LEFT JOIN", "ASOF JOIN")
    rows = _rows(local_engine.sql(inner))
    assert rows and all(c is not None for _, _, c in rows)
    left = _rows(local_engine.sql(SQL))
    assert rows == [r for r in left if r[2] is not None]


def test_non_asof_dialect_stays_local(spark):
    """A SQLite-backed provider has no ASOF syntax: the federation gate
    must refuse the claim and the window-op compile must run locally —
    and still produce correct results from per-table remote scans."""
    from datafusion_federation_spark.engine import FederationEngine
    from datafusion_federation_spark.sources.provider import (
        SQLiteExecutor, SQLProvider)
    import duckdb

    ex = SQLiteExecutor(name="lite_asof", database=":memory:")
    ex.load_rows(
        "ev", "CREATE TABLE ev (user_id INT, tsu BIGINT, event_id INT,"
        " event_type TEXT)",
        [(1, 100, 1, "purchase"), (1, 50, 2, "click"),
         (1, 70, 3, "click"), (2, 10, 4, "purchase")])
    eng = FederationEngine(spark)
    eng.register_remote(SQLProvider(ex), "ev")
    out = eng.sql("""
        SELECT a.event_id, b_id FROM
          (SELECT user_id, tsu, event_id FROM ev
           WHERE event_type = 'purchase') a
        ASOF LEFT JOIN
          (SELECT user_id, tsu, event_id AS b_id FROM ev
           WHERE event_type = 'click') b
        ON a.user_id = b.user_id AND a.tsu >= b.tsu
    """)
    got = sorted((r.event_id, r.b_id) for r in out.collect())
    assert got == [(1, 3), (4, None)]


def test_unsupported_shapes_refuse(local_engine):
    with pytest.raises(NotImplementedError, match="ASOF"):
        local_engine.sql("""
            SELECT 1 FROM (SELECT user_id, ts FROM events) a
            ASOF LEFT JOIN (SELECT user_id, ts FROM events) b
            ON a.user_id = b.user_id AND a.ts >= b.ts
               AND a.ts <= b.ts
        """).collect()
    with pytest.raises(NotImplementedError, match="key"):
        local_engine.sql("""
            SELECT 1 FROM (SELECT user_id, ts FROM events) a
            ASOF LEFT JOIN (SELECT user_id AS uid, ts FROM events) b
            ON a.user_id = b.uid AND a.ts >= b.ts
        """).collect()


def test_select_star_over_asof_refused(local_engine, duck_engine):
    star = """
    SELECT * FROM (SELECT user_id, ts, event_id FROM events
                   WHERE event_type = 'purchase') a
    ASOF LEFT JOIN (SELECT user_id, ts, event_id AS click_id
                    FROM events WHERE event_type = 'click') b
    ON a.user_id = b.user_id AND a.ts >= b.ts
    """
    # the refusal must fire on BOTH arms, before either executes —
    # otherwise the two arms would return different shapes for the
    # same SQL
    with pytest.raises(NotImplementedError, match="SELECT \\*"):
        local_engine.sql(star)
    eng, _ = duck_engine
    with pytest.raises(NotImplementedError, match="SELECT \\*"):
        eng.sql(star)


def test_select_star_over_asof_refused_through_filter(local_engine,
                                                      duck_engine):
    """ADVICE r5: 'SELECT * ... WHERE' parses as Project(Filter(Asof)),
    which bypassed the direct parent check — the guard must walk
    through transparent nodes (Filter/Sort/Limit/Distinct/alias)."""
    shapes = [
        # Project(Filter(AsofJoin))
        """
        SELECT * FROM (SELECT user_id, ts, event_id FROM events
                       WHERE event_type = 'purchase') a
        ASOF LEFT JOIN (SELECT user_id, ts, event_id AS click_id
                        FROM events WHERE event_type = 'click') b
        ON a.user_id = b.user_id AND a.ts >= b.ts
        WHERE a.user_id > 3
        """,
        # Project(Limit(Sort(Filter(AsofJoin)))) — ORDER BY + LIMIT
        """
        SELECT * FROM (SELECT user_id, ts, event_id FROM events
                       WHERE event_type = 'purchase') a
        ASOF LEFT JOIN (SELECT user_id, ts, event_id AS click_id
                        FROM events WHERE event_type = 'click') b
        ON a.user_id = b.user_id AND a.ts >= b.ts
        WHERE a.user_id > 3 ORDER BY a.event_id LIMIT 5
        """,
    ]
    eng, _ = duck_engine
    for sql in shapes:
        with pytest.raises(NotImplementedError, match="SELECT \\*"):
            local_engine.sql(sql)
        with pytest.raises(NotImplementedError, match="SELECT \\*"):
            eng.sql(sql)


def test_ambiguous_ref_above_asof_errors_not_binds(local_engine):
    """A bare column that exists on the asof output AND a later join
    side must error like DuckDB's binder does — the provenance pass
    reporting only the left side's columns used to let it silently
    bind to the other side (review r5, reproduced)."""
    sql = """
    SELECT a.event_id
    FROM (SELECT user_id, ts, event_id FROM events
          WHERE event_type = 'purchase') a
    ASOF LEFT JOIN (SELECT user_id, ts, event_id AS click_id
                    FROM events WHERE event_type = 'click') b
      ON a.user_id = b.user_id AND a.ts >= b.ts
    JOIN (SELECT event_id AS click_id, user_id AS cu FROM events
          WHERE event_type = 'view') c
      ON a.user_id = c.cu
    WHERE click_id > 100
    """
    with pytest.raises(Exception, match="(?i)ambiguous"):
        local_engine.sql(sql).collect()
