"""The reference's 18 e2e SQL golden cases, verbatim (reference
src/sql_testing/sql_tests.rs:215-475): same 6-row fixture, same SQL strings,
same expected rows, order-insensitive for group-bys (run_sql_test_case
:524-527)."""

from __future__ import annotations

import pytest

ROWS = [
    (1, "alice", 10.0),
    (2, "bob", 20.0),
    (3, "charlie", 30.0),
    (4, "alice", 15.0),
    (5, "bob", 25.0),
    (6, "alice", 35.0),
]

CASES = {
    "select_all": (
        "SELECT * FROM test_table",
        ROWS,
    ),
    "select_columns": (
        "SELECT name, value FROM test_table",
        [(n, v) for _, n, v in ROWS],
    ),
    "where_string": (
        "SELECT * FROM test_table WHERE name = 'alice'",
        [(1, "alice", 10.0), (4, "alice", 15.0), (6, "alice", 35.0)],
    ),
    "where_numeric": (
        "SELECT * FROM test_table WHERE value > 20.0",
        [(3, "charlie", 30.0), (5, "bob", 25.0), (6, "alice", 35.0)],
    ),
    "group_by_count": (
        "SELECT name, COUNT(*) as count FROM test_table GROUP BY name",
        [("alice", 3), ("bob", 2), ("charlie", 1)],
    ),
    "group_by_sum": (
        "SELECT name, SUM(value) as sum FROM test_table GROUP BY name",
        [("alice", 60.0), ("bob", 45.0), ("charlie", 30.0)],
    ),
    "group_by_avg": (
        "SELECT name, AVG(value) as avg FROM test_table GROUP BY name",
        [("alice", 20.0), ("bob", 22.5), ("charlie", 30.0)],
    ),
    "group_by_min_max": (
        "SELECT name, MIN(value) as min, MAX(value) as max FROM test_table GROUP BY name",
        [("alice", 10.0, 35.0), ("bob", 20.0, 25.0), ("charlie", 30.0, 30.0)],
    ),
    "where_and": (
        "SELECT * FROM test_table WHERE value > 15.0 AND name != 'charlie'",
        [(2, "bob", 20.0), (5, "bob", 25.0), (6, "alice", 35.0)],
    ),
    "where_or": (
        "SELECT * FROM test_table WHERE name = 'alice' OR value < 15.0",
        [(1, "alice", 10.0), (4, "alice", 15.0), (6, "alice", 35.0)],
    ),
    "where_in": (
        "SELECT * FROM test_table WHERE name IN ('alice', 'charlie')",
        [(1, "alice", 10.0), (3, "charlie", 30.0), (4, "alice", 15.0), (6, "alice", 35.0)],
    ),
    "where_between": (
        "SELECT * FROM test_table WHERE value BETWEEN 15.0 AND 25.0",
        [(2, "bob", 20.0), (4, "alice", 15.0), (5, "bob", 25.0)],
    ),
    "where_like": (
        "SELECT * FROM test_table WHERE name LIKE 'a%'",
        [(1, "alice", 10.0), (4, "alice", 15.0), (6, "alice", 35.0)],
    ),
    "select_computed": (
        "SELECT id, name, value * 2 as computed_value FROM test_table",
        [(i, n, v * 2) for i, n, v in ROWS],
    ),
    "select_case_when": (
        "SELECT id, name, CASE WHEN value > 20.0 THEN true ELSE false END as is_active FROM test_table",
        [(i, n, v > 20.0) for i, n, v in ROWS],
    ),
    "group_by_having": (
        "SELECT name, COUNT(*) as count FROM test_table GROUP BY name HAVING COUNT(*) > 1",
        [("alice", 3), ("bob", 2)],
    ),
    "where_complex": (
        "SELECT * FROM test_table WHERE (name = 'alice' AND value > 10.0) OR (name = 'bob' AND value < 25.0)",
        [(2, "bob", 20.0), (4, "alice", 15.0), (6, "alice", 35.0)],
    ),
    "aliases": (
        "SELECT t.id as user_id, t.name as user_name, t.value as score FROM test_table as t WHERE t.value > 15.0",
        [(2, "bob", 20.0), (3, "charlie", 30.0), (5, "bob", 25.0), (6, "alice", 35.0)],
    ),
}


@pytest.fixture(scope="module", autouse=True)
def test_table(spark):
    df = spark.createDataFrame(ROWS, "id int, name string, value double")
    df.createOrReplaceTempView("test_table")
    yield


@pytest.mark.parametrize("case", list(CASES))
def test_sql_golden(spark, case):
    sql, expected = CASES[case]
    got = [tuple(r) for r in spark.sql(sql).collect()]
    assert sorted(map(repr, got)) == sorted(map(repr, expected)), case
