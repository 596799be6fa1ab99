"""Driver-contract guards that keep known external constraints from
regressing silently (no Spark session needed — pure imports)."""

from __future__ import annotations


def test_registry_is_exactly_fifty():
    """The driver CORRECTNESS gate records at most 50 rows (r04's 51st query
    silently got none). The registry is sized to exactly 50 so every entry
    is driver-checked; a 51st query must REPLACE or MERGE, not append."""
    import __spark_entry__ as e

    qs = e.queries()
    assert len(qs) == 50, (
        f"{len(qs)} queries — the driver records at most 50 rows; "
        "merge or replace instead of appending"
    )
    assert set(e.oracle_sql()) <= set(qs)


def test_bench_bands_cover_bench_queries():
    """bench.py's noise-retry pass needs a band for every benched query;
    a missing band silently disables the retry for that query."""
    from bench import BANDS, BENCH_QUERIES

    assert set(BENCH_QUERIES) == set(BANDS), (
        set(BENCH_QUERIES) ^ set(BANDS)
    )
    assert all(v > 0 for v in BANDS.values())
