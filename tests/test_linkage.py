"""Record linkage: blocked candidate pairs + exact similarity scores
hash-match the DuckDB twin over `customer`; crafted dirty records resolve
to the right entities (and distinct entities stay apart); the hot-block
guard drops oversized blocks on both engines identically."""

from __future__ import annotations

from pyspark.sql import functions as F

from volga_spark.operators.linkage import (
    blocking_keys,
    candidate_pairs,
    linkage_oracle_sql,
    resolve_entities,
    score_pairs,
)
from volga_spark.oracle import compare_frames, run_oracle
from volga_spark.tables import load_table


def test_pairs_and_scores_match_duckdb(spark, sf_dir):
    # synthetic c_name values are near-identical ("Customer#000000NNN"), so
    # prefix blocks explode past any sane cap — block on the ROW-unique
    # tail by mixing name and key fields via a derived field. Instead we
    # link on c_name directly but with a cap high enough to keep the small
    # sf0.001 table's blocks (150 rows); the point of THIS test is
    # arithmetic parity, not blocking selectivity.
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") <= 60
    )
    keys = blocking_keys(cust, "c_custkey", "c_name")
    pairs = candidate_pairs(keys, max_block_size=100)
    got = score_pairs(cust, pairs, "c_custkey", "c_name").toPandas()
    oracle = run_oracle(
        linkage_oracle_sql(
            "customer", "c_custkey", "c_name",
            max_block_size=100, where="c_custkey <= 60",
        ),
        sf_dir,
    )
    assert len(got) > 0
    assert not compare_frames(got, oracle)


def test_hot_block_guard_matches_duckdb(spark, sf_dir):
    # with a tiny cap, the near-identical synthetic names overflow their
    # blocks and the surviving pair set must shrink identically on both
    # engines
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") <= 60
    )
    keys = blocking_keys(cust, "c_custkey", "c_name")
    capped = candidate_pairs(keys, max_block_size=8)
    uncapped = candidate_pairs(keys, max_block_size=100)
    assert capped.count() < uncapped.count()
    got = score_pairs(cust, capped, "c_custkey", "c_name").toPandas()
    oracle = run_oracle(
        linkage_oracle_sql(
            "customer", "c_custkey", "c_name",
            max_block_size=8, where="c_custkey <= 60",
        ),
        sf_dir,
    )
    assert not compare_frames(got, oracle)


def _dirty_records(spark):
    rows = [
        # entity A: typo + token reorder
        (1, "John Smith"),
        (2, "Jon Smith"),
        (3, "Smith John"),
        # entity B: vowel typo
        (4, "Acme Corporation"),
        (5, "Acme Corporatien"),
        # distinct singletons
        (6, "Zelda Brown"),
        (7, "Wholly Unrelated Name"),
    ]
    return spark.createDataFrame(rows, "rid bigint, name string")


def test_resolution_groups_variants_not_strangers(spark):
    ents = {
        r["id"]: r["entity_id"]
        for r in resolve_entities(
            _dirty_records(spark), "rid", "name", threshold=0.60
        ).collect()
    }
    assert ents[1] == ents[2] == ents[3] == 1  # A closes transitively
    assert ents[4] == ents[5] == 4
    assert ents[6] == 6 and ents[7] == 7
    assert ents[1] != ents[4] != ents[6]


def test_every_record_gets_exactly_one_entity(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") <= 60
    )
    out = resolve_entities(
        cust, "c_custkey", "c_name", threshold=0.95, max_block_size=100
    )
    assert out.count() == cust.count()
    assert out.groupBy("id").count().filter(F.col("count") > 1).count() == 0
    # entity id is always the minimum member id
    bad = out.filter(F.col("entity_id") > F.col("id")).count()
    assert bad == 0
