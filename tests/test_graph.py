"""PageRank: bit-exact parity with an integer-arithmetic Python reference,
ranking sanity on known topologies, determinism, and mass conservation."""

from __future__ import annotations

from collections import defaultdict

from volga_spark.operators.graph import pagerank

SCALE = 10**12


def _python_pagerank(edges, iterations=10, d_num=85, scale=SCALE):
    """Mirror of the operator's exact integer fixed-point semantics."""
    edges = [(s, t) for s, t in edges if s != t]
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    outdeg = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    ranks = {v: scale // n for v in nodes}
    base = (100 - d_num) * scale // (100 * n)
    for _ in range(iterations):
        dang = sum(r for v, r in ranks.items() if outdeg[v] == 0)
        dang_share = d_num * dang // (100 * n)
        inflow = defaultdict(int)
        for s, t in edges:
            inflow[t] += ranks[s] * d_num // (100 * outdeg[s])
        ranks = {v: inflow[v] + base + dang_share for v in nodes}
    return ranks


EDGES = [
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 3), (5, 2),
    (6, 5), (7, 5), (3, 8),  # 8 is dangling
    (1, 1),  # self-loop, dropped
    (2, 3),  # parallel edge, kept (weights the link)
]


def test_matches_python_reference_bit_exact(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {
        r["node"]: r["rank_units"]
        for r in pagerank(df, iterations=10).collect()
    }
    expected = _python_pagerank(EDGES, iterations=10)
    assert got == expected


def test_star_hub_ranks_highest(spark):
    star = [(i, 0) for i in range(1, 12)] + [(0, 1)]
    df = spark.createDataFrame(star, ["src", "dst"])
    # 20 iterations: the 0↔1 two-cycle makes the hub/spoke-1 order
    # oscillate until ~iteration 15 (d^k decay of the alternating term)
    rows = pagerank(df, iterations=20).collect()
    ranks = {r["node"]: r["rank_units"] for r in rows}
    hub = ranks.pop(0)
    assert all(hub > v for v in ranks.values())
    # spoke 1 gets the hub's whole outflow — second place
    spoke1 = ranks.pop(1)
    assert all(spoke1 > v for v in ranks.values())


def test_deterministic_across_runs(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    a = sorted(map(tuple, pagerank(df, iterations=8).collect()))
    b = sorted(map(tuple, pagerank(df, iterations=8).collect()))
    assert a == b


def test_mass_conserved_within_floor_loss(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    rows = pagerank(df, iterations=10).collect()
    total = sum(r["rank_units"] for r in rows)
    # floors leak < 1 unit per edge + 2 per node per iteration
    n_nodes = len({x for e in EDGES for x in e if e[0] != e[1]})
    loss_bound = 10 * (len(EDGES) + 2 * n_nodes + 2)
    assert total <= SCALE
    assert total >= SCALE - loss_bound, (total, SCALE - loss_bound)


def test_rank_column_is_units_over_scale(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    for r in pagerank(df, iterations=3).collect():
        assert r["rank"] == r["rank_units"] / SCALE
