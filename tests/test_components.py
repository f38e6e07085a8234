"""Connected components: distributed min-label + pointer jumping must
equal a union-find ground truth on adversarial shapes (chains, stars,
cliques, singleton edges, NULLs, random graphs)."""

from __future__ import annotations

import random

import pytest

from parallel_count_min_sketch_spark.operators.components import (
    connected_components,
)


def _union_find(edges):
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a is None or b is None:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for n in list(parent):
        comp[n] = find(n)
    return comp


def _spark_cc(spark, edges):
    df = spark.createDataFrame(edges, "a BIGINT, b BIGINT").repartition(4)
    out = connected_components(df, "a", "b")
    return {r["node"]: r["component"] for r in out.collect()}


def test_chain_star_clique_and_nulls(spark):
    """A 40-node chain (diameter 39 — needs pointer jumping inside the
    round budget), a star, a clique, a 2-cycle, and NULL endpoints."""
    chain = [(i, i + 1) for i in range(100, 140)]
    star = [(500, x) for x in range(501, 521)]
    clique = [(a, b) for a in range(900, 905) for b in range(a + 1, 905)]
    extra = [(7, 8), (8, 7), (None, 3), (4, None)]
    edges = chain + star + clique + extra
    got = _spark_cc(spark, edges)
    want = _union_find(edges)
    assert got == want
    assert got[139] == 100 and got[520] == 500 and got[904] == 900
    assert 3 not in got and 4 not in got  # NULL edges assert nothing


@pytest.mark.parametrize("seed", [1, 2])
def test_random_graphs_match_union_find(spark, seed):
    rng = random.Random(seed)
    nodes = rng.sample(range(10_000), 300)
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(400)]
    got = _spark_cc(spark, edges)
    assert got == _union_find(edges)


def test_unconverged_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(40)],
                               "a BIGINT, b BIGINT")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(df, "a", "b", max_iter=1).collect()
