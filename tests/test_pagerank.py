"""Integer PageRank: bit-identical to a plain-Python replay of the
same integer recurrence, and rank-sane on a known topology."""

from __future__ import annotations

from collections import defaultdict

import pyspark.sql.functions as F

from mvp_mini_etl_pipeline_1762911573_spark.operators.dedup import (
    PR_DAMP_DEN, PR_DAMP_NUM, PR_ITERS, PR_UNIT, pagerank,
)


def _reference(edge_list, iters):
    nbrs = defaultdict(set)
    for a, b in edge_list:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    mass = {v: PR_UNIT for v in nbrs}
    base = PR_UNIT * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
    for _ in range(iters):
        recv = defaultdict(int)
        for v, ns in nbrs.items():
            c = (mass[v] * PR_DAMP_NUM // PR_DAMP_DEN) // len(ns)
            for n in ns:
                recv[n] += c
        mass = {v: base + recv[v] for v in nbrs}
    return mass


def test_pagerank_matches_python_replay(spark):
    edge_list = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6),
                 (6, 4), (7, 8), (2, 1), (9, 3)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r.node: r.mass for r in pagerank(edges).collect()}
    assert got == _reference(edge_list, PR_ITERS)


def test_pagerank_ranks_hubs_above_leaves(spark):
    # star: hub 0 connected to leaves 1..6, plus an isolated pair 7-8
    edge_list = [(0, i) for i in range(1, 7)] + [(7, 8)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r.node: r.mass for r in pagerank(edges).collect()}
    hub, leaf, pair = got[0], got[1], got[7]
    assert hub > leaf
    assert hub > pair
    # all leaves identical by symmetry
    assert len({got[i] for i in range(1, 7)}) == 1
