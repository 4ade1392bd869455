"""Link-rank semantics on a tiny hand-computed graph."""

from __future__ import annotations

import pandas as pd
import pytest

from rse_spark.functions.linkrank import backlink_counts, gse_link_rank, pagerank


@pytest.fixture(scope="module")
def graph(spark):
    edges = spark.createDataFrame(
        pd.DataFrame(
            {"src": [1, 1, 2, 3, 3, 3], "dst": [2, 3, 3, 1, 2, 4]}
        )
    )
    scores = spark.createDataFrame(
        pd.DataFrame({"src": [1, 2, 3], "score": [1.0, 2.0, 3.0]})
    )
    return edges, scores


def test_backlink_counts(spark, graph):
    edges, _ = graph
    got = {r.dst: r.n_backlinks for r in backlink_counts(edges).collect()}
    assert got == {2: 2, 3: 2, 1: 1, 4: 1}


def test_gse_link_rank_hand_computed(spark, graph):
    edges, scores = graph
    got = {r.dst: r.rank for r in gse_link_rank(edges, scores).collect()}
    # outdeg: 1->2, 2->1, 3->3
    # dst 2: from 1 (1.0/2) + from 3 (3.0/3) = 1.5 -> 0.85*(1+1.5)=2.125
    # dst 3: from 1 (0.5) + from 2 (2.0/1)  = 2.5 -> 0.85*3.5=2.975
    # dst 1: from 3 (1.0)                   -> 0.85*2=1.7
    # dst 4: from 3 (1.0)                   -> 1.7
    assert got == {2: 2.125, 3: 2.975, 1: 1.7, 4: 1.7}


def test_pagerank_converges_and_conserves(spark, graph):
    edges, _ = graph
    pr = {r.node: r.rank for r in pagerank(edges, iterations=20).collect()}
    # total mass ~ n nodes (4), dangling node 4 redistributes
    assert abs(sum(pr.values()) - 4.0) < 1e-6
    # node 3 has the most in-weight mass; node 4 only one weak in-edge
    assert pr[3] > pr[4]
    # another 5 iterations changes ranks by < 1e-3 (converged)
    pr2 = {r.node: r.rank for r in pagerank(edges, iterations=25).collect()}
    for k in pr:
        assert abs(pr[k] - pr2[k]) < 1e-3
