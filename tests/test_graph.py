"""Connected-components duplicate clustering vs recursive-CTE oracle."""

import pytest
from pyspark.sql import functions as F

from blog_snapshotbackup_azuredatalake_spark.operators import graph
from tests.conftest import SF_DIR, assert_matches_oracle


def test_cluster_cc_matches_oracle(spark, ddb):
    df = graph.dedup_cluster_cc(spark, SF_DIR)
    assert_matches_oracle(df, ddb, graph.ORACLES["dedup_cluster_cc"])


def test_cc_merges_chain(spark):
    # a-b, b-c, d-e: chain {1,2,3} and pair {8,9} — label propagation
    # must cross the b hop even though a and c never pair directly
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (8, 9)], "doc_a bigint, doc_b bigint"
    )
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in graph.connected_components(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (8, 8), (9, 8)}


def test_cc_deep_chain_converges(spark):
    # adversarial diameter: a 200-hop path. Plain min-label propagation
    # moves one hop per round and would exhaust MAX_CC_ITERS=20 (the
    # loud-fail raise); the pointer-jumping shortcut makes convergence
    # O(log diameter), so the default budget must cover this easily.
    n = 200
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a bigint, doc_b bigint"
    )
    labels = graph.connected_components(pairs)
    got = {(r["doc_id"], r["cluster_id"]) for r in labels.collect()}
    assert got == {(i, 0) for i in range(n + 1)}


def test_cc_canonical_flag_counts(spark):
    out = graph.dedup_cluster_cc(spark, SF_DIR)
    n_clusters = out.select("cluster_id").distinct().count()
    n_canon = out.filter(F.col("is_canonical")).count()
    assert n_clusters == n_canon
    assert out.filter(F.col("cluster_size") < 2).count() == 0


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_edges = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(
        lambda e: e[0] != e[1]
    ),
    min_size=1,
    max_size=20,
)


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_edges)
def test_cc_matches_union_find(spark, edges):
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges],
        "doc_a bigint, doc_b bigint",
    )
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in graph.connected_components(pairs).collect()
    }
    want = set(_uf_components(edges).items())
    assert got == want


def test_leakage_safe_split_matches_oracle(spark, ddb):
    df = graph.corpus_split_leakage_safe(spark, SF_DIR)
    assert_matches_oracle(df, ddb, graph.ORACLES["corpus_split_leakage_safe"])


def test_leakage_safe_split_semantics(spark):
    rows = graph.corpus_split_leakage_safe(spark, SF_DIR).collect()
    by_split = {r["split"]: r for r in rows}
    assert set(by_split) <= {"train", "val", "test"}
    # zero leakage by construction; the naive split would have leaked
    assert all(r["cross_pairs_safe"] == 0 for r in rows)
    assert sum(r["cross_pairs_naive"] for r in rows) > 0
    # every document lands in exactly one split, at whatever SF the
    # suite is pointed at (SPARK_GRAFT_TEST_SF_DIR)
    from blog_snapshotbackup_azuredatalake_spark.sources.catalog import (
        load_table,
    )

    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs


def test_keep_best_matches_oracle(spark, ddb):
    df = graph.dedup_keep_best(spark, SF_DIR)
    assert_matches_oracle(df, ddb, graph.ORACLES["dedup_keep_best"])


def test_keep_best_keeps_exactly_one_max_quality_doc(spark):
    rows = graph.dedup_keep_best(spark, SF_DIR).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        kept = [m for m in members if m["is_kept"]]
        assert len(kept) == 1, cid
        best_q = max(m["quality_score"] for m in members)
        assert kept[0]["quality_score"] == best_q
        # all members agree on who is kept
        assert {m["kept_doc_id"] for m in members} == {kept[0]["doc_id"]}


def test_pagerank_invariants(spark):
    rows = graph.graph_pagerank(spark, SF_DIR).collect()
    assert rows, "knn graph should yield nodes at sf0.001"
    n = len(rows)
    ids = {r["vec_id"] for r in rows}
    assert len(ids) == n, "one row per node"
    d = graph.PAGERANK_DAMPING
    floor = (1.0 - d) / n
    total = sum(r["rank"] for r in rows)
    # dangling mass leaks in the simplified formulation: (1-d) <= sum <= 1
    assert (1.0 - d) - 1e-9 <= total <= 1.0 + 1e-9, total
    for r in rows:
        assert r["rank"] >= floor - 1e-12, r
        assert r["in_deg"] >= 0
    # a never-pointed-to node sits exactly at the teleport floor
    spokes = [r for r in rows if r["in_deg"] == 0]
    for r in spokes:
        assert r["rank"] == pytest.approx(floor, rel=1e-12)
    # rank mass concentrates: max in-degree node outranks the floor
    top = max(rows, key=lambda r: r["in_deg"])
    if top["in_deg"] > 0:
        assert top["rank"] > floor


def test_ppr_invariants(spark):
    rows = graph.graph_ppr(spark, SF_DIR).collect()
    assert rows, "knn graph should yield nodes at sf0.001"
    assert len({r["vec_id"] for r in rows}) == len(rows), "one row per node"
    seeds = [r for r in rows if r["is_seed"]]
    assert len(seeds) == min(graph.PPR_SEEDS, len(rows))
    # seeds are the lowest node ids (the deterministic seed contract)
    seed_ids = sorted(r["vec_id"] for r in seeds)
    assert seed_ids == sorted(r["vec_id"] for r in rows)[: len(seeds)]
    # restart mass keeps total rank in ((1-d), 1]; only dangling leaks
    total = sum(r["rank"] for r in rows)
    d = graph.PAGERANK_DAMPING
    assert (1.0 - d) - 1e-9 <= total <= 1.0 + 1e-9, total
    # personalization: rank mass concentrates near the seed community —
    # the mean seed rank must beat the mean non-seed rank
    non = [r for r in rows if not r["is_seed"]]
    if non:
        assert sum(r["rank"] for r in seeds) / len(seeds) > sum(
            r["rank"] for r in non
        ) / len(non)
    # every non-seed's rank comes only from walk mass (no teleport term)
    for r in non:
        assert r["rank"] >= 0.0


def test_link_predict_pairs_are_novel_and_share_neighbors(spark):
    from blog_snapshotbackup_azuredatalake_spark.operators import graph
    from blog_snapshotbackup_azuredatalake_spark.operators.similarity import (
        ann_knn_graph,
    )

    rows = graph.graph_link_predict(spark, SF_DIR).collect()
    assert rows
    edges = ann_knn_graph(spark, SF_DIR).select("src", "dst").collect()
    adj = {(r["src"], r["dst"]) for r in edges}
    nbrs = {}
    for r in edges:
        nbrs.setdefault(r["src"], set()).add(r["dst"])
    for r in rows:
        a, b = r["a"], r["b"]
        assert a < b
        # predicted links are NOT existing edges in either direction
        assert (a, b) not in adj and (b, a) not in adj
        # claimed common-neighbor count is the true intersection size
        assert r["cn"] == len(nbrs.get(a, set()) & nbrs.get(b, set()))
        assert r["cn"] >= 1


def test_triangle_count_matches_oracle(spark, ddb):
    df = graph.graph_triangle_count(spark, SF_DIR)
    assert_matches_oracle(df, ddb, graph.ORACLES["graph_triangle_count"])


def test_triangle_count_brute_force_parity(spark):
    # the degree-oriented census must agree with the O(n^3)-ish brute
    # force on the actual sf0.001 co-purchase graph
    from itertools import combinations

    from blog_snapshotbackup_azuredatalake_spark.operators.graph import (
        _copurchase_edges,
    )

    edges = {
        (r["u"], r["v"]) for r in _copurchase_edges(spark, SF_DIR).collect()
    }
    nbrs = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    brute = sum(
        1
        for u in nbrs
        for v, w in combinations(sorted(nbrs[u]), 2)
        if u < v and (v, w) in edges
    )
    row = graph.graph_triangle_count(spark, SF_DIR).collect()[0]
    assert row["n_triangles"] == brute
    assert row["n_edges"] == len(edges)


def test_community_lpa_matches_oracle(spark, ddb):
    df = graph.graph_community_lpa(spark, SF_DIR)
    assert_matches_oracle(df, ddb, graph.ORACLES["graph_community_lpa"])


def test_community_lpa_covers_every_node_once(spark):
    out = graph.graph_community_lpa(spark, SF_DIR).collect()
    nodes = [r["part_id"] for r in out]
    assert len(nodes) == len(set(nodes))
    # sizes are consistent with the actual membership counts
    from collections import Counter

    sizes = Counter(r["community"] for r in out)
    for r in out:
        assert r["community_size"] == sizes[r["community"]]


def test_degree_stats_matches_oracle(spark, ddb):
    df = graph.graph_degree_stats(spark, SF_DIR)
    assert_matches_oracle(df, ddb, graph.ORACLES["graph_degree_stats"])


def test_degree_stats_accounts_for_every_edge_endpoint(spark):
    rows = graph.graph_degree_stats(spark, SF_DIR).collect()
    e0 = graph._copurchase_edges(spark, SF_DIR)
    n_edges = e0.count()
    # every endpoint lands in exactly one bucket: Σ sum_deg = 2m
    assert sum(r["sum_deg"] for r in rows) == 2 * n_edges
    # shares are ppm truncations: they sum to ≤ 1e6 within bucket-count
    total_ppm = sum(r["share_ppm"] for r in rows)
    assert 1_000_000 - len(rows) <= total_ppm <= 1_000_000
    for r in rows:
        assert len(str(r["min_deg"])) == r["bucket"]
        assert len(str(r["max_deg"])) == r["bucket"]


def test_bfs_reach_matches_oracle(spark, ddb):
    df = graph.graph_bfs_reach(spark, SF_DIR)
    assert_matches_oracle(df, ddb, graph.ORACLES["graph_bfs_reach"])


def test_bfs_census_is_total_and_monotone_from_seeds(spark):
    rows = {r["dist"]: r["n_nodes"] for r in graph.graph_bfs_reach(spark, SF_DIR).collect()}
    e0 = graph._copurchase_edges(spark, SF_DIR)
    from pyspark.sql import functions as F

    nodes = (
        e0.select(F.col("u").alias("n"))
        .unionByName(e0.select(F.col("v").alias("n")))
        .distinct()
    )
    n_total = nodes.count()
    n_seeds = nodes.filter(F.col("n") % graph.BFS_SEED_MOD == 0).count()
    assert sum(rows.values()) == n_total  # census covers every node once
    assert rows.get(0, 0) == n_seeds
    assert all(d in range(-1, graph.BFS_HOPS + 1) for d in rows)


def test_cluster_sizes_matches_oracle(spark, ddb):
    df = graph.dedup_cluster_sizes(spark, SF_DIR)
    assert_matches_oracle(df, ddb, graph.ORACLES["dedup_cluster_sizes"])


def test_cluster_sizes_census_is_total(spark):
    from blog_snapshotbackup_azuredatalake_spark.sources.catalog import (
        load_table,
    )

    rows = graph.dedup_cluster_sizes(spark, SF_DIR).collect()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]
        assert r["n_redundant"] == (r["cluster_size"] - 1) * r["n_clusters"]
    # census must agree with the per-doc cluster relation it summarizes
    cc = graph.dedup_cluster_cc(spark, SF_DIR)
    assert sum(r["n_redundant"] for r in rows) == cc.filter(
        "NOT is_canonical"
    ).count()


def test_kcore_matches_oracle(spark, ddb):
    df = graph.graph_kcore(spark, SF_DIR)
    assert_matches_oracle(df, ddb, graph.ORACLES["graph_kcore"])


def test_kcore_census_shrinks_monotonically(spark):
    rows = sorted(
        graph.graph_kcore(spark, SF_DIR).collect(), key=lambda r: r["round"]
    )
    assert len(rows) == graph.KCORE_ROUNDS
    for a, b in zip(rows, rows[1:]):
        assert b["n_nodes"] <= a["n_nodes"]
        assert b["n_edges"] <= a["n_edges"]
    for r in rows:
        assert r["k"] == graph.KCORE_K
        # survivors each passed a ≥k degree test against the previous
        # round's subgraph, so a non-empty survivor set implies edges
        assert (r["n_edges"] > 0) or (r["n_nodes"] == 0)


def test_modularity_matches_oracle(spark, ddb):
    df = graph.graph_modularity(spark, SF_DIR)
    assert_matches_oracle(df, ddb, graph.ORACLES["graph_modularity"])


def test_modularity_is_exact_rational_in_range(spark):
    r = graph.graph_modularity(spark, SF_DIR).collect()[0]
    assert r["q_den"] == 4 * r["n_edges"] * r["n_edges"]
    assert r["modularity"] == r["q_num"] / r["q_den"]
    assert -0.5 <= r["modularity"] <= 1.0
    assert 0 < r["intra_edges"] <= r["n_edges"]


def test_assortativity_matches_oracle(spark, ddb):
    df = graph.graph_assortativity(spark, SF_DIR)
    assert_matches_oracle(df, ddb, graph.ORACLES["graph_assortativity"])


def test_assortativity_moments_and_range(spark):
    r = graph.graph_assortativity(spark, SF_DIR).collect()[0]
    assert -1.0 <= r["assortativity"] <= 1.0
    # both-orientation ends: even count, moments positive, Cauchy-Schwarz
    assert r["n_edge_ends"] % 2 == 0 and r["n_edge_ends"] > 0
    assert 0 < r["sum_deg"] <= r["sum_deg_sq"] * r["n_edge_ends"]
    assert r["sum_deg_prod"] <= r["sum_deg_sq"]  # Σxy ≤ Σx² by symmetry+CS


def test_cc_census_matches_oracle(spark, ddb):
    df = graph.graph_cc_census(spark, SF_DIR)
    assert_matches_oracle(df, ddb, graph.ORACLES["graph_cc_census"])


def test_cc_census_conserves_nodes(spark):
    rows = graph.graph_cc_census(spark, SF_DIR).collect()
    e0 = graph.copurchase_edges_cached(spark, SF_DIR)
    from pyspark.sql import functions as F

    n_nodes = (
        e0.select(F.col("u").alias("n"))
        .unionByName(e0.select(F.col("v").alias("n")))
        .distinct()
        .count()
    )
    assert sum(r["n_nodes"] for r in rows) == n_nodes
    for r in rows:
        assert r["min_size"] <= r["max_size"]
        assert len(str(r["min_size"])) == r["bucket"]
        assert len(str(r["max_size"])) == r["bucket"]


@pytest.mark.parametrize("name", sorted(graph.ORACLES))
def test_graph_matches_oracle(spark, ddb, name):
    df = graph.QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, ddb, graph.ORACLES[name])
