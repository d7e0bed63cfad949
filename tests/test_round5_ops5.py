"""Property gates for the round-5 batch-5 operators (x10, g09, n07,
q38, u03) — exactness vs DuckDB is covered by test_queries_oracle;
these check the structural invariants the SQL can't express."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_u03_budget_sums_exactly(ray_session):
    from naer_ray.pipelines.queries import u03_crawl_budget

    out = u03_crawl_budget(SF, budget=1000)
    assert int(out["budget"].sum()) == 1000
    # proportionality: allocation never off by more than 1 from the
    # exact quota (the Hamilton-method guarantee)
    total = int(out["n_pages"].sum())
    quota = 1000 * out["n_pages"].to_numpy(np.float64) / total
    diff = out["budget"].to_numpy(np.int64) - quota
    assert (np.abs(diff) < 1.0 + 1e-9).all()


def test_g09_dominated_by_hops(ray_session):
    """Weighted dist is >= hop count (min weight 1) and <= 18*hops
    (max weight 18... actually 19? weights are (u+v)%19+1 in [1,19]);
    seeds have dist 0."""
    from naer_ray.pipelines.queries import g04_bfs_levels, g09_shortest_paths

    g9 = g09_shortest_paths(SF).set_index("node_id")["dist"]
    g4 = g04_bfs_levels(SF).set_index("node_id")["dist"]
    # identical reachable sets (same graph, same seeds, same rounds)
    assert set(g9.index) == set(g4.index)
    hops = g4.reindex(g9.index).to_numpy(np.int64)
    w = g9.to_numpy(np.int64)
    assert (w >= hops).all()
    assert (w <= hops * 19).all()
    assert (w[hops == 0] == 0).all()


def test_x10_contains_both_arms(ray_session):
    """The fused top-10 must draw from the union of the two arm
    top-30s, and a doc ranked #1 in BOTH arms would rank #1 fused."""
    from naer_ray.pipelines.queries import x10_rrf_hybrid

    out = x10_rrf_hybrid(SF)
    assert list(out.columns) == ["rnk", "doc_id"]
    assert list(out["rnk"]) == list(range(1, len(out) + 1))
    assert out["doc_id"].is_unique
