"""Triplet pipeline + KG tables end-to-end on sf0.001 (SURVEY.md §3.1)."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def triplet_df(ray_session):
    from llm_scraper_ray.pipelines.queries import q_triplet_extraction

    return q_triplet_extraction("/root/testdata/sf0.001")


def test_pipeline_produces_valid_triplets(triplet_df):
    assert len(triplet_df) > 100
    assert set(triplet_df["subj_type"]) == {"device"}
    assert set(triplet_df["pred"]) <= {"manufacturedBy", "hasSensor", "compatibleWith"}
    assert ((triplet_df["weight"] >= 0) & (triplet_df["weight"] <= 100)).all()
    assert set(triplet_df["method"]) <= {"search", "nli"}


def test_pipeline_deterministic(ray_session, triplet_df):
    """Recompute the full actor-pool chain (bypassing the materialized
    query cache) — distributed execution must be run-to-run identical."""
    from llm_scraper_ray.pipelines.queries import _GATE, _TRIPLET_COLS, _doc_text_rows
    from llm_scraper_ray.pipelines.triplets import triplet_dataset

    again = (
        triplet_dataset(_doc_text_rows("/root/testdata/sf0.001"), gate_keywords=_GATE)
        .to_pandas()[_TRIPLET_COLS]
        .sort_values(_TRIPLET_COLS[:6])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(triplet_df, again)


def test_dedup_and_kg(ray_session, triplet_df):
    from llm_scraper_ray.pipelines.queries import (
        q_kg_nodes,
        q_kg_top_vertices,
        q_triplets_dedup,
    )

    deduped = q_triplets_dedup("/root/testdata/sf0.001")
    key = ["subj_type", "subj_name", "pred", "obj_type", "obj_name"]
    assert len(deduped) == len(triplet_df.drop_duplicates(key))
    assert not deduped.duplicated(key).any()
    assert (deduped["n_sources"] >= 1).all()

    nodes = q_kg_nodes("/root/testdata/sf0.001")
    # J4: unique (type, key); E19: sanitized keys
    assert not nodes.duplicated(["node_type", "node_key"]).any()
    assert nodes["node_key"].str.match(r"^[a-zA-Z0-9_-]+$").all()

    top = q_kg_top_vertices("/root/testdata/sf0.001")
    assert len(top) == 10
    assert list(top["n_edges"]) == sorted(top["n_edges"], reverse=True)


def test_triplets_equal_sequential_oracle(ray_session, triplet_df):
    """Distributed chain == the persisted sequential oracle (the same
    equality the driver checks via the SELECT-from-expected oracle SQL)."""
    import pyarrow.parquet as pq

    from llm_scraper_ray.pipelines.oracle_triplets import persist_expected_triplets
    from llm_scraper_ray.pipelines.queries import _GATE, _TRIPLET_COLS

    path = persist_expected_triplets("/root/testdata/sf0.001", _GATE)
    expected = (
        pq.read_table(path)
        .to_pandas()[_TRIPLET_COLS]
        .sort_values(_TRIPLET_COLS[:6])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(triplet_df, expected)


def test_kg_components_matches_recursive_closure(ray_session):
    """CC labels over the KG edge list == a driver-side union-find over the
    same deduped triplets (independent of the bucket-grouped propagation),
    and every component label is the component's min node hash."""
    from llm_scraper_ray.functions.textnorm import graph_key
    from llm_scraper_ray.pipelines.curation import _MASK63, _md5_lower64
    from llm_scraper_ray.pipelines.queries import (
        _deduped_triplets_df,
        q_kg_components,
    )

    out = q_kg_components("/root/testdata/sf0.001")
    assert not out.duplicated(["node_type", "node_key"]).any()
    tri = _deduped_triplets_df("/root/testdata/sf0.001")

    def h(t, n):
        return _md5_lower64(f"{t}|{graph_key(n)}") & _MASK63

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for r in tri.itertuples():
        union(h(r.subj_type, r.subj_name), h(r.obj_type, r.obj_name))
    got = {
        (r.node_type, r.node_key): r.component_id for r in out.itertuples()
    }
    for (ty, key), comp in got.items():
        assert comp == find(_md5_lower64(f"{ty}|{key}") & _MASK63)
    # at least one non-trivial component (some entity pair is linked)
    assert out["component_id"].duplicated().any()

def test_pagerank_tiny_graph_matches_reference(ray_session):
    """Distributed PageRank over a hand-built 5-node graph (one dangling
    node, parallel-edge weights, a self-loop) == a dense-matrix power
    iteration with the same spec."""
    import numpy as np
    import ray.data as rd

    from llm_scraper_ray.pipelines.graph import (
        DAMPING,
        PR_ITERATIONS,
        PR_ROUND,
        pagerank,
    )

    # nodes 0..4; node 4 is dangling; (0,1) has weight 2; 3 has a self-loop
    edges = pd.DataFrame(
        {
            "src": [0, 0, 1, 2, 3, 3],
            "dst": [1, 2, 2, 4, 3, 0],
            "weight": [2.0, 1.0, 1.0, 1.0, 1.0, 1.0],
        }
    )
    n = 5
    rank = np.full(n, 1.0 / n)
    w = np.zeros((n, n))
    for s, d_, wt in edges.itertuples(index=False):
        w[int(s), int(d_)] += wt
    outw = w.sum(axis=1)
    for _ in range(PR_ITERATIONS):
        dang = rank[outw == 0].sum()
        contrib = np.zeros(n)
        for s in range(n):
            if outw[s] > 0:
                contrib += rank[s] * w[s] / outw[s]
        rank = (1 - DAMPING) / n + DAMPING * (contrib + dang / n)
    got = pagerank(rd.from_pandas(edges), n_nodes=n).set_index("node")[
        "pagerank"
    ]
    assert abs(rank.sum() - 1.0) < 1e-12
    for v in range(n):
        assert got[v] == round(float(rank[v]), PR_ROUND), (v, got[v], rank[v])


def test_kg_pagerank_equals_sequential_oracle(ray_session):
    """Engine kg_pagerank == the persisted dict-based sequential oracle
    (the same equality the driver hash-checks)."""
    import pyarrow.parquet as pq

    from llm_scraper_ray.pipelines.oracle_triplets import persist_expected_pagerank
    from llm_scraper_ray.pipelines.queries import _GATE, q_kg_pagerank

    out = q_kg_pagerank("/root/testdata/sf0.001")
    path = persist_expected_pagerank("/root/testdata/sf0.001", _GATE)
    expected = (
        pq.read_table(path)
        .to_pandas()
        .sort_values(["node_type", "node_key"])
        .reset_index(drop=True)
    )
    assert len(out) > 0
    assert abs(out["pagerank"].sum() - 1.0) < 1e-4
    pd.testing.assert_frame_equal(out, expected)


def test_kg_triangles_matches_bruteforce(ray_session):
    """Distributed wedge-check triangle counts == a driver-side brute-force
    neighbor-set intersection over the same deduped triplets (independent of
    buckets, wedges, and the closing join)."""
    from collections import defaultdict

    from llm_scraper_ray.functions.textnorm import graph_key
    from llm_scraper_ray.pipelines.curation import _MASK63, _md5_lower64
    from llm_scraper_ray.pipelines.queries import (
        _deduped_triplets_df,
        q_kg_triangles,
    )

    out = q_kg_triangles("/root/testdata/sf0.001")
    assert not out.duplicated(["node_type", "node_key"]).any()
    assert out["n_triangles"].sum() > 0  # the KG is dense enough to close

    tri = _deduped_triplets_df("/root/testdata/sf0.001")

    def h(t, n):
        return _md5_lower64(f"{t}|{graph_key(n)}") & _MASK63

    adj: dict[int, set[int]] = defaultdict(set)
    for r in tri.itertuples():
        a, b = h(r.subj_type, r.subj_name), h(r.obj_type, r.obj_name)
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    expected: dict[int, int] = defaultdict(int)
    seen = set()
    for a, nbs in adj.items():
        for b in nbs:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                key = tuple(sorted((a, b, c)))
                if key in seen:
                    continue
                seen.add(key)
                for v in key:
                    expected[v] += 1
    got = {
        h(r.node_type, r.node_key): r.n_triangles for r in out.itertuples()
    }
    for node, n in expected.items():
        assert got[node] == n
    assert sum(got.values()) == sum(expected.values())


def test_kcore_synthetic_cross_bucket_cascade(ray_session):
    """Distributed peeling on a crafted graph whose deletions cascade
    across buckets: a 5-clique (all deg 4) with a pendant chain hanging
    off it. k=3 must peel the chain one node per cross-bucket round
    (each chain node sits in a different NB bucket) and keep the clique."""
    import pandas as pd
    import ray.data as rd

    from llm_scraper_ray.pipelines.graph import kcore

    clique = [101, 102, 103, 104, 105]
    edges = [(a, b) for i, a in enumerate(clique) for b in clique[i + 1 :]]
    edges += [(1, 105), (1, 2), (2, 3)]  # chain 3-2-1-105, distinct buckets
    df = pd.DataFrame(
        {"a": [min(e) for e in edges], "b": [max(e) for e in edges]}
    )
    alive = set(kcore(rd.from_pandas(df), k=3, rounds=6)["node"].tolist())
    assert alive == set(clique)
    # k=2: the chain still peels (3 has deg 1, then 2, then 1 keeps deg 1
    # -> dies), clique survives
    alive2 = set(kcore(rd.from_pandas(df), k=2, rounds=6)["node"].tolist())
    assert alive2 == set(clique)
    # k=5: nothing survives (clique degree is 4)
    alive5 = set(kcore(rd.from_pandas(df), k=5, rounds=6)["node"].tolist())
    assert alive5 == set()


def test_kcore_underbudget_raises(ray_session):
    """A round budget smaller than the cross-bucket cascade depth must
    RAISE (unapplied kill notices detected), not return a k-core
    superset: a long pendant chain peels one cross-bucket hop per round."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from llm_scraper_ray.pipelines.graph import kcore

    clique = [101, 102, 103, 104, 105]
    edges = [(a, b) for i, a in enumerate(clique) for b in clique[i + 1 :]]
    # pendant chain of 8 nodes in 8 distinct buckets: needs ~8 rounds at k=2
    chain = [105, 1, 2, 3, 4, 5, 6, 7, 8]
    edges += list(zip(chain, chain[1:]))
    df = pd.DataFrame({"a": [min(e) for e in edges], "b": [max(e) for e in edges]})
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore(rd.from_pandas(df), k=2, rounds=2)


def test_kg_kcore_equals_sequential_oracle(ray_session):
    """Engine kg_kcore == the persisted set-based sequential peel (true
    fixpoint, no buckets) — convergence of the round budget included."""
    import pyarrow.parquet as pq

    from llm_scraper_ray.pipelines.oracle_triplets import persist_expected_kcore
    from llm_scraper_ray.pipelines.queries import _GATE, _KCORE_K, q_kg_kcore

    out = q_kg_kcore("/root/testdata/sf0.001")
    exp = pq.read_table(
        persist_expected_kcore("/root/testdata/sf0.001", _GATE, _KCORE_K)
    ).to_pandas()
    assert (out["in_kcore"] == 0).any() and (out["in_kcore"] == 1).any()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_kcore_random_graph_parity_with_sequential_peel(ray_session):
    """Distributed peeling == sequential fixpoint peel on seeded random
    graphs (buckets, notice cascades and round budget all exercised on
    shapes the KG doesn't have)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from llm_scraper_ray.pipelines.graph import kcore

    rng = np.random.default_rng(7)
    for trial in range(3):
        n, m = 60, 140
        a = rng.integers(0, n, m)
        b = rng.integers(0, n, m)
        keep = a != b
        lo, hi = np.minimum(a, b)[keep], np.maximum(a, b)[keep]
        edges = pd.DataFrame({"a": lo, "b": hi}).drop_duplicates()
        for k in (2, 3, 4):
            # sequential truth
            adj: dict[int, set] = {}
            for x, y in zip(edges["a"], edges["b"]):
                adj.setdefault(int(x), set()).add(int(y))
                adj.setdefault(int(y), set()).add(int(x))
            alive = set(adj)
            changed = True
            while changed:
                changed = False
                for v in [v for v in alive if len(adj[v]) < k]:
                    changed = True
                    for u in adj[v]:
                        adj[u].discard(v)
                    adj[v] = set()
                    alive.discard(v)
            got = set(kcore(rd.from_pandas(edges), k=k, rounds=10)["node"].tolist())
            assert got == alive, f"trial {trial} k={k}"
