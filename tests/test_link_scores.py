"""Graph link-prediction scores: structural invariants tying the per-EDGE
common-neighbor counts to the per-VERTEX triangle counts (both count each
triangle exactly 3 times), plus bound checks. Oracle-SQL equality runs in
scripts/check_queries.py like every other query."""

SF = "/root/testdata/sf0.001"


def test_kg_link_scores_invariants(ray_session):
    from llm_scraper_ray.pipelines.queries import q_kg_link_scores, q_kg_triangles

    scores = q_kg_link_scores(SF)
    tri = q_kg_triangles(SF)
    assert len(scores) > 0
    # each triangle contributes 3 edge-level common-neighbor credits and
    # 3 vertex-level triangle credits — the totals must agree
    assert scores["n_common"].sum() == tri["n_triangles"].sum()
    # a common neighbor of (a, b) is adjacent to both but is neither a nor b
    assert (
        scores["n_common"] <= scores[["deg_a", "deg_b"]].min(axis=1) - 1
    ).all()
    j = scores["jaccard"]
    assert ((j >= 0) & (j <= 1)).all()
    assert (scores["n_common"] > 0).any(), "the KG must close some wedges"
