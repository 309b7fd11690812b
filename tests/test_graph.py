"""Connected-components fixpoint + CDC merge semantics."""

from pyspark.sql import functions as F

from nyc_data_pipeline_spark.dedup.graph import connected_components
from nyc_data_pipeline_spark.pipelines.cdc import merge_keep_latest


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def test_cc_long_chain_collapses(spark):
    # 0-1-2-3-4-5-6-7: 7 hops — beyond any bounded-round propagation.
    e = _edges(spark, [(i, i + 1) for i in range(7)])
    got = {r["node"]: r["rep_id"] for r in connected_components(e).collect()}
    assert got == {i: 0 for i in range(8)}


def test_cc_multiple_components_and_direction_invariance(spark):
    e = _edges(spark, [(5, 3), (3, 9), (20, 21), (21, 20), (40, 41)])
    got = {r["node"]: r["rep_id"] for r in connected_components(e).collect()}
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20, 40: 40, 41: 40}


def test_cc_star_input_is_already_fixpoint(spark):
    e = _edges(spark, [(1, 0), (2, 0), (3, 0)])
    got = {r["node"]: r["rep_id"] for r in connected_components(e).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0}


def test_merge_delete_beats_update_at_same_version(spark):
    base = spark.createDataFrame(
        [(1, "a", 0, "b"), (2, "a", 0, "b")],
        "doc_id long, lang string, version int, op string",
    )
    changes = spark.createDataFrame(
        [(1, "new", 1, "u"), (1, "x", 1, "d"), (2, "new", 1, "u")],
        "doc_id long, lang string, version int, op string",
    )
    got = {
        r["doc_id"]: r["lang"]
        for r in merge_keep_latest(base, changes).collect()
    }
    # doc 1: update and delete at version 1 — takedown wins, row gone.
    assert got == {2: "new"}


def test_label_propagation_clamps_seeds_and_spreads(spark, sf_dir):
    """Clamped LP invariants: every doc appears once; seeds keep their
    own language; unreached nodes carry null labels; every round-1
    node has at least one seed neighbor in the symmetrized graph."""
    from nyc_data_pipeline_spark.dedup.graph import star_edges
    from nyc_data_pipeline_spark.operators.labelprop import SEED_MOD
    from nyc_data_pipeline_spark.registry import QUERIES

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = QUERIES["graph_label_propagation"](spark, sf_dir).collect()
    assert len(rows) == docs.count()
    assert len({r.doc_id for r in rows}) == len(rows)
    langs = {d.doc_id: d.lang for d in docs.collect()}
    seeds = {r.doc_id for r in rows if r.origin == "seed"}
    assert seeds == {i for i in langs if i % SEED_MOD == 0}
    for r in rows:
        if r.origin == "seed":
            assert r.label == langs[r.doc_id]
        if r.origin == "none":
            assert r.label is None
        else:
            assert r.label is not None
    e = star_edges(docs).collect()
    nbrs = {}
    for edge in e:
        nbrs.setdefault(edge.u, set()).add(edge.v)
        nbrs.setdefault(edge.v, set()).add(edge.u)
    for r in rows:
        if r.origin == "round1":
            assert nbrs.get(r.doc_id, set()) & seeds


def test_common_neighbor_scores_on_constructed_graph(spark):
    """Golden link-prediction check: star-plus-path graph where the
    scores are hand-computable.  Graph: 1-2, 1-3, 2-3 (triangle),
    2-4, 3-4 would close 1-4... use: edges 1-2, 1-3, 2-4, 3-4.
    Non-edge (1,4) has common neighbors {2,3} (d=2 each):
    n_common=2, ra = 2 * 1e6//2 = 1_000_000,
    jaccard = 2*1e6 // (2+2-2) = 1_000_000.
    Non-edge (2,3) has common neighbors {1,4}: symmetric, same scores.
    Ties broken by (x, y) — (1,4) ranks first."""
    from nyc_data_pipeline_spark.operators.linkpred import (
        common_neighbor_topn,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4)], "u bigint, v bigint"
    )
    rows = {r.rank: r for r in common_neighbor_topn(edges).collect()}
    assert len(rows) == 2
    assert (rows[1].x, rows[1].y) == (1, 4)
    assert (rows[2].x, rows[2].y) == (2, 3)
    for r in rows.values():
        assert r.n_common == 2
        assert r.ra_micro == 1_000_000
        assert r.jaccard_ppm == 1_000_000


def test_common_neighbor_hub_cap_excludes_hub_wedges(spark):
    """A center above the cap contributes NO wedges: star graph with
    hub 0 of degree 3 (> cap 2) — no candidate pairs survive."""
    from nyc_data_pipeline_spark.operators.linkpred import (
        common_neighbor_topn,
    )

    star = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "u bigint, v bigint"
    )
    assert common_neighbor_topn(star, hub_cap=2).count() == 0
    # at cap >= 3 the three leaf pairs appear, scored through the hub
    got = common_neighbor_topn(star, hub_cap=3).collect()
    assert sorted((r.x, r.y) for r in got) == [(1, 2), (1, 3), (2, 3)]
    assert all(r.ra_micro == 1_000_000 // 3 for r in got)
