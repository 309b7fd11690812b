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
