"""Corpus-cleaning funnel invariants (pipelines/corpus_clean.py).

Oracle parity for the exact numbers is covered by the registry sweep
(test_oracle_parity); these pin the *structural* properties a curation
funnel must satisfy regardless of corpus: monotone shrinkage stage to
stage, and closure labels at least as collapsed as single-hop labels.
"""

from nyc_data_pipeline_spark import registry
from nyc_data_pipeline_spark.pipelines.corpus_clean import _STAGES

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_funnel_monotone(spark):
    rows = {
        r.stage: (r.n_docs, r.n_tokens)
        for r in registry.QUERIES["pipeline_corpus_clean"](spark, SF).collect()
    }
    assert list(rows) and set(rows) == set(_STAGES)
    for earlier, later in zip(_STAGES, _STAGES[1:]):
        assert rows[later][0] <= rows[earlier][0], (earlier, later, rows)
        assert rows[later][1] <= rows[earlier][1], (earlier, later, rows)
    assert rows["0_raw"][0] > 0
    assert rows["4_near_dedup"][0] >= 1  # keep-one always keeps a representative


def test_closure_at_least_as_collapsed_as_keep_one(spark):
    keep = {
        r.doc_id: r.rep_id
        for r in registry.QUERIES["dedup_minhash_keep_one"](spark, SF).collect()
    }
    clos = {
        r.doc_id: r.rep_id
        for r in registry.QUERIES["dedup_minhash_closure"](spark, SF).collect()
    }
    assert set(keep) == set(clos)
    # Min-propagation is monotone: more rounds can only lower a label.
    assert all(clos[d] <= keep[d] for d in keep)
    # And it can only merge clusters, never split them.
    assert len(set(clos.values())) <= len(set(keep.values()))
