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


def _cdc_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, lang string, n_chars bigint, version int, op string"
    )


def test_cdc_fold_tombstone_blocks_stale_redelivery(spark):
    """A lower-version update (re)delivered AFTER a higher-version
    delete was applied must NOT resurrect the row: the fold keeps the
    tombstone in state, so the stale update loses the keep-latest
    window.  (The exact divergence the r3 advisory called out.)"""
    from nyc_data_pipeline_spark.pipelines.cdc import (
        finalize_merge,
        merge_fold_state,
    )

    base = _cdc_df(spark, [(1, "en", 100, 0, "b"), (2, "en", 200, 0, "b")])
    upd_v1 = _cdc_df(spark, [(1, "recrawl", 101, 1, "u")])
    del_v2 = _cdc_df(spark, [(1, "en", 100, 2, "d")])

    # Delete applied first; the v1 update is then redelivered late.
    state = merge_fold_state(merge_fold_state(base, del_v2), upd_v1)
    tomb = {r.doc_id: (r.op, r.version) for r in state.collect()}
    assert tomb[1] == ("d", 2)  # tombstone survives the stale update
    live = {r.doc_id for r in finalize_merge(state).collect()}
    assert live == {2}


def test_cdc_fold_any_order_and_redelivery_reaches_one_shot_fixpoint(spark):
    """Fold law under adversarial delivery: every permutation of the
    change waves, with one wave delivered twice, reaches the same
    fixpoint as the one-shot merge of all changes."""
    import itertools

    from nyc_data_pipeline_spark.pipelines.cdc import (
        finalize_merge,
        merge_fold_state,
        merge_keep_latest,
    )

    base = _cdc_df(
        spark, [(1, "en", 100, 0, "b"), (2, "en", 200, 0, "b"), (3, "en", 300, 0, "b")]
    )
    waves = [
        _cdc_df(spark, [(1, "w1", 101, 1, "u"), (3, "w1", 301, 1, "u")]),
        _cdc_df(spark, [(1, "en", 100, 2, "d"), (2, "w2", 202, 2, "u")]),
        _cdc_df(spark, [(3, "en", 300, 3, "d")]),
    ]
    want = sorted(
        (r.doc_id, r.lang, r.n_chars, r.version)
        for r in merge_keep_latest(base, waves[0].unionAll(waves[1]).unionAll(waves[2])).collect()
    )
    for order in itertools.permutations(range(3)):
        state = base
        for i in order:
            state = merge_fold_state(state, waves[i])
        state = merge_fold_state(state, waves[order[0]])  # at-least-once redelivery
        got = sorted(
            (r.doc_id, r.lang, r.n_chars, r.version)
            for r in finalize_merge(state).collect()
        )
        assert got == want, order


def test_bucketed_cdc_merge_corpus_side_exchange_free(spark):
    """The bucketed merge's whole point: with the corpus bucketed on
    the merge key, the only Exchange in the plan is the (small) change
    batch's explicit repartition — the corpus side is satisfied by the
    bucket layout (Bucketed: true scan, no shuffle)."""
    from nyc_data_pipeline_spark.pipelines.cdc import (
        change_batch,
        merge_join_bucketed,
        write_documents_bucketed,
    )

    corpus = write_documents_bucketed(spark, SF)
    merged = merge_join_bucketed(corpus, change_batch(corpus))
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert plan.count("Exchange") == 1, plan  # change batch only
    assert "Bucketed: true" in plan


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


def test_weighted_es_sample_bias_and_shape(spark, sf_dir):
    """E-S sampler invariants: exactly N_PER rows per month (months
    with >= N_PER orders), ranks are 1..N_PER, orders belong to their
    month, the draw is deterministic across invocations, and the
    weighted draw is actually biased — the sampled mean o_totalprice
    clearly exceeds the corpus mean (inclusion odds ~ weight)."""
    import pyspark.sql.functions as F

    from nyc_data_pipeline_spark.pipelines.splits import ES_N_PER
    from nyc_data_pipeline_spark.registry import QUERIES

    rows = QUERIES["sample_weighted_es"](spark, sf_dir).collect()
    again = QUERIES["sample_weighted_es"](spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    month_sizes = {
        r.month: r.n
        for r in o.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("month")
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    by_month = {}
    for r in rows:
        by_month.setdefault(r.month, []).append(r)
    assert set(by_month) == set(month_sizes)
    for month, sample in by_month.items():
        assert len(sample) == min(ES_N_PER, month_sizes[month])
        assert sorted(r.es_rank for r in sample) == list(
            range(1, len(sample) + 1)
        )
    # 5-of-~19 per month bounds the achievable lift; 1.2x is a clear
    # signal (unweighted sampling would hover at 1.0x +- noise).
    corpus_mean = o.agg(F.avg("o_totalprice")).first()[0]
    sample_mean = sum(r.weight for r in rows) / len(rows)
    assert sample_mean > 1.2 * float(corpus_mean)


def test_bootstrap_ci_brackets_and_width(spark, sf_dir):
    """Poisson-bootstrap invariants: all 64 replicates survive (no
    zero-weight group at any fixture size), lo < point < hi for every
    priority (the CI covers its own point estimate), the band is
    non-degenerate but tight (within +-5% of the point), and the point
    estimate recomputes from raw orders."""
    import pyspark.sql.functions as F

    from nyc_data_pipeline_spark.registry import QUERIES

    rows = QUERIES["ab_bootstrap_ci"](spark, sf_dir).collect()
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    truth = {
        r.grp: (r.s, r.n)
        for r in o.groupBy(F.col("o_orderpriority").alias("grp"))
        .agg(
            F.sum(F.expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)")).alias("s"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert {r.grp for r in rows} == set(truth)
    for r in rows:
        s, n = truth[r.grp]
        assert r.n_rows == n
        assert r.point_milli == s * 1000 // n
        assert r.n_reps == 64
        assert r.covers_point
        assert r.lo_milli < r.point_milli < r.hi_milli
        # ~90% CI of a mean over n >= 300 rows with cv ~ 0.6:
        # 2 * 1.645 * 0.6 / sqrt(300) ~ 11% of the point at sf0.001,
        # shrinking as 1/sqrt(n) at larger fixtures.
        width = r.hi_milli - r.lo_milli
        assert 0 < width < 0.15 * r.point_milli


def test_shard_export_deterministic_balanced_and_sorted(spark, sf_dir):
    """Export invariants: two runs commit identical stats (determinism
    through a full rewrite), all 16 shards exist and partition the
    corpus exactly, no shard is pathologically fat (the balance the
    trainer's data loader depends on), and each committed file is
    physically ordered by order_key (the decorrelated read order)."""
    from nyc_data_pipeline_spark.registry import QUERIES, load_all
    from nyc_data_pipeline_spark.sources.scans import scratch_dir
    from nyc_data_pipeline_spark.pipelines.splits import N_SHARDS

    load_all()
    q = QUERIES["sample_shard_export"]
    run1 = {r.shard: tuple(r) for r in q(spark, sf_dir).collect()}
    run2 = {r.shard: tuple(r) for r in q(spark, sf_dir).collect()}
    assert run1 == run2  # byte-stable re-run after the full rewrite
    assert sorted(run1) == list(range(N_SHARDS))
    total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    sizes = [run1[s][1] for s in run1]
    assert sum(sizes) == total  # exact partition of the corpus
    mean = total / N_SHARDS
    assert max(sizes) < 2 * mean  # no straggler shard
    # physical order inside a committed shard file
    import pyspark.sql.functions as F

    one = spark.read.parquet(
        f"{scratch_dir('train_shards', sf_dir)}/shard=0"
    )
    keys = [r.order_key for r in one.select("order_key").collect()]
    assert keys == sorted(keys) and len(set(keys)) == len(keys)


def test_gini_golden_values(spark):
    """Hand-computed Gini: a perfectly equal segment scores exactly 0;
    a winner-takes-all segment of 4 (0,0,0,x) scores
    (2*4x - 5x)/(4x) = 750000 ppm; a 2-row (1,3) segment scores
    (2*(1*1+2*3) - 3*4)/(2*4) = 2/8 = 250000 ppm."""
    from nyc_data_pipeline_spark.operators.inequality import (
        gini_by_segment,
    )

    rows = (
        [(i, "EQUAL", 500) for i in range(4)]
        + [(10 + i, "WINNER", c) for i, c in enumerate([0, 0, 0, 1000])]
        + [(20, "PAIR", 1), (21, "PAIR", 3)]
    )
    spend = spark.createDataFrame(rows, "k bigint, seg string, cents bigint")
    got = {
        r.seg: r
        for r in gini_by_segment(
            spend, ["EQUAL", "PAIR", "WINNER"]
        ).collect()
    }
    assert got["EQUAL"].gini_ppm == 0
    assert got["WINNER"].gini_ppm == 750_000
    assert got["PAIR"].gini_ppm == 250_000
    assert got["PAIR"].n_customers == 2 and got["PAIR"].sum_cents == 4


def test_pseudonymize_preserves_join_and_hides_keys(spark, sf_dir):
    """Consistency: the pseudonym join reproduces the plaintext join's
    per-segment counts, sums, and distinct cardinalities exactly.
    No-passthrough: the output schema carries no raw key column, and
    no pseudonym equals its source key's string form.  Rotation: a
    different salt yields disjoint pseudonyms for the same keys."""
    import pyspark.sql.functions as F
    from nyc_data_pipeline_spark.registry import QUERIES, load_all
    from nyc_data_pipeline_spark.pipelines.quality import _PSEUDO

    load_all()
    got = {
        r.seg: (r.n_orders, r.sum_cents, r.n_pseudonyms)
        for r in QUERIES["dq_pseudonymize_joinable"](spark, sf_dir).collect()
    }
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    plain = {
        r.seg: (r.n_orders, r.sum_cents, r.n_keys)
        for r in orders.join(
            cust, orders.o_custkey == cust.c_custkey
        )
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.expr("CAST(floor(o_totalprice*100) AS BIGINT)")).alias(
                "sum_cents"
            ),
            F.countDistinct("c_custkey").alias("n_keys"),
        )
        .collect()
    }
    assert got == plain
    out_cols = QUERIES["dq_pseudonymize_joinable"](spark, sf_dir).columns
    assert "pid" not in out_cols and not any(
        "custkey" in c for c in out_cols
    )
    # rotation severs the mapping
    p1 = _PSEUDO.format(k="c_custkey")
    p2 = p1.replace("r8-rotation-2026-08", "r9-rotation")
    overlap = (
        cust.selectExpr(f"{p1} AS a", f"{p2} AS b")
        .filter("a = b")
        .count()
    )
    assert overlap == 0


def test_rolling_ols_golden_slope(spark):
    """Hand-computed trailing-4 regression: y = 2x exactly → the
    rational slope reduces to 2 at every full window, and the warm-up
    rows (n < 4) fit their shorter prefix exactly too."""
    import pyspark.sql.functions as F
    from nyc_data_pipeline_spark.operators.trends import rolling_ols

    rows = [(1, i, i + 1, 2 * (i + 1)) for i in range(6)]
    o = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, x bigint, y bigint"
    ).select(
        "user_id",
        "event_id",
        F.col("x").cast("decimal(38,0)").alias("x"),
        F.col("y").cast("decimal(38,0)").alias("y"),
    )
    got = {r.event_id: r for r in rolling_ols(o, w=4).collect()}
    for eid, r in got.items():
        num, den = int(r.slope_num), int(r.slope_den)
        if r.n == 1:
            assert num == den == 0  # degenerate single-point window
        else:
            assert num == 2 * den and den > 0
    assert [got[i].n for i in range(6)] == [1, 2, 3, 4, 4, 4]


def test_holt_matches_python_reference(spark):
    """The two-register Holt fold vs a plain Python replay on a series
    that rises then crashes — exercising the negative trend register
    and the agreed truncation-toward-zero division."""
    import pyspark.sql.functions as F
    from nyc_data_pipeline_spark.registry import QUERIES, load_all

    def ref(ys):
        def tdiv(x):
            q = abs(x) // 2
            return q if x >= 0 else -q

        l, b = ys[0], 0
        for y in ys[1:]:
            nl = tdiv(l + b + y)
            b = tdiv(b + (nl - l))
            l = nl
        return l, b

    ys = [10, 20, 30, 40, -15, 7]
    rows = [(1, i, float(y) / 1e6) for i, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "user_id bigint, event_id bigint, value double")
    o = df.select(
        "user_id",
        F.floor(F.col("value") * 1_000_000).cast("bigint").alias("y"),
        (F.col("event_id") * 1000).alias("us"),
        "event_id",
    )
    g = o.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(us, event_id, y))),"
            " s -> s.y)"
        ).alias("ys"),
    )
    got = g.selectExpr(
        "aggregate(slice(ys, 2, CAST(size(ys) - 1 AS INT)),"
        " named_struct('l', ys[0], 'b', CAST(0 AS BIGINT)),"
        " (a, y) -> named_struct("
        "   'l', (a.l + a.b + y) div 2,"
        "   'b', (a.b + ((a.l + a.b + y) div 2 - a.l)) div 2)) AS st"
    ).collect()[0].st
    assert (got.l, got.b) == ref(ys) == (7, -6)


def test_export_ready_shards_exactly_the_survivors(spark, sf_dir):
    """The committed shards must hold exactly corpus_clean's
    4_near_dedup survivor set — same doc count and token mass, no
    leaked gated doc — and the shard map must agree with
    sample_shard_export's assignment on the shared doc_ids."""
    from nyc_data_pipeline_spark.registry import QUERIES, load_all
    from nyc_data_pipeline_spark.sources.scans import scratch_dir
    from nyc_data_pipeline_spark.pipelines.splits import _SHARD
    import pyspark.sql.functions as F

    load_all()
    shards = QUERIES["pipeline_export_ready"](spark, sf_dir).collect()
    funnel = {
        r.stage: (r.n_docs, r.n_tokens)
        for r in QUERIES["pipeline_corpus_clean"](spark, sf_dir).collect()
    }
    n_docs, n_toks = funnel["4_near_dedup"]
    assert sum(r.n_docs for r in shards) == n_docs
    assert sum(r.sum_tokens for r in shards) == n_toks
    committed = spark.read.parquet(
        scratch_dir("export_ready_shards", sf_dir)
    )
    # routing agrees with the standalone export's hash map
    mismatch = committed.filter(
        F.col("shard").cast("bigint") != F.expr(_SHARD)
    ).count()
    assert mismatch == 0


def test_entity_resolution_golden_chain(spark):
    """Constructed record file with a transitive typo chain: 'acme
    corp' / 'acme cor' / 'acme co' — pairwise lev<=1 links form a
    chain the CC step must collapse into ONE canonical entity even
    though the endpoints are 2 edits apart; an unrelated record stays
    a singleton (excluded from the >=2-member output)."""
    import pyspark.sql.functions as F
    from nyc_data_pipeline_spark.dedup.graph import connected_components
    from nyc_data_pipeline_spark.dedup.ngram import (
        FUZZ_MAX_DIST,
        FUZZ_SHARED_MIN,
        _sp_grams,
    )

    recs = spark.createDataFrame(
        [
            (1, "acme corp", 5),
            (2, "acme cor", 0),
            (3, "acme co", 0),
            (9, "zenith widgets", 3),
        ],
        "rec_id bigint, name string, w bigint",
    )
    grams = recs.selectExpr(
        "rec_id", "name", f"{_sp_grams('name')} AS g"
    ).distinct()
    a, b = grams.alias("a"), grams.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.rec_id") < F.col("b.rec_id")),
        )
        .groupBy(
            F.col("a.rec_id").alias("u"),
            F.col("a.name").alias("un"),
            F.col("b.rec_id").alias("v"),
            F.col("b.name").alias("vn"),
        )
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= FUZZ_SHARED_MIN)
    )
    edges = cand.where(F.levenshtein("un", "vn") <= FUZZ_MAX_DIST).select(
        "u", "v"
    )
    got = {(r.u, r.v) for r in edges.collect()}
    assert (1, 2) in got and (2, 3) in got
    assert (1, 3) not in got  # 2 edits apart: NOT a direct match
    cc = {r.node: r.rep_id for r in connected_components(edges).collect()}
    assert cc[1] == cc[2] == cc[3] == 1  # the chain collapses anyway
    assert 9 not in cc  # singleton never enters the edge set
