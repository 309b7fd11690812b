"""Behavioral invariants for the round-5 second batch (gap-fill,
interval-overlap join, PageRank, Count-Min, cross-chunk dedup, LM
novelty) beyond oracle parity."""

import pyspark.sql.functions as F

from nyc_data_pipeline_spark.registry import QUERIES, load_all

load_all()


def test_gapfill_spine_is_dense_and_locf_total(spark, sf_dir):
    """Spine cardinality is exactly |keys| x |hours|; LOCF is non-null
    everywhere at/after each key's first observation and equals the
    observation wherever one exists."""
    rows = QUERIES["window_gapfill_locf"](spark, sf_dir).collect()
    keys = {r.event_type for r in rows}
    hours = {r.epoch_hour for r in rows}
    assert len(rows) == len(keys) * (max(hours) - min(hours) + 1)
    by_key = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.epoch_hour)):
        seen = by_key.setdefault(r.event_type, [False])
        if r.observed is not None:
            seen[0] = True
            assert r.locf == r.observed and not r.is_filled
        elif seen[0]:
            assert r.locf is not None and r.is_filled
        else:
            assert r.locf is None and not r.is_filled


def test_interpolate_exact_on_observed_and_bracketed(spark, sf_dir):
    """At observed cells the rational interpolation reproduces the
    observation exactly (num == v * den); gap cells carry a bracket
    strictly containing their hour."""
    rows = QUERIES["window_interpolate_linear"](spark, sf_dir).collect()
    n_gap_interp = 0
    for r in rows:
        if r.interp_num is not None:
            assert r.interp_den > 0  # never the 0/0 degenerate rational
        if r.observed is not None:
            assert r.interp_den == 1  # canonical form at observed cells
            assert int(r.interp_num) == r.observed * r.interp_den
        elif r.interp_num is not None:
            n_gap_interp += 1
    assert n_gap_interp > 0  # the fixture has interpolatable gaps


def test_interval_overlap_matches_naive_theta_join(spark, sf_dir):
    """The bin-and-residual equi-join returns exactly the pairs the
    naive theta join returns, with non-negative closed-interval
    overlaps."""
    from nyc_data_pipeline_spark.operators.intervals import overlap_join

    a = spark.createDataFrame(
        [(1, 0, 50), (2, 100, 7_200_000_000), (3, 8_000_000_000, 9_000_000_000)],
        "aid long, start_us long, end_us long",
    )
    b = spark.createDataFrame(
        [(10, 40, 120), (20, 7_199_999_999, 8_500_000_000), (30, 99, 99)],
        "bid long, start_us long, end_us long",
    )
    got = {
        (r.aid, r.bid, r.overlap_us)
        for r in overlap_join(a, b, ["aid"], ["bid"]).collect()
    }
    naive = {
        (ra.aid, rb.bid, min(ra.end_us, rb.end_us) - max(ra.start_us, rb.start_us))
        for ra in a.collect()
        for rb in b.collect()
        if ra.start_us <= rb.end_us and rb.start_us <= ra.end_us
    }
    assert got == naive
    assert all(o >= 0 for (_, _, o) in got)


def test_pagerank_teleport_floor_and_hub_ordering(spark, sf_dir):
    """Isolated docs settle at exactly the teleport floor; every rank
    is at least the floor; connected docs strictly exceed it; total
    degree is even (symmetrized edges)."""
    from nyc_data_pipeline_spark.operators.pagerank import SCALE

    rows = QUERIES["graph_pagerank"](spark, sf_dir).collect()
    floor = (15 * SCALE) // 100
    ranks = [int(r.rank) for r in rows]  # exact decimal-string carrier
    for r, rank in zip(rows, ranks):
        assert rank >= floor
        if r.degree == 0:
            assert rank == floor
    assert sum(r.degree for r in rows) % 2 == 0
    if any(r.degree > 0 for r in rows):
        assert max(ranks) > floor


def test_cms_never_undercounts(spark, sf_dir):
    """CMS point estimates dominate the exact counts (the one-sided
    error guarantee), and `overestimate` is their exact difference."""
    rows = QUERIES["approx_cms_heavy_hitters"](spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.cms_estimate >= r.exact_count
        assert r.overestimate == r.cms_estimate - r.exact_count


def test_cross_chunk_share_detects_injected_duplicate(spark, sf_dir):
    """A verbatim re-ingest of a document makes every chunk of BOTH
    copies shared; bounds hold corpus-wide."""
    from nyc_data_pipeline_spark.pipelines.mixing import dedup_cross_chunk_share

    rows = dedup_cross_chunk_share(spark, sf_dir).collect()
    for r in rows:
        assert 0 <= r.n_shared_chunks <= r.n_chunks
    # Two identical docs: every chunk of both must count as shared.
    two = spark.createDataFrame(
        [(1, "alpha beta gamma delta " * 80), (2, "alpha beta gamma delta " * 80)],
        "doc_id long, text string",
    )
    from nyc_data_pipeline_spark.functions.text import spark_token_hashes, spark_tokens
    from nyc_data_pipeline_spark.pipelines.mixing import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        HASH_MOD,
    )

    t = two.selectExpr(
        "doc_id", f"{spark_token_hashes(spark_tokens('text'))} AS hs"
    ).selectExpr("doc_id", "hs", "CAST(size(hs) AS BIGINT) AS n_tok")
    chunks = t.select(
        "doc_id",
        "hs",
        "n_tok",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor((F.col("n_tok") - 1) / CHUNK_STRIDE).cast("bigint"),
            )
        ).alias("ci"),
    ).filter(F.col("ci") * CHUNK_STRIDE < F.col("n_tok"))
    f = chunks.selectExpr(
        "doc_id",
        f"aggregate(slice(hs, ci * {CHUNK_STRIDE} + 1, "
        f"CAST(least(ci * {CHUNK_STRIDE} + {CHUNK_SIZE}, n_tok) "
        f"- ci * {CHUNK_STRIDE} AS INT)), "
        f"CAST(0 AS BIGINT), (a, x) -> (a * 31 + x) % {HASH_MOD}) AS fp",
    )
    fd = f.groupBy("fp").agg(F.countDistinct("doc_id").alias("nd"))
    per_doc = (
        f.join(fd, "fp")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)).alias("n_shared"),
        )
        .collect()
    )
    for r in per_doc:
        assert r.n_shared == r.n_chunks  # identical docs: fully shared


def test_lm_novelty_bounds_and_coverage(spark, sf_dir):
    """0 <= n_in_lm <= n_bigrams for every doc; the LM explains some
    mass somewhere (the corpus's own top bigrams must self-hit)."""
    rows = QUERIES["text_lm_novelty"](spark, sf_dir).collect()
    assert rows
    assert all(0 <= r.n_in_lm <= r.n_bigrams for r in rows)
    assert any(r.n_in_lm > 0 for r in rows)


def test_cusum_closed_form_equals_recursion(spark, sf_dir):
    """The windowed closed form must equal the textbook recursion
    s_t = max(0, s_{t-1} + d_t) replayed row-by-row per event type."""
    from nyc_data_pipeline_spark.catalog import load_table
    from nyc_data_pipeline_spark.operators.analytics import CUSUM_MICRO

    got = {
        (r.event_type, r.event_id): (r.cusum_pos, r.cusum_neg)
        for r in QUERIES["events_cusum_drift"](spark, sf_dir).collect()
    }
    ev = sorted(
        load_table(spark, sf_dir, "events")
        .select("event_type", "event_id", "ts", "value")
        .collect(),
        key=lambda r: (r.event_type, r.ts, r.event_id),
    )
    import math
    from collections import defaultdict

    sums = defaultdict(lambda: [0, 0])
    for r in ev:
        s = sums[r.event_type]
        s[0] += math.floor(r.value * CUSUM_MICRO)
        s[1] += 1
    target = {k: v[0] // v[1] for k, v in sums.items()}
    state = defaultdict(lambda: [0, 0])  # pos, neg
    for r in ev:
        d = math.floor(r.value * CUSUM_MICRO) - target[r.event_type]
        st = state[r.event_type]
        st[0] = max(0, st[0] + d)
        st[1] = max(0, st[1] - d)
        assert got[(r.event_type, r.event_id)] == (st[0], st[1]), r


def test_equidepth_buckets_are_balanced(spark, sf_dir):
    """Within each month, bucket sizes differ by at most one row and
    boundaries are non-decreasing across buckets."""
    rows = QUERIES["agg_equidepth_histogram"](spark, sf_dir).collect()
    by_month = {}
    for r in rows:
        by_month.setdefault(r.month, []).append(r)
    for month, bs in by_month.items():
        ns = [r.n for r in bs]
        assert max(ns) - min(ns) <= 1, (month, ns)
        bs = sorted(bs, key=lambda r: r.bucket)
        for a, b in zip(bs, bs[1:]):
            assert a.hi <= b.lo or abs(a.hi - b.lo) < 1e-9


def test_matryoshka_overlap_bounds(spark, sf_dir):
    rows = QUERIES["sim_matryoshka_recall"](spark, sf_dir).collect()
    assert len(rows) == 10
    assert all(0 <= r.n_overlap <= r.k for r in rows)


def test_rollup_levels_agree(spark, sf_dir):
    """Each grain's totals must reproduce the same corpus totals —
    the mergeability contract the hierarchy relies on."""
    rows = QUERIES["rollup_hierarchy_reuse"](spark, sf_dir).collect()
    tot = {}
    for r in rows:
        k = (r.grain, r.event_type)
        n, s = tot.get(k, (0, 0))
        tot[k] = (n + r.n, s + r.sum_micro)
    types = {et for (_, et) in tot}
    for et in types:
        assert tot[("hour", et)] == tot[("day", et)] == tot[("week", et)]


def test_scd2_pit_equals_direct_window_form(spark, sf_dir):
    """The dim-build + PIT-join formulation must equal the direct
    windowed computation (tier from cumulative spend before each
    order) — two formulations, one truth."""
    import math
    from collections import defaultdict

    from nyc_data_pipeline_spark.catalog import load_table
    from nyc_data_pipeline_spark.operators.joins import SCD2_T1, SCD2_T2

    got = {
        r.o_orderkey: r.tier
        for r in QUERIES["join_scd2_pit"](spark, sf_dir).collect()
    }
    orders = sorted(
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .collect(),
        key=lambda r: (r.o_custkey, r.o_orderdate, r.o_orderkey),
    )
    cum = defaultdict(int)
    for r in orders:
        before = cum[r.o_custkey]
        tier = 0 if before < SCD2_T1 else (1 if before < SCD2_T2 else 2)
        assert got[r.o_orderkey] == tier, (r.o_orderkey, got[r.o_orderkey], tier)
        cum[r.o_custkey] += math.floor(r.o_totalprice * 100)
    # Tiers are monotone per customer (spend only accumulates).
    last = {}
    for r in orders:
        t = got[r.o_orderkey]
        assert t >= last.get(r.o_custkey, 0)
        last[r.o_custkey] = t


def test_dq_expectations_all_healthy(spark, sf_dir):
    """The fixture warehouse passes every expectation (all-zero
    violations), and every check sees the full table."""
    rows = QUERIES["dq_expectations_orders"](spark, sf_dir).collect()
    assert {r.check_name for r in rows} == {
        "o_orderkey_unique",
        "o_orderdate_not_null",
        "o_totalprice_positive",
        "o_orderstatus_domain",
        "o_custkey_fk",
    }
    n = rows[0].n_checked
    for r in rows:
        assert r.n_violations == 0 and r.n_checked == n


def test_dq_drift_cells_conserve_totals(spark, sf_dir):
    """Per-type cell counts sum to the slice totals, and the drift
    flag matches the proportion test recomputed in Python rationals."""
    from fractions import Fraction

    rows = QUERIES["dq_psi_bins_drift"](spark, sf_dir).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, cells in by_type.items():
        assert sum(c.n_ref for c in cells) == cells[0].t_ref
        assert sum(c.n_cur for c in cells) == cells[0].t_cur
        for c in cells:
            expected = abs(
                Fraction(c.n_cur, c.t_cur) - Fraction(c.n_ref, c.t_ref)
            ) > Fraction(5, 100)
            assert c.drifted == expected, (et, c.bin)


def test_phash_near_dup_recrawl_pairs_collapse(spark, sf_dir):
    """Every injected re-crawl copy must map to its original's rep
    (identical fingerprint -> all bands collide); originals keep
    rep <= own id."""
    rows = QUERIES["mm_phash_near_dup"](spark, sf_dir).collect()
    rep = {r.doc_id: r.rep_id for r in rows}
    for doc_id, r in rep.items():
        assert r <= doc_id
        if doc_id >= 1_000_000:
            assert r == rep[doc_id - 1_000_000]


def test_ses_fold_matches_python_recurrence(spark, sf_dir):
    """The cross-engine fold must equal the recurrence replayed in
    Python per user."""
    import math
    from collections import defaultdict

    from nyc_data_pipeline_spark.catalog import load_table

    got = {
        r.user_id: (r.n, r.level_micro)
        for r in QUERIES["grouped_ses_forecast"](spark, sf_dir).collect()
    }
    ev = sorted(
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    state = {}
    counts = defaultdict(int)
    for r in ev:
        y = math.floor(r.value * 1_000_000)
        state[r.user_id] = (
            y if r.user_id not in state else (state[r.user_id] + y) // 2
        )
        counts[r.user_id] += 1
    assert got == {u: (counts[u], s) for u, s in state.items()}


def test_duplicate_payments_finds_exactly_the_replays(spark, sf_dir):
    """With no natural double-charges in the fixture, the sweep must
    find exactly the injected replay pairs (gap 0, replay key =
    original + 10M) — no false positives."""
    rows = QUERIES["dq_duplicate_payments"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.second_key == r.first_key + 10_000_000
        assert r.first_key % 137 == 0
        assert r.gap_hours == 0


def test_recursive_hierarchy_depth_and_root(spark, sf_dir):
    """Every customer's (root, depth) must match the arithmetic chain
    custkey -> custkey//7 -> ... -> root < 7."""
    rows = QUERIES["sql_recursive_hierarchy"](spark, sf_dir).collect()
    got = {r.custkey: (r.root, r.depth) for r in rows}
    assert got  # non-empty and covers every customer
    for ck, (root, depth) in got.items():
        c, d = ck, 0
        while c >= 7:
            c //= 7
            d += 1
        assert (root, depth) == (c, d), ck


def test_geo_cells_consistent_and_radius_subset(spark, sf_dir):
    """Hotspot cells are ranked correctly; the radius probe's members
    are a subset of its ring candidates and match a Python replay."""
    hot = QUERIES["geo_grid_hotspots"](spark, sf_dir).collect()
    assert len(hot) > 1
    ns = [r.n for r in hot]
    assert ns == sorted(ns, reverse=True)
    probe = QUERIES["geo_radius_probe"](spark, sf_dir).collect()
    assert len(probe) == 1
    p = probe[0]
    assert 0 <= p.n_within <= p.n_candidates
    # Python replay of the synthesized geometry.
    from nyc_data_pipeline_spark.catalog import load_table
    from nyc_data_pipeline_spark.operators.geo import (
        CELL,
        LAT0,
        LON0,
        MIX_LAT,
        MIX_LON,
        R_MICRO,
        SPAN,
    )

    ids = [r.event_id for r in load_table(spark, sf_dir, "events").select("event_id").collect()]
    pts = [
        (LAT0 + (e * MIX_LAT) % SPAN, LON0 + (e * MIX_LON) % SPAN) for e in ids
    ]
    c_lat = p.cell_lat * CELL + CELL // 2
    c_lon = p.cell_lon * CELL + CELL // 2
    want_within = sum(
        (la - c_lat) ** 2 + (lo - c_lon) ** 2 <= R_MICRO * R_MICRO
        for la, lo in pts
    )
    assert p.n_within == want_within


def test_winsorize_clips_to_selected_boundaries(spark, sf_dir):
    """Boundaries are actual data values; unclipped rows pass through
    untouched; the clipped fraction stays near 2*(5%)."""
    rows = QUERIES["fn_winsorize"](spark, sf_dir).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, rs in by_type.items():
        values = {r.value for r in rs}
        clipped = [r for r in rs if r.clipped]
        for r in rs:
            if not r.clipped:
                assert r.winsorized == r.value
            else:
                assert r.winsorized in values  # a selected boundary
                assert r.winsorized != r.value
        assert len(clipped) <= 0.12 * len(rs) + 2, et


def test_mad_outliers_match_python_replay(spark, sf_dir):
    """Median, MAD, and every flag must equal a pure-Python replay of
    the lower-median order statistics in micro units."""
    import math

    from nyc_data_pipeline_spark.catalog import load_table
    from nyc_data_pipeline_spark.operators.robust import MAD_K, MICRO

    got = {
        (r.event_type, r.event_id): (r.dev_micro, r.mad_micro, r.is_outlier)
        for r in QUERIES["events_mad_outliers"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    ).collect()
    by_type = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(
            (math.floor(r.value * MICRO), r.event_id)
        )
    for et, vs in by_type.items():
        ordered = sorted(vs)
        n = len(ordered)
        med = ordered[(n + 1) // 2 - 1][0]
        devs = sorted((abs(v - med), eid) for v, eid in vs)
        mad = devs[(n + 1) // 2 - 1][0]
        for v, eid in vs:
            dev = abs(v - med)
            assert got[(et, eid)] == (dev, mad, dev > MAD_K * mad), (et, eid)


def test_langid_audit_cells_partition_corpus(spark, sf_dir):
    from nyc_data_pipeline_spark.catalog import load_table

    rows = QUERIES["text_langid_audit"](spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n for r in rows) == n_docs
    for r in rows:
        assert r.n_correct == (r.n if r.lang == r.predicted_lang else 0)


def test_dau_mau_bounds_and_replay(spark, sf_dir):
    """DAU <= MAU per day; both equal a Python set replay."""
    from nyc_data_pipeline_spark.catalog import load_table
    from nyc_data_pipeline_spark.operators.analytics import MAU_WINDOW

    got = {
        r.day: (r.dau, r.mau)
        for r in QUERIES["events_dau_mau"](spark, sf_dir).collect()
    }
    ud = set()
    for r in load_table(spark, sf_dir, "events").select("user_id", "ts").collect():
        import datetime as dt

        day = (r.ts - dt.datetime(1970, 1, 1)).days
        ud.add((r.user_id, day))
    days = {d for _u, d in ud}
    for d in days:
        dau = sum(1 for u, dd in ud if dd == d)
        mau = len({u for u, dd in ud if d - MAU_WINDOW < dd <= d})
        assert got[d] == (dau, mau), d
        assert dau <= mau


def test_open_backlog_conserves_and_stays_nonnegative(spark, sf_dir):
    """The sweep-line balance starts and ends at the boundary deltas'
    sum (0 when every order closes), and never goes negative."""
    rows = sorted(
        QUERIES["orders_open_backlog"](spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    assert rows
    running = 0
    for r in rows:
        running += r.delta
        assert r.open_orders == running
        assert r.open_orders >= 0
    assert rows[-1].open_orders == 0  # all fixture orders eventually close


def test_survival_curve_monotone_and_conserves(spark, sf_dir):
    """n_surviving is non-increasing in k, starts at n_users, and the
    per-span masses sum back to n_users."""
    rows = sorted(
        QUERIES["events_survival_curve"](spark, sf_dir).collect(),
        key=lambda r: r.day_k,
    )
    assert rows
    n_users = rows[0].n_users
    assert rows[0].n_surviving == n_users or rows[0].day_k > 0
    assert sum(r.n_at for r in rows) == n_users
    for a, b in zip(rows, rows[1:]):
        assert a.n_surviving >= b.n_surviving
        assert b.n_surviving == a.n_surviving - a.n_at


def test_duplicate_payments_orients_by_time_not_key(spark, tmp_path):
    """A genuine double-charge whose LOWER-keyed order is the LATER
    charge must still be reported, oriented earlier->later (the key is
    only the tiebreak for same-instant pairs).  Runs the sweep on a
    crafted orders table: pair (5 earlier, 2 later, 12h apart) and a
    same-instant pair (7, 9)."""
    import datetime as dt

    rows = [
        (2, 1, "O", 100.0, dt.datetime(1995, 6, 2, 0, 0), "1-URGENT"),
        (5, 1, "O", 100.0, dt.datetime(1995, 6, 1, 12, 0), "1-URGENT"),
        (7, 3, "O", 55.5, dt.datetime(1995, 7, 1, 9, 0), "2-HIGH"),
        (9, 3, "O", 55.5, dt.datetime(1995, 7, 1, 9, 0), "2-HIGH"),
        # unrelated: same customer/amount but 3 days apart -> no pair
        (11, 4, "O", 77.0, dt.datetime(1995, 8, 1, 0, 0), "3-MEDIUM"),
        (13, 4, "O", 77.0, dt.datetime(1995, 8, 4, 0, 0), "3-MEDIUM"),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = {
        (r.first_key, r.second_key, r.gap_hours)
        for r in QUERIES["dq_duplicate_payments"](spark, str(tmp_path)).collect()
    }
    assert got == {(5, 2, 12), (7, 9, 0)}
