"""Statistics & observability operators (operators/stats.py).

Oracle tests cover maint_analyze_stats and obs_metrics via the
shared parametrized suite; here we pin the properties the oracle
can't express: CMS error bounds, sketch mergeability, and that the
catalog stats actually round-trip through ANALYZE.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gmt_dbt_spark.catalog import table
from gmt_dbt_spark.operators.stats import (
    _CMS_DEPTH_SEEDS,
    _CMS_WIDTH,
    build_cms,
    cms_estimate,
)
from gmt_dbt_spark.registry import all_queries

from tests.conftest import SF_DIR


def test_cms_never_underestimates_and_bounds_error(spark):
    """CMS guarantee: estimate >= true count for EVERY key; and with
    depth 4 the min-over-rows estimate should stay within the classic
    e*N/w additive bound (loose check: 3x) for all probed keys."""
    orders = table(spark, SF_DIR, "orders")
    n_total = orders.count()
    cms = build_cms(orders, "o_custkey")
    truth = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("true_cnt"))
    probes = truth.orderBy(F.desc("true_cnt"), "o_custkey").limit(50)
    est = cms_estimate(spark, cms, probes.select("o_custkey"), "o_custkey")
    joined = est.join(truth, "o_custkey").collect()
    assert len(joined) == 50
    bound = 3.0 * 2.718 * n_total / _CMS_WIDTH
    for r in joined:
        assert r.est_count >= r.true_cnt, r
        assert r.est_count - r.true_cnt <= bound, r


def test_cms_shard_merge_equals_whole(spark):
    """The 100 TB property: sketching shards independently and
    summing cell counts must equal sketching the whole input —
    partial sketches from 1000 executors union into one."""
    orders = table(spark, SF_DIR, "orders")
    whole = build_cms(orders, "o_custkey")
    even = build_cms(orders.filter(F.col("o_orderkey") % 2 == 0), "o_custkey")
    odd = build_cms(orders.filter(F.col("o_orderkey") % 2 == 1), "o_custkey")
    merged = (
        even.unionByName(odd)
        .groupBy("depth", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_cms_is_bounded_size(spark):
    """Sketch cardinality never exceeds depth x width, regardless of
    input rows — the whole point of the summary."""
    cms = build_cms(table(spark, SF_DIR, "orders"), "o_custkey")
    assert cms.count() <= len(_CMS_DEPTH_SEEDS) * _CMS_WIDTH


def test_analyze_stats_round_trip(spark):
    """The row counts reported by maint_analyze_stats come from the
    CATALOG (post-ANALYZE), and must equal a fresh exact count."""
    out = {
        r.table_name: r.n_rows
        for r in all_queries()["maint_analyze_stats"](spark, SF_DIR).collect()
    }
    assert out["orders"] == table(spark, SF_DIR, "orders").count()
    assert out["lineitem"] == table(spark, SF_DIR, "lineitem").count()


def test_observation_metrics_single_job(spark):
    """obs_metrics must not rescan: the observe aggregates ride the
    counting pass. We assert the metric values equal an independent
    aggregate — and that the query result is exactly one row."""
    df = all_queries()["obs_metrics"](spark, SF_DIR)
    rows = df.collect()
    assert len(rows) == 1
    li = table(spark, SF_DIR, "lineitem").filter(F.col("l_returnflag") == "R")
    check = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").alias("s"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    ).collect()[0]
    r = rows[0]
    assert (r.n_rows, r.sum_qty, r.min_price, r.max_price) == (
        check.n, check.s, check.lo, check.hi,
    )


def test_approx_topk_exact_below_capacity(spark):
    """With |event_type| far below the sketch capacity, approx_top_k
    must return the EXACT top-5 counts (no eviction has happened) —
    the small-data anchor that the sketch plumbing is sound."""
    from gmt_dbt_spark.registry import all_queries

    sf_dir = "/root/testdata/sf0.001"
    got = {
        r["event_type"]: r["approx_count"]
        for r in all_queries()["agg_approx_topk"](spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"))
        .limit(5)
        .collect()
    }
    assert got == exact


def test_volume_drift_inclusive_boundaries(spark, tmp_path):
    """An EXACT halving or doubling must alert (inclusive contract) —
    the fixture series never lands exactly on the boundary, so pin it
    with a synthetic day series: 4 -> 2 (halved), 2 -> 4 (doubled),
    4 -> 3 (fine)."""
    import os

    from pyspark.sql import functions as F

    from gmt_dbt_spark.plans.dq import dq_volume_drift

    rows = []
    eid = 0
    for day, n in (("2020-01-01", 4), ("2020-01-02", 2), ("2020-01-03", 4),
                   ("2020-01-04", 3)):
        for _ in range(n):
            rows.append((eid, f"{day} 12:00:00", eid % 3, "view", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.mode("overwrite").parquet(os.path.join(tmp_path, "events.parquet"))
    out = {str(r.day): r.drift_alert for r in dq_volume_drift(spark, str(tmp_path)).collect()}
    assert out["2020-01-01"] is False   # no previous day
    assert out["2020-01-02"] is True    # exact halving alerts
    assert out["2020-01-03"] is True    # exact doubling alerts
    assert out["2020-01-04"] is False   # 4 -> 3 is within band


# ---- events_match_recognize (r7): NFA reference pins -----------------


def _python_mr_nfa(events):
    """The sequential state machine the relational plan must equal:
    events = [(event_id, ts_str, user_id, event_type)]; per user,
    scan in (ts, event_id) order — anchor on the first view, a later
    click arms completion, a later purchase completes, ERROR resets,
    first match wins. Returns {user: (matched, start_ts, end_ts)}."""
    byu = {}
    for eid, ts, u, et in events:
        byu.setdefault(u, []).append((ts, eid, et))
    out = {}
    for u, evs in byu.items():
        st, anchor = 0, None
        res = (False, None, None)
        for ts, eid, et in sorted(evs):
            if et == "error":
                st, anchor = 0, None
            elif et == "view" and st == 0:
                st, anchor = 1, ts
            elif et == "click" and st == 1:
                st = 2
            elif et == "purchase" and st == 2:
                res = (True, anchor, ts)
                break
        out[u] = res
    return out


def _write_events(spark, tmp_path, events):
    import os

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(e[0], e[1], e[2], e[3], 1.0, "{}") for e in events],
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.mode("overwrite").parquet(os.path.join(tmp_path, "events.parquet"))
    return str(tmp_path)


def test_match_recognize_planted_sequences(spark, tmp_path):
    """Every defining CEP behavior on one fixture, expectations by
    hand (the NFA reference corroborates): plain match, error-reset
    (negative), re-anchor after reset (start = the SECOND view),
    exclusion between click and purchase (negative), wrong order
    (negative), first-view anchoring, same-ts tie broken by
    event_id (click sorts before the view -> negative), and
    first-match-wins on a double sequence."""
    from gmt_dbt_spark.registry import all_queries

    T = "2024-01-01 00:00:{:02d}"
    ev = []
    eid = 0

    def add(u, seq):
        nonlocal eid
        for i, et in enumerate(seq):
            ev.append((eid, T.format(i), u, et))
            eid += 1

    add(1, ["view", "click", "purchase"])                    # match
    add(2, ["view", "error", "click", "purchase"])           # reset kills it
    add(3, ["view", "error", "view", "click", "purchase"])   # re-anchor
    add(4, ["view", "click", "error", "purchase"])           # exclusion
    add(5, ["purchase", "click", "view"])                    # wrong order
    add(6, ["view", "view", "click", "purchase"])            # first view
    add(8, ["view", "click", "purchase", "view", "click", "purchase"])
    # user 7: click and view share ts; click's LOWER event_id sorts it
    # first, so no view precedes the click -> no match
    ev.append((eid, T.format(0), 7, "click")); eid += 1
    ev.append((eid, T.format(0), 7, "view")); eid += 1
    ev.append((eid, T.format(1), 7, "purchase")); eid += 1

    d = _write_events(spark, tmp_path, ev)
    got = {
        r.user_id: (
            r.matched,
            str(r.match_start_ts) if r.match_start_ts else None,
            str(r.match_end_ts) if r.match_end_ts else None,
        )
        for r in all_queries()["events_match_recognize"](spark, d).collect()
    }
    s = lambda i: T.format(i)  # noqa: E731
    assert got[1] == (True, s(0), s(2))
    assert got[2] == (False, None, None)
    assert got[3] == (True, s(2), s(4))   # re-anchored at the 2nd view
    assert got[4] == (False, None, None)
    assert got[5] == (False, None, None)
    assert got[6] == (True, s(0), s(3))   # anchored at the FIRST view
    assert got[7] == (False, None, None)  # tie-break: click before view
    assert got[8] == (True, s(0), s(2))   # first match wins
    # cross-check every row against the NFA reference
    want = {
        u: (m, a, b)
        for u, (m, a, b) in _python_mr_nfa(
            [(e[0], e[1], e[2], e[3]) for e in ev]
        ).items()
    }
    assert {u: (m, a, b) for u, (m, a, b) in
            ((u, v) for u, v in got.items())} == want


def test_match_recognize_matches_nfa_randomized(spark, tmp_path):
    """Randomized equivalence: 40 users x random event logs (with ts
    collisions), the relational windows plan must equal the
    sequential NFA on every user."""
    import random

    from gmt_dbt_spark.registry import all_queries

    rng = random.Random(99)
    ev = []
    eid = 0
    types = ["view", "click", "purchase", "error", "signup"]
    for u in range(40):
        t = 0
        for _ in range(rng.randint(0, 25)):
            t += rng.choice([0, 0, 1, 2])  # frequent ts collisions
            ev.append(
                (
                    eid,
                    f"2024-02-01 00:{t // 60:02d}:{t % 60:02d}",
                    u,
                    rng.choice(types),
                )
            )
            eid += 1
    # shuffle event_ids relative to time to exercise the tiebreak
    rng.shuffle(ev)
    ev = [(i, e[1], e[2], e[3]) for i, e in enumerate(ev)]
    d = _write_events(spark, tmp_path / "rand", ev)
    want = _python_mr_nfa(ev)
    got = {
        r.user_id: (
            r.matched,
            str(r.match_start_ts) if r.match_start_ts else None,
            str(r.match_end_ts) if r.match_end_ts else None,
        )
        for r in all_queries()["events_match_recognize"](spark, d).collect()
    }
    assert got == want


# ---- KMV bottom-k sketches (r8): pure-Python reference pins ---------


def _py_kmv_hash(v):
    import hashlib

    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def _py_kmv_est(hashes, k=64):
    sk = sorted(hashes)[:k]
    if len(sk) < k:
        return len(sk), sk[-1] if sk else None, len(sk)
    return k, sk[-1], ((k - 1) * (1 << 60)) // sk[-1]


def test_kmv_distinct_matches_python_reference(spark, tmp_path):
    """The whole sketch — k_used, kth hash, estimate — derived
    independently via hashlib over the planted keys, for (a) a group
    with fewer distinct keys than K (sketch not full → estimate
    EXACT) and (b) a 1000-distinct group (full sketch → the
    bottom-64 estimator, asserted bit-equal to the reference AND
    inside the 3-sigma ~38% KMV bound around the truth)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gmt_dbt_spark.registry import all_queries

    small = list(range(40))          # < K=64 → exact
    big = list(range(1000, 2000))    # 1000 distinct → estimated
    rows_key = ["1-URGENT"] * len(small) * 2 + ["2-HIGH"] * len(big)
    rows_ck = small * 2 + big        # duplicates must not matter
    d = tmp_path / "kmv"
    d.mkdir()
    pq.write_table(
        pa.table({"o_orderpriority": rows_key, "o_custkey": rows_ck}),
        str(d / "orders.parquet"),
    )
    got = {
        r.o_orderpriority: (r.k_used, r.h_k, r.est_distinct, r.exact_distinct)
        for r in all_queries()["agg_kmv_distinct"](spark, str(d)).collect()
    }
    ku, hk, est = _py_kmv_est([_py_kmv_hash(v) for v in small])
    assert got["1-URGENT"] == (ku, hk, est, 40)
    assert est == 40  # non-full sketch is exact
    ku, hk, est = _py_kmv_est([_py_kmv_hash(v) for v in big])
    assert got["2-HIGH"] == (ku, hk, est, 1000)
    assert abs(est - 1000) * 8 <= 3 * 1000  # 3σ at K=64 (σ≈1/8)


def test_kmv_intersect_matches_python_reference(spark, tmp_path):
    """Planted overlap: A = ids 0..599, B = ids 400..999 → true
    intersection 200. Full surface (k_used, n_common, est_union,
    est_inter, exact_inter) derived independently in Python from the
    same md5 arithmetic; est_inter must match bit-for-bit."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gmt_dbt_spark.registry import all_queries

    a_ids = list(range(600))
    b_ids = list(range(400, 1000))
    d = tmp_path / "kmvint"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "o_orderpriority": ["1-URGENT"] * len(a_ids)
                + ["2-HIGH"] * len(b_ids),
                "o_custkey": a_ids + b_ids,
            }
        ),
        str(d / "orders.parquet"),
    )
    K = 64
    ha = sorted(_py_kmv_hash(v) for v in a_ids)[:K]
    hb = sorted(_py_kmv_hash(v) for v in b_ids)[:K]
    usk = sorted(set(ha) | set(hb))[:K]
    k_used, h_k = len(usk), usk[-1]
    est_union = ((K - 1) * (1 << 60)) // h_k if k_used == K else k_used
    n_common = sum(1 for h in usk if h in set(ha) and h in set(hb))
    est_inter = (n_common * est_union) // k_used
    r = all_queries()["agg_kmv_intersect"](spark, str(d)).collect()[0]
    assert (r.k_used, r.n_common, r.est_union, r.est_inter, r.exact_inter) == (
        k_used,
        n_common,
        est_union,
        est_inter,
        200,
    )


def test_kmv_shard_merge_equals_whole():
    """Mergeability (the property that makes KMV a distributed
    sketch, the `test_cms_shard_merge_equals_whole` twin): bottom-k
    of the UNION of per-shard bottom-k sketches equals the bottom-k
    of the whole key set — for any sharding. Checked on randomized
    shardings of 1000 keys with the same md5 arithmetic the operator
    uses; also pins that merge never needs more than K values per
    shard."""
    import random

    K = 64
    keys = list(range(5000, 6000))
    hashes = sorted(_py_kmv_hash(v) for v in keys)
    whole = hashes[:K]
    for seed in (3, 7, 19):
        rng = random.Random(seed)
        n_shards = rng.randint(2, 9)
        shards = [[] for _ in range(n_shards)]
        for v in keys:
            shards[rng.randrange(n_shards)].append(v)
        merged = sorted(
            {h for s in shards for h in sorted(_py_kmv_hash(v) for v in s)[:K]}
        )[:K]
        assert merged == whole, seed


def test_bench_band_adjudication_rules():
    """tools/bench_band.py (r9, VERDICT item 6): the standing
    uniform-ratio rule as code — a uniform host shift is noise even
    above the band; a concentrated single-query blowup is a suspect
    regression; tiny absolute deltas never flag."""
    import json

    from tools.bench_band import BAND_PATH, adjudicate

    band = json.load(open(BAND_PATH))
    ref = band["reference_queries"]

    # identical run → in-band
    v = adjudicate({"value": sum(ref.values()), "queries": dict(ref)}, band)
    assert v["verdict"] in ("in-band", "fast") and not v["outliers"]

    # uniform 1.6x host shift (total above band) → noise, not regression
    shifted = {q: t * 1.6 for q, t in ref.items()}
    v = adjudicate({"value": sum(shifted.values()), "queries": shifted}, band)
    assert v["verdict"] == "host-shift-noise", v
    assert not v["outliers"]

    # one query 3x (material seconds), rest flat → suspect-regression
    spiked = dict(ref)
    spiked["dedup_simhash"] = ref["dedup_simhash"] * 3
    v = adjudicate({"value": sum(spiked.values()), "queries": spiked}, band)
    assert v["verdict"] == "suspect-regression"
    assert list(v["outliers"]) == ["dedup_simhash"]

    # a 0.1 s query tripling is immaterial → no flag
    tiny = dict(ref)
    tiny["topk"] = 0.28  # ref 0.202 → ratio 1.39; and even 3x stays < 0.3s delta
    v = adjudicate({"value": sum(tiny.values()), "queries": tiny}, band)
    assert v["verdict"] == "in-band"

    # r10 rebase: a query with a RECORDED volatile history carries
    # its own threshold — its observed-max ratio must NOT flag, but
    # exceeding even that still does (the override widens, never
    # disables)
    per_q = band["per_query_outlier_ratio"]
    assert "pipeline_reference_e2e" in per_q and per_q["pipeline_reference_e2e"] > band["outlier_ratio"]
    vol = dict(ref)
    vol["pipeline_reference_e2e"] = ref["pipeline_reference_e2e"] * 2.5  # the r9 driver value's ratio
    v = adjudicate({"value": sum(vol.values()), "queries": vol}, band)
    assert v["verdict"] == "in-band", v
    vol["pipeline_reference_e2e"] = ref["pipeline_reference_e2e"] * 3.2  # past its own threshold
    v = adjudicate({"value": sum(vol.values()), "queries": vol}, band)
    assert v["verdict"] == "suspect-regression"
    assert list(v["outliers"]) == ["pipeline_reference_e2e"]


def _kmv_skew_dir(tmp_path, name, groups, custkeys):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / name
    d.mkdir()
    pq.write_table(
        pa.table({"o_orderpriority": groups, "o_custkey": custkeys}),
        str(d / "orders.parquet"),
    )
    return str(d)


def test_kmv_skew_mega_group(spark, tmp_path):
    """r9 adversarial-skew drill (VERDICT item 7), leg 1: EVERY key
    in ONE group — the worst case for any per-group top-k. The
    map-side Partial WindowGroupLimit must still bound what shuffles:
    each task retains at most K rows for the group pre-exchange, so
    the shuffle carries ≤ K·n_tasks 8-byte hashes and the final heap
    sees ≤ K·n_tasks rows — NEVER the 20k-key distinct relation.
    Memory bound: one K-row heap per (task, group) = K·8 B here.
    Estimator sanity on the full sketch: |est/N - 1| within 3σ of
    the ~1/sqrt(K-2) KMV standard error."""
    import io
    import contextlib

    from gmt_dbt_spark.operators.stats import KMV_K
    from gmt_dbt_spark.registry import all_queries

    n = 20_000
    d = _kmv_skew_dir(
        tmp_path, "kmv_mega", ["only"] * n, list(range(n))
    )
    df = all_queries()["agg_kmv_distinct"](spark, d)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    tree = plan.split("\n\n(1)")[0]
    assert tree.count("WindowGroupLimit") == 2, tree  # Partial + Final
    assert "Partial" in plan, plan

    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.exact_distinct == n and r.k_used == KMV_K
    sigma = 1.0 / (KMV_K - 2) ** 0.5
    assert abs(r.est_distinct / n - 1.0) <= 3 * sigma, r


def test_kmv_skew_all_groups_distinct(spark, tmp_path):
    """Leg 2: |groups| == |rows| (every key its own group — the
    opposite skew). The sketch relation is |groups| rows of one hash
    each; k_used = 1 < K so the estimator takes the EXACT branch and
    est == exact == 1 for every group; the WindowGroupLimit pair
    stays in the plan (it is a no-op cut, not a blowup)."""
    import io
    import contextlib

    from gmt_dbt_spark.registry import all_queries

    n = 5_000
    d = _kmv_skew_dir(
        tmp_path, "kmv_flat", [f"g{i}" for i in range(n)], list(range(n))
    )
    df = all_queries()["agg_kmv_distinct"](spark, d)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    tree = buf.getvalue().split("\n\n(1)")[0]
    assert tree.count("WindowGroupLimit") == 2, tree

    rows = df.collect()
    assert len(rows) == n
    assert all(r.k_used == 1 and r.est_distinct == 1 and
               r.exact_distinct == 1 for r in rows)
