"""Pattern-13 order-audit sweep (r9, VERDICT r8 item 4).

The driver's correctness gate hashes each query's output as a
MULTISET — row order never enters the hash. Pattern 13
(VERIFICATION.md: r8's reversed-pieces bug lived a full round behind
order-insensitive consumers) says every surface whose SEMANTICS are
order-bearing therefore needs the order to reach the hash some other
way, or a written waiver. `sort_order_audit` closed the global sort;
this sweep enumerates ALL order-suspicious registry ids by name
pattern and forces each to carry a classification:

  stamped        an explicit position/rank column in the output —
                 the (position ↔ row) assignment is hash-visible.
  twin           the op itself is hash-invisible but a registered
                 position-stamped twin covers the same order spec.
  selection      a TOTAL order (unique tiebreak, named in `why`)
                 decides WHICH rows survive (top-k / limit / page /
                 per-key sample) — an order bug changes the selected
                 set, which the multiset hash sees. The audit
                 obligation is the tiebreak's totality, not a stamp.
  value-carried  order-derived VALUES are in the output (first/last,
                 LOCF carry, path strings, running-sum pack offsets,
                 session boundaries) — an order bug changes those
                 values. `why` names the total order.
  canonicalized  the output deliberately ERASES input order with an
                 explicit sort (array_sort/sort_array before
                 serialization) — a multiset surface by design;
                 nothing order-bearing remains to audit.
  layout         physical write-layout op; ordering effects are
                 pinned by dedicated storage tests, not the oracle.
  not-order-bearing  name-pattern false positive (no order
                 semantics at all).

A NEW operator matching the pattern cannot register without tripping
the sweep until classified here — the GATES enforcement model.
Evidence tuples, where named, must exist (checked mechanically).
"""

from __future__ import annotations

import os
import re

from gmt_dbt_spark.registry import all_queries

_ORDER_NAME_RE = re.compile(
    r"sort|limit|topk|paging|collect|string_agg|path|reservoir|pack_"
    r"|order|rank|ohlc|locf|sessionize|streak|funnel|first|last|page"
)


ORDER_SURFACES = {
    # --- stamped -----------------------------------------------------
    "sort_order_audit": {
        "class": "stamped",
        "why": "rn = global position under the declared total order",
        "evidence": [("test_llm_ops", "test_sort_order_audit_planted_nulls_and_ties")],
    },
    "sql_offset_paging": {
        "class": "stamped",
        "why": "r9: rn = 40 + within-page row_number under the same "
               "(acctbal DESC, custkey) total order — page selection "
               "was always hash-visible, the within-page assignment "
               "now is too; stamp computed on the 20-row page after "
               "TakeOrderedAndProject",
        "evidence": [("test_plans", "test_offset_paging_stamps_after_take_ordered")],
    },
    "win_rank": {
        "class": "stamped",
        "why": "rank/dense_rank/row_number columns ARE the output",
        "evidence": [],
    },
    "tpcds_share_rank": {
        "class": "stamped",
        "why": "rank column in the output",
        "evidence": [],
    },
    "tpcds_rollup_topk": {
        "class": "stamped",
        "why": "rk column kept in the output (row_number over "
               "(gid, segment) with coalesced-priority tiebreak)",
        "evidence": [],
    },
    "sim_topk": {
        "class": "stamped",
        "why": "(query, neighbor, rank) — rank is the surface; "
               "vec_id tiebreaks make the rank total",
        "evidence": [],
    },
    "sim_topk_lsh": {
        "class": "stamped",
        "why": "same (query, neighbor, rank) surface as sim_topk",
        "evidence": [],
    },
    "sim_topk_ivf": {
        "class": "stamped",
        "why": "same (query, neighbor, rank) surface as sim_topk",
        "evidence": [],
    },
    "sim_topk_ivf_pq": {
        "class": "stamped",
        "why": "fully value-hashed (d2/adc_d2 integer distances + "
               "rank), ties (d2, cid)/(adc_d2, vec_id)",
        "evidence": [],
    },
    # --- twin ---------------------------------------------------------
    "sort_order": {
        "class": "twin",
        "why": "global ORDER BY whose row order the multiset hash "
               "cannot see — covered by sort_order_audit (same sort "
               "spec, position-stamped)",
        "twin": "sort_order_audit",
        "evidence": [],
    },
    # --- selection -----------------------------------------------------
    "topk": {
        "class": "selection",
        "why": "top-25 under (o_totalprice DESC, o_orderkey) — "
               "o_orderkey is the orders PK, order total",
        "evidence": [],
    },
    "limit_n": {
        "class": "selection",
        "why": "LIMIT 100 under ORDER BY o_orderkey (PK — unique)",
        "evidence": [],
    },
    "text_search_topk": {
        "class": "selection",
        "why": "top-10 under (n_terms DESC, score DESC, doc_id ASC) "
               "— doc_id tiebreak makes the cut total",
        "evidence": [],
    },
    "agg_approx_topk": {
        "class": "selection",
        "why": "approx_top_k sketch; fixture distinct items ≤ k so "
               "the sketch never evicts and equals exact counts "
               "(property-pinned); production tie behavior is the "
               "sketch library's, documented in the docstring",
        "evidence": [],
    },
    "sample_reservoir": {
        "class": "selection",
        "why": "k-per-key cut under (md5(doc_id), doc_id) — doc_id "
               "tiebreak total even under digest collision",
        "evidence": [("test_removal_gates", "test_sample_reservoir_planted")],
    },
    # --- value-carried --------------------------------------------------
    "win_first_last": {
        "class": "value-carried",
        "why": "first/last/nth values under (o_orderdate, o_orderkey) "
               "— PK tiebreak; a direction bug changes the values",
        "evidence": [],
    },
    "events_locf": {
        "class": "value-carried",
        "why": "carried value = last non-null over the bucket spine; "
               "bucket is unique per series (total order)",
        "evidence": [],
    },
    "events_ohlc": {
        "class": "value-carried",
        "why": "open/close = min/max of (ts, event_id, value) structs "
               "— event_id makes co-timestamped ticks total",
        "evidence": [],
    },
    "events_path_analysis": {
        "class": "value-carried",
        "why": "path string serializes the first-5 sequence in "
               "(ts, event_id) rank order — order IS the value",
        "evidence": [],
    },
    "events_sessionize": {
        "class": "value-carried",
        "why": "session boundaries from lag over (ts, event_id)",
        "evidence": [],
    },
    "events_funnel": {
        "class": "value-carried",
        "why": "step reach/timing from per-step min(ts) comparisons — "
               "min/max are order-free aggregates; ts values carry "
               "the ordering semantics",
        "evidence": [],
    },
    "events_window_funnel": {
        "class": "value-carried",
        "why": "ordered-steps-within-window decision from ts "
               "arithmetic (order-free aggregates over values)",
        "evidence": [],
    },
    "win_streaks": {
        "class": "value-carried",
        "why": "islands from date arithmetic (day - dense_rank) — "
               "the streak lengths change under any order bug",
        "evidence": [],
    },
    "pack_sequences": {
        "class": "value-carried",
        "why": "pack_id from the shared pack_frame running sum over "
               "(source, doc_id) — a total order; wrong order moves "
               "docs across packs (hash-visible)",
        "evidence": [("test_removal_gates", "test_pack_family_cross_surface_consistency")],
    },
    "pack_concat_chunk": {
        "class": "value-carried",
        "why": "chunk spans (first/last chunk, offset, straddle) from "
               "the same pack_frame running sum — order-bearing span "
               "values; the r9 drill found the exact-boundary "
               "off-by-one blindness and added the planted pin",
        "evidence": [
            ("test_removal_gates", "test_pack_family_cross_surface_consistency"),
            ("test_removal_gates", "test_pack_concat_chunk_boundary_exact_planted"),
        ],
    },
    "pack_nfd_audit": {
        "class": "value-carried",
        "why": "sequential first-fit fold over (doc_id) order; "
               "(bins, waste) pinned by the recursive-CTE replay",
        "evidence": [],
    },
    # --- canonicalized ----------------------------------------------------
    "agg_collect": {
        "class": "canonicalized",
        "why": "array_sort before array_join — input order erased by "
               "design (multiset serialization)",
        "evidence": [],
    },
    "agg_string_agg": {
        "class": "canonicalized",
        "why": "array_sort(collect_set) before concat_ws",
        "evidence": [],
    },
    "fn_higher_order": {
        "class": "canonicalized",
        "why": "arrays array_sort'ed before the fold so both engines "
               "fold in one canonical order",
        "evidence": [],
    },
    "pack_attention_layout": {
        "class": "canonicalized",
        "why": "boundaries = sort_array(collect_list(off)) — and "
               "ascending offsets COINCIDE with doc order because "
               "offsets are a running sum over (source, doc_id), so "
               "the canonical sort is also the semantic order",
        "evidence": [("test_removal_gates", "test_pack_family_cross_surface_consistency")],
    },
    # --- layout -----------------------------------------------------------
    "sink_zorder": {
        "class": "layout",
        "why": "z-order interleaved-bits file layout; ordering effect "
               "= file-level min/max pruning, pinned by storage tests",
        "evidence": [("test_zorder", "test_zorder_prunes_both_dimensions")],
    },
    # --- name-pattern false positives --------------------------------------
    "graph_pagerank": {
        "class": "not-order-bearing",
        "why": "iterative fixpoint — no order semantics ('rank' in "
               "the name only)",
        "evidence": [],
    },
}

_CLASSES = {
    "stamped",
    "twin",
    "selection",
    "value-carried",
    "canonicalized",
    "layout",
    "not-order-bearing",
}


def test_order_audit_sweep():
    """Every order-suspicious registry id is classified; classes are
    legal; twins exist in the registry; named evidence tests exist."""
    qs = all_queries()
    suspicious = {n for n in qs if _ORDER_NAME_RE.search(n)}
    assert suspicious == set(ORDER_SURFACES), (
        f"unclassified order surfaces: {suspicious - set(ORDER_SURFACES)}; "
        f"stale entries: {set(ORDER_SURFACES) - suspicious}"
    )
    for name, meta in ORDER_SURFACES.items():
        assert meta["class"] in _CLASSES, name
        assert meta["why"].strip(), f"{name}: empty why"
        if meta["class"] == "twin":
            assert meta["twin"] in qs, f"{name}: twin not registered"
        for mod_name, test_name in meta.get("evidence", []):
            path = os.path.join(os.path.dirname(__file__), mod_name + ".py")
            assert os.path.exists(path), f"{name}: {mod_name}.py missing"
            with open(path) as f:
                assert f"def {test_name}(" in f.read(), (
                    f"{name}: {mod_name}.{test_name} missing"
                )


def test_stamped_surfaces_really_carry_positions(spark):
    """For the stamped class, don't trust the label: run each on the
    small fixture and assert a position column with a contiguous
    1..k-per-group (or 41..60 page) value set actually exists."""
    from tests.conftest import SF_DIR

    qs = all_queries()

    rows = qs["sql_offset_paging"](spark, SF_DIR).collect()
    assert sorted(r.rn for r in rows) == list(range(41, 61))

    topk = qs["sim_topk"](spark, SF_DIR).collect()
    by_q = {}
    for r in topk:
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert by_q and all(
        sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values()
    )

    audit = qs["sort_order_audit"](spark, SF_DIR)
    n = audit.count()
    assert sorted(r.rn for r in audit.collect()) == list(range(1, n + 1))
