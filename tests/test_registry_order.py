"""The driver-budget ordering IS the mechanism that converts
"claimed" operators into "proven" ones (VERDICT r1's top action) —
pin its behavior: unproven core first (in _CORE_FIRST order), then
unproven LLM-ext prefixes, then other unproven, proven last; and the
CORRECTNESS-row classification that feeds it."""

from __future__ import annotations

import json

from gmt_dbt_spark import registry


def _f(spark, sf_dir):  # stand-in builder
    raise NotImplementedError


def test_priority_order_tiers(monkeypatch):
    monkeypatch.setattr(
        registry, "_proven_ids", lambda: {"scan_parquet", "agg_group"}
    )
    qs = {
        "scan_parquet": _f,   # proven -> last
        "tpch_q1": _f,        # unproven, no prefix -> tier 2
        "dedup_exact": _f,    # unproven core -> tier 0
        "fn_math": _f,        # unproven core, EARLIER in _CORE_FIRST
        "text_langid": _f,    # unproven ext prefix -> tier 1
        "agg_group": _f,      # proven -> last
    }
    order = registry._priority_order(qs)
    assert order[:2] == ["fn_math", "dedup_exact"]  # _CORE_FIRST order
    assert order[2] == "text_langid"
    assert order[3] == "tpch_q1"
    assert set(order[4:]) == {"scan_parquet", "agg_group"}


def test_proven_ids_classification(tmp_path):
    rows = {
        "hash_green": {"hash_match": True, "spark_rows": 3},
        "hash_fail": {"hash_match": False, "spark_rows": 3},
        "rows_only_clean": {"spark_rows": 5, "err": "no_oracle"},
        "rows_only_errored": {"spark_rows": None, "err": "boom"},
        "oracle_query_rows_only_run": {"spark_rows": 5, "err": None},
    }
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(rows))
    # make "rows_only_clean"/"rows_only_errored" oracle-less, the other
    # ids oracle-backed, mirroring the real registry state
    for qid in ("hash_green", "hash_fail", "oracle_query_rows_only_run"):
        registry._ORACLES.setdefault(qid, "SELECT 1")
    try:
        proven = registry._proven_ids(root=str(tmp_path))
    finally:
        for qid in ("hash_green", "hash_fail", "oracle_query_rows_only_run"):
            if registry._ORACLES.get(qid) == "SELECT 1":
                del registry._ORACLES[qid]
    assert "hash_green" in proven
    assert "hash_fail" not in proven          # FAIL must re-run early
    assert "rows_only_clean" in proven        # strongest signal available
    assert "rows_only_errored" not in proven  # errored run stays unproven
    # oracle-backed query that only got a rows run: still unproven
    assert "oracle_query_rows_only_run" not in proven
