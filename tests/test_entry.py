"""t1-style smoke: the driver contract file works end-to-end."""

from __future__ import annotations

import importlib


def test_entry_contract(spark):
    mod = importlib.import_module("__spark_entry__")
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {"r_name", "revenue", "n_items"}


def test_queries_oracle_keys_align(spark):
    mod = importlib.import_module("__spark_entry__")
    qs, os_ = mod.queries(), mod.oracle_sql()
    assert qs, "queries() must not be empty"
    # every oracle key must have a query
    assert set(os_) <= set(qs)
