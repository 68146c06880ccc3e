"""Pins for the r10 semdedup pair-stage optimization.

The blocked self-join + unrolled-dot rewrite rests on two facts:

1. EMBED_DIMS is a real table contract — every embeddings row at
   every shipped sf is exactly 64 wide. The unrolled Σ qa[i]·qb[i]
   yields NULL (and silently drops the pair) on a shorter array, so
   the contract must be pinned, not assumed.
2. Blocking never changes the pair set: with B blocks, side A
   explodes over all blocks and side B tags pmod(id, B), so each
   (a, b) pair matches exactly once for ANY B. Pin blocks=1 (the
   production cluster setting, zero replication) ≡ blocks=8 (the
   local-parallelism default) on the full surface.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gmt_dbt_spark.operators.embeddings import EMBED_DIMS
from gmt_dbt_spark.registry import all_queries
from gmt_dbt_spark.session import scoped_conf

SF_DIRS = [f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_embeddings_fixed_width_contract(spark, sf_dir):
    widths = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(F.size("embedding").alias("w"))
        .distinct()
        .collect()
    )
    assert [r["w"] for r in widths] == [EMBED_DIMS], widths


def test_semdedup_block_factor_invariant(spark):
    """blocks=1 and blocks=8 produce the identical surface."""
    q = all_queries()["dedup_semdedup"]
    sf = "/root/testdata/sf0.01"

    def rows(blocks: int):
        with scoped_conf(spark, **{"spark.gmt_dbt.semdedup_blocks": str(blocks)}):
            # the sentinel row carries NULLs — sort None-safely
            return sorted(
                (tuple(r) for r in q(spark, sf).collect()),
                key=lambda t: tuple((v is None, v) for v in t),
            )

    assert rows(1) == rows(8)
