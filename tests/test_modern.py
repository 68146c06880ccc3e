"""Spark 4.x surface: VARIANT, Python UDTF, HLL sketches, and the
transformWithState gate. (fn_variant / udtf_python correctness vs
DuckDB is covered by the parametrized oracle test; here we pin the
properties the oracle can't express.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from gmt_dbt_spark.catalog import table
from gmt_dbt_spark.registry import all_queries

from tests.conftest import SF_DIR


def test_hll_sketch_close_to_exact(spark):
    """HLL estimates (lgK=12) must land within the query's 5% bound of
    exact distinct counts — per group and for the re-merged ALL rollup
    (merging sketches must not degrade accuracy beyond the sketch's
    bound). The query emits this as `within_bound` booleans plus the
    exact counts (the driver-hashable shape)."""
    rows = all_queries()["agg_hll_sketch"](spark, SF_DIR).collect()
    ev = table(spark, SF_DIR, "events")
    exact = {
        r.event_type: r.exact
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    exact["ALL"] = ev.select("user_id").distinct().count()
    assert {r.event_type for r in rows} == set(exact)
    for r in rows:
        assert r.exact_users == exact[r.event_type], r
        assert r.within_bound is True, r


def test_hll_sketch_partials_merge(spark):
    """The mergeability contract itself: sketches built on disjoint
    halves of the data, unioned, must estimate the same as one sketch
    over the whole — this is what makes the aggregate map-side-safe
    at 100 TB (partial buffers combine associatively)."""
    ev = table(spark, SF_DIR, "events")
    whole = ev.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias("e")
    ).collect()[0].e
    halves = (
        ev.withColumn("half", (F.col("event_id") % 2).cast("int"))
        .groupBy("half")
        .agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("e"))
        .collect()[0]
        .e
    )
    assert whole == halves


def test_tws_gate_consistent_with_env(spark):
    """tws_available() must reflect the runtime truth: when False the
    query falls back (and the oracle test already proves the fallback
    exact); when True the real transformWithState path must run."""
    from gmt_dbt_spark.streaming.stateful import tws_available

    avail = tws_available()
    # In either case the registered query must produce the full-input
    # aggregate row set.
    out = all_queries()["stream_transform_with_state"](spark, SF_DIR)
    n_users = (
        table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    assert out.count() == n_users
    assert isinstance(avail, bool)


def test_approx_percentile_within_sketch_bound(spark):
    """GK sketch rank-error guarantee: with accuracy=10000 and n per
    group well below it, the approx percentile must land inside the
    rank window the query itself checks ([p48,p52] / [p97,max]) — the
    emitted booleans must all be True and every group present."""
    rows = all_queries()["agg_approx_percentile"](spark, SF_DIR).collect()
    ev = table(spark, SF_DIR, "events")
    n_types = ev.select("event_type").distinct().count()
    assert len(rows) == n_types
    for r in rows:
        assert r.p50_within is True, r
        assert r.p99_within is True, r
        assert r.n > 0


def test_unigram_logprob_sane(spark):
    """Unigram LM scores: every doc scored, scores positive/finite,
    and a doc made of the corpus's rarest tokens must score above one
    made of its most common tokens (the property the filter uses)."""
    import math

    from gmt_dbt_spark.functions.text import unigram_logprob_scores

    out = all_queries()["text_unigram_logprob"](spark, SF_DIR).collect()
    docs_n = table(spark, SF_DIR, "documents").count()
    assert len(out) == docs_n
    assert all(r.bound_ok for r in out)
    scored = unigram_logprob_scores(table(spark, SF_DIR, "documents")).collect()
    assert all(
        r.avg_neg_logprob > 0 and math.isfinite(r.avg_neg_logprob) for r in scored
    )

    # build common-only vs rare-only synthetic docs from the corpus vocab
    from gmt_dbt_spark.operators.dedup import tokens_col
    from pyspark.sql import functions as F

    toks = (
        table(spark, SF_DIR, "documents")
        .select(F.explode(tokens_col(F.col("text"))).alias("tok"))
        .groupBy("tok").count().orderBy(F.col("count").desc())
    ).collect()
    common = " ".join([r.tok for r in toks[:5]] * 4)
    rare = " ".join([r.tok for r in toks[-5:]] * 4)
    # score them against the SAME corpus LM by appending as new docs
    base = table(spark, SF_DIR, "documents").select("doc_id", "text")
    extra = spark.createDataFrame(
        [(10_000_001, common), (10_000_002, rare)], "doc_id bigint, text string"
    )
    union = base.unionByName(extra)
    # inline the op's logic over the unioned corpus
    t2 = union.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("tok"))
    vocab = t2.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = t2.count()
    scores = {
        r.doc_id: r.s
        for r in t2.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id")
        .agg((-F.avg(F.log(F.col("cnt") / F.lit(float(total))))).alias("s"))
        .filter(F.col("doc_id") > 10_000_000)
        .collect()
    }
    assert scores[10_000_002] > scores[10_000_001]
