"""ANSI-mode session contract (r10 verdict item 1).

Spark 4.x defaults ``spark.sql.ansi.enabled=true``; this engine's
column expressions assume the permissive semantics (null division /
casts, lazy out-of-range array probes, legacy sizeOfNull) and pin ANSI
off in :func:`flint_spark.get_spark`. A user embedding the library in
their own ANSI-on session must hit the loud plan-build-time guard —
not a data-dependent executor error or silently different nulls.
Representative entry points from every operator family are exercised
here under ``ansi=true``; each must raise the guard's RuntimeError
immediately, and work again the moment ANSI is switched off.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flint_spark import session as fs_session

GUARD_MATCH = "requires spark.sql.ansi.enabled=false"


@pytest.fixture()
def ansi_on(spark):
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        yield spark
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")


def _events(spark, n=10):
    return spark.range(n).select(
        (F.col("id") * 1_000_000_000).alias("time"),
        (F.col("id") % 3).alias("k"),
        F.col("id").cast("double").alias("v"))


def _docs(spark, n=8):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma doc "),
                 F.col("id").cast("string")).alias("text"))


def _emb(spark, n=8):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(F.col("id").cast("double"),
                F.lit(1.0), F.lit(2.0)).alias("embedding"))


def test_guard_fires_across_families(ansi_on):
    spark = ansi_on
    from flint_spark import TimeSeriesDataFrame
    from flint_spark.operators import cycles, ema, holtwinters, kalman
    from flint_spark.pipeline import (bpe, dedup, graph, profile, sampling,
                                      similarity, text, urls)
    from flint_spark.summarizers import mean

    ev, docs, emb = _events(spark), _docs(spark), _emb(spark)
    probes = {
        # §2 time-series surface: TSDF construction + time_ns_expr
        "tsdf": lambda: TimeSeriesDataFrame.from_df(ev),
        "ewma": lambda: ema.ewma(ev, "v"),
        "cycles": lambda: cycles.summarize_cycles(ev, mean("v")),
        "kalman": lambda: kalman.kalman_local_level(ev, "v", 0.1, 1.0),
        "holtwinters": lambda: holtwinters.holt_winters(ev, "v", 4),
        # pipeline families: _words / h28 / _dvec / decorator routes
        "text": lambda: text.token_count("text"),
        "minhash": lambda: dedup.minhash_signatures(docs, num_hashes=4),
        "sampling": lambda: sampling.deterministic_sample(docs, 0.5),
        "cosine": lambda: similarity.cosine_topk(emb, [0], k=2),
        "bpe": lambda: bpe.bpe_train(docs, num_merges=2),
        "urls": lambda: urls.url_dedup(docs.withColumn(
            "url", F.concat(F.lit("http://x.test/"),
                            F.col("doc_id").cast("string")))),
        "profile": lambda: profile.key_profile(docs, ["doc_id"]),
        "pagerank": lambda: graph.pagerank(
            docs.select(F.col("doc_id").alias("src"),
                        (F.col("doc_id") + 1).alias("dst"))),
    }
    for name, build in probes.items():
        with pytest.raises(RuntimeError, match=GUARD_MATCH):
            build()

    # switching ANSI off un-trips the guard with no session rebuild
    spark.conf.set("spark.sql.ansi.enabled", "false")
    assert TimeSeriesDataFrame.from_df(ev).to_df().count() == 10
    assert similarity.cosine_topk(emb, [0], k=2).count() == 2


def test_guard_escape_hatch_and_streaming(ansi_on):
    spark = ansi_on
    from flint_spark.pipeline import text
    from flint_spark.streaming import ts_stream

    # streaming twins resolve their time axis through time_ns_expr at
    # plan-build time — same chokepoint, same loud failure
    ev = _events(spark)
    with pytest.raises(RuntimeError, match=GUARD_MATCH):
        ts_stream.ewma_stream(ev, "v", key=["k"])

    # documented escape hatch: ALLOW_ANSI skips the guard entirely
    fs_session.ALLOW_ANSI = True
    try:
        col = text.token_count("text")
        assert col is not None
    finally:
        fs_session.ALLOW_ANSI = False
    with pytest.raises(RuntimeError, match=GUARD_MATCH):
        text.token_count("text")
