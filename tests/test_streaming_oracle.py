"""Oracle-grade streaming gates (r3 judge item #5).

Replay time-split parquet files one per micro-batch
(``maxFilesPerTrigger=1``) through the stream-stream as-of joins and
the stateful EWMA, materialize the sink, and compare it against DuckDB
running the equivalent BATCH SQL on the same source parquet — the same
three-way, value-level evidence the batch operators get. DuckDB cannot
run a stream, but it can oracle the replay's final table; memory-sink
batch-parity tests (test_extensions) remain the in-family check.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from flint_spark.streaming import ts_stream
from harness import compare, duck_con

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    return duck_con(SF)


def _split_files(df, out_dir, splits, col):
    """Write df as len(splits)+1 single parquet files chunked on
    ``col``, named in replay (ascending-``col``) order."""
    bounds = [None, *splits, None]
    os.makedirs(out_dir, exist_ok=True)
    for i in range(len(bounds) - 1):
        part = df
        if bounds[i] is not None:
            part = part.filter(F.col(col) >= bounds[i])
        if bounds[i + 1] is not None:
            part = part.filter(F.col(col) < bounds[i + 1])
        tmp = os.path.join(out_dir, f"_tmp{i}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        shutil.move(os.path.join(tmp, src),
                    os.path.join(out_dir, f"chunk_{i}.parquet"))
        shutil.rmtree(tmp)


def _time_split_files(df, out_dir, splits):
    _split_files(df, out_dir, splits, "time")


def _replay(spark, batch_df, out_dir):
    """File stream over time-split chunks of batch_df, one per trigger."""
    _time_split_files(batch_df, out_dir, ["2024-01-10", "2024-01-20"])
    return (spark.readStream.schema(batch_df.schema)
            .option("maxFilesPerTrigger", 1).parquet(out_dir))


def _run_to_table(out, name):
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName(name).start())
    q.processAllAvailable()
    q.stop()


_SPLITS = ["2024-01-10", "2024-01-20"]


def test_asof_join_stream_backward_vs_duckdb(spark, con, tmp_path):
    """Stream-stream backward as-of replay == DuckDB ASOF LEFT JOIN."""
    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("time", F.col("ts").cast("timestamp")).drop("ts"))
    left_b = (ev.filter(F.col("event_type") != "click")
              .select("time", "user_id", "event_id"))
    right_b = (ev.filter(F.col("event_type") == "click")
               .groupBy("time", "user_id")
               .agg(F.max("value").alias("click_val")))
    ls = _replay(spark, left_b, str(tmp_path / "l"))
    rs = _replay(spark, right_b, str(tmp_path / "r"))
    out = ts_stream.asof_join_stream(ls, rs, tolerance="2d",
                                     key=["user_id"], watermark="400 days")
    _run_to_table(out, "so_backward")
    got = (spark.sql("SELECT * FROM so_backward")
           .select(F.col("__tns").alias("tns"), "user_id", "event_id",
                   "click_val"))
    sql = """
      WITH l AS (SELECT CAST(ts AS TIMESTAMP) AS t, user_id, event_id
                 FROM events WHERE event_type <> 'click'),
           r AS (SELECT CAST(ts AS TIMESTAMP) AS rt, user_id,
                        max(value) AS click_val
                 FROM events WHERE event_type = 'click' GROUP BY 1, 2)
      SELECT epoch_ns(l.t) AS tns, l.user_id, l.event_id,
             CASE WHEN r.rt >= l.t - INTERVAL 2 DAY THEN r.click_val END
               AS click_val
      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.t >= r.rt
    """
    ok, msg = compare("so_backward", got, sql, con)
    assert ok, msg


@pytest.mark.parametrize("strict", [False, True])
def test_asof_join_stream_future_vs_duckdb(spark, con, tmp_path, strict):
    """Stream-stream forward (and strict) as-of replay == DuckDB ASOF
    with the reversed inequality; right side deduped per (key, time) so
    both engines' tie rules coincide (the raw-right max-struct rule is
    covered by test_stream_future_duplicate_right_tie_rule)."""
    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("time", F.col("ts").cast("timestamp")).drop("ts"))
    uniq = (ev.groupBy("time", "user_id")
            .agg(F.max("value").alias("value")))
    left_b = uniq
    right_b = uniq.select("time", "user_id",
                          F.col("value").alias("next_value"))
    ldir = str(tmp_path / "l")
    ls = _replay(spark, left_b, ldir)
    rs = _replay(spark, right_b, str(tmp_path / "r"))
    # the future join emits a left row only once its lookahead window is
    # watermark-CLOSED w.r.t. its key's max event time, so the replay
    # appends a per-key far-future left sentinel as a final chunk: every
    # real window closes and the sink equals the complete batch result
    # (sentinels themselves stay pending forever and never emit)
    maxt = ev.agg(F.max("time")).first()[0]
    sentinel = (uniq.select("user_id").distinct()
                .withColumn("time",
                            F.lit(maxt) + F.expr("INTERVAL 30 DAYS"))
                .withColumn("value", F.lit(None).cast("double"))
                .select("time", "user_id", "value"))
    tmp = str(tmp_path / "sent")
    sentinel.coalesce(1).write.mode("overwrite").parquet(tmp)
    src = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    shutil.move(os.path.join(tmp, src), os.path.join(ldir, "chunk_9.parquet"))
    out = ts_stream.asof_join_stream_future(
        ls, rs, tolerance="7d", key=["user_id"], watermark="1 day",
        strict_lookahead=strict)
    name = f"so_future_{int(strict)}"
    _run_to_table(out, name)
    got = (spark.sql(f"SELECT * FROM {name}")
           .select(F.col("__tns").alias("tns"), "user_id", "value",
                   "next_value"))
    op = "<" if strict else "<="
    sql = f"""
      WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS t, user_id,
                        max(value) AS value
                 FROM events GROUP BY 1, 2)
      SELECT epoch_ns(l.t) AS tns, l.user_id, l.value,
             CASE WHEN r.t <= l.t + INTERVAL 7 DAY THEN r.value END
               AS next_value
      FROM e l ASOF LEFT JOIN e r
        ON l.user_id = r.user_id AND l.t {op} r.t
    """
    ok, msg = compare(name, got, sql, con)
    assert ok, msg


def test_ewma_stream_vs_duckdb(spark, con, tmp_path):
    """Stateful streaming EWMA replay == DuckDB's closed-form
    exp-prefix-sum (the batch ewma oracle), rounded to 4 decimals like
    the batch gate (state carries across micro-batch renormalization
    boundaries, so bitwise equality is not the contract)."""
    import math

    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("time", F.col("ts").cast("timestamp"))
          .select("time", "user_id", "value"))
    st = _replay(spark, ev, str(tmp_path / "e"))
    out = ts_stream.ewma_stream(st, "value", key=["user_id"],
                                alpha=0.05, duration_per_period="1d")
    _run_to_table(out, "so_ewma")
    got = (spark.sql("SELECT * FROM so_ewma")
           .select(F.col("__tns").alias("tns"), "user_id",
                   (F.floor(F.col("value_ewma") * 10000 + 0.5) / 10000)
                   .alias("ewma")))
    lam = -math.log1p(-0.05) / 86_400e6
    sql = f"""
      WITH e AS (
        SELECT epoch_ns(ts) AS tns, user_id, value,
               epoch_us(ts)::DOUBLE AS tus,
               min(epoch_us(ts)) OVER (PARTITION BY user_id)::DOUBLE AS base
        FROM events
      )
      SELECT tns, user_id,
             floor((exp(-(tus - base) * {lam}) *
                   sum(value * exp((tus - base) * {lam})) OVER (
                     PARTITION BY user_id ORDER BY tns
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                   * 10000 + 0.5) / 10000 AS ewma
      FROM e
    """
    ok, msg = compare("so_ewma", got, sql, con)
    assert ok, msg


def test_exponential_smoothing_stream_vs_duckdb(spark, con, tmp_path):
    """Stateful streaming exponentialSmoothing (current/core, priming=1)
    replay == the batch ema_core DuckDB closed form, rounded to 4
    decimals like the batch gate."""
    import math

    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("time", F.col("ts").cast("timestamp"))
          .select("time", "user_id", "value"))
    st = _replay(spark, ev, str(tmp_path / "es"))
    out = ts_stream.exponential_smoothing_stream(
        st, "value", key=["user_id"], alpha=0.05, priming_periods=1.0,
        duration_per_period="1d", interpolation="current",
        convention="core")
    _run_to_table(out, "so_es")
    got = (spark.sql("SELECT * FROM so_es")
           .select(F.col("__tns").alias("tns"), "user_id",
                   (F.floor(F.col("value_ema") * 10000 + 0.5) / 10000)
                   .alias("ema")))
    lam = -math.log1p(-0.05) / 86_400e6
    lam_day = -math.log1p(-0.05)
    sql = f"""
      WITH e AS (
        SELECT epoch_ns(ts) AS tns, user_id, value,
               epoch_us(ts)::DOUBLE AS tus,
               min(epoch_us(ts)) OVER (PARTITION BY user_id)::DOUBLE AS base,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
                 ::DOUBLE AS prev
        FROM events
      ), d AS (
        SELECT *, CASE WHEN prev IS NULL THEN exp(-{lam_day})
                       ELSE exp(-(tus - prev) * {lam}) END AS dec
        FROM e
      )
      SELECT tns, user_id,
             floor(((sum((1 - dec) * value * exp((tus - base) * {lam})) OVER w)
               / (sum((1 - dec) * exp((tus - base) * {lam})) OVER w))
               * 10000 + 0.5) / 10000 AS ema
      FROM d
      WINDOW w AS (PARTITION BY user_id ORDER BY tns
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """
    ok, msg = compare("so_es", got, sql, con)
    assert ok, msg


def test_summarize_windows_stream_vs_duckdb(spark, con, tmp_path):
    """Streaming per-row sliding-window mean replay == DuckDB RANGE
    BETWEEN frame over the same events."""
    from flint_spark import windows as W

    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("time", F.col("ts").cast("timestamp"))
          .select("time", "user_id", "value"))
    st = _replay(spark, ev, str(tmp_path / "sw"))
    # sequential left-to-right fold: pandas .mean() sums pairwise, which
    # diverges from the SQL window's running sum in the last ulp and
    # flips half-up rounding on a handful of rows
    out = ts_stream.summarize_windows_stream(
        st, W.past_absolute_time("2d"),
        lambda s: sum(s.tolist()) / len(s), "w_mean",
        key=["user_id"], watermark="400 days")
    _run_to_table(out, "so_swin")
    got = (spark.sql("SELECT * FROM so_swin")
           .select(F.col("__tns").alias("tns"), "user_id",
                   (F.floor(F.col("w_mean") * 10000 + 0.5) / 10000)
                   .alias("w_mean")))
    sql = """
      SELECT epoch_ns(ts) AS tns, user_id,
             floor((avg(value) OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts)
                    RANGE BETWEEN 172800000000 PRECEDING AND CURRENT ROW))
                   * 10000 + 0.5) / 10000 AS w_mean
      FROM events
    """
    ok, msg = compare("so_swin", got, sql, con)
    assert ok, msg


def _append_sentinel(spark, ev, out_dir, row_builder):
    """Write a far-future sentinel chunk: event-time watermark is global
    for windowed aggregations, so one row past every real window closes
    them all; the sentinel's own window never emits."""
    maxt = ev.agg(F.max("time")).first()[0]
    sent = row_builder(F.lit(maxt) + F.expr("INTERVAL 30 DAYS"))
    tmp = os.path.join(out_dir, "_sent")
    sent.coalesce(1).write.mode("overwrite").parquet(tmp)
    src = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    shutil.move(os.path.join(tmp, src), os.path.join(out_dir, "chunk_9.parquet"))
    shutil.rmtree(tmp)


def test_summarize_intervals_stream_vs_duckdb(spark, con, tmp_path):
    """Watermarked tumbling-window aggregation replay == DuckDB GROUP BY
    date_trunc: a sentinel chunk closes every real window, so the sink
    is the complete batch result."""
    from flint_spark import summarizers as S

    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("time", F.col("ts").cast("timestamp"))
          .select("time", "event_type", "value"))
    out_dir = str(tmp_path / "iv")
    _time_split_files(ev, out_dir, _SPLITS)
    _append_sentinel(
        spark, ev, out_dir,
        lambda t: ev.limit(1).select(
            t.alias("time"), F.lit("zz_sentinel").alias("event_type"),
            F.lit(None).cast("double").alias("value")))
    st = (spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(out_dir))
    agg = ts_stream.summarize_intervals_stream(
        st, "1 day", S.compose(S.count(), S.sum_("value")),
        key=["event_type"], watermark="1 minute")
    _run_to_table(agg, "so_intervals")
    got = (spark.sql("SELECT * FROM so_intervals")
           .select("time", "event_type", "count",
                   (F.floor(F.col("value_sum") * 10000 + 0.5) / 10000)
                   .alias("value_sum")))
    sql = """
      SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS time, event_type,
             count(*) AS count,
             floor(sum(value) * 10000 + 0.5) / 10000 AS value_sum
      FROM events GROUP BY 1, 2
    """
    ok, msg = compare("so_intervals", got, sql, con)
    assert ok, msg


def test_sessionize_stream_vs_duckdb(spark, con, tmp_path):
    """session_window replay == DuckDB lag/cumsum sessionization (the
    batch sessionize oracle shape): session_end differs by exactly the
    gap (Spark reports last_event + gap), so the compare subtracts it."""
    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("time", F.col("ts").cast("timestamp"))
          .select("time", "user_id"))
    out_dir = str(tmp_path / "sess")
    _time_split_files(ev, out_dir, _SPLITS)
    _append_sentinel(
        spark, ev, out_dir,
        lambda t: ev.limit(1).select(t.alias("time"),
                                     F.lit(-1).cast("long").alias("user_id")))
    st = (spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(out_dir))
    sess = ts_stream.sessionize_stream(st, gap="1 hour", key=["user_id"],
                                       watermark="1 minute")
    _run_to_table(sess, "so_sessions")
    got = (spark.sql("SELECT * FROM so_sessions")
           .filter(F.col("user_id") >= 0)
           .select("user_id", "session_start",
                   (F.col("session_end") - F.expr("INTERVAL 1 HOUR"))
                   .alias("last_event"), "n_events"))
    sql = """
      WITH e AS (
        SELECT CAST(ts AS TIMESTAMP) AS t, user_id,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 3600000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      ), s AS (
        SELECT t, user_id,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY t
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM e
      )
      SELECT user_id, min(t) AS session_start, max(t) AS last_event,
             count(*) AS n_events
      FROM s GROUP BY user_id, sid
    """
    ok, msg = compare("so_sessions", got, sql, con)
    assert ok, msg


def test_dedup_stream_vs_duckdb(spark, con, tmp_path):
    """Streaming exact dedup (dropDuplicatesWithinWatermark) replay over
    a corpus with injected duplicates == DuckDB DISTINCT on the subset:
    the kept set is compared on the subset column and count (which
    physical duplicate survives is arrival-order territory in BOTH
    engines, so only the deduped identity is the contract)."""
    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("time", F.col("ts").cast("timestamp"))
          .select("time", "event_id"))
    doubled = ev.unionByName(ev)  # every event twice
    st = _replay(spark, doubled, str(tmp_path / "dd"))
    out = ts_stream.dedup_stream(st, ["event_id"], watermark="400 days")
    _run_to_table(out, "so_dedup")
    got = (spark.sql("SELECT * FROM so_dedup")
           .groupBy().agg(F.count("*").alias("n"),
                          F.count_distinct("event_id").alias("n_ids"),
                          F.sum("event_id").cast("long").alias("id_sum")))
    sql = """
      SELECT count(*) AS n, count(DISTINCT event_id) AS n_ids,
             sum(event_id)::BIGINT AS id_sum
      FROM (SELECT DISTINCT event_id FROM events)
    """
    ok, msg = compare("so_dedup", got, sql, con)
    assert ok, msg


def test_stream_future_duplicate_right_tie_rule(spark):
    """Duplicate (key, time) RIGHT rows arriving in adversarial order
    across micro-batches resolve to the batch max-struct winner
    (ADVICE r3: the buffer used to keep arrival order and searchsorted
    picked the first tie entry). Verified against batch
    future_left_join on the same tables, both strictness modes, plus
    the backward join and the static forward path."""
    import pandas as pd

    from flint_spark.operators import asof

    left_rows = [(1_000, 1, 100.0), (2_000, 1, 200.0)]
    # three rights at the SAME (key, time): values 5.0, 9.0, 1.0 —
    # batch picks max-struct (9.0); arrival order puts 1.0 last
    right_rows = [(2_000, 1, 5.0), (2_000, 1, 9.0), (2_000, 1, 1.0)]
    left_b = spark.createDataFrame(left_rows, "time long, id int, x double")
    right_b = spark.createDataFrame(right_rows, "time long, id int, rv double")

    exp = (asof.future_left_join(left_b, right_b, tolerance=5_000,
                                 key=["id"])
           .toPandas().sort_values("time", ignore_index=True))
    assert list(exp["rv"]) == [9.0, 9.0]

    # static forward path (broadcast table built from arrival order)
    got_static = (ts_stream.asof_join_static(
        left_b, right_b, tolerance=5_000, key=["id"], direction="forward",
        right_time_column="time")
        .toPandas().sort_values("time", ignore_index=True))
    assert list(got_static["rv"]) == [9.0, 9.0]
    # static backward at the tie timestamp
    got_back = (ts_stream.asof_join_static(
        left_b.withColumn("time", F.col("time") + 1_000), right_b,
        tolerance=5_000, key=["id"], right_time_column="time")
        .toPandas().sort_values("time", ignore_index=True))
    assert list(got_back["rv"]) == [9.0, 9.0]

def test_streaming_corpus_ingestion_vs_duckdb(spark, con, tmp_path):
    """The map-only pipeline surface is streaming-compatible for FREE:
    per-doc text stats, the hashed quality classifier, the map-side
    MinHash signature and SimHash (r4 rewrites — pure projections, no
    per-doc aggregation exchange) run unchanged on a readStream. Replay
    the documents table as a 3-chunk file stream, compute
    quality + simhash + one MinHash column per doc map-side, and
    compare the materialized sink against DuckDB batch SQL."""
    import os as _os
    import shutil as _shutil

    from flint_spark.pipeline import dedup, text as text_ops
    from flint_spark.pipeline.hashing import minhash_params, P

    docs_b = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "text")
    # chunk on doc_id (documents have no event time)
    out_dir = str(tmp_path / "docs")
    _os.makedirs(out_dir, exist_ok=True)
    for i, (lo, hi) in enumerate([(0, 170), (170, 340), (340, 10**9)]):
        part = docs_b.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        tmp = _os.path.join(out_dir, f"_tmp{i}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = next(f for f in _os.listdir(tmp) if f.endswith(".parquet"))
        _shutil.move(_os.path.join(tmp, src),
                     _os.path.join(out_dir, f"chunk_{i}.parquet"))
        _shutil.rmtree(tmp)
    stream = (spark.readStream.schema(docs_b.schema)
              .option("maxFilesPerTrigger", 1).parquet(out_dir))

    # all three operators are pure projections after the r4 rewrites,
    # so they accept the streaming frame unchanged; each runs to its
    # own memory sink and is oracled independently
    scored = text_ops.hashed_classifier_score(stream, n_buckets=64, seed=17)
    sig = dedup.minhash_signatures(scored, num_hashes=4, seed=7)
    sim = dedup.simhash(scored)
    q1 = (scored.select("doc_id",
                        (F.floor(F.col("clf_raw") * 1e6 + 0.5) / 1e6)
                        .alias("clf_raw"))
          .writeStream.outputMode("append").format("memory")
          .queryName("s_clf").start())
    q2 = (sig.writeStream.outputMode("append").format("memory")
          .queryName("s_sig").start())
    q3 = (sim.writeStream.outputMode("append").format("memory")
          .queryName("s_sim").start())
    for q in (q1, q2, q3):
        q.processAllAvailable()
        q.stop()

    import __spark_entry__ as entry
    clf_sql = entry.extra_oracle_sql()["hashed_classifier"]
    ok, msg = compare("stream_clf",
                      spark.sql("SELECT doc_id, clf_raw FROM s_clf"),
                      f"SELECT doc_id, clf_raw FROM ({clf_sql})", con)
    assert ok, msg

    params = minhash_params(4, 7)
    mins = ",\n".join(
        f"min(({a}*h + {b}) % {P}) AS mh_{j}"
        for j, (a, b) in enumerate(params))
    sig_sql = f"""
      WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
                     FROM documents
                     WHERE len(string_split(text, ' ')) >= 3),
      sh AS (SELECT DISTINCT doc_id,
                    unnest(list_transform(generate_series(1, len(w) - 2),
                           i -> array_to_string(list_slice(w, i, i + 2), ' ')))
                      AS shingle
             FROM words),
      h AS (SELECT doc_id,
                   (('0x' || substr(md5(shingle), 1, 7))::BIGINT) AS h
            FROM sh)
      SELECT doc_id, {mins} FROM h GROUP BY doc_id
    """
    ok, msg = compare("stream_sig", spark.sql("SELECT * FROM s_sig"),
                      sig_sql, con)
    assert ok, msg

    from entry_queries.pipeline_q import _sql_simhash
    ok, msg = compare("stream_sim", spark.sql("SELECT * FROM s_sim"),
                      _sql_simhash(), con)
    assert ok, msg


def test_rollup_stream_refresh_vs_duckdb(spark, con, tmp_path):
    """The full continuous-aggregate loop: a file-replay stream keeps
    the 1h PARTIAL table fresh (build_rollup_stream), a batch rollup_to
    coarsens the sink to 1d from partials alone, and DuckDB oracles the
    result against direct 1d aggregation of the raw events — streaming
    refresh + partial-only serving, end to end."""
    from flint_spark.operators import intervals as iv_ops

    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("time", F.col("ts").cast("timestamp"))
          .select("time", "event_type", "value"))
    out_dir = str(tmp_path / "ru")
    _time_split_files(ev, out_dir, _SPLITS)
    _append_sentinel(
        spark, ev, out_dir,
        lambda t: ev.limit(1).select(
            t.alias("time"), F.lit("zz_sentinel").alias("event_type"),
            F.lit(None).cast("double").alias("value")))
    st = (spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(out_dir))
    hourly = ts_stream.build_rollup_stream(st, "1h", ["value"],
                                           key=["event_type"],
                                           watermark="1 minute")
    _run_to_table(hourly, "so_rollup")
    sink = spark.sql("SELECT * FROM so_rollup")
    daily = iv_ops.rollup_to(sink, "1d", ["value"], key=["event_type"])
    out = iv_ops.rollup_finalize(daily, ["value"])
    got = out.select(
        "time", "event_type", "n_rows", "value_count",
        (F.floor(F.col("value_sum") * 10000 + 0.5) / 10000).alias("value_sum"),
        (F.floor(F.col("value_max") * 1000000 + 0.5) / 1000000).alias("value_max"))
    sql = """
      SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS time, event_type,
             count(*) AS n_rows, count(value) AS value_count,
             floor(sum(value) * 10000 + 0.5) / 10000 AS value_sum,
             floor(max(value) * 1000000 + 0.5) / 1000000 AS value_max
      FROM events GROUP BY 1, 2
    """
    ok, msg = compare("so_rollup", got, sql, con)
    assert ok, msg


def test_stream_buffer_preserves_nullable_long_values(spark, tmp_path):
    """Regression: the right-buffer merge must not round-trip values
    through pandas (int+None lists coerce to float64, and floats stored
    into a Long state array silently null out). A nullable LongType
    right column buffered in one micro-batch must emit its exact values
    when matched in a later micro-batch."""
    from flint_spark.operators import asof

    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("time", F.col("ts").cast("timestamp")))
    left_b = (ev.filter(F.col("event_type") != "click")
              .select("time", "user_id", "event_id"))
    right_b = (ev.filter(F.col("event_type") == "click")
               .groupBy("time", "user_id")
               .agg(F.max("event_id").alias("click_id"))
               # nullable LongType data column: null every 5th row
               .withColumn("click_id",
                           F.when(F.col("click_id") % 5 != 0,
                                  F.col("click_id"))))
    ls = _replay(spark, left_b, str(tmp_path / "l"))
    rs = _replay(spark, right_b, str(tmp_path / "r"))
    out = ts_stream.asof_join_stream(ls, rs, tolerance="2d",
                                     key=["user_id"], watermark="400 days")
    _run_to_table(out, "so_nullable_long")
    got = spark.sql("SELECT * FROM so_nullable_long")
    assert dict(got.dtypes)["click_id"] == "bigint"
    exp = asof.left_join(left_b, right_b, tolerance="2d", key=["user_id"])
    g = {(r.user_id, r.event_id): r.click_id for r in got.collect()}
    e = {(r.user_id, r.event_id): r.click_id for r in exp.collect()}
    assert g == e
    assert any(v is not None for v in g.values())  # non-vacuous


def test_rolling_ols_stream_vs_duckdb(spark, con, tmp_path):
    """Sixteenth replay gate: streaming rolling simple OLS == DuckDB's
    pairwise-masked windowed-sum algebra over the batch range frame
    (the rolling_ols oracle shape) on an in-order file replay. Every
    9th x is nulled on BOTH sides, so the gate pins the complete-case
    rule in the stream too."""
    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("time", F.col("ts").cast("timestamp"))
          .withColumn("x", F.when(F.col("event_id") % 9 != 0,
                                  F.get_json_object(F.col("props"), "$.k")
                                  .cast("double")))
          .select("time", "user_id", "x", "value"))
    st = _replay(spark, ev, str(tmp_path / "ro"))
    out = ts_stream.rolling_ols_stream(st, "value", "x",
                                       key=["user_id"], window="7d",
                                       min_samples=5)
    _run_to_table(out, "so_rols")
    got = (spark.sql("SELECT * FROM so_rols")
           .filter(F.col("beta").isNotNull())
           .select(F.col("__tns").alias("tns"), "user_id", "x", "value",
                   (F.floor(F.col("beta") * 10000 + 0.5) / 10000)
                   .alias("beta"),
                   (F.floor(F.col("alpha") * 10000 + 0.5) / 10000)
                   .alias("alpha"),
                   (F.floor(F.col("r2") * 1000000 + 0.5) / 1000000)
                   .alias("r2")))
    sql = """
      WITH e AS (
        SELECT epoch_us(CAST(ts AS TIMESTAMP)) * 1000 AS tns, user_id,
               CASE WHEN event_id % 9 <> 0 THEN
                 CAST(json_extract_string(props, '$.k') AS DOUBLE) END AS x,
               value
        FROM events
      ),
      m AS (
        SELECT tns, user_id, x, value,
               CASE WHEN x IS NOT NULL AND value IS NOT NULL THEN x END
                 AS mx,
               CASE WHEN x IS NOT NULL AND value IS NOT NULL THEN value
                 END AS my
        FROM e
      ),
      s AS (
        SELECT tns, user_id, x, value,
               count(mx) OVER w AS n,
               sum(mx) OVER w AS sx, sum(my) OVER w AS sy,
               sum(mx * mx) OVER w AS sxx, sum(my * my) OVER w AS syy,
               sum(mx * my) OVER w AS sxy
        FROM m
        WINDOW w AS (PARTITION BY user_id ORDER BY tns
                     RANGE BETWEEN 604800000000000 PRECEDING
                     AND CURRENT ROW)
      )
      SELECT tns, user_id, x, value,
             floor(((n * sxy - sx * sy) / (n * sxx - sx * sx)) * 10000
                   + 0.5) / 10000 AS beta,
             floor(((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                     * sx) / n) * 10000 + 0.5) / 10000 AS alpha,
             CASE WHEN n * syy - sy * sy > 0 THEN
               floor((power(n * sxy - sx * sy, 2)
                      / ((n * sxx - sx * sx) * (n * syy - sy * sy)))
                     * 1000000 + 0.5) / 1000000
             END AS r2
      FROM s WHERE n >= 5 AND n * sxx - sx * sx > 0
    """
    ok, msg = compare("so_rols", got, sql, con)
    assert ok, msg


def test_rolling_ols_stream_late_arrival_converges(spark, tmp_path):
    """Late in-horizon chunk slots into the sorted (t, x, y) state:
    rows scored at-or-after the late data landed match the batch
    rolling_ols exactly (same convergence contract as the anomaly
    stream)."""
    import pandas as pd

    from flint_spark import windows as W
    from flint_spark.operators.regression import rolling_ols

    base = pd.Timestamp("2024-01-01")
    rows = [((base + pd.Timedelta(hours=h)).to_pydatetime(), "k",
             float(h % 5), float(2.0 * (h % 5) + 1.0 + (h % 3) * 0.1))
            for h in [0, 1, 2, 3, 4, 5, 6, 7, 9, 10, 11, 12]]
    batch = spark.createDataFrame(
        rows, "time timestamp, k string, x double, y double")
    out_dir = str(tmp_path / "rolate")
    os.makedirs(out_dir, exist_ok=True)
    # replay: [hours 0-5, 9] then LATE [6-7] then [10-12]
    for i, idx in enumerate([[0, 1, 2, 3, 4, 5, 8], [6, 7], [9, 10, 11]]):
        sub = [rows[j] for j in idx]
        (spark.createDataFrame(sub, batch.schema).coalesce(1)
         .write.mode("overwrite").parquet(out_dir + f"/_t{i}"))
        src = next(f for f in os.listdir(out_dir + f"/_t{i}")
                   if f.endswith(".parquet"))
        shutil.move(os.path.join(out_dir + f"/_t{i}", src),
                    os.path.join(out_dir, f"chunk_{i}.parquet"))
        shutil.rmtree(out_dir + f"/_t{i}")
    st = (spark.readStream.schema(batch.schema)
          .option("maxFilesPerTrigger", 1).parquet(out_dir))
    out = ts_stream.rolling_ols_stream(st, "y", "x", key=["k"],
                                       window="1d", min_samples=3)
    _run_to_table(out, "so_ro_late")
    got = {r["__tns"]: (r.beta, r.alpha, r.r2)
           for r in spark.sql("SELECT * FROM so_ro_late").collect()}
    exp_df = rolling_ols(
        batch.withColumn("__tns", F.unix_micros("time") * 1000),
        "y", "x", W.past_absolute_time("1d"), key=["k"], min_samples=3)
    exp = {r["__tns"]: (r.beta, r.alpha, r.r2) for r in exp_df.collect()}
    late_ns = int((base + pd.Timedelta(hours=10)).value)
    checked = 0
    for tns, g in got.items():
        if tns >= late_ns:
            e = exp[tns]
            for gv, ev in zip(g, e):
                assert (gv is None) == (ev is None) and \
                    (gv is None or abs(gv - ev) < 1e-9), (tns, g, e)
            checked += 1
    assert checked >= 3
    assert got[late_ns][0] is not None  # hour-10 window includes 6-7


def test_rolling_ols_multi_stream_vs_duckdb(spark, con, tmp_path):
    """Seventeenth replay gate: streaming k=2 rolling OLS == DuckDB's
    complete-case windowed Gramian sums solved by Cramer's rule over
    the batch range frame, on an in-order file replay (every 9th x1
    nulled on both sides to pin the complete-case rule)."""
    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("time", F.col("ts").cast("timestamp"))
          .withColumn("x1", F.when(F.col("event_id") % 9 != 0,
                                   F.get_json_object(F.col("props"), "$.k")
                                   .cast("double")))
          .withColumn("x2", (F.col("event_id") % 7).cast("double"))
          .select("time", "user_id", "x1", "x2", "value"))
    st = _replay(spark, ev, str(tmp_path / "rom"))
    out = ts_stream.rolling_ols_multi_stream(
        st, "value", ["x1", "x2"], key=["user_id"], window="7d",
        min_samples=5)
    _run_to_table(out, "so_rolsm")
    got = (spark.sql("SELECT * FROM so_rolsm")
           .filter(F.col("beta").isNotNull())
           .select(F.col("__tns").alias("tns"), "user_id", "x1", "x2",
                   "value",
                   (F.floor(F.col("alpha") * 10000 + 0.5) / 10000)
                   .alias("alpha"),
                   (F.floor(F.col("beta")[0] * 10000 + 0.5) / 10000)
                   .alias("b1"),
                   (F.floor(F.col("beta")[1] * 10000 + 0.5) / 10000)
                   .alias("b2"),
                   (F.floor(F.col("r2") * 1000000 + 0.5) / 1000000)
                   .alias("r2")))
    sql = """
      WITH e AS (
        SELECT epoch_us(CAST(ts AS TIMESTAMP)) * 1000 AS tns, user_id,
               CASE WHEN event_id % 9 <> 0 THEN
                 CAST(json_extract_string(props, '$.k') AS DOUBLE) END
                 AS x1,
               (event_id % 7)::DOUBLE AS x2, value
        FROM events
      ),
      m AS (
        SELECT tns, user_id, x1, x2, value,
               CASE WHEN x1 IS NOT NULL AND value IS NOT NULL THEN x1
                 END AS mx1,
               CASE WHEN x1 IS NOT NULL AND value IS NOT NULL THEN x2
                 END AS mx2,
               CASE WHEN x1 IS NOT NULL AND value IS NOT NULL THEN value
                 END AS my
        FROM e
      ),
      s AS (
        SELECT tns, user_id, x1, x2, value,
               count(my) OVER w AS n,
               sum(mx1) OVER w AS a, sum(mx2) OVER w AS b,
               sum(mx1 * mx1) OVER w AS c, sum(mx1 * mx2) OVER w AS d,
               sum(mx2 * mx2) OVER w AS e,
               sum(my) OVER w AS sy, sum(mx1 * my) OVER w AS p,
               sum(mx2 * my) OVER w AS q, sum(my * my) OVER w AS syy
        FROM m
        WINDOW w AS (PARTITION BY user_id ORDER BY tns
                     RANGE BETWEEN 604800000000000 PRECEDING
                     AND CURRENT ROW)
      ),
      solved AS (
        SELECT *, n * (c * e - d * d) - a * (a * e - d * b)
                  + b * (a * d - c * b) AS det
        FROM s
      ),
      coefs AS (
        SELECT tns, user_id, x1, x2, value, n, sy, p, q, syy, det,
               (sy * (c * e - d * d) - a * (p * e - d * q)
                  + b * (p * d - c * q)) / det AS alpha,
               (n * (p * e - d * q) - sy * (a * e - d * b)
                  + b * (a * q - p * b)) / det AS b1,
               (n * (c * q - p * d) - a * (a * q - p * b)
                  + sy * (a * d - c * b)) / det AS b2
        -- relative singularity guard (r10), mirrors the operator
        FROM solved WHERE n >= 5 AND abs(det) > 1e-9 * abs(n * c * e)
      )
      SELECT tns, user_id, x1, x2, value,
             floor(alpha * 10000 + 0.5) / 10000 AS alpha,
             floor(b1 * 10000 + 0.5) / 10000 AS b1,
             floor(b2 * 10000 + 0.5) / 10000 AS b2,
             CASE WHEN syy - sy * sy / n > 0 THEN
               floor((1.0 - (syy - alpha * sy - b1 * p - b2 * q)
                            / (syy - sy * sy / n)) * 1000000 + 0.5)
                 / 1000000
             END AS r2
      FROM coefs
    """
    ok, msg = compare("so_rolsm", got, sql, con)
    assert ok, msg


def test_streaming_bloom_ingestion_vs_duckdb(spark, con, tmp_path):
    """Fifteenth replay gate (r4 judge item #8): bloom_flag is
    map-only (bitmap rides a broadcast into one Arrow stage), so it
    runs unchanged on a readStream — the per-batch incremental-
    ingestion shape at 100 TB: build the corpus filter once in batch,
    flag every arriving micro-batch against it. Replays the documents
    table as a 3-chunk file stream and compares the sink against the
    SAME DuckDB oracle as the batch bloom_dedup gate (false positives
    included, value-for-value)."""
    from entry_queries.extras_q import (_BLOOM_K, _BLOOM_M,
                                        _BLOOM_SALT)
    from flint_spark.pipeline import bloom

    docs_b = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "text")
    bf = bloom.bloom_build(docs_b.filter(F.col("doc_id") % 2 == 0),
                           "doc_id", m=_BLOOM_M, k=_BLOOM_K,
                           salt=_BLOOM_SALT)
    out_dir = str(tmp_path / "docs")
    os.makedirs(out_dir, exist_ok=True)
    for i, (lo, hi) in enumerate([(0, 170), (170, 340), (340, 10**9)]):
        part = docs_b.filter((F.col("doc_id") >= lo)
                             & (F.col("doc_id") < hi))
        tmp = os.path.join(out_dir, f"_tmp{i}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        shutil.move(os.path.join(tmp, src),
                    os.path.join(out_dir, f"chunk_{i}.parquet"))
        shutil.rmtree(tmp)
    stream = (spark.readStream.schema(docs_b.schema)
              .option("maxFilesPerTrigger", 1).parquet(out_dir))
    flagged = bloom.bloom_flag(stream, bf, "doc_id", m=_BLOOM_M,
                               k=_BLOOM_K, salt=_BLOOM_SALT) \
        .select("doc_id", "maybe_seen")
    _run_to_table(flagged, "s_bloom")

    import __spark_entry__ as entry
    sql = entry.extra_oracle_sql()["bloom_dedup"]
    got = spark.sql("SELECT * FROM s_bloom")
    ok, msg = compare("stream_bloom", got, sql, con)
    assert ok, msg
    # non-vacuous: the even half is seen, odd ids are (mostly) not
    rows = {r.doc_id: r.maybe_seen for r in got.collect()}
    assert all(v for i, v in rows.items() if i % 2 == 0)
    assert not all(v for i, v in rows.items() if i % 2 == 1)


def test_anomaly_stream_vs_duckdb(spark, con, tmp_path):
    """Streaming rolling z-score replay == DuckDB's exclusive-bound
    range frame (the batch anomaly_zscore oracle shape) on an in-order
    file replay. Every 7th event's value is nulled on BOTH sides, so
    the gate pins the null-skip contract: null rows score null/False
    and never enter any baseline (batch avg/stddev/count semantics)."""
    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("time", F.col("ts").cast("timestamp"))
          .withColumn("value", F.when(F.col("event_id") % 7 != 0,
                                      F.col("value")))
          .select("time", "event_id", "user_id", "value"))
    st = _replay(spark, ev, str(tmp_path / "an"))
    out = ts_stream.detect_anomalies_stream(st, "value", key=["user_id"],
                                            window="7d", k=2.5)
    _run_to_table(out, "so_anomaly")
    got = (spark.sql("SELECT * FROM so_anomaly")
           .filter(F.col("value_anomaly"))
           .select(F.col("__tns").alias("tns"), "user_id", "value",
                   (F.floor(F.col("value_zscore") * 1000000 + 0.5)
                    / 1000000).alias("z")))
    sql = """
      WITH ev AS (
        SELECT ts, user_id,
               CASE WHEN event_id % 7 <> 0 THEN value END AS value
        FROM events
      ), scored AS (
        SELECT epoch_us(CAST(ts AS TIMESTAMP)) * 1000 AS tns, user_id, value,
               avg(value) OVER w AS mu,
               stddev_samp(value) OVER w AS sd,
               count(value) OVER w AS n
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING)
      )
      SELECT tns, user_id, value,
             floor(((value - mu) / sd) * 1000000 + 0.5) / 1000000 AS z
      FROM scored
      WHERE n >= 5 AND sd > 0 AND abs((value - mu) / sd) > 2.5
    """
    ok, msg = compare("so_anomaly", got, sql, con)
    assert ok, msg


def test_anomaly_stream_late_arrival_converges(spark, tmp_path):
    """A whole chunk of LATE events (inside the horizon, no watermark)
    must slot into the state buffer in timeline order: rows scored in
    later triggers see the same baselines as the batch operator. Rows
    scored BEFORE the late chunk arrived legitimately differ (append
    mode cannot retract); the gate compares only rows emitted at or
    after the late data landed, plus buffer integrity via the final
    trigger."""
    import pandas as pd

    from flint_spark.operators.windows_ops import detect_anomalies

    base = pd.Timestamp("2024-01-01")
    rows = [((base + pd.Timedelta(hours=h)).to_pydatetime(), "k", float(v))
            for h, v in [
        (0, 10.0), (1, 11.0), (2, 9.0), (3, 10.5), (4, 9.5), (5, 10.2),
        # chunk 2 (late: earlier than chunk 1's tail, inside 1d horizon)
        (6, 30.0), (7, 10.1),
        # chunk 3 (after late data: baselines must include hours 6-7)
        (9, 10.0), (10, 29.0), (11, 10.3), (12, 9.9),
    ]]
    batch = spark.createDataFrame(rows, "time timestamp, k string, "
                                        "value double")
    out_dir = str(tmp_path / "late")
    os.makedirs(out_dir, exist_ok=True)
    # replay order: hours [0-5, 9], then LATE [6-7], then [10-12]
    chunks = [[0, 1, 2, 3, 4, 5, 8], [6, 7], [9, 10, 11]]
    for i, idx in enumerate(chunks):
        sub = [rows[j] for j in idx]
        (spark.createDataFrame(sub, batch.schema).coalesce(1)
         .write.mode("overwrite").parquet(out_dir + f"/_t{i}"))
        src = next(f for f in os.listdir(out_dir + f"/_t{i}")
                   if f.endswith(".parquet"))
        shutil.move(os.path.join(out_dir + f"/_t{i}", src),
                    os.path.join(out_dir, f"chunk_{i}.parquet"))
        shutil.rmtree(out_dir + f"/_t{i}")
    st = (spark.readStream.schema(batch.schema)
          .option("maxFilesPerTrigger", 1).parquet(out_dir))
    out = ts_stream.detect_anomalies_stream(
        st, "value", key=["k"], window="1d", k=2.0, min_baseline=3)
    _run_to_table(out, "so_late")
    got = {r["__tns"]: (r["value_zscore"], r["value_anomaly"])
           for r in spark.sql("SELECT * FROM so_late").collect()}
    exp = {r["__tns"]: (r["value_zscore"], r["value_anomaly"])
           for r in detect_anomalies(
               batch.withColumn("__tns",
                                F.unix_micros("time") * 1000),
               "value", window="1d", k=2.0, min_baseline=3)
           .collect()}
    late_ns = int((base + pd.Timedelta(hours=10)).value)
    checked = 0
    for tns, (z, a) in got.items():
        if tns >= late_ns:  # scored after the late chunk landed
            ez, ea = exp[tns]
            assert a == ea and (z == ez or abs(z - ez) < 1e-9), \
                (tns, z, ez)
            checked += 1
    assert checked >= 3
    # the engineered spike at hour 10 must be flagged (it would be
    # missed if the late 30.0 corrupted the sorted buffer)
    assert got[late_ns][1] is True


def test_chunking_stream_vs_duckdb(spark, con, tmp_path):
    """chunk_documents is a pure projection + generator, so it runs
    unchanged on a readStream (like the classifier/signature trio):
    replay the documents table as a 3-chunk file stream and compare
    the chunked sink against the batch chunk_docs oracle."""
    import os as _os
    import shutil as _shutil

    from flint_spark.pipeline.text import chunk_documents

    docs_b = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "text")
    out_dir = str(tmp_path / "docs")
    _os.makedirs(out_dir, exist_ok=True)
    for i, (lo, hi) in enumerate([(0, 170), (170, 340), (340, 10**9)]):
        part = docs_b.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        tmp = _os.path.join(out_dir, f"_tmp{i}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = next(f for f in _os.listdir(tmp) if f.endswith(".parquet"))
        _shutil.move(_os.path.join(tmp, src),
                     _os.path.join(out_dir, f"chunk_{i}.parquet"))
        _shutil.rmtree(tmp)
    stream = (spark.readStream.schema(docs_b.schema)
              .option("maxFilesPerTrigger", 1).parquet(out_dir))

    chunked = chunk_documents(stream, max_tokens=64, overlap=16) \
        .select("doc_id", "chunk_id", "chunk_tokens", "chunk_text")
    q = (chunked.writeStream.outputMode("append").format("memory")
         .queryName("s_chunks").start())
    q.processAllAvailable()
    q.stop()

    import __spark_entry__ as entry
    ok, msg = compare("stream_chunks", spark.sql("SELECT * FROM s_chunks"),
                      entry.extra_oracle_sql()["chunk_docs"], con)
    assert ok, msg


def test_interval_tagging_stream_vs_duckdb(spark, con, tmp_path):
    """Stream-static point-in-interval tagging: streamed events join a
    STATIC interval table through point_in_interval_join unchanged
    (bucket explode on the static side, map-side bucket id on the
    stream, stream-static equi-join + residual filter — all
    append-mode-legal). Oracle: DuckDB runs the inequality join."""
    from flint_spark.operators.joins import point_in_interval_join

    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("time", F.col("ts").cast("timestamp")).drop("ts"))
    iv = (ev.filter(F.col("event_id") % 97 == 0)
          .select(F.col("event_id").alias("iv_id"),
                  (F.col("time") - F.expr("INTERVAL 30 MINUTES")).alias("begin"),
                  (F.col("time") + F.expr("INTERVAL 30 MINUTES")).alias("end")))
    stream = _replay(spark, ev.select("time", "event_id", "value"),
                     str(tmp_path / "pts"))
    out = point_in_interval_join(stream, iv, bucket="1h") \
        .select("event_id", "iv_id")
    _run_to_table(out, "s_ivtag")

    ok, msg = compare("stream_ivtag", spark.sql("SELECT * FROM s_ivtag"), """
      WITH iv AS (
        SELECT event_id AS iv_id,
               CAST(ts AS TIMESTAMP) - INTERVAL 30 MINUTE AS b,
               CAST(ts AS TIMESTAMP) + INTERVAL 30 MINUTE AS e
        FROM events WHERE event_id % 97 = 0)
      SELECT p.event_id, iv.iv_id
      FROM events p JOIN iv
        ON CAST(p.ts AS TIMESTAMP) >= iv.b AND CAST(p.ts AS TIMESTAMP) < iv.e
    """, con)
    assert ok, msg


def test_topk_join_static_stream_vs_duckdb(spark, con, tmp_path):
    """Streaming last-k enrichment (topk_join_static): the events
    stream picks up its 3 most recent orders per user map-side from
    the broadcast static table; the sink matches the batch asof_topk
    oracle (DESC-list subquery)."""
    import __spark_entry__ as entry
    from flint_spark.streaming.ts_stream import topk_join_static
    from entry_queries.common import R, _orders_right

    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("time", F.col("ts").cast("timestamp")).drop("ts")
          .select("time", "event_id", "user_id"))
    stream = _replay(spark, ev, str(tmp_path / "ev"))
    out = topk_join_static(stream, _orders_right(spark, SF), k=3,
                           tolerance="9000d", key=["user_id"])
    arr = F.col("o_totalprice_lastk")
    proj = out.select(
        "event_id", "user_id", "n_matched",
        R(F.element_at(arr, 1), 4).alias("v1"),
        R(F.element_at(arr, 2), 4).alias("v2"),
        R(F.element_at(arr, 3), 4).alias("v3"))
    _run_to_table(proj, "s_topk")

    ok, msg = compare("stream_topk", spark.sql("SELECT * FROM s_topk"),
                      entry.extra_oracle_sql()["asof_topk"], con)
    assert ok, msg


def test_token_shift_stream_vs_duckdb(spark, con, tmp_path):
    """Streaming drift monitor: odd-id documents replay as a 3-chunk
    stream against the even-id batch reference; the K+1-row running
    bucket counts finalize through the SHARED probability/KL math and
    match the batch token_shift oracle bitwise."""
    import os as _os
    import shutil as _shutil

    import __spark_entry__ as entry
    from entry_queries.common import R
    from flint_spark.pipeline.text import (token_shift_finalize,
                                           token_shift_reference)
    from flint_spark.streaming.ts_stream import token_shift_stream

    docs_b = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "text")
    ref = token_shift_reference(docs_b.filter(F.col("doc_id") % 2 == 0),
                                vocab_size=12)

    new_b = docs_b.filter(F.col("doc_id") % 2 == 1)
    out_dir = str(tmp_path / "docs")
    _os.makedirs(out_dir, exist_ok=True)
    for i, (lo, hi) in enumerate([(0, 170), (170, 340), (340, 10**9)]):
        part = new_b.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        tmp = _os.path.join(out_dir, f"_tmp{i}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = next(f for f in _os.listdir(tmp) if f.endswith(".parquet"))
        _shutil.move(_os.path.join(tmp, src),
                     _os.path.join(out_dir, f"chunk_{i}.parquet"))
        _shutil.rmtree(tmp)
    stream = (spark.readStream.schema(new_b.schema)
              .option("maxFilesPerTrigger", 1).parquet(out_dir))

    counts = token_shift_stream(stream, ref)
    q = (counts.writeStream.outputMode("complete").format("memory")
         .queryName("s_drift").start())
    q.processAllAvailable()
    q.stop()

    final = token_shift_finalize(ref, spark.sql("SELECT * FROM s_drift"))
    proj = final.select("w",
                        R("p_ref", 8).alias("p_ref"),
                        R("p_new", 8).alias("p_new"),
                        R("kl_term", 8).alias("kl_term"),
                        R("rev_kl_term", 8).alias("rev_kl_term"),
                        R("tv_term", 8).alias("tv_term"))
    ok, msg = compare("stream_drift", proj,
                      entry.extra_oracle_sql()["token_shift"], con)
    assert ok, msg


def test_ohlc_bars_stream_vs_duckdb(spark, con, tmp_path):
    """Streaming OHLCV bars replay (22nd gate) == the batch ohlc oracle:
    tumbling 1-day windows + the shared ``bar_aggs`` list, sentinel
    closes every real window. TWAP is batch-only (lead is not
    expressible under streaming aggregation), so the compare covers
    the OHLCV subset."""
    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("time", F.col("ts").cast("timestamp"))
          .withColumn("vol", F.get_json_object("props", "$.k").cast("double"))
          .select("time", "event_type", "event_id", "value", "vol"))
    out_dir = str(tmp_path / "ohlc")
    _time_split_files(ev, out_dir, _SPLITS)
    _append_sentinel(
        spark, ev, out_dir,
        lambda t: ev.limit(1).select(
            t.alias("time"), F.lit("zz_sentinel").alias("event_type"),
            F.lit(-1).cast("long").alias("event_id"),
            F.lit(0.0).alias("value"), F.lit(0.0).alias("vol")))
    st = (spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(out_dir))
    bars = ts_stream.ohlc_bars_stream(
        st, "1 day", "value", key=["event_type"], volume_col="vol",
        tie_break=["event_id"], watermark="1 minute")
    _run_to_table(bars, "so_ohlc")
    r4 = lambda c: F.floor(F.col(c) * 10000 + 0.5) / 10000
    r6 = lambda c: F.floor(F.col(c) * 1000000 + 0.5) / 1000000
    got = (spark.sql("SELECT * FROM so_ohlc")
           .select("time", "event_type",
                   r4("open").alias("open"), r4("high").alias("high"),
                   r4("low").alias("low"), r4("close").alias("close"),
                   "n", r4("volume").alias("volume"),
                   r6("vwap").alias("vwap")))
    sql = """
      WITH e AS (
        SELECT event_type, epoch_us(ts) AS tus, value, event_id,
               CAST(json_extract_string(props, '$.k') AS DOUBLE) AS vol,
               date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
        FROM events WHERE value IS NOT NULL)
      SELECT day AS time, event_type,
             floor(first(value ORDER BY tus, event_id, value) * 1e4 + 0.5) / 1e4 AS open,
             floor(max(value) * 1e4 + 0.5) / 1e4 AS high,
             floor(min(value) * 1e4 + 0.5) / 1e4 AS low,
             floor(last(value ORDER BY tus, event_id, value) * 1e4 + 0.5) / 1e4 AS close,
             count(*) AS n,
             floor(sum(COALESCE(vol, 0)) * 1e4 + 0.5) / 1e4 AS volume,
             CASE WHEN sum(COALESCE(vol, 0)) <> 0
                  THEN floor(sum(value * COALESCE(vol, 0))
                             / sum(COALESCE(vol, 0)) * 1e6 + 0.5) / 1e6
             END AS vwap
      FROM e GROUP BY day, event_type
    """
    ok, msg = compare("so_ohlc", got, sql, con)
    assert ok, msg


def test_cms_build_stream_vs_duckdb(spark, con, tmp_path):
    """Streaming count-min ingestion replay (23rd gate): per-day cell
    partials == DuckDB replaying the md5 position family per day, and
    the re-summed windows feed the BATCH estimator with estimates
    equal to a batch-built sketch — mergeability across the
    batch/stream boundary, value-for-value."""
    from flint_spark.pipeline.sketches import (cms_build, cms_estimate,
                                               _pos_sql)

    W, D = 64, 3
    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("time", F.col("ts").cast("timestamp"))
          .select("time", "user_id"))
    out_dir = str(tmp_path / "cms")
    _time_split_files(ev, out_dir, _SPLITS)
    # sentinel key must be NON-null: cms_build_stream filters null keys
    # BEFORE the watermark node, and a filtered row cannot advance the
    # watermark; -1 never occurs in the data and its far-future window
    # never closes, so no sentinel cell is ever emitted
    _append_sentinel(
        spark, ev, out_dir,
        lambda t: ev.limit(1).select(t.alias("time"),
                                     F.lit(-1).cast("long")
                                     .alias("user_id")))
    st = (spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(out_dir))
    cells = ts_stream.cms_build_stream(st, "user_id", "1 day",
                                       width=W, depth=D,
                                       watermark="1 minute")
    _run_to_table(cells, "so_cms")
    got = spark.sql("SELECT * FROM so_cms")
    pos = lambda j: _pos_sql("CAST(user_id AS VARCHAR)", j, W, "cms")
    unions = " UNION ALL ".join(
        f"SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS time, "
        f"{j} AS j, {pos(j)} AS bucket FROM events "
        f"WHERE user_id IS NOT NULL" for j in range(D))
    sql = (f"SELECT time, j, bucket, count(*) AS cnt FROM ({unions}) "
           f"GROUP BY 1, 2, 3")
    ok, msg = compare("so_cms", got, sql, con)
    assert ok, msg

    # sentinel's window never closed, so re-summed cells == batch build
    merged = (got.groupBy("j", "bucket")
              .agg(F.sum("cnt").alias("cnt")))
    batch = cms_build(ev, "user_id", width=W, depth=D)
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, batch.collect()))
    probe = ev.select("user_id").distinct()
    est_s = {r.user_id: r.est_count for r in cms_estimate(
        probe, merged, "user_id", width=W, depth=D).collect()}
    est_b = {r.user_id: r.est_count for r in cms_estimate(
        probe, batch, "user_id", width=W, depth=D).collect()}
    assert est_s == est_b


def test_bm25_score_stream_vs_duckdb(spark, con, tmp_path):
    """Stream-static BM25 (24th gate): corpus statistics computed once
    in batch (bm25_corpus_stats — 2 + |query| driver numbers), then a
    replayed document stream scores map-only against the inlined
    literals (bm25_score_static) — identical to the batch bm25 gate's
    oracle because both paths share _bm25_score_exprs and the stats
    enter the arithmetic as the same doubles."""
    import os as _os
    import shutil as _shutil

    from flint_spark.pipeline.text import bm25_corpus_stats, bm25_score_static

    terms = ["hash", "join", "vector"]
    docs_b = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "text")
    stats = bm25_corpus_stats(docs_b, terms)
    out_dir = str(tmp_path / "bm25docs")
    _os.makedirs(out_dir, exist_ok=True)
    for i, (lo, hi) in enumerate([(0, 170), (170, 340), (340, 10**9)]):
        part = docs_b.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        tmp = _os.path.join(out_dir, f"_tmp{i}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = next(f for f in _os.listdir(tmp) if f.endswith(".parquet"))
        _shutil.move(_os.path.join(tmp, src),
                     _os.path.join(out_dir, f"chunk_{i}.parquet"))
        _shutil.rmtree(tmp)
    stream = (spark.readStream.schema(docs_b.schema)
              .option("maxFilesPerTrigger", 1).parquet(out_dir))
    scored = bm25_score_static(stream, terms, stats)
    q = (scored.select("doc_id",
                       (F.floor(F.col("bm25") * 1e6 + 0.5) / 1e6)
                       .alias("bm25"), "n_terms")
         .writeStream.outputMode("append").format("memory")
         .queryName("s_bm25").start())
    q.processAllAvailable()
    q.stop()

    import __spark_entry__ as entry
    bm25_sql = entry.extra_oracle_sql()["bm25"]
    ok, msg = compare("stream_bm25",
                      spark.sql("SELECT * FROM s_bm25"), bm25_sql, con)
    assert ok, msg


def test_funnel_stream_vs_duckdb(spark, con, tmp_path):
    """Streaming funnel replay (25th gate): k-timestamp bounded state
    per user; the monotone per-trigger emissions' max-n_steps row per
    user equals the batch funnel (chained min-after oracle) under an
    in-order replay."""
    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("time", F.col("ts").cast("timestamp"))
          .select("time", "user_id", "event_type"))
    out_dir = str(tmp_path / "fun")
    _time_split_files(ev, out_dir, _SPLITS)
    st = (spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(out_dir))
    out = ts_stream.funnel_stream(st, ["view", "click", "purchase"],
                                  key=["user_id"])
    _run_to_table(out, "so_funnel")
    got = spark.sql("""
      SELECT DISTINCT user_id, step1_tns, step2_tns, step3_tns,
             n_steps, converted
      FROM so_funnel
      WHERE (user_id, n_steps) IN
            (SELECT user_id, max(n_steps) FROM so_funnel GROUP BY user_id)
    """)
    import __spark_entry__ as entry
    funnel_sql = entry.extra_oracle_sql()["funnel"]
    sql = f"""
      SELECT user_id, epoch_ns(step1_time) AS step1_tns,
             epoch_ns(step2_time) AS step2_tns,
             epoch_ns(step3_time) AS step3_tns, n_steps, converted
      FROM ({funnel_sql})
    """
    ok, msg = compare("stream_funnel", got, sql, con)
    assert ok, msg


def test_drawdown_stream_vs_duckdb(spark, con, tmp_path):
    """Streaming running-peak drawdown replay (26th gate): one-double
    state per user; in-order replay == the batch window oracle,
    including null-value rows (peak inherited, drawdown null) and the
    peak<=0 undefined rule."""
    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("time", F.col("ts").cast("timestamp"))
          .select("time", "user_id", "value"))
    out_dir = str(tmp_path / "dd")
    _time_split_files(ev, out_dir, _SPLITS)
    st = (spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(out_dir))
    out = ts_stream.drawdown_stream(st, "value", key=["user_id"])
    _run_to_table(out, "so_dd")
    r6 = lambda c: F.floor(F.col(c) * 1e6 + 0.5) / 1e6
    got = (spark.sql("SELECT * FROM so_dd")
           .select(F.col("__tns").alias("tns"), "user_id",
                   r6("value").alias("value"), r6("peak").alias("peak"),
                   r6("drawdown").alias("drawdown")))
    sql = """
      WITH p AS (
        SELECT epoch_ns(CAST(ts AS TIMESTAMP)) AS tns, user_id, value,
               max(value) OVER (PARTITION BY user_id
                                ORDER BY ts ROWS UNBOUNDED PRECEDING)
                 AS peak
        FROM events)
      SELECT tns, user_id,
             floor(value * 1e6 + 0.5) / 1e6 AS value,
             floor(peak * 1e6 + 0.5) / 1e6 AS peak,
             CASE WHEN peak > 0
                  THEN floor((peak - value) / peak * 1e6 + 0.5) / 1e6
             END AS drawdown
      FROM p
    """
    ok, msg = compare("stream_dd", got, sql, con)
    assert ok, msg


def _desc_order_replay(spark, pdf_rows, schema, out_dir):
    """One trigger, one parquet file written in DESCENDING time order,
    so a group split across Arrow chunks arrives newest-chunk-first —
    the adversarial layout for any per-chunk fold."""
    import pandas as pd

    df = (spark.createDataFrame(pd.DataFrame(pdf_rows), schema=schema)
          .orderBy(F.col("time").desc()))
    df.coalesce(1).write.mode("overwrite").parquet(out_dir)
    return (spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 10).parquet(out_dir))


def _collect_sorted(spark, name, cols):
    return (spark.sql(f"SELECT {cols} FROM {name} ORDER BY 1, 2")
            .toPandas())


def test_multi_chunk_trigger_parity(spark, tmp_path):
    """Chunk-invariance pin for the _trigger_pdf fix: a key whose
    trigger rows exceed spark.sql.execution.arrow.maxRecordsPerBatch
    reaches the stateful folds as SEVERAL chunks in file (here:
    reverse-time) order. Every fold must assemble + time-sort the whole
    trigger first — per-chunk processing applies running peaks, funnel
    steps and EWMA decays in chunk order and diverges. Gate: the
    7-row-chunk replay must equal the default (single-chunk) replay
    bit-for-bit for drawdown, funnel and EWMA."""
    import math

    import pandas as pd

    n = 60
    base = pd.Timestamp("2024-01-01")
    rows = {
        "time": [base + pd.Timedelta(minutes=i) for i in range(n)],
        "user_id": ["u1"] * (n - 5) + ["u2"] * 5,
        "value": [100.0 + 30.0 * math.sin(i / 3.0) for i in range(n)],
        "event_type": [
            "view" if i == 2 else
            "click" if i == 30 else
            "purchase" if i == 50 else "other" for i in range(n)],
    }
    schema = "time timestamp, user_id string, value double, event_type string"

    def run(tag, batch_rows):
        old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                       str(batch_rows))
        try:
            st = _desc_order_replay(spark, rows, schema,
                                    str(tmp_path / f"src_{tag}"))
            dd = ts_stream.drawdown_stream(st, "value", key=["user_id"])
            _run_to_table(dd, f"mc_dd_{tag}")
            st2 = _desc_order_replay(spark, rows, schema,
                                     str(tmp_path / f"src2_{tag}"))
            fu = ts_stream.funnel_stream(
                st2, ["view", "click", "purchase"], key=["user_id"])
            _run_to_table(fu, f"mc_fu_{tag}")
            st3 = _desc_order_replay(spark, rows, schema,
                                     str(tmp_path / f"src3_{tag}"))
            ew = ts_stream.ewma_stream(st3, "value", key=["user_id"],
                                       alpha=0.1, duration_per_period="1h")
            _run_to_table(ew, f"mc_ew_{tag}")
        finally:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                           old)

    run("one", 100000)   # whole trigger in one chunk: known-good path
    run("many", 7)       # ~9 chunks for u1, newest chunk first
    for prefix, cols in (
            ("mc_dd", "user_id, __tns, value, peak, drawdown"),
            ("mc_fu", "user_id, n_steps, step1_tns, step2_tns, "
                      "step3_tns, converted"),
            ("mc_ew", "user_id, __tns, value, value_ewma")):
        a = _collect_sorted(spark, f"{prefix}_one", cols)
        b = _collect_sorted(spark, f"{prefix}_many", cols)
        pd.testing.assert_frame_equal(a, b, check_exact=True,
                                      obj=prefix)


def test_ewm_volatility_stream_vs_duckdb(spark, con, tmp_path):
    """Streaming decayed-volatility replay (27th gate): four-double
    state per key (last t, Σwx, Σwx², Σw); in-order replay == the
    closed-form exp-prefix-sum ratios in DuckDB, rounded to 4 decimals
    like the ewma gate (block renormalization at trigger boundaries
    rules out bitwise)."""
    import math

    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("time", F.col("ts").cast("timestamp"))
          .select("time", "user_id", "value"))
    st = _replay(spark, ev, str(tmp_path / "v"))
    out = ts_stream.ewm_volatility_stream(st, "value", key=["user_id"],
                                          alpha=0.05,
                                          duration_per_period="1d")
    _run_to_table(out, "so_ewmvol")
    r4 = lambda c: F.floor(F.col(c) * 10000 + 0.5) / 10000
    got = (spark.sql("SELECT * FROM so_ewmvol")
           .select(F.col("__tns").alias("tns"), "user_id",
                   r4("value_ewm_mean").alias("ewm_mean"),
                   r4("value_ewm_var").alias("ewm_var"),
                   r4("value_ewm_vol").alias("ewm_vol")))
    lam = -math.log1p(-0.05) / 86_400e6
    sql = f"""
      WITH e AS (
        SELECT epoch_ns(ts) AS tns, user_id, value,
               epoch_us(ts)::DOUBLE AS tus,
               min(epoch_us(ts)) OVER (PARTITION BY user_id)::DOUBLE AS base
        FROM events
      ),
      s AS (
        SELECT tns, user_id,
               sum(value * exp((tus - base) * {lam})) OVER w AS nume,
               sum(value * value * exp((tus - base) * {lam})) OVER w AS numq,
               sum(exp((tus - base) * {lam})) OVER w AS den
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY tns
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      )
      SELECT tns, user_id,
             floor((nume / den) * 1e4 + 0.5) / 1e4 AS ewm_mean,
             floor(greatest(numq / den - (nume / den) * (nume / den), 0.0)
                   * 1e4 + 0.5) / 1e4 AS ewm_var,
             floor(sqrt(greatest(numq / den - (nume / den) * (nume / den),
                                 0.0)) * 1e4 + 0.5) / 1e4 AS ewm_vol
      FROM s
    """
    ok, msg = compare("so_ewmvol", got, sql, con)
    assert ok, msg


def test_ewm_family_stream_null_skip(spark, tmp_path):
    """A null value in the stream must not poison the key's state:
    replay a series with interior nulls through ewma_stream and
    ewm_volatility_stream and compare against the batch operators
    (ewma_native null-skip contract, shared _decayed_carry_scan)."""
    import pandas as pd

    from flint_spark.operators.ema import ewm_volatility, ewma_native

    rows = {
        "time": [pd.Timestamp("2024-01-01") + pd.Timedelta(hours=i)
                 for i in range(6)],
        "user_id": ["u"] * 6,
        "value": [1.0, None, 3.0, None, 5.0, 2.0],
    }
    schema = "time timestamp, user_id string, value double"
    batch = spark.createDataFrame(pd.DataFrame(rows), schema=schema)
    src = str(tmp_path / "nulls")
    batch.coalesce(1).write.mode("overwrite").parquet(src)
    st = (spark.readStream.schema(batch.schema)
          .option("maxFilesPerTrigger", 1).parquet(src))

    out = ts_stream.ewma_stream(st, "value", key=["user_id"],
                                alpha=0.2, duration_per_period="1h")
    _run_to_table(out, "ns_ewma")
    got = {r["__tns"]: r.value_ewma
           for r in spark.sql("SELECT * FROM ns_ewma").collect()}
    exp = {r.time: r.value_ewma for r in
           ewma_native(batch.withColumn("time", F.unix_timestamp("time")
                                        .cast("long") * 10 ** 9),
                       "value", alpha=0.2, duration_per_period="1h",
                       key=["user_id"]).collect()}
    assert set(got) == set(exp) and len(got) == 6
    for t in got:
        assert got[t] is not None and abs(got[t] - exp[t]) < 1e-9, t

    st2 = (spark.readStream.schema(batch.schema)
           .option("maxFilesPerTrigger", 1).parquet(src))
    vout = ts_stream.ewm_volatility_stream(st2, "value", key=["user_id"],
                                           alpha=0.2,
                                           duration_per_period="1h")
    _run_to_table(vout, "ns_vol")
    gv = {r["__tns"]: (r.value_ewm_mean, r.value_ewm_vol)
          for r in spark.sql("SELECT * FROM ns_vol").collect()}
    ev = {r.time: (r.value_ewm_mean, r.value_ewm_vol) for r in
          ewm_volatility(batch.withColumn("time",
                                          F.unix_timestamp("time")
                                          .cast("long") * 10 ** 9),
                         "value", alpha=0.2, duration_per_period="1h",
                         key=["user_id"]).collect()}
    assert set(gv) == set(ev) and len(gv) == 6
    for t in gv:
        assert gv[t][0] is not None and gv[t][1] is not None, t
        assert abs(gv[t][0] - ev[t][0]) < 1e-9, t
        assert abs(gv[t][1] - ev[t][1]) < 1e-9, t


def test_dema_stream_vs_duckdb(spark, con, tmp_path):
    """Streaming Brown double smoothing replay (28th gate): four-double
    state; the single smooth resolves per row, the same step vector
    re-scans the s1 series for the double smooth. In-order replay ==
    the chained closed-form oracle, rounded like the ewma gate."""
    import __spark_entry__ as entry

    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("time", F.col("ts").cast("timestamp"))
          .select("time", "user_id", "value"))
    st = _replay(spark, ev, str(tmp_path / "d"))
    out = ts_stream.brown_double_smoothing_stream(
        st, "value", key=["user_id"], alpha=0.05,
        duration_per_period="1d")
    _run_to_table(out, "so_dema")
    r4 = lambda c, n: F.floor(F.col(c) * 10 ** n + 0.5) / 10 ** n
    got = (spark.sql("SELECT * FROM so_dema")
           .select(F.col("__tns").alias("tns"), "user_id",
                   r4("value_dema_level", 4).alias("dema_level"),
                   r4("value_dema_trend", 6).alias("dema_trend"),
                   r4("value_dema_fcst", 4).alias("dema_fcst")))
    sql = (f"SELECT epoch_ns(time) AS tns, user_id, dema_level, "
           f"dema_trend, dema_fcst FROM ({entry.extra_oracle_sql()['dema']})")
    ok, msg = compare("so_dema", got, sql, con)
    assert ok, msg


def test_realized_volatility_stream_vs_duckdb(spark, con, tmp_path):
    """Streaming realized volatility replay (29th gate): two-number
    log-return chain state + Spark's own watermarked tumbling-window
    aggregation; complete-mode sink == the batch RV oracle."""
    import __spark_entry__ as entry

    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("time", F.col("ts").cast("timestamp"))
          .select("time", "user_id", "event_id", "value"))
    st = _replay(spark, ev, str(tmp_path / "rv"))
    out = ts_stream.realized_volatility_stream(
        st, "1d", "value", key=["user_id"], tie_break=["event_id"],
        watermark="400 days")
    q = (out.writeStream.outputMode("complete").format("memory")
         .queryName("so_rv").start())
    q.processAllAvailable()
    q.stop()
    r = lambda c, n: F.floor(F.col(c) * 10 ** n + 0.5) / 10 ** n
    got = (spark.sql("SELECT * FROM so_rv")
           .select(F.unix_timestamp("time").alias("tsec"), "user_id",
                   r("rv", 8).alias("rv"), r("vol", 6).alias("vol"),
                   "n_returns"))
    sql = (f"SELECT CAST(epoch(time) AS BIGINT) AS tsec, user_id, rv, vol, n_returns "
           f"FROM ({entry.extra_oracle_sql()['realized_vol']})")
    ok, msg = compare("so_rv", got, sql, con)
    assert ok, msg


def test_ewm_corr_stream_vs_duckdb(spark, con, tmp_path):
    """Streaming pairwise decayed moments replay (30th gate):
    seven-number state; in-order replay == the batch ewm_corr oracle
    (closed-form ratios, identical clamps), 4-6 decimal rounding."""
    import __spark_entry__ as entry

    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("time", F.col("ts").cast("timestamp"))
          .withColumn("xf", F.get_json_object(F.col("props"), "$.k")
                      .cast("double"))
          .filter(F.col("xf").isNotNull() & F.col("value").isNotNull())
          .select("time", "event_id", "user_id", "value", "xf"))
    st = _replay(spark, ev, str(tmp_path / "c"))
    out = ts_stream.ewm_corr_stream(st, "value", "xf", key=["user_id"],
                                    alpha=0.05, duration_per_period="1d")
    _run_to_table(out, "so_ewmcorr")
    # Rq, matching the oracle's r10 pre-snap: exact-rational betas
    # (0.9703125) sit ON the half boundary with ulp engine divergence
    from entry_queries.common import Rq
    got = (spark.sql("SELECT * FROM so_ewmcorr")
           .select(F.col("__tns").alias("tns"), "user_id",
                   Rq("value_xf_ewm_cov", 4).alias("ewm_cov"),
                   Rq("value_xf_ewm_corr", 6).alias("ewm_corr"),
                   Rq("value_xf_ewm_beta", 6).alias("ewm_beta")))
    sql = (f"SELECT epoch_ns(time) AS tns, user_id, ewm_cov, ewm_corr, "
           f"ewm_beta FROM ({entry.extra_oracle_sql()['ewm_corr']})")
    ok, msg = compare("so_ewmcorr", got, sql, con)
    assert ok, msg


def test_cusum_stream_vs_duckdb(spark, con, tmp_path):
    """Streaming CUSUM replay == DuckDB running the batch
    prefix-sum-minus-running-min identity with the same in-control
    targets. Every 7th value is nulled on BOTH sides, pinning the
    null-skip contract (nulls freeze the four-number state and score
    null); four doubles of state per key carry the detector across
    the three triggers."""
    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("time", F.col("ts").cast("timestamp"))
          .withColumn("value", F.when(F.col("event_id") % 7 != 0,
                                      F.col("value")))
          .select("time", "event_id", "user_id", "value"))
    st = _replay(spark, ev, str(tmp_path / "cu"))
    out = ts_stream.cusum_stream(st, "value", key=["user_id"],
                                 k=0.5, h=4.0, mu=50.0, sigma=47.0)
    _run_to_table(out, "so_cusum")
    r6 = lambda c: (F.floor(F.col(c) * 1000000 + 0.5) / 1000000)  # noqa: E731
    got = (spark.sql("SELECT * FROM so_cusum")
           .select(F.col("__tns").alias("tns"), "user_id", "value",
                   r6("value_cusum_pos").alias("s_pos"),
                   r6("value_cusum_neg").alias("s_neg"),
                   F.col("value_alarm").alias("alarm")))
    sql = """
      WITH ev AS (
        SELECT epoch_us(CAST(ts AS TIMESTAMP)) * 1000 AS tns,
               epoch_us(ts) AS tus, user_id,
               CASE WHEN event_id % 7 <> 0 THEN value END AS value
        FROM events
      ),
      z AS (SELECT *, (value - 50.0) / 47.0 AS zz FROM ev),
      c AS (
        SELECT *, sum(coalesce(zz - 0.5, 0.0)) OVER w AS cup,
                  sum(coalesce(-zz - 0.5, 0.0)) OVER w AS cdn
        FROM z
        WINDOW w AS (PARTITION BY user_id ORDER BY tus, value
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ),
      m AS (
        SELECT *, least(0.0, min(cup) OVER w) AS mup,
                  least(0.0, min(cdn) OVER w) AS mdn
        FROM c
        WINDOW w AS (PARTITION BY user_id ORDER BY tus, value
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      )
      SELECT tns, user_id, value,
             CASE WHEN zz IS NOT NULL
                  THEN floor((cup - mup) * 1e6 + 0.5) / 1e6 END AS s_pos,
             CASE WHEN zz IS NOT NULL
                  THEN floor((cdn - mdn) * 1e6 + 0.5) / 1e6 END AS s_neg,
             CASE WHEN zz IS NOT NULL
                  THEN (cup - mup > 4.0 OR cdn - mdn > 4.0) END AS alarm
      FROM m
    """
    ok, msg = compare("so_cusum", got, sql, con)
    assert ok, msg


def test_kalman_stream_vs_duckdb(spark, con, tmp_path):
    """Streaming Kalman local-level replay == DuckDB's recursive-CTE
    replay of the exact gain/variance recursion (q=4/day, r=25,
    p0=100). Every 7th value is nulled on BOTH sides: null observations
    score null and leave the (last_t, level, var) state untouched, so
    diffusion spans the gap to the next observed row."""
    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("time", F.col("ts").cast("timestamp"))
          .withColumn("value", F.when(F.col("event_id") % 7 != 0,
                                      F.col("value")))
          .select("time", "event_id", "user_id", "value"))
    st = _replay(spark, ev, str(tmp_path / "kf"))
    out = ts_stream.kalman_stream(st, "value", key=["user_id"],
                                  q=4.0, r=25.0, period="1d", p0=100.0)
    _run_to_table(out, "so_kalman")
    got = (spark.sql("SELECT * FROM so_kalman")
           .filter(F.col("value_kf").isNotNull())
           .select(F.col("__tns").alias("tns"), "user_id", "value",
                   (F.floor(F.col("value_kf") * 1000000 + 0.5)
                    / 1000000).alias("kf")))
    sql = """
      WITH RECURSIVE base AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) * 1000 AS tns,
               epoch_us(ts)::DOUBLE AS tus, value AS x,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts), value, event_id) AS rn
        FROM events
        WHERE event_id % 7 <> 0 AND value IS NOT NULL
      ),
      kf AS (
        SELECT user_id, tns, rn, tus, x, x AS l, 100.0::DOUBLE AS P
        FROM base WHERE rn = 1
        UNION ALL
        SELECT b.user_id, b.tns, b.rn, b.tus, b.x,
               kf.l + ((kf.P + 4.0 * (b.tus - kf.tus) / 86400000000.0)
                       / (kf.P + 4.0 * (b.tus - kf.tus) / 86400000000.0
                          + 25.0)) * (b.x - kf.l) AS l,
               (1.0 - (kf.P + 4.0 * (b.tus - kf.tus) / 86400000000.0)
                    / (kf.P + 4.0 * (b.tus - kf.tus) / 86400000000.0
                       + 25.0))
                 * (kf.P + 4.0 * (b.tus - kf.tus) / 86400000000.0) AS P
        FROM kf JOIN base b ON b.user_id = kf.user_id
                           AND b.rn = kf.rn + 1
      )
      SELECT tns, user_id, x AS value,
             floor(l * 1e6 + 0.5) / 1e6 AS kf
      FROM kf
    """
    ok, msg = compare("so_kalman", got, sql, con)
    assert ok, msg


def test_dsir_score_stream_vs_duckdb(spark, con, tmp_path):
    """Streaming DSIR scoring: a batch-trained hashed-bigram ratio
    model scores a replayed document stream map-side (dsir_score is a
    stateless projection, so it runs unchanged on readStream — the
    online data-selection face), compared against the batch oracle's
    distribution + scoring SQL. Docs replay split on doc_id (documents
    have no event time)."""
    import os
    import shutil

    from flint_spark.pipeline import sampling as smp

    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text"))
    target = docs.filter(F.col("doc_id") % 31 == 0)
    ratios = smp.dsir_log_ratios(docs, target, n_buckets=256)

    out_dir = str(tmp_path / "dsir")
    os.makedirs(out_dir, exist_ok=True)
    for i, (lo, hi) in enumerate([(0, 170), (170, 340), (340, 10**9)]):
        tmp = os.path.join(out_dir, f"_tmp{i}")
        (docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
         .coalesce(1).write.mode("overwrite").parquet(tmp))
        src = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        shutil.move(os.path.join(tmp, src),
                    os.path.join(out_dir, f"chunk_{i}.parquet"))
        shutil.rmtree(tmp)
    st = (spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(out_dir))
    out = smp.dsir_score(st, ratios)
    _run_to_table(out.select("doc_id",
                             (F.floor(F.col("logw") * 1000000 + 0.5)
                              / 1000000).alias("logw")), "so_dsir")
    got = spark.sql("SELECT * FROM so_dsir")

    import __spark_entry__ as entry
    # reuse the batch oracle's CTE chain up to logw (drop the
    # selection tail: scoring is the streamed part)
    full = entry.extra_oracle_sql()["dsir"]
    head = full[:full.index("keyed AS (")]
    sql = head.rstrip().rstrip(",") + """
  SELECT doc_id, floor(logw * 1e6 + 0.5) / 1e6 AS logw FROM lw
"""
    ok, msg = compare("so_dsir", got, sql, con)
    assert ok, msg


def test_holt_winters_stream_vs_duckdb(spark, con, tmp_path):
    """Streaming Holt-Winters replay == the batch recursive-CTE oracle
    (list-typed seasonal vector in the recursion AND in the stream
    state). The (init, level, trend, seas[7]) state carries across the
    three triggers; nulled 7th values freeze it on both sides."""
    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("time", F.col("ts").cast("timestamp"))
          .withColumn("value", F.when(F.col("event_id") % 7 != 0,
                                      F.col("value")))
          .select("time", "event_id", "user_id", "value"))
    st = _replay(spark, ev, str(tmp_path / "hw"))
    out = ts_stream.holt_winters_stream(st, "value", key=["user_id"],
                                        period=7, alpha=0.4, beta=0.2,
                                        gamma=0.3, unit="1d")
    _run_to_table(out, "so_hw")
    r6 = lambda c: (F.floor(F.col(c) * 1000000 + 0.5) / 1000000)  # noqa: E731
    got = (spark.sql("SELECT * FROM so_hw")
           .filter(F.col("value_hw").isNotNull())
           .select(F.col("__tns").alias("tns"), "user_id",
                   r6("value_hw_level").alias("hw_level"),
                   r6("value_hw_trend").alias("hw_trend"),
                   r6("value_hw").alias("hw")))
    lnew = "0.4*(b2.x - hw.seas[b2.phase+1]) + 0.6*(hw.l + hw.b)"
    zeros = "[" + ", ".join(["0.0::DOUBLE"] * 7) + "]"
    sql = f"""
      WITH RECURSIVE base AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) * 1000 AS tns,
               value AS x,
               ((floor(epoch_us(ts) * 1000 / 86400000000000.0)::BIGINT
                 % 7) + 7) % 7 AS phase,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts), value, event_id) AS rn
        FROM events WHERE event_id % 7 <> 0 AND value IS NOT NULL
      ),
      hw AS (
        SELECT user_id, tns, rn, phase, x,
               x AS l, 0.0::DOUBLE AS b, {zeros} AS seas
        FROM base WHERE rn = 1
        UNION ALL
        SELECT b2.user_id, b2.tns, b2.rn, b2.phase, b2.x,
               {lnew} AS l,
               0.2*(({lnew}) - hw.l) + 0.8*hw.b AS b,
               list_transform(range(1, 8), i -> CASE WHEN i = b2.phase+1
                 THEN 0.3*(b2.x - ({lnew})) + 0.7*hw.seas[i]
                 ELSE hw.seas[i] END) AS seas
        FROM hw JOIN base b2 ON b2.user_id = hw.user_id
                            AND b2.rn = hw.rn + 1
      )
      SELECT tns, user_id,
             floor(l * 1e6 + 0.5) / 1e6 AS hw_level,
             floor(b * 1e6 + 0.5) / 1e6 AS hw_trend,
             floor((l + seas[phase+1]) * 1e6 + 0.5) / 1e6 AS hw
      FROM hw
    """
    ok, msg = compare("so_hw", got, sql, con)
    assert ok, msg


def test_kmv_stream_vs_duckdb(spark, con, tmp_path):
    """Streaming KMV replay: after EVERY trigger the per-key running
    sketch equals DuckDB's batch sketch of the cumulative prefix — the
    merge rule (k smallest of old ∪ new) is exactly the batch union
    rule, so state is history-independent. One emitted row per
    (key, trigger-with-rows); the oracle computes the sketch per
    (key, chunk prefix) for chunks where the key has rows, using the
    replay's known split bounds."""
    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("time", F.col("ts").cast("timestamp"))
          .select("time", "user_id", "event_type"))
    st = _replay(spark, ev, str(tmp_path / "kmv"))
    out = ts_stream.kmv_stream(st, "user_id", key=["event_type"], k=16)
    _run_to_table(out, "so_kmv")
    got = (spark.sql("SELECT * FROM so_kmv")
           .select("event_type", "m",
                   (F.floor(F.col("est_distinct") * 1000000 + 0.5)
                    / 1000000).alias("est")))
    sql = """
      WITH chunks AS (
        SELECT * FROM (VALUES
          (1, TIMESTAMP '2024-01-10'),
          (2, TIMESTAMP '2024-01-20'),
          (3, TIMESTAMP '9999-01-01')) t(cid, bound)
      ),
      tagged AS (
        SELECT event_type, user_id, CAST(ts AS TIMESTAMP) AS time,
               CASE WHEN ts < TIMESTAMP '2024-01-10' THEN 1
                    WHEN ts < TIMESTAMP '2024-01-20' THEN 2
                    ELSE 3 END AS cid
        FROM events WHERE user_id IS NOT NULL
      ),
      live AS (SELECT DISTINCT event_type, cid FROM tagged),
      prefix AS (
        SELECT l.event_type, l.cid,
               (('0x' || substr(md5('kmv:' || t.user_id::VARCHAR),
                                1, 13))::BIGINT + 0.5)
                 / 4503599627370496.0
                 AS h
        FROM live l
        JOIN chunks c ON c.cid = l.cid
        JOIN tagged t ON t.event_type = l.event_type
                     AND t.time < c.bound
        GROUP BY 1, 2, 3
      ),
      kept AS (
        SELECT event_type, cid, h,
               row_number() OVER (PARTITION BY event_type, cid
                                  ORDER BY h) AS rk
        FROM prefix
      )
      SELECT event_type,
             count(*)::INT AS m,
             floor((CASE WHEN count(*) >= 16 THEN 15.0 / max(h)
                         ELSE count(*)::DOUBLE END) * 1e6 + 0.5) / 1e6
               AS est
      FROM kept WHERE rk <= 16 GROUP BY event_type, cid
    """
    ok, msg = compare("so_kmv", got, sql, con)
    assert ok, msg


def test_volume_bars_stream_vs_duckdb(spark, con, tmp_path):
    """Streaming volume-clock bars: an in-order replay emits exactly
    the batch operator's CLOSED bars (every bar except each key's
    final open one), bit-for-bit — the per-trigger exclusive volume
    prefix continues from state and folds the same (time, event_id,
    price) order as batch. The oracle is the batch bar SQL with each
    key's max bar_seq dropped."""
    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("time", F.col("ts").cast("timestamp"))
          .withColumn("vol", F.get_json_object("props", "$.k")
                      .cast("double"))
          .select("time", "event_type", "event_id", "value", "vol"))
    st = _replay(spark, ev, str(tmp_path / "vbars"))
    out = ts_stream.volume_bars_stream(st, 250.0, "value", "vol",
                                       key=["event_type"],
                                       tie_break=["event_id"])
    _run_to_table(out, "so_vbars")
    got = (spark.sql("SELECT * FROM so_vbars")
           .select("event_type", "bar_seq", "tns",
                   (F.floor(F.col("open") * 1e4 + 0.5) / 1e4).alias("open"),
                   (F.floor(F.col("high") * 1e4 + 0.5) / 1e4).alias("high"),
                   (F.floor(F.col("low") * 1e4 + 0.5) / 1e4).alias("low"),
                   (F.floor(F.col("close") * 1e4 + 0.5) / 1e4).alias("close"),
                   "n",
                   (F.floor(F.col("volume") * 1e4 + 0.5) / 1e4).alias("volume"),
                   (F.floor(F.col("vwap") * 1e6 + 0.5) / 1e6).alias("vwap")))
    sql = """
      WITH e AS (
        SELECT event_type, epoch_us(ts) AS tus, value, event_id,
               COALESCE(CAST(json_extract_string(props, '$.k')
                             AS DOUBLE), 0) AS vol
        FROM events WHERE value IS NOT NULL),
      b AS (
        SELECT *, sum(vol) OVER (PARTITION BY event_type
                  ORDER BY tus, event_id, value
                  ROWS UNBOUNDED PRECEDING) - vol AS bef
        FROM e),
      g AS (SELECT *, CAST(floor(bef / 250.0) AS BIGINT) AS bar FROM b),
      bars AS (
        SELECT event_type, bar AS bar_seq,
               min(tus) * 1000 AS tns,
               floor(first(value ORDER BY tus, event_id, value)
                     * 1e4 + 0.5) / 1e4 AS open,
               floor(max(value) * 1e4 + 0.5) / 1e4 AS high,
               floor(min(value) * 1e4 + 0.5) / 1e4 AS low,
               floor(last(value ORDER BY tus, event_id, value)
                     * 1e4 + 0.5) / 1e4 AS close,
               count(*) AS n,
               floor(sum(vol) * 1e4 + 0.5) / 1e4 AS volume,
               CASE WHEN sum(vol) <> 0
                    THEN floor(sum(value * vol) / sum(vol) * 1e6 + 0.5)
                         / 1e6 END AS vwap
        FROM g GROUP BY event_type, bar)
      SELECT * FROM bars
      QUALIFY bar_seq < max(bar_seq) OVER (PARTITION BY event_type)
    """
    ok, msg = compare("so_vbars", got, sql, con)
    assert ok, msg


def test_volume_bars_stream_chunk_invariance(spark, tmp_path):
    """Chunk-invariance pin for volume_bars_stream: a reverse-time
    multi-chunk trigger must produce exactly the single-chunk bars —
    the fold assembles + (time, tie, price)-sorts the whole trigger
    before the volume prefix scan, so chunk boundaries cannot move
    bar boundaries."""
    import pandas as pd

    n = 60
    base = pd.Timestamp("2024-01-01")
    rows = {
        "time": [base + pd.Timedelta(minutes=i) for i in range(n)],
        "user_id": ["u1"] * (n - 10) + ["u2"] * 10,
        "value": [100.0 + (i % 13) for i in range(n)],
        "vol": [float(1 + (i % 3)) for i in range(n)],
    }
    schema = "time timestamp, user_id string, value double, vol double"

    def run(tag, batch_rows):
        old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                       str(batch_rows))
        try:
            st = _desc_order_replay(spark, rows, schema,
                                    str(tmp_path / f"vb_{tag}"))
            out = ts_stream.volume_bars_stream(st, 7.0, "value", "vol",
                                               key=["user_id"])
            _run_to_table(out, f"mc_vb_{tag}")
        finally:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                           old)

    run("one", 100000)
    run("many", 7)
    cols = "user_id, bar_seq, tns, open, high, low, close, n, volume, vwap"
    a = _collect_sorted(spark, "mc_vb_one", cols)
    b = _collect_sorted(spark, "mc_vb_many", cols)
    pd.testing.assert_frame_equal(a, b, check_exact=True, obj="mc_vb")


def test_pack_sequences_stream_vs_duckdb(spark, con, tmp_path):
    """Streaming sequence packing (37th replay gate): per-shard state
    is the running token count; segments emit exactly once,
    immediately — an in-order replay (chunks split on doc_id, the
    stream's order axis) equals the batch operator on ALL rows,
    bitwise (integer arithmetic end to end; nothing stays open).
    Oracle: the per-shard window-cumsum + generate_series batch SQL."""
    docs_b = (spark.read.parquet(f"{SF}/documents.parquet")
              .withColumn("n_tokens", F.greatest(F.size(F.split(F.col("text"), " ")), F.lit(0)))
              .withColumn("shard", F.pmod(F.col("doc_id"), F.lit(4)))
              .select("doc_id", "shard", "n_tokens"))
    out_dir = str(tmp_path / "pack")
    _split_files(docs_b, out_dir, [150, 350], "doc_id")
    st = (spark.readStream.schema(docs_b.schema)
          .option("maxFilesPerTrigger", 1).parquet(out_dir))
    out = ts_stream.pack_sequences_stream(st, 64, "n_tokens",
                                          key=["shard"])
    _run_to_table(out, "so_pack")
    got = spark.sql("SELECT shard, doc_id, seq_id, doc_off, seq_off, "
                    "seg_tokens FROM so_pack")
    sql = """
      WITH d AS (
        SELECT doc_id, doc_id % 4 AS shard,
               len(string_split(text, ' ')) AS n
        FROM documents
      ), c AS (
        SELECT doc_id, shard, n,
               CAST(COALESCE(sum(n) OVER (PARTITION BY shard
                    ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS BIGINT) AS cb
        FROM d
      ), s AS (
        SELECT doc_id, shard, n, cb,
               unnest(generate_series(cb // 64,
                    CASE WHEN n > 0 THEN (cb + n - 1) // 64
                         ELSE cb // 64 END)) AS seq_id
        FROM c
      )
      SELECT shard, doc_id, CAST(seq_id AS BIGINT) AS seq_id,
             CAST(GREATEST(0, seq_id * 64 - cb) AS BIGINT) AS doc_off,
             CAST(cb + GREATEST(0, seq_id * 64 - cb) - seq_id * 64
                  AS BIGINT) AS seq_off,
             CAST(CASE WHEN n > 0
                  THEN LEAST(n, (seq_id + 1) * 64 - cb)
                       - GREATEST(0, seq_id * 64 - cb)
                  ELSE 0 END AS BIGINT) AS seg_tokens
      FROM s
    """
    ok, msg = compare("so_pack", got, sql, con)
    assert ok, msg


def test_pack_bins_stream_vs_duckdb(spark, con, tmp_path):
    """Streaming next-fit capacity packing (38th replay gate): per-key
    state is (open bin, fill); the seeded fold replays the batch
    recurrence exactly, so the in-order replay equals the batch
    operator on ALL rows, bitwise. Oracle: the same WITH RECURSIVE CTE
    that gates the batch operator, stepping document-by-document."""
    docs_b = (spark.read.parquet(f"{SF}/documents.parquet")
              .withColumn("n_tokens", F.greatest(F.size(F.split(F.col("text"), " ")), F.lit(0)))
              .withColumn("shard", F.pmod(F.col("doc_id"), F.lit(3)))
              .select("doc_id", "shard", "n_tokens"))
    out_dir = str(tmp_path / "bins")
    _split_files(docs_b, out_dir, [120, 380], "doc_id")
    st = (spark.readStream.schema(docs_b.schema)
          .option("maxFilesPerTrigger", 1).parquet(out_dir))
    out = ts_stream.pack_bins_stream(st, 96, "n_tokens", key=["shard"])
    _run_to_table(out, "so_bins")
    got = spark.sql("SELECT shard, doc_id, bin_id FROM so_bins")
    sql = """
      WITH RECURSIVE d AS (
        -- COALESCE: a NULL n would poison the walk's NULL-intolerant
        -- fill/bin recursion for the whole shard
        SELECT doc_id, doc_id % 3 AS shard,
               COALESCE(len(string_split(text, ' ')), 0) AS n
        FROM documents
      ), seq AS (
        SELECT doc_id, shard, n,
               row_number() OVER (PARTITION BY shard
                                  ORDER BY doc_id) AS rn
        FROM d
      ), walk AS (
        SELECT shard, rn, doc_id, n,
               CAST(0 AS BIGINT) AS bin, n AS fill
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT s.shard, s.rn, s.doc_id, s.n,
               CASE WHEN w.fill > 0 AND w.fill + s.n > 96
                    THEN w.bin + 1 ELSE w.bin END,
               CASE WHEN w.fill > 0 AND w.fill + s.n > 96
                    THEN s.n ELSE w.fill + s.n END
        FROM walk w JOIN seq s ON s.shard = w.shard AND s.rn = w.rn + 1
      )
      SELECT shard, doc_id, bin AS bin_id FROM walk
    """
    ok, msg = compare("so_bins", got, sql, con)
    assert ok, msg


def _chunk_replay(spark, rows, schema, out_dir, chunks):
    """File stream replaying ``rows`` as one parquet file per index
    list in ``chunks`` — the out-of-order (late-arrival) replay rig
    shared by the r8/r9 anomaly + rolling-OLS convergence tests and
    the r10 recurrence-stream semantics pins."""
    batch = spark.createDataFrame(rows, schema)
    os.makedirs(out_dir, exist_ok=True)
    for i, idx in enumerate(chunks):
        sub = [rows[j] for j in idx]
        (spark.createDataFrame(sub, batch.schema).coalesce(1)
         .write.mode("overwrite").parquet(out_dir + f"/_t{i}"))
        src = next(f for f in os.listdir(out_dir + f"/_t{i}")
                   if f.endswith(".parquet"))
        shutil.move(os.path.join(out_dir + f"/_t{i}", src),
                    os.path.join(out_dir, f"chunk_{i}.parquet"))
        shutil.rmtree(out_dir + f"/_t{i}")
    return (spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", 1).parquet(out_dir))


def test_kalman_stream_late_arrival_semantics(spark, tmp_path):
    """r10 item 6: a recurrence stream cannot bitwise-reconverge to
    batch after late data (append mode, state already advanced) — the
    pinned contract is the DOCUMENTED fold instead: a cross-trigger
    straggler folds as a same-time correction (diffusion clamped at
    zero, state clock never rewinds), verified against an independent
    test-local replay of that rule over the exact trigger sequence.
    The unclamped fold would feed a NEGATIVE predicted variance into
    the gain on the late chunk — this test fails loudly on it."""
    import pandas as pd

    base = pd.Timestamp("2024-01-01")
    hours = [0, 1, 2, 3, 4, 5, 9, 6, 7, 10, 11, 12]
    rows = [((base + pd.Timedelta(hours=h)).to_pydatetime(), "k",
             10.0 + (h % 4) * 2.0) for h in hours]
    # triggers: [0-5, 9] then LATE [6, 7] then [10-12]
    chunks = [[0, 1, 2, 3, 4, 5, 6], [7, 8], [9, 10, 11]]
    st = _chunk_replay(spark, rows,
                       "time timestamp, k string, value double",
                       str(tmp_path / "kflate"), chunks)
    out = ts_stream.kalman_stream(st, "value", key=["k"], q=4.0,
                                  r=25.0, period="1d", p0=100.0)
    _run_to_table(out, "so_kf_late")
    got = {r["__tns"]: r["value_kf"]
           for r in spark.sql("SELECT * FROM so_kf_late").collect()}

    # independent replay of the documented semantics
    q, r_, p0, period_ns = 4.0, 25.0, 100.0, 86400 * 10**9
    state, exp = None, {}
    for idx in chunks:
        for t, _, x in sorted((int(pd.Timestamp(rows[j][0]).value),
                               None, rows[j][2]) for j in idx):
            if state is None:
                last, level, var = t, x, p0
            else:
                last, level, var = state
                p = var + q * max(t - last, 0) / period_ns
                g = p / (p + r_)
                level, var = level + g * (x - level), (1.0 - g) * p
                last = max(last, t)
            state = (last, level, var)
            exp[t] = level
    assert set(got) == set(exp)
    for t in exp:
        assert got[t] is not None and abs(got[t] - exp[t]) < 1e-12, t
    # and the state stayed sane: late folds never produced NaN/inf
    assert all(abs(v) < 1e6 for v in got.values())


def test_holt_winters_stream_late_arrival_semantics(spark, tmp_path):
    """Same protocol for the Holt-Winters recurrence stream: late
    rows fold in arrival order (their own timestamp still selects the
    seasonal phase), pinned against an independent test-local replay
    of the published recurrence over the exact trigger sequence."""
    import pandas as pd

    base = pd.Timestamp("2024-01-01")
    days = [0, 1, 2, 3, 4, 5, 9, 6, 7, 10, 11, 12]
    rows = [((base + pd.Timedelta(days=d)).to_pydatetime(), "k",
             20.0 + (d % 3) * 5.0) for d in days]
    chunks = [[0, 1, 2, 3, 4, 5, 6], [7, 8], [9, 10, 11]]
    st = _chunk_replay(spark, rows,
                       "time timestamp, k string, value double",
                       str(tmp_path / "hwlate"), chunks)
    alpha, beta, gamma, period = 0.4, 0.2, 0.3, 7
    out = ts_stream.holt_winters_stream(st, "value", key=["k"],
                                        period=period, alpha=alpha,
                                        beta=beta, gamma=gamma,
                                        unit="1d")
    _run_to_table(out, "so_hw_late")
    got = {r["__tns"]: (r["value_hw_level"], r["value_hw_trend"],
                        r["value_hw"])
           for r in spark.sql("SELECT * FROM so_hw_late").collect()}

    unit_ns = 86400 * 10**9
    init, level, trend, seas = False, 0.0, 0.0, [0.0] * period
    exp = {}
    for idx in chunks:
        for t, x in sorted((int(pd.Timestamp(rows[j][0]).value),
                            rows[j][2]) for j in idx):
            p = int((t // unit_ns) % period)
            if not init:
                init, level, trend = True, x, 0.0
            else:
                prev = level
                level = alpha * (x - seas[p]) + (1 - alpha) * (level + trend)
                trend = beta * (level - prev) + (1 - beta) * trend
                seas[p] = gamma * (x - level) + (1 - gamma) * seas[p]
            exp[t] = (level, trend, level + seas[p])
    assert set(got) == set(exp)
    for t, e in exp.items():
        for gv, ev in zip(got[t], e):
            assert abs(gv - ev) < 1e-12, (t, got[t], e)


def test_volume_bars_stream_late_arrival_semantics(spark, tmp_path):
    """Volume-clock stream under a late tick: the straggler folds into
    the OPEN bar in arrival order (a volume clock is arrival-ordered by
    construction once data is out of order), volume is conserved, and
    the closed bar's OHLCV accounts for the late tick exactly —
    hand-computed bar pinned field by field."""
    import pandas as pd

    base = pd.Timestamp("2024-01-01")
    rows = [
        ((base + pd.Timedelta(minutes=1)).to_pydatetime(), "k", 10.0, 40.0),
        ((base + pd.Timedelta(minutes=2)).to_pydatetime(), "k", 11.0, 40.0),
        # LATE tick (minute 1.5) arrives in trigger 2, crosses the
        # 100-volume threshold inside the open bar
        ((base + pd.Timedelta(minutes=1, seconds=30)).to_pydatetime(),
         "k", 9.0, 40.0),
        # trigger 3 opens bar 1, which CLOSES bar 0
        ((base + pd.Timedelta(minutes=3)).to_pydatetime(), "k", 12.0, 50.0),
    ]
    chunks = [[0, 1], [2], [3]]
    st = _chunk_replay(
        spark, rows,
        "time timestamp, k string, value double, vol double",
        str(tmp_path / "vblate"), chunks)
    out = ts_stream.volume_bars_stream(st, 100.0, "value", "vol",
                                       key=["k"])
    _run_to_table(out, "so_vb_late")
    bars = spark.sql("SELECT * FROM so_vb_late ORDER BY bar_seq") \
        .collect()
    assert len(bars) == 1  # bar 1 is still open, never emitted
    b = bars[0]
    assert b.bar_seq == 0
    assert b.tns == int(pd.Timestamp(rows[0][0]).value)
    assert (b.open, b.high, b.low) == (10.0, 11.0, 9.0)
    assert b.close == 9.0        # last PROCESSED tick (the late one)
    assert b.n == 3 and b.volume == 120.0
    assert abs(b.vwap - (10.0 * 40 + 11.0 * 40 + 9.0 * 40) / 120.0) < 1e-12


def test_pack_sequences_stream_late_arrival_semantics(spark, tmp_path):
    """Sequence packing under a late document: packing state is one
    running token offset, so a straggler packs AT ITS ARRIVAL POSITION
    (documented tradeoff — the batch operator would have packed it at
    its id position); offsets stay contiguous, every document packs
    exactly once, tokens are conserved. Exact segment rows pinned."""
    rows = [(1, 0, 40), (2, 0, 40), (0, 0, 50), (3, 0, 30)]
    chunks = [[0, 1], [2], [3]]  # id 0 arrives LATE (third)
    st = _chunk_replay(spark, rows,
                       "doc_id long, shard int, n_tokens long",
                       str(tmp_path / "packlate"), chunks)
    out = ts_stream.pack_sequences_stream(st, 64, "n_tokens",
                                          key=["shard"])
    _run_to_table(out, "so_pack_late")
    got = {(r.doc_id, r.seq_id): (r.doc_off, r.seq_off, r.seg_tokens)
           for r in spark.sql("SELECT * FROM so_pack_late").collect()}
    exp = {
        (1, 0): (0, 0, 40),
        (2, 0): (0, 40, 24), (2, 1): (24, 0, 16),
        (0, 1): (0, 16, 48), (0, 2): (48, 0, 2),   # late doc: cb=80
        (3, 2): (0, 2, 30),                        # cb=130
    }
    assert got == exp
    assert sum(v[2] for v in got.values()) == 160  # token conservation


def test_stream_gopher_rules_vs_duckdb(spark, con, tmp_path):
    """The Gopher quality-rule bundle is a stateless per-document
    projection, so it runs on a readStream UNCHANGED (39th replay
    gate): replay the documents table as a 3-chunk file stream through
    `pipeline.text.gopher_rules`, materialize the sink, and compare
    every metric + the flag against DuckDB batch SQL — bitwise, no
    quantization (each metric is one division of exact integers)."""
    from entry_queries.extras_q import SQL_GOPHER_RULES
    from flint_spark.pipeline.text import GOPHER_METRICS, gopher_rules

    docs_b = (spark.read.parquet(f"{SF}/documents.parquet")
              .select("doc_id", "text"))
    out_dir = str(tmp_path / "gopher")
    _split_files(docs_b, out_dir, [170, 340], "doc_id")
    st = (spark.readStream.schema(docs_b.schema)
          .option("maxFilesPerTrigger", 1).parquet(out_dir))
    out = gopher_rules(st).select(
        "doc_id", *GOPHER_METRICS,
        F.col("gopher_pass").cast("int").alias("gopher_pass"),
        "n_rules_failed")
    _run_to_table(out, "so_gopher")
    got = spark.sql("SELECT * FROM so_gopher")
    ok, msg = compare("so_gopher", got, SQL_GOPHER_RULES, con)
    assert ok, msg
