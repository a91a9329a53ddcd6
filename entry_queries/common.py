from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flint_spark import clocks, summarizers as S, windows as W
from flint_spark.operators import aggregate as agg_ops
from flint_spark.operators import asof, cycles, intervals, windows_ops
from flint_spark.operators import ema as ema_ops
from flint_spark.operators import regression, sessions
from flint_spark.pipeline import dedup, multimodal, similarity, text as text_ops
from flint_spark.pipeline.hashing import P, minhash_params, hyperplanes
from flint_spark.timeseries import TIME_COLUMN, as_time_expr, ns_to_time_expr

def R(col, k: int):
    """Deterministic half-up rounding, identical in Spark and DuckDB.

    Built-in round() disagrees between engines at exact .5 boundaries
    (HALF_UP on decimal string vs binary round-half-away), which money
    averages hit constantly. floor(x*10^k + 0.5)/10^k evaluates the
    same way on the same double in both engines.
    """
    if isinstance(col, str):
        col = F.col(col)
    m = float(10 ** k)
    return F.floor(col * F.lit(m) + F.lit(0.5)) / F.lit(m)


#: Rq pre-snaps only below this magnitude: above it Spark's F.floor
#: (LONG-valued) could saturate at |v|*1e9 > 2^63 while DuckDB's floor
#: stays DOUBLE — and for |v| > ~1e6 the double's own ulp already
#: exceeds the 1e-9 grid, so the snap buys nothing there anyway
_RQ_PRESNAP_MAX = 1.0e6


def Rq(col, k: int, pre: int = 9):
    """Double rounding for BOUNDARY-FRAGILE ratios: pre-snap to the
    1e-{pre} grid, then half-up at 1e-{k}.

    ``R`` guarantees identical results only on identical doubles. A
    ratio of windowed sums differs across engines by ulps (Spark's
    growing frame folds sequentially, DuckDB's segment tree pairwise),
    and when the TRUE value sits exactly on a half-up boundary (e.g. a
    beta of exactly -0.56475 from 2-decimal inputs — observed at sf0.1,
    2 rows in 94k), floor(x*10^k + 0.5) becomes a per-engine coin
    flip. Pre-snapping both engines' values (within ~1e-12 of each
    other) onto the same 1e-9 grid point first makes the final
    rounding operate on IDENTICAL doubles; a flip now needs the true
    value within ulps of a 1e-9 HALF-boundary that also abuts the
    1e-{k} half point — 5 orders of magnitude less likely.

    Values past ``_RQ_PRESNAP_MAX`` skip the snap (plain ``R``):
    Spark's LONG floor would saturate near 2^63 where DuckDB's DOUBLE
    floor does not, and the grid is below one ulp there regardless.
    SQL twin::

        CASE WHEN abs(v) < 1e6
             THEN floor(floor(v*1e9 + 0.5)/1e9 * 10^k + 0.5)/10^k
             ELSE floor(v * 10^k + 0.5)/10^k END
    """
    if isinstance(col, str):
        col = F.col(col)
    p = float(10 ** pre)
    snapped = F.floor(col * F.lit(p) + F.lit(0.5)) / F.lit(p)
    guarded = F.when(F.abs(col) < F.lit(_RQ_PRESNAP_MAX), snapped) \
        .otherwise(col)
    return R(guarded, k)


def rq_sql(expr: str, k: int, pre: int = 9) -> str:
    """DuckDB fragment computing exactly :func:`Rq` — keep the two in
    lockstep. ``expr`` should be a simple column reference (it is
    repeated four times). ``pre`` mirrors Rq's snap grid: long float
    folds (EMA chains over 10x data, 700-term products) carry more
    than 1e-9 of cross-engine error, so scale-fragile gates snap
    coarser (pre=8) — the r10 sf1 sweep is what exposed this."""
    m = 10 ** k
    return (f"CASE WHEN abs({expr}) < 1e6 "
            f"THEN floor(floor(({expr}) * 1e{pre} + 0.5) / 1e{pre} "
            f"* {m} + 0.5) / {m} "
            f"ELSE floor(({expr}) * {m} + 0.5) / {m} END")


# ----------------------------------------------------------------------
# loaders
# ----------------------------------------------------------------------

def _ensure_session_confs(spark: SparkSession) -> None:
    """The driver supplies its own SparkSession; these runtime-settable
    confs are required for correctness here: TIMESTAMP(NANOS) parquet
    must read as Long ns, timestamps must render in UTC to match the
    DuckDB oracle, and Spark 4's default ANSI mode would error on the
    permissive arithmetic this engine (like the reference) assumes."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_session_confs(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with time = µs TIMESTAMP (matches DuckDB's view of ts).
    Schema-tolerant: fixtures have carried ts as TIMESTAMP(NANOS) (read
    as Long ns) and as TIMESTAMP(MICROS) across rounds."""
    df = _t(spark, sf_dir, "events")
    return df.withColumn(TIME_COLUMN, as_time_expr(df, "ts", "timestamp")) \
             .drop("ts")


def _lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").withColumnRenamed("l_shipdate", TIME_COLUMN)


def _orders_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders as an as-of right side: unique per (user_id, time)."""
    return (_t(spark, sf_dir, "orders")
            .select(F.col("o_orderdate").alias(TIME_COLUMN),
                    F.col("o_custkey").alias("user_id"), "o_totalprice")
            .groupBy(TIME_COLUMN, "user_id")
            .agg(F.max("o_totalprice").alias("o_totalprice")))


_ORDERS_RIGHT_SQL = """
  SELECT o_orderdate AS rt, o_custkey AS user_id,
         max(o_totalprice) AS o_totalprice
  FROM orders GROUP BY 1, 2
"""


def count_exchanges(df) -> int:
    """Exchange count of df's final adaptive plan (executes the df so
    AQE finalizes) — lets a gate assert its promised shuffle shape.
    Shared walker: ``flint_spark.plans.audit``."""
    from flint_spark.plans.audit import count_exchanges as _ce
    return _ce(df)


def lang_scores_sql(w: str = "w") -> dict[str, str]:
    """Per-language stopword-ratio DuckDB fragments — the SQL mirror of
    ``pipeline.text._stopword_ratio``, built from the same
    LANG_STOPWORDS constant so Spark and oracle can never drift."""
    return {lang: (f"(len(list_filter({w}, x -> list_contains(["
                   + ", ".join(f"'{word}'" for word in words)
                   + f"], x)))::DOUBLE / len({w}))")
            for lang, words in text_ops.LANG_STOPWORDS.items()}


def lang_case_sql(w: str = "w") -> str:
    """Fold-order argmax language CASE (first language in key order
    achieving the max) — mirrors ``pipeline.text._language_id``."""
    scores = lang_scores_sql(w)
    langs = list(text_ops.LANG_STOPWORDS)
    cases = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(f"{scores[lang]} >= {scores[other]}"
                             for other in langs[i + 1:])
        cases.append(f"WHEN {conds} THEN '{lang}'")
    return "CASE " + " ".join(cases) + f" ELSE '{langs[-1]}' END"


def quality_sql(text: str = "text", w: str = "w") -> str:
    """Document-quality formula fragment — mirrors
    ``pipeline.text._quality`` term for term."""
    return (f"(0.4 * least(len({w})::DOUBLE / 64.0, 1.0)"
            f" + 0.4 * (len(list_distinct({w}))::DOUBLE / len({w}))"
            f" + 0.2 * (1.0 - least(abs((length({text}) - (len({w}) - 1))"
            f"::DOUBLE / len({w}) - 5.0) / 5.0, 1.0)))")
