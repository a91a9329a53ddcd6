"""Gate queries + oracles (part 2: LLM-data pipeline — dedup, ANN,
text, multimodal — plus relational/TPC-H-ish and UDF-facade queries)."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flint_spark import clocks, summarizers as S, windows as W
from flint_spark.operators import aggregate as agg_ops
from flint_spark.operators import asof, cycles, intervals, windows_ops
from flint_spark.operators import ema as ema_ops
from flint_spark.operators import regression, sessions
from flint_spark.pipeline import dedup, multimodal, similarity, text as text_ops
from flint_spark.pipeline.hashing import P, minhash_params, hyperplanes
from flint_spark.timeseries import TIME_COLUMN, ns_to_time_expr

from .common import (R, Rq, rq_sql, _ensure_session_confs, _t,
                     _events, _lineitem, _orders_right, _ORDERS_RIGHT_SQL)
# ----------------------------------------------------------------------
# training-data pipeline queries + oracles
# ----------------------------------------------------------------------

_MH_N, _MH_BANDS, _MH_SEED, _MH_THRESH = 32, 8, 7, 0.5
_PROBES = [0, 1, 2, 3, 4]
_PLANES_N, _PLANES_SEED = 8, 11


def q_dedup_exact(spark, sf):
    """Exact-dup grouping over the corpus UNIONed with a salted copy of
    every 7th document (re-keyed past the id range). The r3 fixtures
    carried zero exact duplicates, so the bare query proved only that
    both engines return empty (judge: vacuous gate) — the injected
    copies guarantee non-empty output at every sf regardless of fixture
    drift, while still detecting any organic duplicates."""
    docs = _t(spark, sf, "documents")
    salted = (docs.filter(F.col("doc_id") % 7 == 0)
              .withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000)))
    return dedup.exact_duplicate_groups(docs.unionByName(salted))


SQL_DEDUP_EXACT = """
  WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 10000000 AS doc_id, text FROM documents
    WHERE doc_id % 7 = 0
  )
  SELECT md5(text) AS text_md5, count(*) AS n_dups, min(doc_id) AS canonical_id
  FROM corpus GROUP BY 1 HAVING count(*) > 1
"""


def q_corpus_stats(spark, sf):
    docs = _t(spark, sf, "documents")
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_unique_texts"),
        F.countDistinct("lang").alias("n_langs"))


SQL_CORPUS_STATS = """
  SELECT count(*) AS n_docs, count(DISTINCT md5(text)) AS n_unique_texts,
         count(DISTINCT lang) AS n_langs
  FROM documents
"""


def q_minhash_lsh(spark, sf):
    docs = _t(spark, sf, "documents")
    out = dedup.minhash_lsh_pairs(docs, num_hashes=_MH_N, bands=_MH_BANDS,
                                  seed=_MH_SEED, threshold=_MH_THRESH)
    return out.select("id_a", "id_b", R("est_jaccard", 6).alias("est_jaccard"))


def _sql_minhash_lsh() -> str:
    params = minhash_params(_MH_N, _MH_SEED)
    rows = _MH_N // _MH_BANDS
    mins = ",\n         ".join(
        f"min(({a}*h + {b}) % {P}) AS mh_{j}" for j, (a, b) in enumerate(params))
    band_selects = "\n    UNION ALL\n".join(
        f"    SELECT doc_id, {b} AS band, concat_ws(','"
        + "".join(f", mh_{b * rows + r}" for r in range(rows))
        + ") AS bsig FROM sig"
        for b in range(_MH_BANDS))
    eq = " + ".join(f"CASE WHEN sa.mh_{j} = sb.mh_{j} THEN 1 ELSE 0 END"
                    for j in range(_MH_N))
    return f"""
  WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
                 WHERE len(string_split(text, ' ')) >= 3),
  sh AS (SELECT DISTINCT doc_id,
                unnest(list_transform(generate_series(1, len(w) - 2),
                       i -> array_to_string(list_slice(w, i, i + 2), ' '))) AS shingle
         FROM words),
  h AS (SELECT doc_id, (('0x' || substr(md5(shingle), 1, 7))::BIGINT) AS h FROM sh),
  sig AS (SELECT doc_id, {mins} FROM h GROUP BY doc_id),
  bands AS (
{band_selects}
  ),
  pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
  scored AS (
    SELECT p.id_a, p.id_b, ({eq}) / {float(_MH_N)} AS est_jaccard
    FROM pairs p
    JOIN sig sa ON sa.doc_id = p.id_a
    JOIN sig sb ON sb.doc_id = p.id_b)
  SELECT id_a, id_b, floor((est_jaccard) * 1000000 + 0.5) / 1000000 AS est_jaccard
  FROM scored WHERE est_jaccard >= {_MH_THRESH}
"""


def q_simhash(spark, sf):
    docs = _t(spark, sf, "documents")
    return dedup.simhash(docs)


def _sql_simhash() -> str:
    sums = ",\n         ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s_{i}"
        for i in range(32))
    sim = " + ".join(f"CASE WHEN s_{i} > 0 THEN {2 ** i} ELSE 0 END"
                     for i in range(32))
    return f"""
  WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
  h AS (SELECT doc_id, (('0x' || substr(md5(w), 1, 8))::BIGINT) AS h FROM tok),
  bits AS (SELECT doc_id, {sums} FROM h GROUP BY doc_id)
  SELECT doc_id, ({sim})::BIGINT AS simhash FROM bits
"""


def q_simhash_pairs(spark, sf):
    docs = _t(spark, sf, "documents")
    return dedup.simhash_pairs(docs, max_hamming=3)


def _sql_simhash_pairs() -> str:
    chunks = "\n    UNION ALL\n".join(
        f"    SELECT doc_id, simhash, {c} AS band, (simhash >> {c * 8}) & 255 AS chunk"
        f" FROM sim" for c in range(4))
    return f"""
  WITH sim AS ({_sql_simhash()}),
  banded AS (
{chunks}
  )
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         bit_count(xor(a.simhash, b.simhash)) AS hamming
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def q_ngram_jaccard(spark, sf):
    docs = _t(spark, sf, "documents")
    out = dedup.ngram_jaccard_pairs(docs, threshold=0.6, max_df=100)
    return out.select("id_a", "id_b", R("jaccard", 6).alias("jaccard"))


SQL_NGRAM_JACCARD = """
  WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
                 WHERE len(string_split(text, ' ')) >= 3),
  sh0 AS (SELECT DISTINCT doc_id,
                 unnest(list_transform(generate_series(1, len(w) - 2),
                        i -> array_to_string(list_slice(w, i, i + 2), ' '))) AS shingle
          FROM words),
  rare AS (SELECT shingle FROM sh0 GROUP BY 1 HAVING count(*) <= 100),
  sh AS (SELECT sh0.* FROM sh0 JOIN rare USING (shingle)),
  sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY 1),
  inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
  SELECT id_a, id_b,
         floor((i::DOUBLE / (sa.nsh + sb.nsh - i)) * 1000000 + 0.5) / 1000000 AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE i::DOUBLE / (sa.nsh + sb.nsh - i) >= 0.6
"""


def q_cosine_topk(spark, sf):
    emb = _t(spark, sf, "embeddings")
    out = similarity.cosine_topk(emb, _PROBES, k=10)
    return out.select("probe_id", "vec_id", R("cosine", 6).alias("cosine"),
                      "rank")


SQL_COSINE_TOPK = f"""
  WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
  probes AS (SELECT vec_id AS probe_id, v AS pv FROM base
             WHERE vec_id IN ({', '.join(map(str, _PROBES))})),
  j AS (SELECT p.probe_id, b.vec_id,
               list_dot_product(b.v, p.pv)
                 / (sqrt(list_dot_product(b.v, b.v))
                    * sqrt(list_dot_product(p.pv, p.pv))) AS cosine
        FROM base b CROSS JOIN probes p WHERE b.vec_id <> p.probe_id),
  r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
                                     ORDER BY cosine DESC, vec_id) AS rank
        FROM j)
  SELECT probe_id, vec_id, floor((cosine) * 1000000 + 0.5) / 1000000 AS cosine, rank FROM r WHERE rank <= 10
"""


def q_lsh_ann(spark, sf):
    emb = _t(spark, sf, "embeddings")
    out = similarity.lsh_ann_topk(emb, _PROBES, k=10, n_planes=_PLANES_N,
                                  seed=_PLANES_SEED)
    return out.select("probe_id", "vec_id", R("cosine", 6).alias("cosine"),
                      "rank")


def _sql_lsh_ann() -> str:
    planes = hyperplanes(_PLANES_N, 64, _PLANES_SEED)
    bucket = " + ".join(
        f"CASE WHEN list_dot_product(v, {plane}) > 0 THEN {2 ** p} ELSE 0 END"
        for p, plane in enumerate(planes))
    return f"""
  WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
  bucketed AS (SELECT vec_id, v, ({bucket})::BIGINT AS bucket FROM base),
  probes AS (SELECT vec_id AS probe_id, v AS pv, bucket AS pbucket FROM bucketed
             WHERE vec_id IN ({', '.join(map(str, _PROBES))})),
  j AS (SELECT p.probe_id, b.vec_id,
               list_dot_product(b.v, p.pv)
                 / (sqrt(list_dot_product(b.v, b.v))
                    * sqrt(list_dot_product(p.pv, p.pv))) AS cosine
        FROM bucketed b JOIN probes p
          ON b.bucket = p.pbucket AND b.vec_id <> p.probe_id),
  r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
                                     ORDER BY cosine DESC, vec_id) AS rank
        FROM j)
  SELECT probe_id, vec_id, floor((cosine) * 1000000 + 0.5) / 1000000 AS cosine, rank FROM r WHERE rank <= 10
"""


def q_text_stats(spark, sf):
    docs = _t(spark, sf, "documents")
    out = text_ops.text_stats(docs)
    return out.select(
        "doc_id", "n_tokens", "n_tokens_bpe",
        R("avg_word_len", 6).alias("avg_word_len"),
        R("distinct_ratio", 6).alias("distinct_ratio"),
        R("stopword_ratio_en", 6).alias("stopword_ratio_en"),
        R("quality", 6).alias("quality"),
        "lang_pred", "fingerprint")


def _sql_text_stats() -> str:
    from .common import lang_case_sql, lang_scores_sql, quality_sql

    scores = lang_scores_sql()
    lang_case = lang_case_sql()
    return f"""
  WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
  SELECT doc_id,
         len(w) AS n_tokens,
         (len(w) + list_aggregate(list_transform(w,
             x -> cast(floor(length(x) / 4.0) AS INT)), 'sum'))::INT AS n_tokens_bpe,
         floor(((length(text) - (len(w) - 1))::DOUBLE / len(w)) * 1000000 + 0.5) / 1000000 AS avg_word_len,
         floor((len(list_distinct(w))::DOUBLE / len(w)) * 1000000 + 0.5) / 1000000 AS distinct_ratio,
         floor(({scores['en']}) * 1000000 + 0.5) / 1000000 AS stopword_ratio_en,
         floor({quality_sql()} * 1000000 + 0.5) / 1000000 AS quality,
         {lang_case} AS lang_pred,
         list_reduce(list_transform(w,
             x -> (('0x' || substr(md5(x), 1, 7))::BIGINT)),
             (acc, h) -> (acc * {text_ops.FINGERPRINT_BASE} + h) % {P}) AS fingerprint
  FROM d
"""


def q_lang_confusion(spark, sf):
    docs = _t(spark, sf, "documents")
    pred = docs.withColumn("lang_pred", text_ops.language_id("text"))
    return pred.groupBy("lang", "lang_pred").agg(F.count("*").alias("n"))


def _sql_lang_confusion() -> str:
    inner = _sql_text_stats()
    return f"""
  WITH t AS ({inner})
  SELECT d.lang, t.lang_pred, count(*) AS n
  FROM documents d JOIN t ON d.doc_id = t.doc_id
  GROUP BY 1, 2
"""


def q_multimodal_features(spark, sf):
    docs = _t(spark, sf, "documents")
    mm = multimodal.with_binary_payload(docs)
    out = multimodal.extract_features(mm)
    return out.select("doc_id", "byte_len", "byte_sum", "first_byte",
                      R("aspect_ratio", 6).alias("aspect_ratio"))


SQL_MULTIMODAL_FEATURES = """
  WITH h AS (SELECT doc_id, text,
                    (('0x' || substr(md5(text), 1, 7))::BIGINT) AS h
             FROM documents)
  SELECT doc_id,
         length(text)::BIGINT AS byte_len,
         list_aggregate(list_transform(string_split(text, ''),
                        c -> unicode(c)), 'sum')::BIGINT AS byte_sum,
         unicode(substr(text, 1, 1)) AS first_byte,
         floor(((h % 1024 + 64)::DOUBLE / ((h // 1024) % 1024 + 64)) * 1000000 + 0.5) / 1000000
           AS aspect_ratio
  FROM h
"""


def q_frame_sampling(spark, sf):
    docs = _t(spark, sf, "documents")
    mm = multimodal.with_binary_payload(docs)
    return multimodal.sample_frames(mm, every_n=4)


SQL_FRAME_SAMPLING = """
  WITH h AS (SELECT doc_id,
                    (('0x' || substr(md5(text), 1, 7))::BIGINT) % 16 + 1 AS n_frames
             FROM documents)
  SELECT doc_id, unnest(generate_series(0, n_frames - 1, 4)) AS frame_idx FROM h
"""




def q_cycle_rank(spark, sf):
    """addColumnsForCycle: percent_rank of quantity within each shipdate
    cycle (reference CycleColumn rankers)."""
    li = _lineitem(spark, sf)
    out = cycles.add_columns_for_cycle(
        li, {"qty_rank": F.percent_rank()},
        order_by=["l_quantity", "l_orderkey", "l_linenumber"])
    return out.select(TIME_COLUMN, "l_orderkey", "l_linenumber",
                      R("qty_rank", 6).alias("qty_rank"))


SQL_CYCLE_RANK = """
  SELECT l_shipdate AS time, l_orderkey, l_linenumber,
         floor((percent_rank() OVER (PARTITION BY l_shipdate
                ORDER BY l_quantity, l_orderkey, l_linenumber)) * 1000000 + 0.5)
           / 1000000 AS qty_rank
  FROM lineitem
"""


def q_group_interval(spark, sf):
    """groupByInterval: member event_ids per 1d interval and type."""
    ev = _events(spark, sf)
    clock = clocks.uniform("2024-01-01", "2027-01-01", "1d")
    out = intervals.group_by_interval(ev, clock, key=["event_type"],
                                      inclusion="begin", rounding="begin")
    ids = F.sort_array(
        F.transform(F.col("rows"), lambda r: r["event_id"])).cast("array<string>")
    return out.select(TIME_COLUMN, "event_type",
                      F.array_join(ids, ",").alias("event_ids"))


SQL_GROUP_INTERVAL = """
  SELECT date_trunc('day', ts) AS time, event_type,
         array_to_string(list_sort(list(event_id)), ',') AS event_ids
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2027-01-01'
  GROUP BY 1, 2
"""


def q_cycle_product(spark, sf):
    """product / min / max summarizers over small per-day cycles."""
    li = _lineitem(spark, sf)
    li = li.withColumn("disc1", F.col("l_discount") + 1)
    summ = S.compose(S.product("disc1"), S.min_("l_quantity"), S.max_("l_quantity"))
    out = cycles.summarize_cycles(li, summ)
    # compare the product in LOG space (r10 sf1 sweep): a 700-term
    # product reaches ~1e14 with multiplication-order-dependent ulp
    # noise — log makes the error scale-free (~1e-10 absolute), and
    # Rq pre=8 absorbs it; a raw product at k=6 would overflow
    # Spark's LONG floor and coin-flip besides
    return out.select(TIME_COLUMN,
                      Rq(F.log("disc1_product"), 6, pre=8)
                      .alias("log_disc_product"),
                      F.col("l_quantity_min").alias("qty_min"),
                      F.col("l_quantity_max").alias("qty_max"))


SQL_CYCLE_PRODUCT = f"""
  SELECT l_shipdate AS time,
         {rq_sql('ln(product(l_discount + 1))', 6, pre=8)}
           AS log_disc_product,
         min(l_quantity) AS qty_min, max(l_quantity) AS qty_max
  FROM lineitem GROUP BY 1
"""


def q_cycles_udf(spark, sf):
    """summarizeCycles with a pandas UDF (value spread per user-day)."""
    from flint_spark import functions as FL
    ev = _events(spark, sf)
    daily = ev.withColumn(TIME_COLUMN, F.date_trunc("day", F.col(TIME_COLUMN)))

    def spread(pdf):
        return {"spread": float(pdf["value"].max() - pdf["value"].min())}

    out = FL.summarize_cycles_udf(daily, spread, "spread double",
                                  key=["event_type"])
    return out.select(TIME_COLUMN, "event_type", R("spread", 4).alias("spread"))


SQL_CYCLES_UDF = """
  SELECT date_trunc('day', ts) AS time, event_type,
         floor((max(value) - min(value)) * 10000 + 0.5) / 10000 AS spread
  FROM events GROUP BY 1, 2
"""


def q_window_udf(spark, sf):
    """summarizeWindows with a pandas UDF (mean over past 1h per user) —
    must agree with the built-in window mean."""
    from flint_spark import functions as FL
    # centivalues (r10 sf1 sweep): integer-double window sums are exact
    # in any fold order, so the UDF's pandas mean and the oracle's
    # segment-tree avg agree bitwise at any window length; the raw
    # double mean coin-flipped the k=4 boundary once windows grew 10x
    ev = _events(spark, sf).select(
        TIME_COLUMN, "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).alias("value"))

    out = FL.summarize_windows_udf(
        ev, W.past_absolute_time("1h"),
        lambda pdf: float(pdf["value"].mean()), "w_mean", key=["user_id"])
    return out.select(TIME_COLUMN, "user_id",
                      R(F.col("w_mean") / 100, 4).alias("w_mean"))


SQL_WINDOW_UDF = """
  SELECT CAST(ts AS TIMESTAMP) AS time, user_id,
         floor((avg(floor(value * 100 + 0.5)) OVER (
                PARTITION BY user_id ORDER BY ts
                RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                / 100)
               * 10000 + 0.5) / 10000 AS w_mean
  FROM events
"""




def q_tpch_q1(spark, sf):
    """TPC-H Q1 shape: generic analytics delegate straight to Catalyst
    (the reference likewise passes non-temporal queries to Spark)."""
    # revenue in EXACT integer units of 1e-4 (cents x hundredths —
    # both factors are exact decimals in the data): a LONG sum is
    # fold-order-free at any scale, where the raw double sum's
    # cross-engine noise at sf1 (~1.5M-row groups) approached the
    # k=0 rounding grid (r10 sf1 sweep hardening; q3ish actually
    # flipped, this gate got the same treatment proactively)
    li = _lineitem(spark, sf).withColumn(
        "rev_u", F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        * (100 - F.floor(F.col("l_discount") * 100 + F.lit(0.5))))
    out = (li.filter(F.col(TIME_COLUMN) <= F.lit("2001-09-02"))
           .groupBy("l_returnflag", "l_linestatus")
           .agg(F.sum("l_quantity").alias("sum_qty"),
                R(F.sum("rev_u") / 10000, 0).alias("revenue"),
                R(F.avg("l_quantity"), 4).alias("avg_qty"),
                R(F.avg("l_discount"), 6).alias("avg_disc"),
                F.count("*").alias("count_order")))
    return out


SQL_TPCH_Q1 = """
  SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         floor((CAST(sum(floor(l_extendedprice * 100 + 0.5)
                     * (100 - floor(l_discount * 100 + 0.5))) AS BIGINT)
                / 10000) * 1 + 0.5) / 1 AS revenue,
         floor((avg(l_quantity)) * 10000 + 0.5) / 10000 AS avg_qty,
         floor((avg(l_discount)) * 1000000 + 0.5) / 1000000 AS avg_disc,
         count(*) AS count_order
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '2001-09-02'
  GROUP BY 1, 2
"""


def q_tpch_q3ish(spark, sf):
    """Q3 shape: 3-way join with a broadcast dimension, per-order revenue."""
    # revenue in EXACT integer 1e-4 units (see q_tpch_q1): the raw
    # double sum sits EXACTLY on a k=2 half-up boundary for ~1% of
    # orders (cents x hundredths is a 1e-4-grid decimal), so at sf1 the
    # engines' ulp-different binary sums started coin-flipping
    li = _lineitem(spark, sf).withColumn(
        "rev_u", F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        * (100 - F.floor(F.col("l_discount") * 100 + F.lit(0.5))))
    orders = _t(spark, sf, "orders")
    cust = _t(spark, sf, "customer")
    out = (li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
           .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
           .filter(F.col("c_mktsegment") == "BUILDING")
           .groupBy("l_orderkey", "o_orderdate")
           .agg(R(F.sum("rev_u") / 10000, 2).alias("revenue")))
    return out


SQL_TPCH_Q3ISH = """
  SELECT l_orderkey, o_orderdate,
         floor((CAST(sum(floor(l_extendedprice * 100 + 0.5)
                     * (100 - floor(l_discount * 100 + 0.5))) AS BIGINT)
                / 10000) * 100 + 0.5) / 100 AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
  GROUP BY 1, 2
"""


def q_topk_per_group(spark, sf):
    """top-3 revenue days per returnflag (window top-k pattern)."""
    li = _lineitem(spark, sf)
    daily = (li.groupBy(TIME_COLUMN, "l_returnflag")
             .agg(R(F.sum("l_extendedprice"), 2).alias("day_rev")))
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("day_rev"), F.col(TIME_COLUMN))
    return (daily.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3))


SQL_TOPK_PER_GROUP = """
  WITH daily AS (
    SELECT l_shipdate AS time, l_returnflag,
           floor((sum(l_extendedprice)) * 100 + 0.5) / 100 AS day_rev
    FROM lineitem GROUP BY 1, 2
  )
  SELECT * FROM (
    SELECT time, l_returnflag, day_rev,
           row_number() OVER (PARTITION BY l_returnflag
                              ORDER BY day_rev DESC, time) AS rk
    FROM daily) WHERE rk <= 3
"""




def q_null_skip(spark, sf):
    """Summarizer null-skipping (reference PredicateSummarizer /
    null-input row skipping, timeseries/summarize/Summarizer.scala:168-188):
    aggregates ignore injected nulls; count(col) < count(*)."""
    ev = _events(spark, sf)
    ev = ev.withColumn("v_null", F.when(F.col("value") >= 50, F.col("value")))
    summ = S.compose(S.count(), S.count("v_null"), S.sum_("v_null"),
                     S.mean("v_null"), S.min_("v_null"))
    out = agg_ops.summarize(ev, summ, key=["event_type"])
    return out.select("event_type", "count",
                      F.col("v_null_count").alias("n_nonnull"),
                      R("v_null_sum", 4).alias("sum_nonnull"),
                      R("v_null_mean", 6).alias("mean_nonnull"),
                      F.col("v_null_min").alias("min_nonnull"))


SQL_NULL_SKIP = """
  SELECT event_type, count(*) AS count,
         count(CASE WHEN value >= 50 THEN value END) AS n_nonnull,
         floor((sum(CASE WHEN value >= 50 THEN value END)) * 10000 + 0.5) / 10000
           AS sum_nonnull,
         floor((avg(CASE WHEN value >= 50 THEN value END)) * 1000000 + 0.5)
           / 1000000 AS mean_nonnull,
         min(CASE WHEN value >= 50 THEN value END) AS min_nonnull
  FROM events GROUP BY 1
"""




def q_embedding_dedup(spark, sf):
    """Embedding-cosine near-dup pairs via LSH candidate buckets."""
    emb = _t(spark, sf, "embeddings")
    out = similarity.embedding_near_dup_pairs(emb, threshold=0.35,
                                              n_planes=_PLANES_N,
                                              seed=_PLANES_SEED)
    return out.select("id_a", "id_b", R("cosine", 6).alias("cosine"))


def _sql_embedding_dedup() -> str:
    planes = hyperplanes(_PLANES_N, 64, _PLANES_SEED)
    bucket = " + ".join(
        f"CASE WHEN list_dot_product(v, {plane}) > 0 THEN {2 ** p} ELSE 0 END"
        for p, plane in enumerate(planes))
    return f"""
  WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
  bucketed AS (
    SELECT vec_id, ({bucket})::BIGINT AS bucket,
           list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn
    FROM base),
  pairs AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_dot_product(a.vn, b.vn) AS cosine
    FROM bucketed a JOIN bucketed b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
  SELECT id_a, id_b, floor((cosine) * 1000000 + 0.5) / 1000000 AS cosine
  FROM pairs WHERE cosine >= 0.35
"""




_CUSTOM_TICKS = ["2024-01-01", "2024-01-04", "2024-01-05", "2024-01-12",
                 "2024-02-01", "2024-02-15", "2024-04-01", "2024-07-01",
                 "2025-01-01", "2026-01-01"]


def q_interval_custom_clock(spark, sf):
    """summarizeIntervals over an arbitrary (non-uniform) clock - the
    broadcast+searchsorted path (inclusion=begin, rounding=begin)."""
    ev = _events(spark, sf)
    ticks = spark.createDataFrame([(t,) for t in _CUSTOM_TICKS], "time string")         .select(F.col("time").cast("timestamp").alias("time"))
    out = intervals.summarize_intervals(
        ev, ticks, S.compose(S.count(), S.sum_("value")), key=["event_type"],
        inclusion="begin", rounding="begin")
    return out.select(TIME_COLUMN, "event_type", "count",
                      R("value_sum", 4).alias("value_sum"))


def _sql_interval_custom_clock() -> str:
    pairs = ", ".join(
        f"(TIMESTAMP '{b}', TIMESTAMP '{e}')"
        for b, e in zip(_CUSTOM_TICKS[:-1], _CUSTOM_TICKS[1:]))
    return f"""
  WITH iv(b, e) AS (VALUES {pairs})
  SELECT iv.b AS time, ev.event_type, count(*) AS count,
         floor((sum(ev.value)) * 10000 + 0.5) / 10000 AS value_sum
  FROM events ev JOIN iv ON ev.ts >= iv.b AND ev.ts < iv.e
  GROUP BY 1, 2
"""




def q_ewma_windowed(spark, sf):
    """Sliding-window EWMA - the reference's left-subtractable flagship
    (doc/ema.md ~70x claim) as an O(n) incremental range-frame plan."""
    ev = _events(spark, sf)
    out = ema_ops.ewma_windowed(ev, "value", W.past_absolute_time("6h"),
                                alpha=0.05, duration_per_period="1h",
                                convention="legacy", key=["user_id"])
    return out.select(TIME_COLUMN, "user_id", R("value_ewma", 4).alias("w_ewma"))


SQL_EWMA_WINDOWED = """
  WITH e AS (
    SELECT CAST(ts AS TIMESTAMP) AS time, user_id, value,
           epoch_us(ts)::DOUBLE AS tus,
           min(epoch_us(ts)) OVER (PARTITION BY user_id)::DOUBLE AS base
    FROM events
  )
  SELECT time, user_id,
         floor((exp(-(tus - base) * {lam}) *
                sum(value * exp((tus - base) * {lam})) OVER (
                  PARTITION BY user_id ORDER BY time
                  RANGE BETWEEN INTERVAL 6 HOUR PRECEDING AND CURRENT ROW))
               * 10000 + 0.5) / 10000 AS w_ewma
  FROM e
""".format(lam=-__import__("math").log1p(-0.05) / 3_600e6)




_IVF_CENTROIDS = [0, 60, 120, 180, 240, 300, 360, 420]


def q_ivf_ann(spark, sf):
    """IVF ANN: deterministic coarse quantization + nprobe=2 search."""
    emb = _t(spark, sf, "embeddings")
    out = similarity.ivf_ann_topk(emb, _PROBES, _IVF_CENTROIDS, k=10, nprobe=2)
    return out.select("probe_id", "vec_id", R("cosine", 6).alias("cosine"),
                      "rank")


def _sql_ivf_ann() -> str:
    cents = ", ".join(map(str, _IVF_CENTROIDS))
    probes = ", ".join(map(str, _PROBES))
    cos = ("list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) "
           "* sqrt(list_dot_product({b}, {b})))")
    return f"""
  WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
  cents AS (SELECT vec_id AS centroid_id, v AS cv FROM base
            WHERE vec_id IN ({cents})),
  assigned AS (
    SELECT vec_id, v, centroid_id FROM (
      SELECT b.vec_id, b.v, c.centroid_id,
             row_number() OVER (PARTITION BY b.vec_id
               ORDER BY {cos.format(a='b.v', b='c.cv')} DESC, c.centroid_id) AS rk
      FROM base b CROSS JOIN cents c) WHERE rk = 1),
  probes AS (SELECT vec_id AS probe_id, v AS pv FROM base
             WHERE vec_id IN ({probes})),
  probe_lists AS (
    SELECT probe_id, pv, centroid_id FROM (
      SELECT p.probe_id, p.pv, c.centroid_id,
             row_number() OVER (PARTITION BY p.probe_id
               ORDER BY {cos.format(a='p.pv', b='c.cv')} DESC, c.centroid_id) AS rk
      FROM probes p CROSS JOIN cents c) WHERE rk <= 2),
  cand AS (
    SELECT pl.probe_id, pl.pv, a.vec_id, a.v
    FROM assigned a JOIN probe_lists pl USING (centroid_id)
    WHERE a.vec_id <> pl.probe_id),
  ranked AS (
    SELECT probe_id, vec_id, {cos.format(a='v', b='pv')} AS cosine,
           row_number() OVER (PARTITION BY probe_id
             ORDER BY {cos.format(a='v', b='pv')} DESC, vec_id) AS rank
    FROM cand)
  SELECT probe_id, vec_id, floor((cosine) * 1000000 + 0.5) / 1000000 AS cosine,
         rank
  FROM ranked WHERE rank <= 10
"""




def q_tpch_q6(spark, sf):
    """Q6 shape: pure filter+agg, fully pushed to the scan."""
    li = _lineitem(spark, sf)
    out = (li.filter((F.col(TIME_COLUMN) >= F.lit("1997-01-01"))
                     & (F.col(TIME_COLUMN) < F.lit("1998-01-01"))
                     & (F.col("l_discount").between(0.03, 0.05))
                     & (F.col("l_quantity") < 24))
           .agg(R(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
                .alias("revenue"),
                F.count("*").alias("n")))
    return out


SQL_TPCH_Q6 = """
  SELECT floor((sum(l_extendedprice * l_discount)) * 100 + 0.5) / 100 AS revenue,
         count(*) AS n
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    AND l_discount BETWEEN 0.03 AND 0.05 AND l_quantity < 24
"""




def q_interval_begin_end(spark, sf):
    """Interval matrix cell [b,e) with end-tick labels (inclusion=begin,
    rounding=end)."""
    ev = _events(spark, sf)
    clock = clocks.uniform("2024-01-01", "2027-01-01", "1d")
    out = intervals.summarize_intervals(
        ev, clock, S.count(), key=["event_type"],
        inclusion="begin", rounding="end")
    return out.select(TIME_COLUMN, "event_type", "count")


SQL_INTERVAL_BEGIN_END = """
  SELECT date_trunc('day', ts) + INTERVAL 1 DAY AS time, event_type,
         count(*) AS count
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2027-01-01'
  GROUP BY 1, 2
"""

