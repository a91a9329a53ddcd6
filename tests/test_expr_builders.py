"""Bit-equality pins for the r11 SQL-string expression builders in
flint_spark.pipeline.similarity.

The optimization replaced per-element Column-API construction
(one py4j round-trip per literal) with single parsed SQL strings, and
added size-guarded UNROLLED arithmetic fast paths for the hot dot
products. Both must be bitwise-identical to the original fold forms:
these tests evaluate old and new expressions side by side in one Spark
row and compare exact doubles (no tolerance).
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from flint_spark.pipeline import similarity as sim


ADVERSARIAL_DOUBLES = [
    0.0, -0.0, 1.0, -1.0, 1 / 3, -1 / 3, 0.1, 2.5, -2.5,
    1e-308, 5e-324, 1.7976931348623157e308, -1.7976931348623157e308,
    math.pi, -math.e, 123456789.123456789, 2 ** 53 + 1.0,
    6.02214076e23, -1.602176634e-19,
]


def test_sql_double_literal_roundtrip(spark):
    """_dlit parses back to the bit-identical IEEE double for every
    adversarial value (repr() emits the shortest round-tripping
    decimal; Spark's parser is a correctly-rounded strtod)."""
    exprs = [F.expr(sim._dlit(x)).alias(f"c{i}")
             for i, x in enumerate(ADVERSARIAL_DOUBLES)]
    row = spark.range(1).select(*exprs).first()
    for i, x in enumerate(ADVERSARIAL_DOUBLES):
        got = row[f"c{i}"]
        assert math.copysign(1.0, got) == math.copysign(1.0, x)
        assert got == x, (i, x, got)


def test_lit_f64s_matches_per_element_array(spark):
    vals = ADVERSARIAL_DOUBLES + [float("nan")]  # nan -> fallback path
    finite = ADVERSARIAL_DOUBLES
    row = spark.range(1).select(
        sim._lit_f64s(finite).alias("fast"),
        F.array(*[F.lit(float(v)) for v in finite]).alias("ref"),
        sim._lit_f64s(vals).alias("fb"),
    ).first()
    assert list(row["fast"]) == list(row["ref"])
    assert row["fb"][-1] != row["fb"][-1]  # nan preserved via fallback


def _rand_vec(rng, dim):
    return [rng.uniform(-2, 2) for _ in range(dim)]


def test_unrolled_dot_and_norm_bit_equal_fold(spark):
    """The unrolled chains replay the fold's exact left-to-right IEEE
    op order, so results are bit-equal on random vectors."""
    rng = random.Random(411)
    dim = 17
    a, b = _rand_vec(rng, dim), _rand_vec(rng, dim)
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    row = df.select(
        F.expr(sim._dot_sql("a", "b")).alias("fold_dot"),
        F.expr(sim._dot_cols_unrolled("a", "b", dim)).alias("un_dot"),
        F.expr(sim._dot_lit_unrolled("a", b)).alias("unlit_dot"),
        F.expr(sim._norm_sql("a")).alias("fold_norm"),
        F.expr(sim._norm_unrolled("a", dim)).alias("un_norm"),
        sim._dot(F.col("a"), F.col("b")).alias("col_dot"),
        sim._norm(F.col("a")).alias("col_norm"),
    ).first()
    assert row["fold_dot"] == row["un_dot"] == row["unlit_dot"] == row["col_dot"]
    assert row["fold_norm"] == row["un_norm"] == row["col_norm"]
    # driver-side norm replay used for literal centroid norms
    assert sim._py_norm(b) == df.select(
        F.expr(sim._norm_sql(sim._arr_sql(b)))).first()[0]


def test_cosine_helpers_fast_vs_fallback(spark):
    """_cos_pair_cols/_cosine_cols: the size-guarded fast branch equals
    the fold branch bit-for-bit, and ragged rows take the fallback."""
    rng = random.Random(7)
    dim = 12
    rows = [(_rand_vec(rng, dim), _rand_vec(rng, dim)) for _ in range(20)]
    rows.append((_rand_vec(rng, 5), _rand_vec(rng, 5)))  # ragged -> fallback
    df = spark.createDataFrame(rows, "a array<double>, b array<double>")
    got = df.select(
        sim._cos_pair_cols("a", "b", dim).alias("pair_fast"),
        sim._cos_pair_cols("a", "b", None).alias("pair_slow"),
        sim._cosine_cols("a", "b", dim).alias("cos_fast"),
        sim._cosine_cols("a", "b", None).alias("cos_slow"),
    ).collect()
    for r in got:
        assert r["pair_fast"] == r["pair_slow"]
        assert r["cos_fast"] == r["cos_slow"]


def test_bucket_expr_string_matches_column_form(spark):
    rng = random.Random(99)
    dim, n_planes = 8, 6
    planes = [_rand_vec(rng, dim) for _ in range(n_planes)]
    rows = [([_rand_vec(rng, dim)][0],) for _ in range(25)]
    rows.append((_rand_vec(rng, 3),))  # ragged -> fallback branch
    df = spark.createDataFrame(rows, "v array<double>")
    got = df.select(
        sim.bucket_expr("v", planes).alias("s"),
        sim.bucket_expr(F.col("v"), planes).alias("c"),
    ).collect()
    for r in got:
        assert r["s"] == r["c"]


def test_argmax_centroid_matches_legacy_column_form(spark):
    """String-built _argmax_centroid (fast + fallback branches) equals
    the per-element Column construction it replaced, including the
    (cos, -id) tie rule."""
    rng = random.Random(321)
    dim, k = 10, 5
    cents = [(i, _rand_vec(rng, dim)) for i in range(k)]
    cents.append((k, list(cents[0][1])))  # duplicate centroid -> exact tie
    rows = [( _rand_vec(rng, dim),) for _ in range(30)]
    rows.append((list(cents[2][1]),))     # exact centroid hit
    rows.append((_rand_vec(rng, 4),))     # ragged -> fallback branch
    df = spark.createDataFrame(rows, "v array<double>")

    # legacy Column-API construction (the pre-r11 body)
    entries = []
    for cid, cv in cents:
        lit_cv = F.array(*[F.lit(float(x)) for x in cv])
        cos = sim._dot(F.col("v"), lit_cv) / (
            sim._norm(F.col("v")) * sim._norm(lit_cv))
        entries.append(F.struct(cos.alias("s"), F.lit(-cid).alias("nid")))
    legacy = F.array_max(F.array(*entries))

    new = sim._argmax_centroid("v", cents)
    got = df.select(legacy.alias("l"), new.alias("n")).collect()
    for r in got:
        assert r["l"]["s"] == r["n"]["s"]
        assert r["l"]["nid"] == r["n"]["nid"]


def test_pq_codes_sql_matches_argmin_subcode(spark):
    rng = random.Random(55)
    m, ksub, dsub = 3, 4, 5
    dim = m * dsub
    books = [[_rand_vec(rng, dsub) for _ in range(ksub)] for _ in range(m)]
    rows = [(_rand_vec(rng, dim),) for _ in range(20)]
    df = spark.createDataFrame(rows, "v array<double>")

    legacy = F.array(*[
        sim._argmin_subcode(F.slice(F.col("v"), s * dsub + 1, dsub),
                            books[s])["code"]
        for s in range(m)])
    new = F.expr(sim._pq_codes_sql("v", books, dsub))
    got = df.select(legacy.alias("l"), new.alias("n")).collect()
    for r in got:
        assert list(r["l"]) == list(r["n"])


def test_pq_encode_nonfinite_codebook_fallback(spark):
    """A codebook carrying inf keeps the Column-API path and still
    encodes (no SQL-literal form for non-finite doubles)."""
    rng = random.Random(2)
    books = [[[1.0, float("inf")], [0.5, -0.5]]]
    df = spark.createDataFrame(
        [(1, [0.4, -0.6]), (2, [0.9, 0.9])], "vec_id long, embedding array<double>")
    out = sim.pq_encode(df, books, id_col="vec_id").collect()
    assert sorted((r["vec_id"], list(r["codes"])) for r in out) == [
        (1, [1]), (2, [1])]
