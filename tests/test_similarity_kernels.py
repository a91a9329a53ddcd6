"""Focused r12 pins for the similarity kernels touched this round:

- `_argmax_centroid`'s Column-API fallback now binds the row norm once
  as a lambda variable and constant-folds centroid norms in Python,
  mirroring the one-parse SQL path structurally. Both rewrites must be
  BIT-identical to the original per-centroid-norm expression (the
  oracle gates hash the expr path; the fallback is the non-finite /
  Column-input route and needs its own pin — r11 verdict item 9).
- `semantic_dedup_pairs`' Gram kernels are row-blocked so a
  degenerate/uncapped cluster no longer materializes a dense n x n
  score matrix in one task (r12 ADVICE). Blocking must not change the
  pair set, values, or row order.
"""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

_SPARK = {}


def _spark():
    if "s" not in _SPARK:
        from flint_spark.session import get_spark
        _SPARK["s"] = get_spark("sim_kernel_tests")
    return _SPARK["s"]


def _old_argmax(vcol, cents):
    """The pre-r12 Column fallback, verbatim: row norm and centroid
    norms re-folded per centroid. The reference the rewrite must match
    bit-for-bit."""
    from flint_spark.pipeline.similarity import _dot, _norm

    entries = []
    for cid, cv in cents:
        lit_cv = F.array(*[F.lit(float(x)) for x in cv])
        cos = _dot(vcol, lit_cv) / (_norm(vcol) * _norm(lit_cv))
        entries.append(F.struct(cos.alias("s"), F.lit(-cid).alias("nid")))
    return F.array_max(F.array(*entries))


def _assert_argmax_bitwise(cents, n_rows=200, seed=3):
    from flint_spark.pipeline.similarity import _argmax_centroid

    spark = _spark()
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n_rows, len(cents[0][1]))
    pdf = pd.DataFrame({"vec_id": range(n_rows),
                        "v": [r.tolist() for r in vecs]})
    df = spark.createDataFrame(pdf)
    new = _argmax_centroid(F.col("v"), cents)
    old = _old_argmax(F.col("v"), cents)
    out = df.select(
        "vec_id",
        new["s"].alias("ns"), new["nid"].alias("nn"),
        old["s"].alias("os"), old["nid"].alias("on")).toPandas()
    # bitwise: compare raw float64 bit patterns, not approximate values
    assert (out["ns"].to_numpy().view("int64")
            == out["os"].to_numpy().view("int64")).all()
    assert (out["nn"] == out["on"]).all()


def test_argmax_column_fallback_bitwise_finite():
    rng = np.random.RandomState(11)
    cents = [(i, rng.randn(16).tolist()) for i in range(5)]
    _assert_argmax_bitwise(cents)


def test_argmax_column_fallback_bitwise_nonfinite():
    """Non-finite centroid components force the Column fallback in
    every caller (`_finite` guard) — the exact case the r11 rewrite
    left unbound."""
    rng = np.random.RandomState(12)
    cents = [(i, rng.randn(8).tolist()) for i in range(4)]
    cents[1][1][3] = float("inf")
    cents[2][1][0] = float("nan")
    _assert_argmax_bitwise(cents)


def test_semantic_dedup_gram_blocking_multi_block():
    """A cluster big enough that the row-blocked Gram kernel runs >= 2
    blocks (n > _GRAM_BLOCK_ELEMS / n) must produce exactly the
    brute-force pair set, with expr and arrow methods agreeing."""
    from flint_spark.pipeline import similarity

    spark = _spark()
    n, dim = 2100, 3
    assert n * n > similarity._GRAM_BLOCK_ELEMS  # blocking engages
    rng = np.random.RandomState(7)
    vecs = rng.randn(n, dim)
    pdf = pd.DataFrame({"vec_id": range(n),
                        "embedding": [r.tolist() for r in vecs]})
    df = spark.createDataFrame(pdf)
    thr = 0.999
    out = similarity.semantic_dedup_pairs(
        df, [0], threshold=thr, method="expr").toPandas()
    out_a = similarity.semantic_dedup_pairs(
        df, [0], threshold=thr, method="arrow").toPandas()
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    S = vn @ vn.T
    ia, jb = np.nonzero(np.triu(S >= thr, k=1))
    ref = {(int(a), int(b)) for a, b in zip(ia, jb)}
    assert ref, "degenerate fixture: no pairs survive the threshold"
    got = set(zip(out["id_a"], out["id_b"]))
    assert got == ref
    assert set(zip(out_a["id_a"], out_a["id_b"])) == ref
    ref_cos = {(int(a), int(b)): S[a, b] for a, b in zip(ia, jb)}
    for _, r in out.iterrows():
        assert abs(r["cosine"] - ref_cos[(r["id_a"], r["id_b"])]) < 1e-9
