"""r12 ADVICE pin: `left_join_topk`'s unorderable-payload fallback
degrades PER GROUP (mirroring the old per-group
`_sort_time_then_values`), instead of dropping the (time, values) tie
rule for every group in the Arrow batch on one TypeError.

Note on reachability: pandas' multi-key sort factorizes object
columns, so ANY array/struct payload is unhashable and takes the
fallback — Spark's column typing means a batch can't mix orderable and
unorderable rows within one column. The per-group form is still the
contract-faithful shape (and covers non-Spark callers of the kernel);
these tests pin (a) the scalar tie rule survives untouched, (b) the
fallback path executes per group without crashing or losing matches."""

_SPARK = {}


def _spark():
    if "s" not in _SPARK:
        from flint_spark.session import get_spark
        _SPARK["s"] = get_spark("topk_fallback_tests")
    return _SPARK["s"]


def test_topk_scalar_payload_keeps_tie_rule():
    """Orderable (scalar) payloads: duplicate right timestamps resolve
    by the documented max-struct rule — the k-tail of the value-sorted
    run, reversed — independent of insertion order."""
    from flint_spark.operators.asof import left_join_topk

    spark = _spark()
    # one compute partition => all key groups share one Arrow batch
    spark.conf.set("spark.flint.compute.partitions", "1")
    try:
        right_rows = [(95_000, "a", v) for v in (60, 50, 40, 30, 20, 10)] \
            + [(95_000, "b", v) for v in (9, 7, 8)]
        left_rows = [(100_000, "a", 1.0), (100_000, "b", 2.0)]
        ldf = spark.createDataFrame(left_rows,
                                    "time long, k string, lv double")
        rdf = spark.createDataFrame(right_rows,
                                    "time long, k string, v long")
        out = left_join_topk(ldf, rdf, k=3, tolerance=50_000,
                             key=["k"]).toPandas().set_index("k")
        assert list(out.loc["a", "v_lastk"]) == [60, 50, 40]
        assert list(out.loc["b", "v_lastk"]) == [9, 8, 7]
    finally:
        spark.conf.unset("spark.flint.compute.partitions")


def test_topk_unorderable_payload_per_group_fallback():
    """Array payloads are unhashable in pandas' multi-key sort, so the
    TypeError fallback fires; the per-group degradation must keep every
    group's full match set and per-group time windows intact."""
    from flint_spark.operators.asof import left_join_topk

    spark = _spark()
    spark.conf.set("spark.flint.compute.partitions", "1")
    try:
        right_rows = (
            [(95_000, "a", [v]) for v in (60, 50, 40, 30)]
            + [(95_000, "b", [None]), (95_000, "b", [1]),
               (40_000, "b", [99])])  # outside b's tolerance window
        left_rows = [(100_000, "a", 1.0), (100_000, "b", 2.0)]
        ldf = spark.createDataFrame(left_rows,
                                    "time long, k string, lv double")
        rdf = spark.createDataFrame(right_rows,
                                    "time long, k string, v array<bigint>")
        out = left_join_topk(ldf, rdf, k=3, tolerance=50_000,
                             key=["k"]).toPandas().set_index("k")
        a_vals = sorted(x[0] for x in out.loc["a", "v_lastk"])
        assert out.loc["a", "n_matched"] == 3
        assert len(a_vals) == 3 and set(a_vals) <= {30, 40, 50, 60}
        import pandas as pd
        # Arrow renders the null list element as NaN in a float array
        b_vals = sorted((-1 if pd.isna(x[0]) else int(x[0]))
                        for x in out.loc["b", "v_lastk"])
        assert out.loc["b", "n_matched"] == 2
        assert b_vals == [-1, 1]  # [99] is outside the window
    finally:
        spark.conf.unset("spark.flint.compute.partitions")
