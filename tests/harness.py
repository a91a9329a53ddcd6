"""Local mirror of the driver's correctness gate: run each
``__spark_entry__.queries()`` entry and its ``oracle_sql()`` through
DuckDB on the same parquet, compare row count, column names and values
(column-name-sorted, row-order-insensitive)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import os as _os
EXACT = _os.environ.get("HARNESS_EXACT", "") == "1"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object and len(s) and isinstance(s.dropna().iloc[0] if s.notna().any() else None, (list, np.ndarray)):
            df[c] = s.map(lambda v: np.nan if (
                v is None or (np.isscalar(v) and pd.isna(v)))
                else tuple(v))
        elif pd.api.types.is_float_dtype(s):
            if not EXACT:
                df[c] = s.round(9)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("float64")  # unify Int64/int32/int64
    for c in df.columns:
        # None/NaN unification in object columns (Spark toPandas emits
        # None where DuckDB .df() emits nan): assert_frame_equal's
        # None-vs-nan leniency is deprecated (FutureWarning today,
        # raises in a future pandas) — normalize before comparing
        if df[c].dtype == object:
            df[c] = df[c].where(df[c].notna(), np.nan)
    return df.sort_values(list(df.columns), ignore_index=True)


def _dtype_class_mismatch(got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    """Driver hashes without unifying int/float: a DuckDB HUGEINT (-> f64)
    vs Spark int64 column hash-mismatches even on equal values (r1
    sessionize). Flag any int-vs-float split before _canon masks it."""
    bad = []
    for c in set(got.columns) & set(exp.columns):
        g, e = got[c].dtype, exp[c].dtype
        gi = pd.api.types.is_integer_dtype(g)
        ei = pd.api.types.is_integer_dtype(e)
        gf = pd.api.types.is_float_dtype(g)
        ef = pd.api.types.is_float_dtype(e)
        if (gi and ef) or (gf and ei):
            bad.append(f"{c}: spark={g} oracle={e}")
    return bad


def compare(name: str, spark_df, sql: str, con) -> tuple[bool, str]:
    return compare_expected(name, spark_df, con.sql(sql).df())


def compare_expected(name: str, spark_df,
                     exp_raw: pd.DataFrame) -> tuple[bool, str]:
    got_raw = spark_df.toPandas()
    dt_bad = _dtype_class_mismatch(got_raw, exp_raw)
    if dt_bad:
        return False, f"int/float dtype split (driver hash hazard): {dt_bad}"
    got = _canon(got_raw)
    exp = _canon(exp_raw)
    if list(got.columns) != list(exp.columns):
        return False, f"columns differ: {list(got.columns)} vs {list(exp.columns)}"
    if len(got) != len(exp):
        return False, f"row count {len(got)} vs {len(exp)}"
    try:
        pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                      check_exact=EXACT, rtol=0,
                                      atol=0 if EXACT else 1e-9)
    except AssertionError as e:
        # first non-empty line beyond the header — the r10 sf1 sweep's
        # FAIL rows printed an empty message because line [1] of a
        # frame-mismatch assertion is blank
        lines = [ln.strip() for ln in str(e).split("\n") if ln.strip()]
        detail = " | ".join(lines[:3])[:240] if lines else str(e)[:240]
        return False, detail
    return True, f"{len(got)} rows"


def main(sf_dir: str = "/root/testdata/sf0.001", only: list[str] | None = None):
    import __spark_entry__ as entry
    from flint_spark import get_spark

    spark = get_spark("harness")
    con = duck_con(sf_dir)
    qs = {**entry.queries(), **entry.extra_queries()}
    oracles = {**entry.oracle_sql(), **entry.extra_oracle_sql()}
    # second oracle mode (r10 verdict item 4): the five recursive-CTE
    # oracles are O(n²)+ in DuckDB; HARNESS_PY_ORACLE=1 swaps them for
    # the linear Python reference replays so the WHOLE registry sweeps
    # at sf1 in one protocol. Pinned equal to the SQL oracles at small
    # SF by test_extra_queries.py.
    py_mode = _os.environ.get("HARNESS_PY_ORACLE", "") == "1"
    if py_mode:
        from py_oracles import PY_ORACLES
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            if name not in oracles:
                n = df.count()
                print(f"  {name:24s} ROWS-ONLY {n}")
                continue
            if py_mode and name in PY_ORACLES:
                ok, msg = compare_expected(name, df, PY_ORACLES[name](con))
                msg += " [py-oracle]"
            else:
                ok, msg = compare(name, df, oracles[name], con)
            print(f"  {name:24s} {'OK  ' if ok else 'FAIL'} {msg}")
            if not ok:
                failures.append(name)
        except Exception as e:  # noqa: BLE001
            print(f"  {name:24s} ERROR {type(e).__name__}: {str(e)[:160]}")
            failures.append(name)
    print(f"\n{len(qs) - len(failures)}/{len(qs)} passing")
    return failures


if __name__ == "__main__":
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sys.exit(1 if main(sf, only) else 0)
