"""Multi-dimensional data layout: z-order (Morton) clustering.

Parquet scan pruning is driven by per-file / per-row-group min-max
stats, which a single-column sort only narrows for ONE predicate
column. Interleaving the bits of several quantized columns into one
sort key (the Delta/Iceberg ``OPTIMIZE ZORDER BY`` technique) makes a
range sort narrow the min-max envelope of EVERY participating column
by ~n_files^(1/k), so conjunctive and single-column predicates on any
of them prune files.

``zorder_key`` is a pure column expression — the bit gather/scatter is
plain integer arithmetic, replayed bitwise by the DuckDB oracle — and
``cluster_by_zorder`` is just ``repartitionByRange`` + an in-partition
sort on that key: Catalyst's range exchange does the heavy lifting,
and the parquet writer records the narrowed stats for free.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quantize(c: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map a numeric column onto the [0, 2^bits) integer grid using the
    column's own min/max (rank-preserving affine quantization)."""
    span = (hi - lo).cast("double")
    scaled = F.when(span > 0,
                    (c.cast("double") - lo.cast("double")) / span) \
        .otherwise(F.lit(0.0))
    q = F.floor(scaled * F.lit(float(2 ** bits))).cast("long")
    return F.least(F.greatest(q, F.lit(0)), F.lit(2 ** bits - 1))


def zorder_key(cols: Sequence[Column], bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of already-quantized
    non-negative integer columns into one Morton key (column 0 gets
    the most significant position of each bit group). Pure integer
    arithmetic — the disjoint bit positions sum without carries, so
    the whole key is one addition chain Catalyst folds into codegen."""
    k = len(cols)
    if k * bits > 63:
        raise ValueError(
            f"zorder_key needs {k * bits} bits for {k} columns x {bits} "
            f"bits each — exceeds a 63-bit signed long; lower bits "
            f"(e.g. bits={63 // k}) or cluster fewer columns")
    terms = []
    for i in range(bits):           # bit i of every column
        for j, c in enumerate(cols):
            src = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            dst = i * k + (k - 1 - j)
            terms.append(src * F.lit(2 ** dst))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def with_zorder_key(df: DataFrame, columns: Sequence[str], bits: int = 8,
                    key_name: str = "__zorder") -> DataFrame:
    """Append the z-order key over ``columns``, quantizing each to
    ``bits`` bits against its observed min/max (one lightweight
    min/max aggregation, broadcast as literals — the same trimmed
    collect pattern as interval clocks)."""
    aggs = []
    for c in columns:
        aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
    row = df.agg(*aggs).first()
    quant = [_quantize(F.col(c), F.lit(row[f"lo_{c}"]), F.lit(row[f"hi_{c}"]),
                       bits) for c in columns]
    return df.withColumn(key_name, zorder_key(quant, bits))


def cluster_by_zorder(df: DataFrame, columns: Sequence[str],
                      num_files: int, bits: int = 8) -> DataFrame:
    """Range-cluster rows by their z-order key into ``num_files``
    contiguous key ranges (one range exchange), sorted within each
    partition so parquet row-group stats narrow too. Write the result
    with ``.write.parquet`` to get a multi-dimensionally pruned
    layout."""
    keyed = with_zorder_key(df, columns, bits)
    return (keyed.repartitionByRange(num_files, F.col("__zorder"))
            .sortWithinPartitions("__zorder")
            .drop("__zorder"))
