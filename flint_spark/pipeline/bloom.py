"""Deterministic Bloom filter for incremental corpus deduplication.

The 100 TB ingestion problem this solves: dedup each NEW batch against
an existing corpus without joining or re-scanning the corpus per batch.
Build a Bloom filter over the corpus keys ONCE (distributed position
aggregation -> m-bit bitmap on the driver, m/8 bytes), broadcast it,
and flag each new batch map-side — no shuffle touches the new batch.

Unlike ``DataFrame.stat.bloomFilter`` (JVM object, engine-private
hashing), positions here are k md5-derived hashes of the key
(``pipeline.hashing.h28``), so construction AND membership are pure
functions of the key that DuckDB replays value-for-value — the gate
query checks the exact kept/flagged sets, false positives included.

Contracts: no false negatives ever (a key in the corpus is always
flagged); false-positive rate ~(1 - e^{-kn/m})^k — size m >= ~10 bits
per corpus key for ~1%.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .hashing import h28

#: default filter geometry: 2^20 bits = 128 KiB broadcast
DEFAULT_M = 1 << 20
DEFAULT_K = 5


def _position_cols(key: Column, m: int, k: int, salt: str) -> list[Column]:
    return [
        F.pmod(h28(F.concat(F.lit(f"{salt}:{j}:"), key.cast("string"))),
               F.lit(m))
        for j in range(k)
    ]


def bloom_build(df: DataFrame, key_col: str, m: int = DEFAULT_M,
                k: int = DEFAULT_K, salt: str = "bloom") -> bytes:
    """Distributed Bloom construction: map-side position explosion,
    distinct-position aggregation (at most m rows collected — the same
    O(m) driver footprint as the bitmap itself), packed to m/8 bytes."""
    import numpy as np

    pos = F.explode(F.array(*_position_cols(F.col(key_col), m, k, salt)))
    # null keys hash to null positions (nothing to record — a null is
    # MISSING, not a value) and would crash the bitmap fill
    rows = (df.filter(F.col(key_col).isNotNull())
            .select(pos.alias("p")).distinct().collect())
    bits = np.zeros(m, dtype=bool)
    if rows:
        bits[[r["p"] for r in rows]] = True
    return np.packbits(bits).tobytes()


def bloom_flag(df: DataFrame, bloom: bytes, key_col: str,
               m: int = DEFAULT_M, k: int = DEFAULT_K,
               salt: str = "bloom",
               flag_col: str = "maybe_seen") -> DataFrame:
    """Adds ``flag_col``: True iff all k positions of the key are set —
    i.e. the key is in the corpus OR a false positive. Map-side only:
    the bitmap rides a broadcast variable into one Arrow-batched pandas
    stage (vectorized md5 via hashlib over the batch; numpy bit test).
    """
    import hashlib

    import numpy as np

    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(bloom)
    schema = T.StructType(list(df.schema.fields)
                          + [T.StructField(flag_col, T.BooleanType())])
    in_cols = list(df.columns)
    # stringify with SPARK's cast, not pandas astype(str): the two
    # disagree for booleans ('true' vs 'True') and large doubles
    # ('1.0E20' vs '1e+20'), and a representation mismatch with
    # bloom_build's positions means FALSE NEGATIVES — breaking the
    # module's core contract. Null keys flag False (never seen).
    keyed = df.withColumn("__bloom_k", F.col(key_col).cast("string"))

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.unpackbits(np.frombuffer(bc.value, dtype=np.uint8))
        for pdf in batches:
            keys = pdf["__bloom_k"]
            present = keys.notna().to_numpy()
            flags = present.copy()
            for j in range(k):
                prefix = f"{salt}:{j}:"
                pos = keys.map(lambda s, p=prefix: 0 if s is None else int(
                    hashlib.md5((p + s).encode("utf-8")).hexdigest()[:7],
                    16) % m)
                flags &= bits[pos.to_numpy(dtype=np.int64)].astype(bool)
            out = pdf[in_cols].copy()
            out[flag_col] = flags
            yield out

    return keyed.mapInPandas(check, schema)


def dedup_against_corpus(new_batch: DataFrame, corpus: DataFrame,
                         key_col: str, m: int = DEFAULT_M,
                         k: int = DEFAULT_K,
                         salt: str = "bloom") -> DataFrame:
    """Keep only new-batch rows that are DEFINITELY not in the corpus
    (no false negatives: nothing already in the corpus survives; a
    ~(1-e^{-kn/m})^k fraction of genuinely-new rows is dropped as false
    positives — the standard Bloom ingestion tradeoff)."""
    bloom = bloom_build(corpus, key_col, m, k, salt)
    flagged = bloom_flag(new_batch, bloom, key_col, m, k, salt)
    return flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
