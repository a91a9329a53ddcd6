"""Test-set decontamination: flag training documents sharing word
n-grams with an evaluation set.

The standard pretraining hygiene step (the reference engine has no
analogue — this is part of the LLM-pipeline extension surface): any
training document containing an n-gram that also appears in a held-out
benchmark is contaminated and must be dropped or redacted before
training.

Scale posture: the evaluation set is small by definition (benchmarks
are thousands of documents, the corpus is billions), so its distinct
n-gram table broadcasts and contamination detection is a map-side
broadcast semi-join over the raw (non-deduplicated) corpus shingle
stream. The corpus-scale data crosses exactly ONE exchange: the
per-doc distinct-hit aggregation of the join survivors, which the
selective semi-join has already shrunk to contaminated rows only.
The zero-hit reattachment is a second map-side broadcast join (the
hit table is at most one row per contaminated doc). Shingling reuses
``dedup.shingles`` (pure codegen expressions, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles
from ..session import ansi_guard


@ansi_guard("decontamination operators")
def contaminated_ngrams(test_docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 8) -> DataFrame:
    """Distinct word n-grams of the evaluation set: (shingle). The
    contamination dictionary — small enough to broadcast."""
    return shingles(test_docs, text_col, id_col, k=n).select("shingle").distinct()


@ansi_guard("decontamination operators")
def decontaminate(docs: DataFrame, test_docs: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 8, min_hits: int = 1,
                  ids_unique: bool = True,
                  broadcast_hits: bool = True) -> DataFrame:
    """Per-document contamination report: (id, hits, contaminated).

    ``hits`` counts DISTINCT shared n-grams with the evaluation set;
    ``contaminated`` is ``hits >= min_hits``. Join the result back on
    ``id_col`` and filter ``~contaminated`` to clean the corpus.

    Plan (one corpus exchange): map-side-distinct shingles -> broadcast
    semi-join against the n-gram dictionary -> per-doc count of the
    survivors -> broadcast left-join back onto the id column. Per-doc
    shingle dedup is ``array_distinct`` before the explode (no
    exchange), so distinct-hit counting is a plain count and the only
    corpus-scale exchange is the hits aggregation of join survivors.

    ``ids_unique=False`` adds a distinct on the id projection (one more
    corpus-scale exchange — only for corpora that may repeat ids).
    ``broadcast_hits=False`` falls back to a shuffle join for the
    reattachment — only needed in the pathological case where a large
    fraction of a huge corpus is contaminated (hit table too big to
    broadcast)."""
    dic = F.broadcast(contaminated_ngrams(test_docs, text_col, id_col, n))
    sh = shingles(docs, text_col, id_col, k=n, distinct=True)
    hits = (sh.join(dic, "shingle")
            .groupBy(id_col)
            .agg(F.count("*").alias("hits")))
    if broadcast_hits:
        hits = F.broadcast(hits)
    ids = docs.select(id_col)
    if not ids_unique:
        ids = ids.distinct()
    return (ids
            .join(hits, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce(F.col("hits"), F.lit(0)).alias("hits"),
                    (F.coalesce(F.col("hits"), F.lit(0)) >= min_hits)
                    .alias("contaminated")))
