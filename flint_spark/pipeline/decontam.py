"""Test-set decontamination: flag training documents sharing word
n-grams with an evaluation set.

The standard pretraining hygiene step (the reference engine has no
analogue — this is part of the LLM-pipeline extension surface): any
training document containing an n-gram that also appears in a held-out
benchmark is contaminated and must be dropped or redacted before
training.

Scale posture: the evaluation set is small by definition (benchmarks
are thousands of documents, the corpus is billions), so its distinct
n-gram table broadcasts and contamination detection is ONE map-side
broadcast semi-join over the corpus shingles — no corpus shuffle at
all when only the flag is needed, one hash aggregation when per-doc
hit counts are requested. Shingling reuses ``dedup.shingles`` (pure
codegen expressions, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles


def contaminated_ngrams(test_docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 8) -> DataFrame:
    """Distinct word n-grams of the evaluation set: (shingle). The
    contamination dictionary — small enough to broadcast."""
    return shingles(test_docs, text_col, id_col, k=n).select("shingle").distinct()


def decontaminate(docs: DataFrame, test_docs: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 8, min_hits: int = 1) -> DataFrame:
    """Per-document contamination report: (id, hits, contaminated).

    ``hits`` counts DISTINCT shared n-grams with the evaluation set;
    ``contaminated`` is ``hits >= min_hits``. Join the result back on
    ``id_col`` and filter ``~contaminated`` to clean the corpus.
    """
    dic = F.broadcast(contaminated_ngrams(test_docs, text_col, id_col, n))
    sh = shingles(docs, text_col, id_col, k=n)
    hits = (sh.join(dic, "shingle")
            .groupBy(id_col)
            .agg(F.count("*").alias("hits")))
    return (docs.select(id_col).distinct()
            .join(hits, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce(F.col("hits"), F.lit(0)).alias("hits"),
                    (F.coalesce(F.col("hits"), F.lit(0)) >= min_hits)
                    .alias("contaminated")))
