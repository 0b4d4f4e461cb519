"""Sequential coalescing — the reference's index-compression operator.

Per document, stream its passage vectors **in insertion order**; maintain a
running-average cluster; when the cosine distance of the next vector to the
running average reaches ``delta``, emit the average and start a new cluster;
always emit the final average (ref ``util/__init__.py:51-101``, inner
``_coalesce`` at :70-84).

The algorithm is inherently sequential *within* a document but embarrassingly
parallel *across* documents — exactly the shape of
``groupBy(doc_id).applyInPandas``: one shuffle by doc_id, then a pure NumPy
scan per group, no driver involvement. (The reference runs a doc-at-a-time
driver loop over the whole index.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("vector", T.ArrayType(T.FloatType())),
    ]
)


def cos_dist(a: np.ndarray, b: np.ndarray) -> float:
    """Cosine distance (ref util/__init__.py:40-48)."""
    return float(1 - np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


def coalesce_sequential(P: np.ndarray, delta: float) -> list[np.ndarray]:
    """The exact reference algorithm on one doc's ordered vectors
    (util/__init__.py:70-84)."""
    P_new: list[np.ndarray] = []
    A: list[np.ndarray] = []
    A_avg: np.ndarray = np.empty(())
    first = True
    for v in P:
        if first:
            first = False
        elif cos_dist(v, A_avg) >= delta:
            P_new.append(A_avg)
            A = []
        A.append(v)
        A_avg = np.mean(A, axis=0)
    P_new.append(A_avg)
    return P_new


def coalesce_vectors(
    index_df: DataFrame, delta: float, doc_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, seq, vector) — coalesced clusters per doc.

    ``index_df`` needs (doc_id, vec_idx, vector); rows are sorted by
    ``vec_idx`` inside each group to reproduce insertion order (SURVEY §7.4
    hazard 3).
    """

    def per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_idx")
        P = np.stack(pdf["vector"].apply(lambda v: np.asarray(v, dtype=np.float32)))
        out = coalesce_sequential(P, delta)
        return pd.DataFrame(
            {
                "doc_id": [str(pdf[doc_col].iloc[0])] * len(out),
                "seq": np.arange(len(out), dtype=np.int64),
                "vector": [np.asarray(v, dtype=np.float32) for v in out],
            }
        )

    src = index_df.select(
        F.col(doc_col).cast("string").alias("doc_id"), "vec_idx", "vector"
    ).filter(F.col("doc_id").isNotNull())
    return src.groupBy("doc_id").applyInPandas(per_doc, schema=OUT_SCHEMA)


def create_coalesced_index(source, delta: float):
    """VectorIndex -> coalesced VectorIndex (ref util/__init__.py:51-101)."""
    from sparkforward.index import Mode, VectorIndex

    out = coalesce_vectors(source.df, delta)
    new_df = out.select(
        # order-consistent ordinal within each doc; global contiguity not needed
        (F.xxhash64("doc_id") * 1024 + F.col("seq")).alias("vec_idx"),
        "doc_id",
        F.lit(None).cast("string").alias("psg_id"),
        "vector",
    )
    return VectorIndex(new_df, mode=Mode.MAXP)
