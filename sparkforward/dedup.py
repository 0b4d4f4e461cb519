"""Deduplication operators for large-scale corpus pipelines.

* :func:`exact_duplicates` — hash-groupBy on ``md5(text)``; the partial
  aggregation makes this one vocabulary-of-hashes-sized shuffle.
* :func:`minhash_near_duplicates` — MinHash + LSH banding over distinct
  token sets: signature (map-side after one token explode), band buckets,
  bucket self-join for candidates, exact-Jaccard verification. All hash
  functions are ``md5`` so the DuckDB oracle can reproduce results exactly.
* :func:`simhash` — 64-bit SimHash fingerprints (Spark-only; pytest-verified).

Scale notes: the bucket self-join is the classic LSH trick — candidate pairs
are generated per-bucket, never corpus x corpus. A pathological bucket (all
near-identical docs) produces a quadratic bucket; the band key includes the
band index so hot buckets split across ``NUM_BANDS`` keys, and at real scale
the bucket join runs under AQE skew handling.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparkforward.tokenize import SPLIT_PATTERN

NUM_HASHES = 8
ROWS_PER_BAND = 2
NUM_BANDS = NUM_HASHES // ROWS_PER_BAND
JACCARD_THRESHOLD = 0.7


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(text_md5, n_docs, rep_doc_id) for every exactly-duplicated text."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("rep_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def _token_sets(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, term) with distinct terms per doc."""
    return docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col(text_col)), SPLIT_PATTERN),
                    lambda t: t != "",
                )
            )
        ).alias("term"),
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, h, mh) — MinHash signature rows, md5-based (oracle-matching)."""
    tokset = _token_sets(docs, text_col)
    hseq = F.explode(F.sequence(F.lit(0), F.lit(NUM_HASHES - 1))).alias("h")
    return (
        tokset.select("doc_id", "term", hseq)
        .withColumn(
            "mh",
            F.md5(F.concat(F.col("h").cast("string"), F.lit(":"), F.col("term"))),
        )
        .groupBy("doc_id", "h")
        .agg(F.min("mh").alias("mh"))
    )


def minhash_near_duplicates(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) — LSH candidates verified by exact Jaccard."""
    sig = minhash_signatures(docs, text_col)
    bands = (
        sig.withColumn("band", (F.col("h") / ROWS_PER_BAND).cast("bigint"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("h", "mh"))),
                        lambda s: s["mh"],
                    ),
                )
            ).alias("band_key")
        )
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"), "band", "band_key"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), "band", "band_key"
    )
    cand = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    tokset = _token_sets(docs, text_col)
    sizes = tokset.groupBy("doc_id").agg(F.count("*").alias("sz"))
    ta = tokset.select(F.col("doc_id").alias("doc_a"), "term")
    tb = tokset.select(F.col("doc_id").alias("doc_b"), "term")
    inter = (
        cand.join(ta, "doc_a")
        .join(tb, ["doc_b", "term"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
    )
    sza = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza"))
    szb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb"))
    return (
        inter.join(sza, "doc_a")
        .join(szb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("i").cast("double")
                / (F.col("sza") + F.col("szb") - F.col("i")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


#: DuckDB oracle for minhash_near_duplicates — same hashes, same banding.
MINHASH_SQL = f"""
WITH tokset AS (
  SELECT doc_id, unnest(list_distinct(list_filter(
    regexp_split_to_array(lower(text), '{SPLIT_PATTERN}'), t -> t <> ''))) AS term
  FROM documents
),
hs AS (SELECT unnest(range({NUM_HASHES})) AS h),
sig AS (
  SELECT doc_id, h, min(md5(h::VARCHAR || ':' || term)) AS mh
  FROM tokset CROSS JOIN hs GROUP BY doc_id, h
),
bands AS (
  SELECT doc_id, h // {ROWS_PER_BAND} AS band,
         md5(string_agg(mh, ',' ORDER BY h)) AS band_key
  FROM sig GROUP BY doc_id, h // {ROWS_PER_BAND}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS sz FROM tokset GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS i
  FROM cand c
  JOIN tokset ta ON ta.doc_id = c.doc_a
  JOIN tokset tb ON tb.doc_id = c.doc_b AND ta.term = tb.term
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       round(i.i::DOUBLE / (sa.sz + sb.sz - i.i), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE round(i.i::DOUBLE / (sa.sz + sb.sz - i.i), 6) >= {JACCARD_THRESHOLD}
"""


def simhash(
    docs: DataFrame, text_col: str = "text", out_col: str = "simhash"
) -> DataFrame:
    """64-bit SimHash fingerprints (Arrow-batched NumPy; Spark-only op).

    Per doc: each distinct term contributes its blake2b-64 bit pattern
    weighted +1/-1; the fingerprint is the sign vector re-packed to 64 bits.
    Near-duplicates have small Hamming distance.
    """
    import hashlib

    fields = docs.schema.fields + [T.StructField(out_col, T.LongType())]

    def hash_batches(it):
        from sparkforward.tokenize import tokenize

        for pdf in it:
            out = []
            for text in pdf[text_col]:
                acc = np.zeros(64, dtype=np.int64)
                for term in set(tokenize(text or "")):
                    h = np.uint64(
                        int.from_bytes(
                            hashlib.blake2b(term.encode(), digest_size=8).digest(), "big"
                        )
                    )
                    bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                    acc += np.where(bits == np.uint64(1), 1, -1)
                fp = int(
                    ((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
                        dtype=np.uint64
                    )
                )
                out.append(fp - (1 << 64) if fp >= (1 << 63) else fp)
            pdf = pdf.copy()
            pdf[out_col] = pd.Series(out, index=pdf.index, dtype="int64")
            yield pdf

    return docs.mapInPandas(hash_batches, schema=T.StructType(fields))
