"""Top-k BM25 serving over the posting index: block-max WAND, DAAT.

Per query: postings of the query's terms are gathered with a broadcast
semi-join (parquet row-group pruning on the sorted ``term`` column), salt
shards are merged, and a document-at-a-time WAND traversal with block-max
skipping produces the top-k. Pruning is **lossless**: block maxima are exact
BM25 upper bounds computed at build time, and surviving documents are
re-scored from raw (tf, dl) with the identical float64 formula as the
exhaustive scorer — so ``wand_topk == bm25_topk`` holds exactly (it is the
driver's oracle check for this query).

Scale shape: one task per query group (``applyInPandas`` over q_id). The
decoded working set is bounded by the query's posting sizes; for head-heavy
queries at 10^12 docs the follow-up is partition-parallel WAND (per
(q_id, doc-range) with a final top-k merge window) — the storage layout
(salted shards, block metadata) already supports it.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparkforward.bm25 import B, K1, SCORE_DECIMALS
from sparkforward.postings import PostingIndex, decode_posting_list
from sparkforward.tokenize import query_terms

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("q_id", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("rank", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ]
)


class _TermCursor:
    """Merged (over salt shards) posting cursor for one query term."""

    __slots__ = ("doc_ids", "scores", "block_of", "block_max", "pos", "max_score")

    def __init__(self, rows: pd.DataFrame, avgdl: float, block_size: int):
        docs_l, tfs_l, dls_l = [], [], []
        block_max_l, block_of_l = [], []
        block_base = 0
        term_idf = float(rows["idf"].iloc[0])
        for _, row in rows.iterrows():
            d, tf, dl = decode_posting_list(row)
            docs_l.append(d)
            tfs_l.append(tf)
            dls_l.append(dl)
            # stored bound is idf-free (postings.encode_posting_list);
            # multiplying by the positive idf keeps it an exact upper bound
            bm = term_idf * np.asarray(row["block_max_z"], dtype=np.float64)
            block_max_l.append(bm)
            block_of_l.append(block_base + np.arange(len(d)) // block_size)
            block_base += len(bm)
        d = np.concatenate(docs_l)
        tf = np.concatenate(tfs_l)
        dl = np.concatenate(dls_l)
        block_of = np.concatenate(block_of_l)
        order = np.argsort(d, kind="stable")  # salt shards interleave doc ids
        self.doc_ids = d[order]
        # exact per-posting score (float64, same formula as bm25.py)
        tf64 = tf[order].astype(np.float64)
        self.scores = term_idf * (tf64 * (K1 + 1.0)) / (
            tf64 + K1 * (1.0 - B + B * dl[order].astype(np.float64) / avgdl)
        )
        self.block_of = block_of[order]
        self.block_max = np.concatenate(block_max_l) if block_max_l else np.array([])
        self.pos = 0
        self.max_score = float(self.block_max.max()) if len(self.block_max) else 0.0

    def current(self) -> int:
        return int(self.doc_ids[self.pos]) if self.pos < len(self.doc_ids) else -1

    def exhausted(self) -> bool:
        return self.pos >= len(self.doc_ids)

    def seek(self, target: int) -> None:
        """Advance to the first posting with doc_id >= target (galloping)."""
        self.pos += int(
            np.searchsorted(self.doc_ids[self.pos :], target, side="left")
        )

    def current_block_max(self) -> float:
        if self.exhausted():
            return 0.0
        return float(self.block_max[int(self.block_of[self.pos])])


def wand_query(
    term_rows: pd.DataFrame, k: int, avgdl: float, block_size: int
) -> list[tuple[int, float]]:
    """Block-max WAND over one query's term postings -> [(doc_id, score)].

    Returns the exact top-k by (score desc, doc_id asc); ``score`` is the
    float64 BM25 sum over the query's matching terms.
    """
    cursors = [
        _TermCursor(rows, avgdl, block_size)
        for _, rows in term_rows.groupby("term", sort=True)
    ]
    # Ranking happens on scores rounded to SCORE_DECIMALS (like the
    # exhaustive path), so heap items compare (rounded score, -doc_id): ties
    # keep the smaller doc_id. Upper bounds are raw float64; pruning uses a
    # margin of one rounding unit so a raw score that would round up to tie
    # the threshold is never skipped — pruning stays lossless w.r.t. the
    # rounded ranking.
    eps = 10.0 ** (-SCORE_DECIMALS)
    heap: list[tuple[float, int]] = []
    threshold = -np.inf

    while True:
        live = [c for c in cursors if not c.exhausted()]
        if not live:
            break
        live.sort(key=lambda c: c.current())
        # find pivot: smallest prefix whose term-level UB sum could still
        # reach the (margin-lowered) threshold
        acc = 0.0
        pivot_idx = -1
        for i, c in enumerate(live):
            acc += c.max_score
            if acc > threshold - eps:
                pivot_idx = i
                break
        if pivot_idx == -1:
            break  # no document can beat the threshold
        pivot_doc = live[pivot_idx].current()
        # cursors beyond pivot_idx may also sit on pivot_doc (ties in the
        # sorted order) — they contribute to the pivot's upper bound too
        end = pivot_idx
        while end + 1 < len(live) and live[end + 1].current() == pivot_doc:
            end += 1
        # block-max refinement: tighter UB using the cursors' current blocks
        block_ub = sum(c.current_block_max() for c in live[: end + 1])
        if block_ub <= threshold - eps:
            # skip: advance the cursor with the largest max past the pivot
            mover = max(live[: end + 1], key=lambda c: c.max_score)
            mover.seek(pivot_doc + 1)
            continue
        if live[0].current() == pivot_doc:
            # all preceding cursors aligned on pivot -> fully score it
            score = 0.0
            for c in live:  # term-sorted order: deterministic summation
                if c.current() == pivot_doc:
                    score += float(c.scores[c.pos])
                    c.pos += 1
                elif c.current() > pivot_doc:
                    break
            item = (round(score, SCORE_DECIMALS), -pivot_doc)
            if len(heap) < k:
                heapq.heappush(heap, item)
                if len(heap) == k:
                    threshold = heap[0][0]
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
                threshold = heap[0][0]
        else:
            # not aligned: advance cursors before the pivot up to it
            for c in live[:pivot_idx]:
                if c.current() < pivot_doc:
                    c.seek(pivot_doc)
    out = sorted(heap, key=lambda t: (-t[0], -t[1]))
    return [(-d, s) for s, d in out]


def wand_topk(
    index: PostingIndex, queries: DataFrame, k: int = 10
) -> DataFrame:
    """(q_id, id, rank, score) — distributed top-k serving.

    One ``applyInPandas`` group per query; postings pruned to query terms by
    a broadcast join before any decode.
    """
    avgdl = float(index.stats["avgdl"])
    block_size = int(index.stats.get("block_size", 128))
    kk = int(k)

    qt = query_terms(queries)
    # The query-term set is tiny and known before the scan — collect it and
    # push an In(term, ...) predicate INTO the parquet scan so row-group
    # min/max pruning on the term-sorted postings skips everything else
    # (a broadcast join alone would still read every row group).
    term_list = [r["term"] for r in qt.select("term").distinct().collect()]
    gathered = (
        index.postings.filter(F.col("term").isin(term_list))
        .join(F.broadcast(qt), "term")
        .join(F.broadcast(index.terms.select("term", "idf")), "term")
    )

    def serve(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        (q_id,) = key
        hits = wand_query(pdf, kk, avgdl, block_size)
        return pd.DataFrame(
            {
                "q_id": [q_id] * len(hits),
                "id": [str(d) for d, _ in hits],
                "rank": np.arange(1, len(hits) + 1, dtype=np.int64),
                "score": [s for _, s in hits],
            }
        )

    return gathered.groupBy("q_id").applyInPandas(serve, schema=RESULT_SCHEMA)
