"""Incremental index maintenance: append a delta corpus to a committed
posting index WITHOUT a full rebuild — and come out byte-identical to a
from-scratch build of the union corpus.

The reference appends to its vector store in place (``index/disk.py:243-301``
resizes h5py datasets under a single process) and enforces the B1/B2 append
contract (validated input, duplicate-id rejection). A distributed posting
index can't mutate in place — instead each append writes a new immutable
**generation** under ``<index>/gen-N`` and flips ``stats.json``'s
``data_dir`` pointer atomically (tmp + rename). Readers see the old complete
generation or the new one, never a mix; a crash mid-append leaves the base
index untouched and the next append wipes the orphaned generation and
redoes the work.

Byte-identity with a from-scratch union build (verified by the DuckDB
signature in tools/soak_append.py) pins three subtleties:

* **avgdl moves** with the union corpus, and every block's ``max_z/min_z``
  bakes avgdl in — so even untouched terms need their metadata refreshed.
  Their blobs and block boundaries are avgdl-free, so the refresh is a
  MAP-ONLY pass (decode tf/dl, recompute z extrema): no tokenize, no
  shuffle, sequential columnar I/O. The exact integer token total
  (``stats.sum_dl``) is persisted at build time so the union avgdl
  reproduces the builder's float64 division bit-for-bit.
* **Touched terms re-merge through the identical kernel**: a final block
  row's blobs ARE the partial-row format (absolute first doc, plain deltas
  after), so base blocks of delta-touched terms feed straight back through
  :func:`postings.salt_partials` + :func:`postings.merge_salted` together
  with the delta's stage-1 partials. Salting re-derives from the UNION df
  (:func:`postings.head_map` is a pure function of (df, config)), so a term
  that crosses the salt threshold — or needs a larger power-of-two modulus —
  re-shards exactly as a scratch build would.
* **Append is id-monotone** (new doc ids strictly above the base max),
  mirroring the reference's append-only contract; a colliding id would
  corrupt posting order and is rejected up front (B2 analog).

Scale notes (100 TB): the delta pays tokenize + shuffle only for ITS OWN
postings; the base pays one embarrassingly-parallel metadata rewrite and a
re-merge bounded by the delta's vocabulary. Appends should be batched so
that rewrite amortizes; the next step beyond this (kept out of scope here)
is a multi-segment LSM layout where untouched rows are not rewritten at all
and stale bounds are inflated by ``max(1, avgdl_new/avgdl_old)`` at serve
time — sound because final scores are always recomputed from raw tf/dl.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkforward.bm25 import B, K1
from sparkforward.postings import (
    BLOCK_POSTING_SCHEMA,
    STATS_TERM,
    TARGET_SHARD_POSTINGS,
    PostingIndex,
    _build_partials,
    attach_term_meta,
    head_map,
    index_data_root,
    merge_salted,
    salt_partials,
    varbyte_decode,
)

_BLOCK_COLS = [f.name for f in BLOCK_POSTING_SCHEMA.fields]


def _refresh_block_meta(avgdl: float):
    """mapInPandas kernel: recompute ``max_z``/``min_z`` under a new avgdl.

    Batched like the merge kernel: one varbyte decode per Arrow batch and
    stream (not per row), extrema via ``np.maximum/minimum.reduceat`` at the
    rows' posting-count boundaries. The z formula is element-for-element the
    one in :func:`postings.encode_posting_list`, and float max/min are
    order-independent exact comparisons — so refreshed metadata is
    bit-identical to what a scratch build computes for the same blocks.
    """

    def refresh(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                yield pdf
                continue
            n_arr = pdf["n"].to_numpy(dtype=np.int64)
            tf = varbyte_decode(b"".join(bytes(b) for b in pdf["tf_blob"]))
            dl = varbyte_decode(b"".join(bytes(b) for b in pdf["dl_blob"]))
            z = (tf * (K1 + 1.0)) / (
                tf + K1 * (1.0 - B + B * dl.astype(np.float64) / avgdl)
            )
            starts = np.concatenate(([0], np.cumsum(n_arr)[:-1]))
            out = pdf.copy()
            out["max_z"] = np.maximum.reduceat(z, starts)
            out["min_z"] = np.minimum.reduceat(z, starts)
            yield out

    return refresh


def append_to_index(
    spark: SparkSession,
    path: str,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> PostingIndex:
    """Append ``docs`` to the committed index at ``path``; return the
    reloaded index. Build configuration (block size, salting, bucket
    modulus) is pinned from the base ``stats.json`` — an append must shard
    and bucket exactly like the original build or resume/serve invariants
    break (cf. the n_buckets resume pin in postings.merge_partials).
    """
    with open(os.path.join(path, "stats.json")) as fh:
        stats = json.load(fh)
    if stats.get("layout") != "block":
        raise ValueError(
            "append_to_index requires the block-granular layout; "
            f"index at {path} has layout={stats.get('layout')!r} — rebuild it"
        )
    if "sum_dl" not in stats:
        raise ValueError(
            "append_to_index needs the exact integer token total "
            "(stats.sum_dl, written by round-6+ builds); rebuild the base "
            "index once — n_docs*avgdl cannot recover it exactly"
        )
    root = index_data_root(path, stats)
    cur_gen = stats.get("data_dir")

    # wipe orphaned generations from a crashed append: stats.json never
    # pointed at them, so the base index is intact and they are garbage
    for d in glob.glob(os.path.join(path, "gen-*")):
        if os.path.basename(d) != cur_gen:
            shutil.rmtree(d, ignore_errors=True)

    base_post = spark.read.parquet(os.path.join(root, "postings")).drop("bucket")
    base_terms = spark.read.parquet(os.path.join(root, "terms"))

    raw_partials = _build_partials(docs, id_col, text_col).persist()
    try:
        g = (
            raw_partials.filter(F.col("term") == STATS_TERM)
            .agg(F.sum("n").alias("n"), F.sum("sum_dl").alias("sum_dl"))
            .collect()[0]
        )
        n_delta = int(g["n"] or 0)
        if n_delta == 0:  # empty delta: the union IS the base index
            return PostingIndex.load(spark, path)
        sum_dl_delta = int(g["sum_dl"])

        # id-monotone append contract (reference B2 analog): one metadata-only
        # agg on the base (last_doc column, blob pages unread) + one tiny agg
        # on the delta
        max_base = base_post.agg(F.max("last_doc")).collect()[0][0]
        min_delta = docs.agg(
            F.min(F.col(id_col).cast("long"))
        ).collect()[0][0]
        if max_base is not None and min_delta is not None and min_delta <= max_base:
            raise RuntimeError(
                f"append_to_index: delta doc ids must be strictly greater than "
                f"the base index's (base max {max_base}, delta min {min_delta}) "
                "— duplicate or interleaved ids would corrupt posting order"
            )

        n_union = int(stats["n_docs"]) + n_delta
        sum_dl_union = int(stats["sum_dl"]) + sum_dl_delta
        # float64 division of exactly-converted integers — bit-identical to
        # the builder's Spark-side sum(sum_dl)::double / sum(n)
        avgdl = float(sum_dl_union) / float(n_union)

        delta_partials = raw_partials.filter(F.col("term") != STATS_TERM)
        delta_df = (
            delta_partials.groupBy("term").agg(F.sum("n").alias("df")).persist()
        )
        df_union = (
            base_terms.select("term", "df")
            .unionByName(delta_df)
            .groupBy("term")
            .agg(F.sum("df").alias("df"))
        )
        salt_threshold = int(stats["salt_threshold"])
        head = head_map(
            [
                (r["term"], int(r["df"]))
                for r in df_union.filter(F.col("df") > salt_threshold).collect()
            ],
            salt_threshold,
            int(stats["n_salt"]),
            int(stats.get("target_shard_postings", TARGET_SHARD_POSTINGS)),
        )

        # delta vocabulary is workload-bounded (<= delta postings), so the
        # touched/untouched split broadcasts it instead of shuffling the base
        touched_terms = F.broadcast(delta_df.select("term"))
        touched_base = base_post.join(touched_terms, "term", "left_semi")
        untouched = base_post.join(touched_terms, "term", "left_anti")

        # a block row's (n, blobs) is a valid partial row — reuse the exact
        # build machinery on base blocks + delta partials of touched terms
        merged_input = touched_base.select(
            "term", "n", "doc_blob", "tf_blob", "dl_blob"
        ).unionByName(
            delta_partials.select("term", "n", "doc_blob", "tf_blob", "dl_blob")
        )
        salted = salt_partials(merged_input, head)
        if num_partitions:
            salted = salted.repartition(num_partitions, "term", "salt")
        touched_rows = merge_salted(
            salted, head, avgdl, int(stats["block_size"])
        )
        refreshed = untouched.select(*_BLOCK_COLS).mapInPandas(
            _refresh_block_meta(avgdl), schema=BLOCK_POSTING_SCHEMA
        )
        all_rows = touched_rows.unionByName(refreshed)

        gen_no = 1 + (int(cur_gen.split("-", 1)[1]) if cur_gen else 0)
        gen_dir = os.path.join(path, f"gen-{gen_no}")
        n_buckets = int(stats["n_buckets"])
        (
            all_rows.withColumn(
                "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
            )
            .repartition(n_buckets, "bucket")
            .sortWithinPartitions("term", "salt", "block_no")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(os.path.join(gen_dir, "postings"))
        )
        attach_term_meta(df_union, float(n_union), head).write.mode(
            "overwrite"
        ).parquet(os.path.join(gen_dir, "terms"))
        delta_df.unpersist()

        # generation manifest: lineage + metrics for the append itself
        with open(os.path.join(gen_dir, "manifest.json"), "w") as fh:
            json.dump(
                {
                    "generation": gen_no,
                    "base_data_dir": cur_gen,
                    "delta_docs": n_delta,
                    "delta_sum_dl": sum_dl_delta,
                    "n_docs": float(n_union),
                    "avgdl": avgdl,
                },
                fh,
            )

        # THE COMMIT POINT: everything above is invisible until this rename
        new_stats = {
            **stats,
            "n_docs": float(n_union),
            "avgdl": avgdl,
            "sum_dl": sum_dl_union,
            "data_dir": f"gen-{gen_no}",
        }
        tmp = os.path.join(path, ".stats.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(new_stats, fh)
        os.replace(tmp, os.path.join(path, "stats.json"))
    finally:
        raw_partials.unpersist()

    # the superseded generation's data is now unreferenced; keep exactly one
    # committed generation on disk (the new one) — old root dirs under the
    # index path are removed only AFTER the commit point, so a crash here
    # costs disk, never correctness
    if cur_gen:
        shutil.rmtree(os.path.join(path, cur_gen), ignore_errors=True)
    else:
        shutil.rmtree(os.path.join(path, "postings"), ignore_errors=True)
        shutil.rmtree(os.path.join(path, "terms"), ignore_errors=True)
    return PostingIndex.load(spark, path)
