"""Incremental index maintenance: append a delta corpus to a committed
posting index WITHOUT a full rebuild.

The reference appends to its vector store in place (``index/disk.py:243-301``
resizes h5py datasets under a single process) and enforces the B1/B2 append
contract (validated input, duplicate-id rejection). A distributed posting
index can't mutate in place — instead each append writes new immutable data
under ``<index>/gen-N`` and flips ``stats.json`` atomically (tmp + rename).
Readers see the old complete state or the new one, never a mix; a crash
mid-append leaves the base index untouched and the next append wipes the
orphaned generation and redoes the work.

Two append modes trade write amplification against read fan-in:

* ``mode="rewrite"`` (default): the new generation holds the COMPLETE union
  index and is byte-identical to a from-scratch build of the union corpus
  (verified by the DuckDB signature in tools/soak_append.py). Byte-identity
  pins three subtleties:

  - **avgdl moves** with the union corpus, and every block's
    ``max_z/min_z`` bakes avgdl in — so even untouched terms need their
    metadata refreshed. Their blobs and block boundaries are avgdl-free, so
    the refresh is a MAP-ONLY pass (decode tf/dl, recompute z extrema): no
    tokenize, no shuffle, sequential columnar I/O. The exact integer token
    total (``stats.sum_dl``) is persisted at build time so the union avgdl
    reproduces the builder's float64 division bit-for-bit.
  - **Touched terms re-merge through the identical kernel**: a final block
    row's blobs ARE the partial-row format (absolute first doc, plain
    deltas after), so base blocks of delta-touched terms feed straight back
    through :func:`postings.salt_partials` + :func:`postings.merge_salted`
    together with the delta's stage-1 partials. Salting re-derives from the
    UNION df, so a term that crosses the salt threshold — or needs a larger
    power-of-two modulus — re-shards exactly as a scratch build would.
  - **Append is id-monotone** (new doc ids strictly above the base max),
    mirroring the reference's append-only contract; a colliding id would
    corrupt posting order and is rejected up front (B2 analog).

* ``mode="segment"``: the 100-TB fast path — untouched base rows are **not
  rewritten at all**. The new generation holds ONLY the delta-touched
  terms' re-merged rows; a term-tombstone list hides those terms' stale
  rows in older segments, and :func:`postings.compose_segment_postings`
  stacks the segments at load time, inflating stale segments' ``max_z`` /
  deflating ``min_z`` by the avgdl-ratio bound (sound pruning; serving is
  EXACT because final scores always recompute from raw tf/dl under the
  current avgdl). :func:`compact_index` folds the stack back into one
  generation that is byte-identical to a scratch union build — block
  boundaries are avgdl-free and each visible row was produced by the exact
  merge kernel at SOME append, so compaction is a map-only metadata refresh
  plus a rewrite.

Scale notes (100 TB): the delta pays tokenize + shuffle only for ITS OWN
postings. In rewrite mode the base additionally pays one
embarrassingly-parallel metadata rewrite (every byte rewritten once per
append — amortize by batching appends); in segment mode it pays NOTHING
per append beyond the touched-term re-merge, at the cost of one extra
parquet scan branch per segment at serve time — compact on a cadence
(``max_segments``) exactly like an LSM store.

Honest caveat: tombstoning is TERM-granular, and under a Zipfian
vocabulary nearly every delta touches the head terms that hold most of
the index's bytes — so segment mode's write savings over rewrite mode is
mostly the untouched-TAIL re-merge plus the whole untouched metadata
refresh, not the head bytes. The further step (kept out of scope) is
Lucene-style per-segment posting lists for ALL terms with cursor-level
merge across segments at serve time — zero re-merge on append, but it
needs cross-segment block numbering and a pinned salt layout.
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
    compose_segment_postings,
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


def _referenced_dirs(stats: dict) -> set[str]:
    """gen-N dir names the committed ``stats`` still points at."""
    refs = set()
    if stats.get("data_dir"):
        refs.add(stats["data_dir"])
    for seg in stats.get("segments") or []:
        if seg["dir"]:
            refs.add(seg["dir"])
    return refs


def _root_in_use(stats: dict) -> bool:
    """True when postings live at the index root (pre-append layout or the
    base segment of a stack that started there)."""
    if not stats.get("data_dir"):
        return True
    return any(not seg["dir"] for seg in stats.get("segments") or [])


def _next_gen(stats: dict) -> int:
    nums = [int(d.split("-", 1)[1]) for d in _referenced_dirs(stats)]
    return 1 + max(nums, default=0)


def _visible_base(spark: SparkSession, path: str, stats: dict) -> DataFrame:
    """The committed index's visible posting rows, raw metadata (the
    appender drops or recomputes bounds, so no ratio adjustment)."""
    if stats.get("segments"):
        df = compose_segment_postings(spark, path, stats, adjust_bounds=False)
    else:
        root = index_data_root(path, stats)
        df = spark.read.parquet(os.path.join(root, "postings"))
    return df.drop("bucket")


def _write_postings(rows: DataFrame, gen_dir: str, n_buckets: int) -> None:
    (
        rows.withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
        )
        .repartition(n_buckets, "bucket")
        .sortWithinPartitions("term", "salt", "block_no")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(os.path.join(gen_dir, "postings"))
    )


def _flip_stats(path: str, new_stats: dict) -> None:
    """THE COMMIT POINT: everything written before this rename is invisible."""
    tmp = os.path.join(path, ".stats.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(new_stats, fh)
    os.replace(tmp, os.path.join(path, "stats.json"))


def _drop_superseded(path: str, old_stats: dict, keep: str) -> None:
    """Remove data dirs the new commit no longer references — runs only
    AFTER the stats flip, so a crash here costs disk, never correctness."""
    for d in _referenced_dirs(old_stats):
        if d != keep:
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)
    if _root_in_use(old_stats):
        shutil.rmtree(os.path.join(path, "postings"), ignore_errors=True)
        shutil.rmtree(os.path.join(path, "terms"), ignore_errors=True)


def append_to_index(
    spark: SparkSession,
    path: str,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
    mode: str = "rewrite",
    max_segments: int | None = None,
) -> PostingIndex:
    """Append ``docs`` to the committed index at ``path``; return the
    reloaded index. Build configuration (block size, salting, bucket
    modulus) is pinned from the base ``stats.json`` — an append must shard
    and bucket exactly like the original build or resume/serve invariants
    break (cf. the n_buckets resume pin in postings.merge_partials).

    ``mode="rewrite"`` produces a single generation byte-identical to a
    scratch union build; ``mode="segment"`` stacks an LSM segment holding
    only the touched terms (see module docstring). ``max_segments`` (segment
    mode) auto-compacts once the stack exceeds that many segments.
    """
    if mode not in ("rewrite", "segment"):
        raise ValueError(f"append_to_index: unknown mode {mode!r}")
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
    referenced = _referenced_dirs(stats)

    # wipe orphaned generations from a crashed append: stats.json never
    # pointed at them, so the base index is intact and they are garbage
    for d in glob.glob(os.path.join(path, "gen-*")):
        if os.path.basename(d) not in referenced:
            shutil.rmtree(d, ignore_errors=True)

    base_post = _visible_base(spark, path, stats)
    base_terms = spark.read.parquet(
        os.path.join(index_data_root(path, stats), "terms")
    )

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

        gen_no = _next_gen(stats)
        gen_dir = os.path.join(path, f"gen-{gen_no}")
        n_buckets = int(stats["n_buckets"])

        if mode == "rewrite":
            untouched = base_post.join(touched_terms, "term", "left_anti")
            refreshed = untouched.select(*_BLOCK_COLS).mapInPandas(
                _refresh_block_meta(avgdl), schema=BLOCK_POSTING_SCHEMA
            )
            _write_postings(touched_rows.unionByName(refreshed), gen_dir, n_buckets)
        else:
            _write_postings(touched_rows, gen_dir, n_buckets)
            # term tombstones: hide the touched terms' stale rows in every
            # older segment (bounded by the delta's vocabulary)
            delta_df.select("term").write.mode("overwrite").parquet(
                os.path.join(gen_dir, "tombstones")
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
                    "mode": mode,
                    "base_data_dir": stats.get("data_dir"),
                    "delta_docs": n_delta,
                    "delta_sum_dl": sum_dl_delta,
                    "n_docs": float(n_union),
                    "avgdl": avgdl,
                },
                fh,
            )

        new_stats = {
            **stats,
            "n_docs": float(n_union),
            "avgdl": avgdl,
            "sum_dl": sum_dl_union,
            "data_dir": f"gen-{gen_no}",
        }
        if mode == "segment":
            segs = stats.get("segments") or [
                # first segment append: the committed base becomes segment 0
                {
                    "dir": stats.get("data_dir") or "",
                    "avgdl": float(stats["avgdl"]),
                    "tombstones": None,
                }
            ]
            new_stats["segments"] = segs + [
                {
                    "dir": f"gen-{gen_no}",
                    "avgdl": avgdl,
                    "tombstones": f"gen-{gen_no}/tombstones",
                }
            ]
        else:
            new_stats.pop("segments", None)
        _flip_stats(path, new_stats)
    finally:
        raw_partials.unpersist()

    if mode == "rewrite":
        # the superseded data is now unreferenced; keep exactly one
        # committed generation on disk (the new one)
        _drop_superseded(path, stats, keep=f"gen-{gen_no}")
    elif max_segments is not None and len(new_stats["segments"]) > max_segments:
        return compact_index(spark, path)
    return PostingIndex.load(spark, path)


def compact_index(spark: SparkSession, path: str) -> PostingIndex:
    """Fold an LSM segment stack back into a single generation —
    byte-identical to a from-scratch build of the same corpus.

    Block boundaries and blobs are avgdl-free and every visible row was
    produced by the exact merge kernel at some append, so compaction is a
    MAP-ONLY metadata refresh (recompute max_z/min_z under the current
    avgdl — bit-identical to what a scratch build computes for the same
    blocks) plus one bucketed rewrite. No tokenize, no merge shuffle.
    """
    with open(os.path.join(path, "stats.json")) as fh:
        stats = json.load(fh)
    if not stats.get("segments"):
        return PostingIndex.load(spark, path)

    visible = compose_segment_postings(
        spark, path, stats, adjust_bounds=False
    ).drop("bucket")
    refreshed = visible.select(*_BLOCK_COLS).mapInPandas(
        _refresh_block_meta(float(stats["avgdl"])), schema=BLOCK_POSTING_SCHEMA
    )
    gen_no = _next_gen(stats)
    gen_dir = os.path.join(path, f"gen-{gen_no}")
    _write_postings(refreshed, gen_dir, int(stats["n_buckets"]))
    spark.read.parquet(
        os.path.join(index_data_root(path, stats), "terms")
    ).write.mode("overwrite").parquet(os.path.join(gen_dir, "terms"))
    with open(os.path.join(gen_dir, "manifest.json"), "w") as fh:
        json.dump(
            {
                "generation": gen_no,
                "mode": "compact",
                "compacted_from": [s["dir"] for s in stats["segments"]],
                "n_docs": float(stats["n_docs"]),
                "avgdl": float(stats["avgdl"]),
            },
            fh,
        )
    new_stats = {**stats, "data_dir": f"gen-{gen_no}"}
    new_stats.pop("segments")
    _flip_stats(path, new_stats)
    _drop_superseded(path, stats, keep=f"gen-{gen_no}")
    return PostingIndex.load(spark, path)
