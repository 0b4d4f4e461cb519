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
    from sparkforward.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="sparkforward-bench", cores=CPUS)
    qs = entrymod.queries()

    # warm the JVM/Python workers so per-query numbers measure the engine
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    # index-build throughput: synthesized Common-Crawl-style corpus
    from sparkforward.postings import build_inverted_index
    from sparkforward.webtext import synthesize_webpages, webpages_as_documents

    docs = webpages_as_documents(
        synthesize_webpages(spark, BUILD_DOCS, num_partitions=max(CPUS * 2, 32))
    )
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

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "suite_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "index_build_docs_per_sec": round(BUILD_DOCS / build_sec, 1),
                "wand_serve_p95_sec": round(wand_p95, 3),
                "query_p95_sec": round(
                    sorted(timings[q] for q in BENCH_QUERIES)[
                        max(0, int(0.95 * len(BENCH_QUERIES)) - 1)
                    ],
                    3,
                ),
                "cores": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
