"""TAAT-vs-WAND kernel crossover at 1M docs (judge r4 #1 done-criterion).

Round 3 measured the per-posting Python DAAT kernel LOSING to vectorized
TAAT even at 16% block skip (BENCH/BASELINE.md "TAAT/WAND dispatch").
This tool re-measures the round-5 block-at-a-time vectorized kernel
(wand.wand_query_vec) end-to-end — real index build, real serve — on two
1M-doc corpora:

* uniform (i.i.d. doc ids — the r3 regime, low byte-pruning), and
* crawl-order locality (host-clustered tail terms — the high-pruning
  regime the dispatch targets),

with the same 8 mixed rare+head queries. Both kernels are forced via
``taat_max_postings`` (-1 -> always TAAT, 0 -> always WAND); rows must
be identical. Prints one JSON line per corpus.

Usage: python tools/bench_crossover.py [--docs 1000000] [--cores 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    ("w1", "tail500 query join"),
    ("w2", "tail200 tail500 the"),
    ("w3", "tail1000 spark data"),
    ("w4", "tail300 filter stream"),
    ("w5", "tail150 tail700 merge"),
    ("w6", "tail2000 table hash"),
    ("w7", "tail450 scan column"),
    ("w8", "tail900 big value"),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--cores", type=int, default=16)
    args = ap.parse_args()

    from sparkforward.postings import PostingIndex, build_inverted_index
    from sparkforward.session import get_spark
    from sparkforward.wand import wand_topk
    from sparkforward.webtext import synthesize_webpages, webpages_as_documents

    spark = get_spark(app_name="crossover", cores=args.cores)
    sc = spark.sparkContext
    qdf = spark.createDataFrame(QUERIES, "q_id string, query string")

    for label, locality in (("uniform", False), ("locality", True)):
        cpath = tempfile.mkdtemp(prefix=f"sfwd_xover_c_{label}_")
        webpages_as_documents(
            synthesize_webpages(
                spark, args.docs, num_partitions=args.cores * 2,
                locality=locality,
            )
        ).write.mode("overwrite").parquet(cpath)
        docs = spark.read.parquet(cpath)
        ipath = tempfile.mkdtemp(prefix=f"sfwd_xover_i_{label}_")
        t0 = time.time()
        build_inverted_index(
            docs, ipath, salt_threshold=args.docs // 10, n_salt=16,
            num_partitions=args.cores * 2,
        )
        build_sec = time.time() - t0
        index = PostingIndex.load(spark, ipath).cache()

        out = {"corpus": label, "n_docs": args.docs,
               "build_sec": round(build_sec, 2)}
        rows_by_kernel = {}
        for kernel, taat_max in (("taat", -1), ("wand_vec", 0)):
            acc_d, acc_t = sc.accumulator(0), sc.accumulator(0)
            io: dict = {}
            best = 1e18
            for _ in range(3):
                t0 = time.time()
                rows = wand_topk(
                    index, qdf, k=10, taat_max_postings=taat_max,
                    block_stats=(acc_d, acc_t), io_stats=io,
                ).collect()
                best = min(best, time.time() - t0)
            rows_by_kernel[kernel] = sorted(
                (r["q_id"], r["id"], r["rank"], r["score"]) for r in rows
            )
            out[f"{kernel}_sec"] = round(best, 3)
            out[f"{kernel}_decode_fraction"] = round(
                acc_d.value / max(acc_t.value, 1), 4
            )
        out["bytes_fraction"] = round(io.get("bytes_fraction", 1.0), 4)
        out["rows_match"] = rows_by_kernel["taat"] == rows_by_kernel["wand_vec"]
        out["wand_vs_taat"] = round(
            out["wand_vec_sec"] / max(out["taat_sec"], 1e-9), 3
        )
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
