"""spark-submit entry point: build the inverted index on a cluster.

Usage (multi-executor cluster; the north rule's deployment shape):

    zip -r sparkforward.zip sparkforward/
    spark-submit --py-files sparkforward.zip \
        tools/build_index_job.py \
        --input /data/webpages_parquet --output /indexes/main \
        --id-col doc_id --text-col text \
        --num-partitions 4096 --n-salt 64 [--resume]

Locally the same script runs under ``spark-submit --master local[N]``.
The job is resumable: rerunning with ``--resume`` skips term-hash buckets
whose checkpoint manifests are already committed.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str]) -> int:
    p = argparse.ArgumentParser(description="Build a sparkforward posting index")
    p.add_argument("--input", required=True, help="input parquet path (corpus)")
    p.add_argument("--output", required=True, help="index output directory")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--num-partitions", type=int, default=None)
    p.add_argument("--n-buckets", type=int, default=None)
    p.add_argument("--salt-threshold", type=int, default=1_000_000)
    p.add_argument("--n-salt", type=int, default=16)
    p.add_argument("--block-size", type=int, default=128)
    p.add_argument("--resume", action="store_true")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from sparkforward.postings import build_inverted_index

    spark = SparkSession.builder.appName("sparkforward-build").getOrCreate()
    docs = spark.read.parquet(args.input)
    t0 = time.time()
    index = build_inverted_index(
        docs,
        args.output,
        id_col=args.id_col,
        text_col=args.text_col,
        salt_threshold=args.salt_threshold,
        n_salt=args.n_salt,
        block_size=args.block_size,
        num_partitions=args.num_partitions,
        n_buckets=args.n_buckets,
        resume=args.resume,
    )
    elapsed = time.time() - t0
    print(
        json.dumps(
            {
                "status": "ok",
                "output": args.output,
                "n_docs": index.stats["n_docs"],
                "avgdl": index.stats["avgdl"],
                "elapsed_sec": round(elapsed, 2),
                "docs_per_sec": round(index.stats["n_docs"] / elapsed, 1),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
