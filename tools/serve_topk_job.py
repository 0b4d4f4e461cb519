"""spark-submit entry point: serve top-k BM25 (+ optional interpolation).

    spark-submit --py-files sparkforward.zip tools/serve_topk_job.py \
        --index /indexes/main --queries /queries.parquet --output /runs/out \
        --k 10 [--vectors /indexes/dense --alpha 0.2]

``--queries``: parquet with (q_id:string, query:string).
With ``--vectors`` (a VectorIndex directory) the WAND ranking is re-ranked
by ``alpha * bm25 + (1 - alpha) * dense`` — the reference's flagship
interpolation pipeline — using query vectors from a (q_id, q_vector)
parquet passed as ``--query-vectors``.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str]) -> int:
    p = argparse.ArgumentParser(description="Serve top-k from a sparkforward index")
    p.add_argument("--index", required=True)
    p.add_argument("--queries", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--vectors", default=None, help="dense VectorIndex dir")
    p.add_argument("--query-vectors", default=None, help="(q_id, q_vector) parquet")
    p.add_argument("--alpha", type=float, default=0.2)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from sparkforward.postings import PostingIndex
    from sparkforward.wand import wand_topk

    spark = SparkSession.builder.appName("sparkforward-serve").getOrCreate()
    index = PostingIndex.load(spark, args.index).cache()
    queries = spark.read.parquet(args.queries)
    result = wand_topk(index, queries, k=args.k)

    if args.vectors:
        from sparkforward.index import VectorIndex
        from sparkforward.ranking import Ranking
        from sparkforward.score import interpolated_rerank

        if not args.query_vectors:
            raise SystemExit("--vectors requires --query-vectors")
        vidx = VectorIndex.load(spark, args.vectors)
        qvecs = spark.read.parquet(args.query_vectors)
        sparse = Ranking(
            result.select("q_id", "id", F.col("score").cast("float").alias("score"))
        )
        result = interpolated_rerank(
            sparse, vidx, alpha=args.alpha, query_vectors=qvecs, k=args.k
        ).df

    result.write.mode("overwrite").parquet(args.output)
    print(f"wrote {args.output}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
