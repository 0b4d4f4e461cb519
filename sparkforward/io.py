"""Sources & sinks: TREC runfiles (ref ranking.py:348-409) and helpers.

Runfile format: whitespace-separated ``q_id Q0 id rank score name``.
Write path emits tab-separated CSV; read path parses any whitespace via a
JVM-side ``split`` (no per-row Python).
"""

from __future__ import annotations

import glob
import os
import shutil
from collections.abc import Mapping

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from sparkforward.ranking import Ranking, add_ranks


def write_trec_run(ranking: Ranking, target: str, single_file: bool = True) -> None:
    """Write a TREC runfile (ref ranking.py:348-366).

    ``single_file=True`` coalesces to one part and renames it to ``target``
    (runfiles are small API-edge artifacts); at scale pass False to keep a
    sharded directory.
    """
    df = add_ranks(ranking.df).select(
        "q_id",
        F.lit("Q0").alias("q0"),
        "id",
        "rank",
        F.col("score").cast("string").alias("score"),
        F.lit(str(ranking.name)).alias("name"),
    )
    if not single_file:
        df.write.mode("overwrite").option("sep", "\t").csv(target)
        return
    tmp = target + ".tmpdir"
    df.coalesce(1).write.mode("overwrite").option("sep", "\t").csv(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
    os.makedirs(os.path.dirname(os.path.abspath(target)), exist_ok=True)
    shutil.move(part, target)
    shutil.rmtree(tmp)


def read_trec_run(
    spark: SparkSession, path: str, queries: Mapping[str, str] | None = None
) -> Ranking:
    """Read a TREC runfile (ref ranking.py:388-409), whitespace-tolerant."""
    lines = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), r"\s+")
    df = lines.select(
        parts.getItem(0).alias("q_id"),
        parts.getItem(2).alias("id"),
        parts.getItem(4).cast("float").alias("score"),
        parts.getItem(5).alias("name"),
    )
    name_row = df.select("name").limit(1).collect()
    name = name_row[0]["name"] if name_row else None
    return Ranking(df.drop("name"), name=name, queries=queries)
