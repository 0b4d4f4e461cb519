"""Iceberg table integration — the north rule's canonical storage layer.

The engine's on-disk layout (postings bucketed by term hash, per-bucket
commit manifests, term dictionary, vector side table) maps 1:1 onto Iceberg
tables; this module carries that mapping as *code*: session configuration
for a real cluster, DDL for the tables, and a write path that uses the
Iceberg DataFrame API when the runtime is present. The sandbox has no
Iceberg jars, so everything degrades explicitly — :func:`iceberg_available`
feature-detects, writers raise :class:`IcebergUnavailable` with the exact
spark-submit incantation, and the plain-Parquet layout (postings.py,
checkpoint.py) remains the tested fallback whose manifests emulate
Iceberg's snapshot + partition-commit tracking.

Equivalences (what Iceberg buys over the Parquet fallback at 10^12 docs):

* ``_manifests/bucket-*.json``  ->  Iceberg snapshot + partition-level
  commit metadata (atomic REPLACE per partition, time travel for lineage).
* ``postings/bucket=N``         ->  ``PARTITIONED BY (bucket(N, term))`` —
  same row-group pruning on the In(term, ...) serve-time filter, plus
  hidden-partitioning (no manual bucket column).
* streaming partials by batch_id -> append-only Iceberg table; compaction
  becomes ``rewrite_data_files``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Maven coordinate documented for spark-submit --packages (public artifact)
ICEBERG_PACKAGE = "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0"


class IcebergUnavailable(RuntimeError):
    """Raised when an Iceberg write is requested but no runtime is loaded."""


def iceberg_session_conf(catalog: str = "sfwd", warehouse: str = "/tmp/sfwd_warehouse") -> dict[str, str]:
    """The session config that turns Iceberg on (pass to session.get_spark's
    ``extra_conf``, or translate to ``--conf`` flags for spark-submit)."""
    return {
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
        "spark.jars.packages": ICEBERG_PACKAGE,
    }


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the session classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001 — classpath probe
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:  # noqa: BLE001 — ClassNotFound via py4j
        return False


def posting_tables_ddl(catalog: str = "sfwd", db: str = "idx", term_buckets: int = 256) -> dict[str, str]:
    """DDL for the engine's tables on Iceberg — the 1:1 layout mapping.

    ``postings`` is hidden-partitioned by ``bucket(term)`` (the serve-time
    In-filter prunes partitions server-side) and sorted by (term, salt,
    block_no) within files so row-group min/max statistics stay selective —
    the same two properties the Parquet layout provides by construction.
    Block-granular rows (round 4): the serve's metadata pass reads only the
    non-blob columns (columnar projection skips blob pages), and the
    surviving-block gather pushes (term, salt, block_no) keys — on Iceberg
    that prunes at file AND page granularity via column metrics.
    """
    return {
        "postings": f"""
CREATE TABLE IF NOT EXISTS {catalog}.{db}.postings (
  term STRING, salt INT, n_shards INT, block_no INT, n BIGINT,
  first_doc BIGINT, last_doc BIGINT, max_z DOUBLE, min_z DOUBLE, n_bytes BIGINT,
  doc_blob BINARY, tf_blob BINARY, dl_blob BINARY)
USING iceberg
PARTITIONED BY (bucket({term_buckets}, term))
TBLPROPERTIES ('write.distribution-mode' = 'hash',
               'sort-order' = 'term ASC, salt ASC, block_no ASC')
""",
        "terms": f"""
CREATE TABLE IF NOT EXISTS {catalog}.{db}.terms (
  term STRING, df DOUBLE, idf DOUBLE, n_shards INT)
USING iceberg
PARTITIONED BY (bucket({term_buckets}, term))
""",
        "pages": f"""
CREATE TABLE IF NOT EXISTS {catalog}.{db}.pages (
  url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)
USING iceberg
PARTITIONED BY (days(warc_ts), bucket(1024, url))
""",
        "vectors": f"""
CREATE TABLE IF NOT EXISTS {catalog}.{db}.vectors (
  vec_idx BIGINT, doc_id STRING, psg_id STRING, vector ARRAY<FLOAT>)
USING iceberg
PARTITIONED BY (bucket(1024, doc_id))
""",
    }


def write_iceberg(df: DataFrame, table: str, mode: str = "createOrReplace") -> None:
    """Write a DataFrame to an Iceberg table (``catalog.db.table``).

    ``mode``: createOrReplace | append | overwritePartitions (the last is
    the idempotent-replay primitive streaming.py emulates with dynamic
    partition overwrite on Parquet).
    """
    if not iceberg_available(df.sparkSession):
        raise IcebergUnavailable(
            "No Iceberg runtime on the classpath. Launch with "
            f"spark-submit --packages {ICEBERG_PACKAGE} plus the configs from "
            "iceberg_session_conf(); the plain-Parquet layout (postings.py) "
            "is the tested fallback in this environment."
        )
    writer = df.writeTo(table)
    if mode == "append":
        writer.append()
    elif mode == "overwritePartitions":
        writer.overwritePartitions()
    else:
        writer.using("iceberg").createOrReplace()
