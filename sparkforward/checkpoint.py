"""Per-partition build checkpoints: lineage + metrics manifests, resume.

The north rule requires builds "resumable from per-partition checkpoints
carrying lineage and metrics". The reference has no equivalent (its HDF5
append is single-process); our unit of recovery is the **term-hash bucket**:
each bucket is written as its own parquet partition directory, and a
manifest JSON per bucket records lineage (input snapshot, build config) and
metrics (rows, bytes, wall-clock). ``completed_partitions`` feeds the
builder's skip-filter on restart — equivalent to Iceberg snapshot +
partition-level commit tracking, expressed on plain Parquet.
"""

from __future__ import annotations

import glob
import json
import os
import time
from collections.abc import Callable


def _manifest_dir(index_path: str) -> str:
    return os.path.join(index_path, "_manifests")


def completed_partitions(index_path: str) -> frozenset[int]:
    """Bucket ids with a committed manifest (these are skipped on resume)."""
    out = set()
    for f in glob.glob(os.path.join(_manifest_dir(index_path), "bucket-*.json")):
        try:
            with open(f) as fh:
                m = json.load(fh)
            if m.get("status") == "committed":
                out.add(int(m["bucket"]))
        except (json.JSONDecodeError, KeyError, ValueError):
            continue  # torn write -> treat as incomplete, rebuild
    return frozenset(out)


def committed_lineage(index_path: str) -> dict | None:
    """Lineage dict of any committed manifest (they share build config).

    Resume reads the ORIGINAL build's configuration from here — bucket ids
    are ``pmod(xxhash64(term), n_buckets)``, so a resumed build must keep
    the original modulus for the completed-bucket skip to mean anything.
    """
    for f in glob.glob(os.path.join(_manifest_dir(index_path), "bucket-*.json")):
        try:
            with open(f) as fh:
                m = json.load(fh)
            if m.get("status") == "committed":
                return m.get("lineage", {})
        except (json.JSONDecodeError, KeyError, ValueError):
            continue
    return None


def partition_metrics(index_path: str, bucket: int) -> dict:
    """Rows/bytes/files for a bucket's parquet partition directory."""
    part_dir = os.path.join(index_path, "postings", f"bucket={bucket}")
    files = glob.glob(os.path.join(part_dir, "*.parquet"))
    return {
        "files": len(files),
        "bytes": sum(os.path.getsize(f) for f in files),
    }


def manifest_writer(index_path: str) -> Callable[[list[int]], None]:
    """Returns a committer: writes one manifest per completed bucket.

    Manifests are written atomically (tmp + rename) after the bucket's data
    files exist, so a crash mid-build leaves the bucket uncommitted and it
    is rebuilt on resume.
    """
    t_start = time.time()

    def commit(buckets: list[int], extra: dict | None = None) -> None:
        mdir = _manifest_dir(index_path)
        os.makedirs(mdir, exist_ok=True)
        elapsed = time.time() - t_start
        for b in buckets:
            manifest = {
                "bucket": int(b),
                "status": "committed",
                "lineage": {
                    "builder": "sparkforward.postings.build_inverted_index",
                    "committed_at_unix": time.time(),
                    **(extra or {}),
                },
                "metrics": {
                    **partition_metrics(index_path, b),
                    "build_elapsed_sec": elapsed,
                },
            }
            tmp = os.path.join(mdir, f".bucket-{b}.json.tmp")
            with open(tmp, "w") as fh:
                json.dump(manifest, fh)
            os.replace(tmp, os.path.join(mdir, f"bucket-{b}.json"))

    return commit
