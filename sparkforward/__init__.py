"""sparkforward — a PySpark-native interpolation-based ranking engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of ``fast-forward-indexes`` (reference: /root/reference, studied
for behavior only):

* Ranking algebra (interpolate / cut / normalize / rr_scores / fusion)
  as lazy DataFrame transforms — ``sparkforward.ranking``.
* A native inverted-index build + BM25 query engine (the stage the reference
  delegates to PyTerrier) — ``sparkforward.tokenize`` / ``postings`` /
  ``bm25``.
* Dense forward-index ("Fast-Forward") scoring with MAXP/AVEP/FIRSTP/PASSAGE
  modes and early stopping — ``sparkforward.index`` / ``score``.
* Product quantization, sequential coalescing, dedup, similarity search and
  text-analysis utilities for large-scale corpus pipelines.

Everything is expressed against the public PySpark DataFrame API; custom
kernels are Arrow-batched pandas UDFs (never per-row Python).
"""

from sparkforward.ranking import Ranking
from sparkforward.index import Mode, VectorIndex

__all__ = ["Ranking", "Mode", "VectorIndex"]
__version__ = "0.1.0"
