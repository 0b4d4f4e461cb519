"""Product quantization: fit / encode / decode (+ OPQ rotation).

Re-implements the semantics of the reference's quantizer layer
(``quantizer/base.py``, ``quantizer/nanopq.py`` — which wraps the nanopq
library) with a self-contained NumPy k-means, distributed Spark-first:

* **fit** runs on the driver over a bounded training sample — exactly the
  reference's approach (it fits on the first ``quantizer_fit_batches``
  buffered batches, ``util/indexer.py:106-121``); codebooks are tiny
  (M x Ks x dsub floats) and are **broadcast** into the encode/decode UDFs.
* **encode/decode** are Arrow-batched pandas UDF kernels (argmin over
  codeword distances / codebook gather) — float32 in, uint8 codes out,
  ~dim/M compression of index storage *and* shuffle bytes.
* Lifecycle guards mirror ``quantizer/base.py:46-76`` + ``index/base.py:
  103-118``: fit before use, no refit after attach, attach only to an empty
  index.
* serialize/deserialize keeps the reference's (meta, attributes, data)
  shape (``quantizer/base.py:147-196``) as a JSON-able dict.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _kmeans(
    X: np.ndarray, k: int, seed: int, n_iter: int = 25
) -> np.ndarray:
    """Deterministic Lloyd k-means -> (k, d) centroids (float32)."""
    rng = np.random.default_rng(seed)
    n = X.shape[0]
    if n < k:
        raise ValueError(f"Need >= {k} training vectors, got {n}.")
    X64 = np.asarray(X, dtype=np.float64)
    centroids = X64[rng.choice(n, size=k, replace=False)]
    for _ in range(n_iter):
        # argmin_c ||x-c||^2 == argmin_c (||c||^2 - 2 x.c) — the ||x||^2
        # term is constant per row; the expansion runs as one BLAS matmul,
        # which keeps k ~ 2^10+ codebooks (large-IVF fits) tractable where
        # the (n, k, d) broadcast difference would allocate gigabytes
        assign = ((centroids**2).sum(axis=1) - 2.0 * (X64 @ centroids.T)).argmin(axis=1)
        for j in range(k):
            sel = X64[assign == j]
            if len(sel):
                centroids[j] = sel.mean(axis=0)
    return centroids.astype(np.float32)


class ProductQuantizer:
    """PQ with M subspaces x Ks codewords (ref quantizer/nanopq.py:29-44)."""

    def __init__(self, M: int = 8, Ks: int = 256, seed: int = 42) -> None:
        if Ks > 256:
            raise ValueError("Ks must fit in uint8 (<= 256).")
        self.M = M
        self.Ks = Ks
        self.seed = seed
        self.codebooks: np.ndarray | None = None  # (M, Ks, dsub)
        self._attached = False

    # ----------------------------- lifecycle ---------------------------- #
    @property
    def fitted(self) -> bool:
        return self.codebooks is not None

    def set_attached(self) -> None:
        """Called when attached to an index: freezes the quantizer
        (ref quantizer/base.py:72-76)."""
        if not self.fitted:
            raise RuntimeError("Quantizer must be fit before it is attached.")
        self._attached = True

    def fit(self, X: np.ndarray) -> "ProductQuantizer":
        if self._attached:
            raise RuntimeError("Quantizer is attached to an index — refit not allowed.")
        X = np.asarray(X, dtype=np.float32)
        dim = X.shape[1]
        if dim % self.M != 0:
            raise ValueError(f"dim {dim} not divisible by M={self.M}.")
        dsub = dim // self.M
        ks = min(self.Ks, X.shape[0])
        books = np.zeros((self.M, self.Ks, dsub), dtype=np.float32)
        for m in range(self.M):
            sub = X[:, m * dsub : (m + 1) * dsub]
            books[m, :ks] = _kmeans(sub, ks, seed=self.seed + m)
            if ks < self.Ks:  # pad unused codewords with the last centroid
                books[m, ks:] = books[m, ks - 1]
        self.codebooks = books
        return self

    @property
    def dims(self) -> tuple[int, int]:
        """(input dim, code dim) — ref quantizer/base.py property."""
        assert self.codebooks is not None
        return self.codebooks.shape[0] * self.codebooks.shape[2], self.M

    # ------------------------------ kernels ----------------------------- #
    def encode(self, X: np.ndarray) -> np.ndarray:
        """(n, dim) float32 -> (n, M) uint8 codes.

        Distances are computed as a strict sequential left fold of squared
        differences in float64, rounded to 6 decimals before the argmin
        (ties -> lowest code). That exact recipe is expressible in ANSI SQL
        (`list_dot_product(diff, diff)` over literal codewords folds in the
        same order), so code assignments are bit-reproducible by the DuckDB
        oracle — the determinism contract every scored operator follows.
        The BLAS expansion ||x||^2 - 2xC^T + ||c||^2 is faster but its
        reassociated summation can flip an argmin at a rounding boundary.
        """
        if not self.fitted:
            raise RuntimeError("Quantizer has not been fit.")
        X = np.asarray(X, dtype=np.float32)
        n = X.shape[0]
        M, Ks, dsub = self.codebooks.shape
        codes = np.empty((n, M), dtype=np.uint8)
        for m in range(M):
            sub = X[:, m * dsub : (m + 1) * dsub].astype(np.float64)
            C = self.codebooks[m].astype(np.float64)  # (Ks, dsub)
            d2 = np.zeros((n, Ks), dtype=np.float64)
            for j in range(dsub):  # sequential fold over the subspace dims
                diff = sub[:, j, None] - C[None, :, j]
                d2 += diff * diff
            codes[:, m] = np.round(d2, 6).argmin(axis=1).astype(np.uint8)
        return codes

    def decode(self, codes: np.ndarray) -> np.ndarray:
        """(n, M) uint8 -> (n, dim) float32 approximate vectors."""
        if not self.fitted:
            raise RuntimeError("Quantizer has not been fit.")
        codes = np.asarray(codes)
        M, Ks, dsub = self.codebooks.shape
        return np.concatenate(
            [self.codebooks[m][codes[:, m]] for m in range(M)], axis=1
        ).astype(np.float32)

    # ---------------------------- serialization ------------------------- #
    def serialize(self) -> dict:
        """(meta, attributes, data) triple, JSON-able (ref base.py:147-175)."""
        assert self.codebooks is not None
        return {
            "meta": {
                "module": type(self).__module__,
                "name": type(self).__name__,
            },
            "attributes": {"M": self.M, "Ks": self.Ks, "seed": self.seed},
            "data": {
                "codebooks": self.codebooks.tolist(),
                "shape": list(self.codebooks.shape),
            },
        }

    @classmethod
    def deserialize(cls, payload: dict) -> "ProductQuantizer":
        q = cls(**payload["attributes"])
        q.codebooks = np.asarray(payload["data"]["codebooks"], dtype=np.float32)
        return q


def _seq_rotate(X: np.ndarray, R: np.ndarray) -> np.ndarray:
    """``X @ R`` as a strict sequential float64 left fold over input dims,
    cast to float32 — the SQL-reproducible rotation: per output element the
    additions run in input-dim order, exactly how DuckDB's
    ``list_dot_product`` over a literal rotation column folds, so the
    oracle recomputes every rotated coordinate bit-identically (a BLAS
    sgemm's reassociated/float32 accumulation would diverge by ulps and
    flip ``round(d2, 6)`` argmins at boundaries — the trap class that hid
    three real bugs before the PQ entry pinned this recipe)."""
    X64 = np.asarray(X, dtype=np.float64)
    R64 = np.asarray(R, dtype=np.float64)
    acc = np.zeros((X64.shape[0], R64.shape[1]), dtype=np.float64)
    for i in range(R64.shape[0]):
        acc += X64[:, i, None] * R64[None, i, :]
    return acc.astype(np.float32)


class OPQ(ProductQuantizer):
    """Optimized PQ: learn a rotation R, then PQ in the rotated space
    (ref quantizer/nanopq.py:77-149). Alternating minimization: fit PQ,
    update R from the SVD of X^T X_rec, repeat. Serving-path rotations go
    through :func:`_seq_rotate` (deterministic, oracle-reproducible); the
    fit loop's internal rotations stay BLAS (only the fitted (codebooks,
    R) pair matters downstream)."""

    def __init__(self, M: int = 8, Ks: int = 256, seed: int = 42, rotation_iters: int = 5):
        super().__init__(M=M, Ks=Ks, seed=seed)
        self.rotation_iters = rotation_iters
        self.R: np.ndarray | None = None

    def fit(self, X: np.ndarray) -> "OPQ":
        if self._attached:
            raise RuntimeError("Quantizer is attached to an index — refit not allowed.")
        X = np.asarray(X, dtype=np.float32)
        dim = X.shape[1]
        R = np.eye(dim, dtype=np.float32)
        for _ in range(self.rotation_iters):
            Xr = X @ R
            super().fit(Xr)
            # reconstruct in the rotated space (bypass OPQ's own de-rotation)
            rec = ProductQuantizer.decode(self, ProductQuantizer.encode(self, Xr))
            U, _, Vt = np.linalg.svd(X.T @ rec)
            R = (U @ Vt).astype(np.float32)
        self.R = R
        super().fit(X @ R)
        return self

    def encode(self, X: np.ndarray) -> np.ndarray:
        if self.R is None:
            raise RuntimeError("Quantizer has not been fit.")
        return super().encode(_seq_rotate(np.asarray(X, dtype=np.float32), self.R))

    def decode(self, codes: np.ndarray) -> np.ndarray:
        out = super().decode(codes)
        if self.R is not None:
            out = _seq_rotate(out, self.R.T)
        return out.astype(np.float32)

    def serialize(self) -> dict:
        payload = super().serialize()
        payload["attributes"]["rotation_iters"] = self.rotation_iters
        payload["data"]["R"] = self.R.tolist() if self.R is not None else None
        return payload

    @classmethod
    def deserialize(cls, payload: dict) -> "OPQ":
        q = cls(**payload["attributes"])
        q.codebooks = np.asarray(payload["data"]["codebooks"], dtype=np.float32)
        if payload["data"].get("R") is not None:
            q.R = np.asarray(payload["data"]["R"], dtype=np.float32)
        return q


def deserialize_quantizer(payload: dict) -> ProductQuantizer:
    """Dynamic re-import dispatch on the (meta) module/class names —
    the reference's Quantizer.deserialize shape (quantizer/base.py:177-196)."""
    import importlib

    mod = importlib.import_module(payload["meta"]["module"])
    cls = getattr(mod, payload["meta"]["name"])
    return cls.deserialize(payload)


def fit_from_dataframe(
    df: DataFrame, quantizer: ProductQuantizer, vec_col: str = "vector",
    sample_size: int = 4096, seed: int = 42,
) -> ProductQuantizer:
    """Fit on a bounded sample collected to the driver — the distributed
    analogue of the reference's buffer-first-batches strategy
    (util/indexer.py:106-121)."""
    n = df.count()
    frac = min(1.0, (sample_size * 1.2) / max(n, 1))
    sample = df.select(vec_col).sample(fraction=frac, seed=seed).limit(sample_size)
    X = np.array([r[vec_col] for r in sample.collect()], dtype=np.float32)
    return quantizer.fit(X)


def encode_column(
    df: DataFrame, quantizer: ProductQuantizer, vec_col: str = "vector"
) -> DataFrame:
    """array<float> -> array<tinyint> PQ codes (Arrow-batched kernel).

    The fitted quantizer (codebooks + any rotation — a few MB at most) rides
    in the task closure, i.e. is shipped once per executor like a broadcast.
    """
    q = quantizer

    @F.pandas_udf(T.ArrayType(T.ShortType()))
    def pq_encode(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            X = np.stack(s.apply(lambda v: np.asarray(v, dtype=np.float32)))
            yield pd.Series(list(q.encode(X).astype(np.int16)))

    return df.withColumn(vec_col, pq_encode(F.col(vec_col)))


def decode_column(
    df: DataFrame, quantizer: ProductQuantizer, vec_col: str = "vector"
) -> DataFrame:
    """PQ codes -> approximate array<float> vectors (Arrow-batched kernel)."""
    q = quantizer

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def pq_decode(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            codes = np.stack(s.apply(lambda v: np.asarray(v, dtype=np.int16)))
            yield pd.Series(list(q.decode(codes.astype(np.uint8))))

    return df.withColumn(vec_col, pq_decode(F.col(vec_col)))
