"""Encoder protocol: text -> dense vector, as Arrow-batched UDFs.

The reference's ``Encoder`` ABC (``encoder/base.py:10-23``) is its UDF
surface; tests there use ``LambdaEncoder`` with trivial functions
(``tests/test_index.py:43``). Heavy Transformer encoders
(``encoder/transformer.py``) are an explicit plugin point here — torch is
out of scope for the engine core — so we ship:

* :class:`LambdaEncoder` — wrap any ``str -> np.ndarray`` function
  (ref ``encoder/__init__.py:32-44``),
* :class:`HashEncoder` — a *deterministic* stand-in encoder that is stable
  across processes and partitionings (blake2b-seeded Gaussian), used by
  tests and benchmarks instead of the reference's golden torch embeddings.

``encode_df`` applies any encoder distributed via ``mapInPandas`` (Arrow
batches — never per-row Python), mirroring the reference's batched
``encode_queries`` (``index/base.py:58-72``).
"""

from __future__ import annotations

import abc
import hashlib
from collections.abc import Callable, Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class Encoder(abc.ABC):
    """Batch text encoder. Ref: encoder/base.py:10-23."""

    @abc.abstractmethod
    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        """Encode a batch of texts into a (len(texts), dim) float32 array."""

    @property
    @abc.abstractmethod
    def dim(self) -> int: ...


class LambdaEncoder(Encoder):
    """Wrap a per-text function. Ref: encoder/__init__.py:32-44."""

    def __init__(self, f: Callable[[str], np.ndarray]) -> None:
        self._f = f
        self._dim: int | None = None

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        out = np.array([self._f(t) for t in texts], dtype=np.float32)
        self._dim = out.shape[1] if out.ndim == 2 else None
        return out

    @property
    def dim(self) -> int:
        if self._dim is None:
            self._dim = int(np.asarray(self._f("probe")).shape[0])
        return self._dim


def _text_seed(text: str) -> int:
    """64-bit process-stable seed for a text (NOT Python's randomized hash)."""
    return int.from_bytes(hashlib.blake2b(text.encode("utf-8"), digest_size=8).digest(), "big")


class HashEncoder(Encoder):
    """Deterministic pseudo-embedding: blake2b(text)-seeded unit Gaussian.

    Stable across processes/partitions — the distributed analogue of the
    reference tests' ``LambdaEncoder`` fixture (tests/test_index.py:43).
    """

    def __init__(self, dim: int = 64, seed: int = 42, normalize: bool = True) -> None:
        self._dim = dim
        self._seed = seed
        self._normalize = normalize

    @property
    def dim(self) -> int:
        return self._dim

    def encode_one(self, text: str) -> np.ndarray:
        rng = np.random.default_rng((self._seed << 64) | _text_seed(text))
        v = rng.standard_normal(self._dim).astype(np.float32)
        if self._normalize:
            v /= np.linalg.norm(v)
        return v

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        return np.stack([self.encode_one(t) for t in texts])


def encode_df(
    df: DataFrame,
    encoder: Encoder | None = None,
    text_col: str = "query",
    out_col: str = "vector",
    batch_size: int = 256,
    encoder_factory: Callable[[], Encoder] | None = None,
) -> DataFrame:
    """Distributed encoding via mapInPandas (Arrow-batched).

    Two ways to supply the encoder:

    * ``encoder`` — a ready object pickled into the task closure; right for
      cheap encoders (Lambda/Hash) whose state ships in a few bytes.
    * ``encoder_factory`` — a zero-arg callable invoked ONCE per task,
      inside the batch iterator, before the first batch. This is the hook a
      heavy model encoder needs (ref encoder/transformer.py:18-90 loads a
      torch checkpoint): the model is constructed on the WORKER, exactly
      once per task, and amortized across every Arrow batch the task
      processes — never per 256-row slice, never on the driver.
      (tests pin one init per task via an accumulator-counting factory.)
    """
    if (encoder is None) == (encoder_factory is None):
        raise ValueError("Provide exactly one of encoder / encoder_factory.")
    schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
    )

    def encode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        enc = encoder_factory() if encoder_factory is not None else encoder
        for pdf in it:
            for lo in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[lo : lo + batch_size].copy()
                vecs = enc(chunk[text_col].tolist())
                chunk[out_col] = list(np.asarray(vecs, dtype=np.float32))
                yield chunk

    return df.mapInPandas(encode_batches, schema=schema)


def encode_queries_local(
    queries: Sequence[tuple[str, str]], encoder: Encoder
) -> list[tuple[str, list[float]]]:
    """Driver-side encoding for small query sets (the serving hot path)."""
    vecs = encoder([q for _, q in queries])
    return [(q_id, [float(x) for x in vec]) for (q_id, _), vec in zip(queries, vecs)]
