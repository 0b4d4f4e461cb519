"""Transformer text encoders (E3-E6): the reference's model zoo, Spark-shaped.

Ports the exact input-preparation and pooling semantics of the reference's
``encoder/transformer.py``:

* CLS pooling                      (TransformerEncoder, ref :18-92)
* TCT-ColBERT query:  "[CLS] [Q] " + q + "[MASK]"*36, mean over tokens 4:
                                   (ref :95-134, per Pyserini)
* TCT-ColBERT doc:    "[CLS] [D] " + d, attention-masked mean over tokens 4:
                                   (ref :137-189)
* TAS-B:              CLS pooling  (ref :192-209)
* Contriever:         attention-masked mean over ALL tokens (ref :212-240)
* BGE:                CLS pooling + L2 normalize (ref :243-261)

The model forward pass is behind a pluggable **backend** — a callable
``backend(prepared_texts, tokenizer_call_args) -> (last_hidden_state
[B,T,H], attention_mask [B,T])`` returning NumPy arrays. The default
backend lazily loads HuggingFace ``transformers`` + ``torch`` (absent from
this container: constructing without an injected backend raises a clear
ImportError). All pooling math is pure NumPy and unit-tested against the
reference formulas with a fake backend, so everything EXCEPT the forward
pass is exercised here.

Distributed use: pass a factory to ``encoders.encode_df`` so the checkpoint
loads once per task and amortizes across Arrow batches (ref
``index/base.py:58-72``)::

    encode_df(df, encoder_factory=lambda: TCTColBERTDocumentEncoder())
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence
from typing import Any

import numpy as np

from sparkforward.encoders import Encoder

#: backend contract: (prepared_texts, tokenizer_call_args)
#: -> (last_hidden_state float[B,T,H], attention_mask int[B,T])
Backend = Callable[[Sequence[str], Mapping[str, Any]], tuple[np.ndarray, np.ndarray]]


def _hf_backend(
    model: str,
    device: str = "cpu",
    model_args: Mapping[str, Any] | None = None,
    tokenizer_args: Mapping[str, Any] | None = None,
) -> Backend:
    """Default backend: HuggingFace AutoModel/AutoTokenizer (lazy import)."""
    try:
        import torch
        from transformers import AutoModel, AutoTokenizer
    except ImportError as e:  # pragma: no cover — torch absent here
        raise ImportError(
            "TransformerEncoder's default backend needs `torch` and "
            "`transformers` (not shipped in this environment). Either install "
            "them or inject a custom `backend=` callable."
        ) from e

    m = AutoModel.from_pretrained(model, **(model_args or {}))
    m.to(device)
    m.eval()
    tok = AutoTokenizer.from_pretrained(model, **(tokenizer_args or {}))

    def backend(texts: Sequence[str], call_args: Mapping[str, Any]):
        inputs = tok(list(texts), return_tensors="pt", **call_args).to(device)
        with torch.no_grad():
            out = m(**inputs)
        return (
            out.last_hidden_state.cpu().numpy(),
            inputs["attention_mask"].cpu().numpy(),
        )

    return backend


class TransformerEncoder(Encoder):
    """CLS pooling over the last hidden state (ref transformer.py:18-92)."""

    #: tokenizer call args (subclasses override; ref :31-33)
    tokenizer_call_args: Mapping[str, Any] = {"padding": True, "truncation": True}

    def __init__(
        self,
        model: str = "",
        device: str = "cpu",
        model_args: Mapping[str, Any] | None = None,
        tokenizer_args: Mapping[str, Any] | None = None,
        normalize: bool = False,
        backend: Backend | None = None,
    ) -> None:
        self._backend = backend or _hf_backend(model, device, model_args, tokenizer_args)
        self._normalize = normalize
        self._dim: int | None = None

    # ------------------------- reference hook points ------------------- #
    def _get_tokenizer_inputs(self, texts: Sequence[str]) -> list[str]:
        """Prepare texts (ref :54-60); subclasses add model-specific markup."""
        return list(texts)

    def _aggregate(self, last_hidden: np.ndarray, attention_mask: np.ndarray) -> np.ndarray:
        """CLS token of the last hidden state (ref :62-77)."""
        return last_hidden[:, 0]

    # ------------------------------- API -------------------------------- #
    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        last_hidden, mask = self._backend(
            self._get_tokenizer_inputs(texts), self.tokenizer_call_args
        )
        out = np.asarray(self._aggregate(np.asarray(last_hidden, dtype=np.float64),
                                         np.asarray(mask)))
        if self._normalize:  # ref :89-90
            out = out / np.clip(
                np.linalg.norm(out, axis=1, keepdims=True), 1e-12, None
            )
        out = out.astype(np.float32)
        self._dim = out.shape[1]
        return out

    @property
    def dim(self) -> int:
        if self._dim is None:
            self._dim = int(self(["probe"]).shape[1])
        return self._dim


class TCTColBERTQueryEncoder(TransformerEncoder):
    """TCT-ColBERT query encoder (ref transformer.py:95-134)."""

    def __init__(self, model: str = "castorini/tct_colbert-msmarco",
                 max_length: int = 36, **kw: Any) -> None:
        self._max_length = max_length
        self.tokenizer_call_args = {
            "max_length": max_length,
            "truncation": True,
            "add_special_tokens": False,
        }
        super().__init__(model, **kw)

    def _get_tokenizer_inputs(self, texts: Sequence[str]) -> list[str]:
        # ref :125-126 — explicit CLS/[Q] markers + mask-token padding
        return ["[CLS] [Q] " + q + "[MASK]" * self._max_length for q in texts]

    def _aggregate(self, last_hidden: np.ndarray, attention_mask: np.ndarray) -> np.ndarray:
        # ref :128-134 — unmasked mean over tokens 4: (skip CLS,[,Q,])
        return last_hidden[:, 4:, :].mean(axis=1)


class TCTColBERTDocumentEncoder(TransformerEncoder):
    """TCT-ColBERT document encoder (ref transformer.py:137-189)."""

    def __init__(self, model: str = "castorini/tct_colbert-msmarco",
                 max_length: int = 512, **kw: Any) -> None:
        self._max_length = max_length
        self.tokenizer_call_args = {
            "max_length": max_length,
            "padding": True,
            "truncation": True,
            "add_special_tokens": False,
        }
        super().__init__(model, **kw)

    def _get_tokenizer_inputs(self, texts: Sequence[str]) -> list[str]:
        return ["[CLS] [D] " + d for d in texts]  # ref :170-171

    def _aggregate(self, last_hidden: np.ndarray, attention_mask: np.ndarray) -> np.ndarray:
        # ref :173-189 — attention-masked mean over tokens 4:
        tok = last_hidden[:, 4:, :]
        mask = attention_mask[:, 4:, None].astype(np.float64)
        return (tok * mask).sum(axis=1) / np.clip(mask.sum(axis=1), 1e-9, None)


class TASBEncoder(TransformerEncoder):
    """TAS-B: CLS pooling, default args (ref transformer.py:192-209)."""

    def __init__(self, model: str = "sebastian-hofstaetter/distilbert-dot-tas_b-b256-msmarco",
                 **kw: Any) -> None:
        super().__init__(model, **kw)


class ContrieverEncoder(TransformerEncoder):
    """Contriever: masked mean over ALL tokens (ref transformer.py:212-240)."""

    def __init__(self, model: str = "facebook/contriever", **kw: Any) -> None:
        super().__init__(model, **kw)

    def _aggregate(self, last_hidden: np.ndarray, attention_mask: np.ndarray) -> np.ndarray:
        mask = attention_mask[:, :, None].astype(bool)
        tok = np.where(mask, last_hidden, 0.0)  # masked_fill (ref :233-235)
        return tok.sum(axis=1) / attention_mask.sum(axis=1)[:, None]


class BGEEncoder(TransformerEncoder):
    """BGE: CLS pooling + L2 normalization (ref transformer.py:243-261)."""

    def __init__(self, model: str = "BAAI/bge-base-en-v1.5", **kw: Any) -> None:
        kw.setdefault("normalize", True)
        super().__init__(model, **kw)
