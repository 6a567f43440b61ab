"""Text → embedding plumbing for training-data pipelines.

The model call is pluggable (``register_embedder``) — real sentence
encoders aren't in this container, so the default is a deterministic
feature-hashing embedder (hashing trick: each token's md5 picks a bucket
and sign, L2-normalized).  That default is not a stub: feature-hashed
bag-of-words IS a legitimate cheap embedding, deterministic across runs
and engines.  The Spark-side shape — Arrow batches, ``array<float>``
output, partition parallelism, no driver collects — is exactly what a
real encoder UDF uses.
"""

from __future__ import annotations

import hashlib
import math
from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_EMBEDDERS: dict[str, Callable] = {}


def register_embedder(name: str, fn: Callable) -> None:
    """Install a real encoder: ``fn(texts: list[str]) -> list[list[float]]``
    (batch-at-a-time, so model weights load once per worker)."""
    _EMBEDDERS[name] = fn


def _hashing_embedder(dim: int):
    def embed_batch(texts):
        out = []
        for t in texts:
            vec = [0.0] * dim
            if t:
                for tok in t.lower().split():
                    h = int.from_bytes(
                        hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")
                    vec[h % dim] += 1.0 if (h >> 63) & 1 else -1.0
            n = math.sqrt(sum(x * x for x in vec))
            out.append([x / n for x in vec] if n > 0 else vec)
        return out

    return embed_batch


def embed_text(df: DataFrame, text_col: str = "text",
               out_col: str = "embedding", dim: int = 64,
               embedder: Optional[str] = None,
               batch_size: int = 1024) -> DataFrame:
    """Append an ``array<float>`` embedding column via mapInPandas — one
    Python worker pass, Arrow transfer, embedder invoked batch-at-a-time."""
    fn = _EMBEDDERS[embedder] if embedder else _hashing_embedder(dim)
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.FloatType()))])

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start:start + batch_size].copy()
                chunk[out_col] = fn(chunk[text_col].tolist())
                yield chunk

    return df.mapInPandas(process, out_schema)
