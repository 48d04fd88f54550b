"""Distributed PCA over an embedding column.

Dimensionality reduction is the workhorse before large-scale ANN: a
64->16 projection cuts every downstream shuffle/broadcast of vector
bytes 4x (compounding with the int8 quantizer in simsearch.py) while
keeping most neighborhood structure.  The fit is classic two-pass-free
moment accumulation:

* ``embedding_moments`` — ONE pass: every Arrow batch emits a single
  partial row packed as one array ``[n, sum(d), gram(d*d)]`` (NumPy
  ``x.T @ x`` per batch, float64).  Partials are reduced
  DISTRIBUTED — posexplode to (pos, val) and groupBy(pos).sum — so a
  100 TB corpus produces #batches tiny rows and a 1+d+d^2-group
  aggregate, never a driver-side list of partials.  Only the final
  d^2 moment vector (32 KB at d=64) reaches the driver.
* ``fit_pca`` — eigendecomposition of the d x d covariance on the
  driver (NumPy ``eigh``; d is model width, not data size).
* ``project`` — a scalar Arrow pandas UDF doing one
  ``(batch - mean) @ W.T`` matmul per batch: narrow, no shuffle, and
  the BLAS call is the whole per-row cost.

Covariance is population (/n) — the eigenvectors are scale-invariant
to that choice and /n keeps ``sum(eigenvalues) == trace`` exact.
Sign convention: each component's largest-|coeff| entry is made
positive so the fit is deterministic across LAPACK builds.

Reference parity: the reference plugin has no embedding tier; this
extends the engine's ANN stack (operators/simsearch.py IVF/LSH/int8)
per SURVEY.md's training-data-ops mandate.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def embedding_moments(embs: DataFrame, col: str = "embedding"
                      ) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, sum_vec[d], gram[d,d]) accumulated in one distributed pass."""
    d = embs.select(F.size(F.col(col)).alias("d")).first()["d"]
    width = 1 + d + d * d
    schema = T.StructType(
        [T.StructField("part", T.ArrayType(T.DoubleType()))])

    def _partials(batches):
        for pdf in batches:
            x = np.stack(pdf[col].to_numpy()).astype(np.float64)
            part = np.empty(width)
            part[0] = len(x)
            part[1:1 + d] = x.sum(axis=0)
            part[1 + d:] = (x.T @ x).ravel()
            yield pd.DataFrame({"part": [part]})

    total = (embs.select(col).mapInPandas(_partials, schema)
             .select(F.posexplode("part").alias("pos", "val"))
             .groupBy("pos").agg(F.sum("val").alias("val"))
             .orderBy("pos").collect())
    vec = np.array([r["val"] for r in total])
    assert len(vec) == width
    n = int(vec[0])
    return n, vec[1:1 + d], vec[1 + d:].reshape(d, d)


@dataclass(frozen=True)
class PCAModel:
    mean: np.ndarray          # (d,)
    components: np.ndarray    # (k, d) rows = principal axes
    explained_variance: np.ndarray  # (k,) eigenvalues, descending


def fit_pca(embs: DataFrame, k: int, col: str = "embedding") -> PCAModel:
    n, s, g = embedding_moments(embs, col)
    if n < 2:
        raise ValueError(f"need >= 2 vectors to fit PCA, got {n}")
    d = len(s)
    if not 1 <= k <= d:
        raise ValueError(f"need 1 <= k <= {d}: {k}")
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)          # ascending
    order = np.argsort(w)[::-1][:k]
    comp = v[:, order].T
    flip = np.sign(comp[np.arange(k), np.abs(comp).argmax(axis=1)])
    return PCAModel(mean=mean, components=comp * flip[:, None],
                    explained_variance=np.maximum(w[order], 0.0))


def project(embs: DataFrame, model: PCAModel, col: str = "embedding",
            out_col: str = "pca") -> DataFrame:
    """Append the k-dim projection — narrow, one BLAS matmul/batch."""
    mean, wt = model.mean, model.components.T  # (d,), (d, k)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _proj(v: pd.Series) -> pd.Series:
        x = np.stack(v.to_numpy()).astype(np.float64)
        out = (x - mean) @ wt
        return pd.Series(list(out))

    return embs.withColumn(out_col, _proj(F.col(col)))
