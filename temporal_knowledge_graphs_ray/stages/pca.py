"""Distributed PCA over an embedding column (scale addition — the
dimension-reduction / whitening step of an embedding pipeline, e.g.
before clustering or ANN indexing; the reference has no linear-algebra
surface, its embeddings go straight to cosine similarity).

The fit is the textbook moment-accumulation recipe: ONE streaming pass
computes per-block partials ``(n, sum x, sum x x^T)``; a combine pass
collapses partial rows batchwise so the driver reduce is bounded at
ceil(blocks / combine_batch) rows regardless of corpus size (at 100 TB
with d=64 a partial row is ~33 KB — the corpus itself never moves and
is never shuffled). The driver assembles the d x d sample covariance
(d is the embedding width, tiny), runs a dense symmetric
eigendecomposition, and fixes each component's sign so the
largest-|entry| coordinate is positive — making the model a pure
function of the data up to floating-point summation order (tested
against a single-machine numpy oracle and across partition layouts in
tests/test_pca.py).

Transform is a pure streaming matmul: the (k x d) component matrix
ships once via ``ray.put`` and every batch projects zero-copy.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from .similarity import _to_matrix


@dataclass
class PcaModel:
    mean: np.ndarray               # (d,)
    components: np.ndarray         # (k, d) rows = principal axes
    explained_variance: np.ndarray  # (k,) eigenvalues, descending
    n: int

    def save(self, path: str) -> None:
        np.savez(path, mean=self.mean, components=self.components,
                 explained_variance=self.explained_variance,
                 n=np.int64(self.n))

    @classmethod
    def load(cls, path: str) -> "PcaModel":
        z = np.load(path)
        return cls(mean=z["mean"], components=z["components"],
                   explained_variance=z["explained_variance"],
                   n=int(z["n"]))


def _moment_partials(emb_col: str):
    def partial(t: pa.Table) -> pa.Table:
        m = _to_matrix(t[emb_col])
        if m.size == 0:
            d = 0
            s = np.zeros(0)
            ss = np.zeros(0)
        else:
            d = m.shape[1]
            s = m.sum(axis=0)
            ss = (m.T @ m).reshape(-1)
        return pa.table({
            "n": pa.array([m.shape[0]], pa.int64()),
            "d": pa.array([d], pa.int64()),
            "s": pa.array([s.tolist()], pa.list_(pa.float64())),
            "ss": pa.array([ss.tolist()], pa.list_(pa.float64())),
        })

    return partial


def _combine_partials(t: pa.Table) -> pa.Table:
    """Merge many (n, s, ss) partial rows into one (pure elementwise
    sums) — the tree-reduce level that bounds driver state."""
    n = t["n"].to_numpy().sum()
    ds_ = t["d"].to_numpy()
    d = int(ds_.max()) if len(ds_) else 0
    s = np.zeros(d)
    ss = np.zeros(d * d)
    for row_s, row_ss in zip(t["s"].to_pylist(), t["ss"].to_pylist()):
        if row_s:
            s += np.asarray(row_s)
            ss += np.asarray(row_ss)
    return pa.table({
        "n": pa.array([int(n)], pa.int64()),
        "d": pa.array([d], pa.int64()),
        "s": pa.array([s.tolist()], pa.list_(pa.float64())),
        "ss": pa.array([ss.tolist()], pa.list_(pa.float64())),
    })


def fit_pca(ds, k: int | None = None, emb_col: str = "embedding",
            combine_batch: int = 1024) -> PcaModel:
    """Fit PCA on ``ds[emb_col]`` (list<float>, uniform width).

    Sample covariance (n-1 denominator, matching ``np.cov``);
    eigenvalues descending; deterministic component signs.
    """
    partials = (ds.select_columns([emb_col])
                .map_batches(_moment_partials(emb_col),
                             batch_format="pyarrow")
                .map_batches(_combine_partials,
                             batch_format="pyarrow",
                             batch_size=combine_batch))
    pdf = partials.to_pandas()
    n = int(pdf["n"].sum())
    if n < 2:
        raise ValueError(f"fit_pca needs >= 2 rows, got {n}")
    d = int(pdf["d"].max())
    s = np.zeros(d)
    ss = np.zeros(d * d)
    for row_s, row_ss in zip(pdf["s"], pdf["ss"]):
        if len(row_s):
            s += np.asarray(row_s, dtype=np.float64)
            ss += np.asarray(row_ss, dtype=np.float64)
    mean = s / n
    cov = (ss.reshape(d, d) - n * np.outer(mean, mean)) / (n - 1)
    # numerical symmetry guard before eigh
    cov = (cov + cov.T) / 2.0
    evals, evecs = np.linalg.eigh(cov)   # ascending
    order = np.argsort(evals)[::-1]
    k_eff = d if k is None else min(k, d)
    order = order[:k_eff]
    comps = evecs[:, order].T            # (k, d)
    # deterministic sign: largest-|entry| coordinate positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PcaModel(mean=mean, components=comps,
                    explained_variance=np.maximum(evals[order], 0.0),
                    n=n)


def pca_transform(ds, model: PcaModel, emb_col: str = "embedding",
                  id_col: str = "vec_id", out_col: str = "pca"):
    """Project every row onto the model's components: one streaming
    map, components broadcast once. Output (id_col, out_col)."""
    import ray

    ref = ray.put((model.mean.copy(), model.components.copy()))

    def project(t: pa.Table, _ref=ref) -> pa.Table:
        import ray as _ray

        mean, comps = _ray.get(_ref)
        m = _to_matrix(t[emb_col])
        proj = (m - mean) @ comps.T if m.size else np.zeros(
            (0, comps.shape[0]))
        return pa.table({
            id_col: t[id_col],
            out_col: pa.array(proj.tolist(), pa.list_(pa.float64())),
        })

    return ds.select_columns([id_col, emb_col]).map_batches(
        project, batch_format="pyarrow")
