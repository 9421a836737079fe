"""Distributed PCA: numpy-oracle parity, layout invariance, transform
correctness, sign determinism, save/load."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from temporal_knowledge_graphs_ray.stages.pca import (
    PcaModel,
    fit_pca,
    pca_transform,
)


def _synth(n=400, d=12, seed=7):
    rng = np.random.default_rng(seed)
    # distinct, well-separated variances so eigenvectors are unique
    scales = np.linspace(10.0, 0.5, d)
    base = rng.standard_normal((n, d)) * scales
    # rotate so components aren't axis-aligned
    q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    x = base @ q.T + rng.uniform(-3, 3, d)
    return x


def _numpy_pca(x, k):
    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[order]


@pytest.fixture()
def emb_ds(ray_session):
    x = _synth()
    df = pd.DataFrame({
        "vec_id": [f"v{i:04d}" for i in range(len(x))],
        "embedding": [row.tolist() for row in x],
    })
    return rd.from_pandas(df), x


def test_fit_matches_numpy_oracle(emb_ds, ray_session):
    ds, x = emb_ds
    model = fit_pca(ds, k=5)
    mean, comps, evals = _numpy_pca(x, 5)
    assert model.n == len(x)
    np.testing.assert_allclose(model.mean, mean, atol=1e-9)
    np.testing.assert_allclose(model.explained_variance, evals,
                               rtol=1e-9)
    np.testing.assert_allclose(model.components, comps, atol=1e-8)


def test_layout_invariance(emb_ds, ray_session):
    ds, _ = emb_ds
    m1 = fit_pca(ds, k=4)
    m2 = fit_pca(ds.repartition(13), k=4)
    np.testing.assert_allclose(m1.components, m2.components, atol=1e-9)
    np.testing.assert_allclose(m1.mean, m2.mean, atol=1e-12)


def test_combine_pass_bounds_driver_rows(emb_ds, ray_session):
    ds, x = emb_ds
    # tiny combine batches still give the exact same model
    m1 = fit_pca(ds.repartition(19), k=3, combine_batch=2)
    mean, comps, _ = _numpy_pca(x, 3)
    np.testing.assert_allclose(m1.components, comps, atol=1e-8)


def test_transform_matches_numpy(emb_ds, ray_session):
    ds, x = emb_ds
    model = fit_pca(ds, k=5)
    out = pca_transform(ds, model).to_pandas()
    out = out.sort_values("vec_id", ignore_index=True)
    proj = (x - model.mean) @ model.components.T
    got = np.stack([np.asarray(v) for v in out["pca"]])
    np.testing.assert_allclose(got, proj, atol=1e-9)
    # variance along first projected axis == first eigenvalue
    np.testing.assert_allclose(proj[:, 0].var(ddof=1),
                               model.explained_variance[0], rtol=1e-9)


def test_variance_ordering_and_k_clamp(emb_ds, ray_session):
    ds, _ = emb_ds
    model = fit_pca(ds, k=100)  # clamped to d=12
    assert model.components.shape == (12, 12)
    ev = model.explained_variance
    assert all(ev[i] >= ev[i + 1] - 1e-12 for i in range(len(ev) - 1))


def test_too_few_rows_raises(ray_session):
    ds = rd.from_pandas(pd.DataFrame(
        {"vec_id": ["a"], "embedding": [[1.0, 2.0]]}))
    with pytest.raises(ValueError):
        fit_pca(ds, k=1)


def test_save_load_roundtrip(emb_ds, tmp_path, ray_session):
    ds, _ = emb_ds
    model = fit_pca(ds, k=3)
    p = str(tmp_path / "pca.npz")
    model.save(p)
    loaded = PcaModel.load(p)
    np.testing.assert_array_equal(loaded.components, model.components)
    np.testing.assert_array_equal(loaded.mean, model.mean)
    assert loaded.n == model.n
