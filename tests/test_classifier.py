"""Trainable quality classifier: distributed full-batch GD must match
the sequential numpy oracle (same features, same epochs), learn a
planted quality signal, and be layout-invariant."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

DIM = 2 ** 12
SEED = 7


def _planted_corpus(n: int = 400) -> pd.DataFrame:
    """Half 'reference-quality' docs, half boilerplate spam, with
    distinctive vocabularies plus shared filler."""
    good_v = ["theorem", "analysis", "evidence", "measured", "study"]
    bad_v = ["click", "buy", "free", "winner", "casino"]
    fill = ["the", "of", "data", "page", "web", "text"]
    rows = []
    for i in range(n):
        label = i % 2
        vocab = good_v if label else bad_v
        words = [vocab[(i + j) % len(vocab)] for j in range(6)]
        words += [fill[(i * 3 + j) % len(fill)] for j in range(4)]
        # deterministic shuffle-ish interleave so bigrams vary
        words = words[i % 5:] + words[:i % 5]
        rows.append({"doc_id": i, "text": " ".join(words),
                     "label": label})
    return pd.DataFrame(rows)


def _oracle_fit(df: pd.DataFrame, dim: int, ngrams: int, seed: int,
                epochs: int, lr: float, l2: float = 0.0):
    """Sequential numpy reimplementation of fit_classifier (same
    hashing kernel, same update rule)."""
    from temporal_knowledge_graphs_ray.stages.classifier import (
        _hash_features,
    )

    idx_lists, cnt_lists = _hash_features(list(df["text"]), dim,
                                          ngrams, seed)
    y = df["label"].to_numpy(dtype=np.float64)
    w = np.zeros(dim)
    b = 0.0
    losses = []
    n = len(df)
    for _ in range(epochs):
        z = np.full(n, b)
        for i, (ui, ci) in enumerate(zip(idx_lists, cnt_lists)):
            if len(ui):
                z[i] += (w[ui] * (ci / max(ci.sum(), 1.0))).sum()
        p = 1.0 / (1.0 + np.exp(-z))
        resid = p - y
        gw = np.zeros(dim)
        for i, (ui, ci) in enumerate(zip(idx_lists, cnt_lists)):
            if len(ui):
                gw[ui] += (ci / max(ci.sum(), 1.0)) * resid[i]
        losses.append(float(np.sum(np.logaddexp(0.0, z) - y * z)) / n)
        w -= lr * (gw / n + l2 * w)
        b -= lr * resid.sum() / n
    return w, b, losses


@pytest.mark.usefixtures("ray_session")
class TestClassifier:
    def test_matches_sequential_oracle(self):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.classifier import (
            featurize, fit_classifier,
        )

        df = _planted_corpus(200)
        feats = featurize(rd.from_pandas(df), label_col="label",
                          dim=DIM, ngrams=2, seed=SEED)
        model = fit_classifier(feats, dim=DIM, ngrams=2, seed=SEED,
                               epochs=8, lr=2.0, l2=0.01)
        w, b, losses = _oracle_fit(df, DIM, 2, SEED, epochs=8, lr=2.0,
                                   l2=0.01)
        np.testing.assert_allclose(model.w, w, rtol=1e-7, atol=1e-12)
        assert abs(model.b - b) < 1e-9
        np.testing.assert_allclose(model.losses, losses, rtol=1e-9)

    def test_learns_planted_signal_and_scores(self):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.classifier import (
            classify_text, featurize, fit_classifier,
        )

        df = _planted_corpus(400)
        ds = rd.from_pandas(df)
        feats = featurize(ds, label_col="label", dim=DIM, ngrams=2,
                          seed=SEED)
        model = fit_classifier(feats, dim=DIM, ngrams=2, seed=SEED,
                               epochs=30, lr=8.0)
        # loss decreases monotonically-ish and ends low
        assert model.losses[-1] < model.losses[0] / 3
        scored = (classify_text(ds, model).to_pandas()
                  .merge(df[["doc_id", "label"]], on="doc_id"))
        acc = ((scored["quality_score"] > 0.5).astype(int)
               == scored["label"]).mean()
        assert acc >= 0.99
        # scores are calibrated to the right side for both classes
        assert scored.loc[scored.label == 1, "quality_score"].min() > 0.5
        assert scored.loc[scored.label == 0, "quality_score"].max() < 0.5

    def test_layout_invariance(self):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.classifier import (
            featurize, fit_classifier,
        )

        df = _planted_corpus(150)
        m = []
        for parts in (1, 7):
            ds = rd.from_pandas(df).repartition(parts)
            feats = featurize(ds, label_col="label", dim=DIM,
                              ngrams=2, seed=SEED)
            m.append(fit_classifier(feats, dim=DIM, ngrams=2,
                                    seed=SEED, epochs=6, lr=2.0))
        np.testing.assert_allclose(m[0].w, m[1].w, rtol=1e-7,
                                   atol=1e-12)
        assert abs(m[0].b - m[1].b) < 1e-9

    def test_save_load_roundtrip(self, tmp_path):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.classifier import (
            TextClassifierModel, classify_text, featurize,
            fit_classifier,
        )

        df = _planted_corpus(100)
        ds = rd.from_pandas(df)
        feats = featurize(ds, label_col="label", dim=DIM, ngrams=2,
                          seed=SEED)
        model = fit_classifier(feats, dim=DIM, ngrams=2, seed=SEED,
                               epochs=4, lr=2.0)
        path = str(tmp_path / "clf.npz")
        model.save(path)
        loaded = TextClassifierModel.load(path)
        a = classify_text(ds, model).to_pandas().sort_values("doc_id")
        b = classify_text(ds, loaded).to_pandas().sort_values("doc_id")
        assert list(a["quality_score"]) == list(b["quality_score"])

    def test_bad_labels_rejected(self):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.classifier import (
            featurize,
        )

        df = pd.DataFrame({"doc_id": [0], "text": ["x"], "label": [2]})
        with pytest.raises(Exception):
            featurize(rd.from_pandas(df), label_col="label",
                      dim=DIM).materialize()

    def test_filter_by_quality_matches_scores(self):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.classifier import (
            classify_text, featurize, filter_by_quality, fit_classifier,
        )

        df = _planted_corpus(200)
        df["extra"] = df["doc_id"] * 7  # passthrough column
        ds = rd.from_pandas(df)
        feats = featurize(ds, label_col="label", dim=DIM, ngrams=2,
                          seed=SEED)
        model = fit_classifier(feats, dim=DIM, ngrams=2, seed=SEED,
                               epochs=15, lr=8.0)
        scores = (classify_text(ds, model).to_pandas()
                  .set_index("doc_id")["quality_score"])
        kept = filter_by_quality(ds, model, 0.5,
                                 score_col="qs").to_pandas()
        want_ids = sorted(scores[scores >= 0.5].index)
        assert sorted(kept["doc_id"]) == want_ids
        # all input columns pass through; appended score matches
        assert {"doc_id", "text", "label", "extra", "qs"} == set(
            kept.columns)
        for _, r in kept.iterrows():
            assert r["qs"] == pytest.approx(scores[r["doc_id"]])
        assert (kept["extra"] == kept["doc_id"] * 7).all()

    def test_empty_and_null_text_docs(self):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.classifier import (
            classify_text, featurize, fit_classifier,
        )

        df = pd.DataFrame({
            "doc_id": [0, 1, 2, 3],
            "text": ["good study evidence", "", None, "buy free casino"],
            "label": [1, 0, 0, 0],
        })
        ds = rd.from_pandas(df)
        feats = featurize(ds, label_col="label", dim=DIM, seed=SEED)
        model = fit_classifier(feats, dim=DIM, seed=SEED, epochs=3,
                               lr=1.0)
        out = classify_text(ds, model).to_pandas()
        assert len(out) == 4
        # featureless docs score exactly sigmoid(b)
        sb = 1.0 / (1.0 + np.exp(-model.b))
        got = out.set_index("doc_id")["quality_score"]
        assert got[1] == pytest.approx(sb) and got[2] == pytest.approx(sb)
