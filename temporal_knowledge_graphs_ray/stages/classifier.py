"""Distributed trainable quality classifier (scale addition — the
fastText-style linear classifier the big web-corpus pipelines use to
filter for "reference-quality" text, e.g. GPT-3's WebText-vs-CommonCrawl
LR filter and LLaMA/CCNet's fastText step; the reference repo has no
trainable-model surface, its nearest analogue is the fixed heuristic
quality score in stages/textstats.py).

Model: logistic regression over hashed bag-of-word-n-grams —
``p(quality|doc) = sigmoid(w . x + b)`` with x the L1-normalized counts
of word {1..n}-grams hashed into ``dim`` buckets (the fastText "hashing
trick"; collisions are part of the model, not an error).

Training is full-batch gradient descent, expressed as one streaming
pass per epoch: ``map_batches`` emits per-block partial rows
``(n, sum grad_w, sum grad_b, sum loss)``, a batched combine level
bounds the driver reduce at ceil(blocks / combine_batch) rows (the
PCA moment-pass shape — stages/pca.py), and the driver applies the
(dim,)-sized update. The corpus never moves and is never shuffled; the
only per-epoch driver state is the weight vector itself, which ships
to workers once per epoch via ``ray.put``. Featurization (tokenize +
hash) runs ONCE and the small derived feature table (ids + hashed
index/count lists, ~tokens x 6 bytes; at 100 TB write it to Parquet
via ``features.write_parquet`` and re-read) feeds every epoch.

Deterministic: zero init, fixed epoch count and learning rate, hashing
via the stable vectorized SipHash kernel — the fitted model is a pure
function of (data, hyperparameters) up to float summation order
(block layouts shift gradients by ~1e-16 per term; the tests pin a
sequential numpy oracle to 1e-7 and cross-layout equality likewise).

No SQL oracle: iterative float optimization is not SQL-expressible;
the oracle is the in-repo sequential numpy implementation
(tests/test_classifier.py), per SURVEY §5's policy for Q1-style
iterative ops.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ..functions.hashing import hash64_vec

_WORD_RE = re.compile(r"[a-z0-9]+")


@dataclass
class TextClassifierModel:
    w: np.ndarray          # (dim,)
    b: float
    dim: int
    ngrams: int            # max n-gram order (2 = unigrams + bigrams)
    seed: int
    losses: list = field(default_factory=list)  # mean log-loss per epoch

    def save(self, path: str) -> None:
        np.savez(path, w=self.w, b=np.float64(self.b),
                 dim=np.int64(self.dim), ngrams=np.int64(self.ngrams),
                 seed=np.int64(self.seed),
                 losses=np.asarray(self.losses, dtype=np.float64))

    @classmethod
    def load(cls, path: str) -> "TextClassifierModel":
        z = np.load(path)
        return cls(w=z["w"], b=float(z["b"]), dim=int(z["dim"]),
                   ngrams=int(z["ngrams"]), seed=int(z["seed"]),
                   losses=list(z["losses"]))


def doc_grams(text: str, ngrams: int) -> list[str]:
    """Word {1..ngrams}-grams of the lower-cased ``[a-z0-9]+`` token
    stream (space-joined) — the fastText wordNgrams feature set."""
    words = _WORD_RE.findall(text.lower())
    out = list(words)
    for n in range(2, ngrams + 1):
        out.extend(" ".join(words[i:i + n])
                   for i in range(len(words) - n + 1))
    return out


def _hash_features(texts, dim: int, ngrams: int, seed: int):
    """Per-doc hashed feature indices+counts for a batch of texts.

    Returns (idx_lists, cnt_lists): for each doc the sorted unique
    hashed bucket ids (int64) and their occurrence counts (int64).
    One vectorized SipHash call covers the whole batch's grams.
    """
    per_doc = [doc_grams(t or "", ngrams) for t in texts]
    lens = np.fromiter((len(g) for g in per_doc), dtype=np.int64,
                       count=len(per_doc))
    flat = [g for gs in per_doc for g in gs]
    if flat:
        h = (hash64_vec(flat, seed) % np.uint64(dim)).astype(np.int64)
    else:
        h = np.empty(0, dtype=np.int64)
    offs = np.concatenate(([0], np.cumsum(lens)))
    idx_lists, cnt_lists = [], []
    for i in range(len(per_doc)):
        ui, ci = np.unique(h[offs[i]:offs[i + 1]], return_counts=True)
        idx_lists.append(ui)
        cnt_lists.append(ci.astype(np.int64))
    return idx_lists, cnt_lists


def featurize(ds, text_col: str = "text", id_col: str = "doc_id",
              label_col: str | None = None, dim: int = 2 ** 18,
              ngrams: int = 2, seed: int = 0):
    """One streaming pass: text -> (id, f_idx list<int64>,
    f_cnt list<int64>[, label int8]). Run once; feeds every epoch
    (and inference). ``f_cnt/sum(f_cnt)`` is the L1-normalized
    feature value."""
    cols = [id_col, text_col] + ([label_col] if label_col else [])

    def feats(t: pa.Table) -> pa.Table:
        idx_lists, cnt_lists = _hash_features(
            t[text_col].to_pylist(), dim, ngrams, seed)
        data = {
            id_col: t[id_col],
            "f_idx": pa.array([x.tolist() for x in idx_lists],
                              pa.list_(pa.int64())),
            "f_cnt": pa.array([x.tolist() for x in cnt_lists],
                              pa.list_(pa.int64())),
        }
        if label_col:
            lab = np.asarray(t[label_col].to_numpy(zero_copy_only=False),
                             dtype=np.int64)
            if len(lab) and not np.isin(lab, (0, 1)).all():
                raise ValueError("labels must be 0/1")
            data["label"] = pa.array(lab, pa.int64())
        return pa.table(data)

    return ds.select_columns(cols).map_batches(feats,
                                               batch_format="pyarrow")


def _flatten_features(t: pa.Table):
    """(idx_flat, val_flat, doc_of_entry, n_docs) from a features
    table — val is the per-doc L1-normalized count. Zero-copy Arrow
    list offsets; empty docs contribute nothing."""
    def one_chunk(col):
        a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if isinstance(a, pa.ChunkedArray):   # older pyarrow keeps the type
            a = (a.chunk(0) if a.num_chunks == 1 else
                 pa.concat_arrays(a.chunks) if a.num_chunks else
                 pa.array([], pa.list_(pa.int64())))
        return a

    import pyarrow.compute as pc

    fi = one_chunk(t["f_idx"])
    fc = one_chunk(t["f_cnt"])
    # flatten() honors slicing (``.values``/``.offsets`` do not for a
    # sliced ListArray — a zero-copy block slice would misalign docs)
    idx_flat = np.asarray(fi.flatten().to_numpy(zero_copy_only=False),
                          dtype=np.int64)
    cnt_flat = np.asarray(fc.flatten().to_numpy(zero_copy_only=False),
                          dtype=np.float64)
    lens = np.asarray(pc.list_value_length(fi).to_numpy(
        zero_copy_only=False), dtype=np.int64)
    doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    # np.add.reduceat mishandles zero-length segments (an empty doc's
    # slot reads the NEXT segment's sum), so accumulate via add.at
    totals = np.zeros(len(lens), dtype=np.float64)
    if len(idx_flat):
        np.add.at(totals, doc_of, cnt_flat)
    totals = np.maximum(totals, 1.0)
    val_flat = cnt_flat / totals[doc_of] if len(idx_flat) else cnt_flat
    return idx_flat, val_flat, doc_of, len(lens)


def _scores_np(t: pa.Table, w: np.ndarray, b: float) -> np.ndarray:
    idx, val, doc_of, n = _flatten_features(t)
    z = np.full(n, b, dtype=np.float64)
    if len(idx):
        np.add.at(z, doc_of, w[idx] * val)
    return z


def _scores_from_lists(idx_lists, cnt_lists, w: np.ndarray,
                       b: float) -> np.ndarray:
    """Vectorized logit per doc from ``_hash_features`` output."""
    lens = np.fromiter((len(u) for u in idx_lists), dtype=np.int64,
                       count=len(idx_lists))
    z = np.full(len(idx_lists), b, dtype=np.float64)
    if lens.sum():
        idx = np.concatenate([u for u in idx_lists if len(u)])
        cnt = np.concatenate(
            [c for c in cnt_lists if len(c)]).astype(np.float64)
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        totals = np.zeros(len(lens), dtype=np.float64)
        np.add.at(totals, doc_of, cnt)
        np.add.at(z, doc_of, w[idx] * (cnt / np.maximum(totals, 1.0)[doc_of]))
    return z


def fit_classifier(features, dim: int = 2 ** 18, ngrams: int = 2,
                   seed: int = 0, epochs: int = 20, lr: float = 2.0,
                   l2: float = 0.0, combine_batch: int = 256,
                   label_col: str = "label") -> TextClassifierModel:
    """Full-batch GD on mean log-loss over a ``featurize(...)`` output
    (pass ``dim/ngrams/seed`` matching the featurize call — they are
    recorded on the model for inference). ``features`` is materialized
    once if lazy (it is the small derived table; at 100 TB pass a
    re-readable ``read_parquet`` dataset instead)."""
    import ray

    feats = features
    if hasattr(feats, "materialize"):
        feats = feats.materialize()

    w = np.zeros(dim, dtype=np.float64)
    b = 0.0
    losses: list[float] = []
    cols = feats.select_columns(["f_idx", "f_cnt", label_col])

    for _ in range(epochs):
        ref = ray.put((w.copy(), b))

        def partial(t: pa.Table, _ref=ref) -> pa.Table:
            import ray as _ray

            cw, cb = _ray.get(_ref)
            y = np.asarray(t[label_col].to_numpy(zero_copy_only=False),
                           dtype=np.float64)
            z = _scores_np(t, cw, cb)
            p = 1.0 / (1.0 + np.exp(-z))
            resid = p - y
            idx, val, doc_of, _n = _flatten_features(t)
            gw = np.zeros(len(cw), dtype=np.float64)
            if len(idx):
                np.add.at(gw, idx, val * resid[doc_of])
            loss = float(np.sum(np.logaddexp(0.0, z) - y * z))
            return pa.table({
                "n": pa.array([len(y)], pa.int64()),
                "gw": pa.array([gw.tolist()], pa.list_(pa.float64())),
                "gb": pa.array([float(resid.sum())], pa.float64()),
                "loss": pa.array([loss], pa.float64()),
            })

        def combine(t: pa.Table) -> pa.Table:
            gw = np.zeros(dim, dtype=np.float64)
            for row in t["gw"].to_pylist():
                gw += np.asarray(row, dtype=np.float64)
            return pa.table({
                "n": pa.array([int(t["n"].to_numpy().sum())], pa.int64()),
                "gw": pa.array([gw.tolist()], pa.list_(pa.float64())),
                "gb": pa.array([float(t["gb"].to_numpy().sum())],
                               pa.float64()),
                "loss": pa.array([float(t["loss"].to_numpy().sum())],
                                 pa.float64()),
            })

        pdf = (cols.map_batches(partial, batch_format="pyarrow")
               .map_batches(combine, batch_format="pyarrow",
                            batch_size=combine_batch)
               .to_pandas())
        n = int(pdf["n"].sum())
        if n == 0:
            raise ValueError("fit_classifier: empty features dataset")
        gw = np.zeros(dim, dtype=np.float64)
        for row in pdf["gw"]:
            gw += np.asarray(row, dtype=np.float64)
        gb = float(pdf["gb"].sum())
        losses.append(float(pdf["loss"].sum()) / n)
        w -= lr * (gw / n + l2 * w)
        b -= lr * (gb / n)

    return TextClassifierModel(w=w, b=b, dim=dim, ngrams=ngrams,
                               seed=seed, losses=losses)


def classify(features, model: TextClassifierModel,
             id_col: str = "doc_id", out_col: str = "quality_score"):
    """Score a ``featurize(...)`` output (featurized with the model's
    dim/ngrams/seed): one streaming pass, weights broadcast once.
    Output (id_col, out_col = sigmoid score in (0,1))."""
    import ray

    ref = ray.put((model.w.copy(), model.b))

    def score(t: pa.Table, _ref=ref) -> pa.Table:
        import ray as _ray

        cw, cb = _ray.get(_ref)
        z = _scores_np(t, cw, cb)
        return pa.table({
            id_col: t[id_col],
            out_col: pa.array(1.0 / (1.0 + np.exp(-z)), pa.float64()),
        })

    return features.select_columns([id_col, "f_idx", "f_cnt"]).map_batches(
        score, batch_format="pyarrow")


def classify_text(ds, model: TextClassifierModel, text_col: str = "text",
                  id_col: str = "doc_id", out_col: str = "quality_score"):
    """Convenience: featurize with the model's recorded hyperparameters
    and score, fused as one streaming pipeline."""
    feats = featurize(ds, text_col=text_col, id_col=id_col,
                      dim=model.dim, ngrams=model.ngrams, seed=model.seed)
    return classify(feats, model, id_col=id_col, out_col=out_col)


def filter_by_quality(ds, model: TextClassifierModel,
                      min_score: float, text_col: str = "text",
                      score_col: str | None = None):
    """Keep rows whose classifier score is >= ``min_score`` — the GPT-3 /
    CCNet model-filter step, as ONE streaming pass that featurizes,
    scores against the broadcast weight vector and filters in place (no
    join back to the corpus; all input columns pass through; null text
    scores sigmoid(b) like the score path). ``score_col`` optionally
    appends the kept rows' scores."""
    import ray

    ref = ray.put((model.w.copy(), model.b))
    dim, ngrams, seed = model.dim, model.ngrams, model.seed

    def keep(t: pa.Table, _ref=ref) -> pa.Table:
        import ray as _ray

        cw, cb = _ray.get(_ref)
        idx_lists, cnt_lists = _hash_features(
            t[text_col].to_pylist(), dim, ngrams, seed)
        z = _scores_from_lists(idx_lists, cnt_lists, cw, cb)
        p = 1.0 / (1.0 + np.exp(-z))
        if score_col is not None:
            t = t.append_column(score_col, pa.array(p, pa.float64()))
        return t.filter(pa.array(p >= min_score))

    return ds.map_batches(keep, batch_format="pyarrow")
