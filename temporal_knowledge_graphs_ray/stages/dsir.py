"""DSIR-style data selection via importance resampling (scale addition
following the public recipe of Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling": hashed-n-gram bag-of-words
models of a TARGET corpus and the RAW corpus give each raw document an
importance log-weight sum_f c_f * (log p_target(f) - log p_raw(f));
select the top-k by weight, or Gumbel-top-k to sample proportionally.
The reference has no selection surface — this is a training-data
curation primitive for webtext at scale).

Dataflow: fitting each LM is ONE streaming pass (per-batch hashed
feature counts combined map-side into (bucket, n) rows) whose sparse
partials merge into the fixed-size counts vector (driver stream by
default, bucketed distributed reduce past mega-block scale); the raw
corpus then streams through ONE weighting pass against the broadcast
log-ratio vector, and selection is the house partial-top-k
(stages/topk.py) — nothing corpus-sized ever sits on the driver or
shuffles. Everything is deterministic: feature hashing is
``hash64_vec`` (vectorized SipHash — one call per document, not one
Python hash per n-gram), integer counts are exact under any block
layout, and the Gumbel noise is a pure function of (id, seed).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import hash64_vec, stable_hash64

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def doc_feature_counts(text: str, num_buckets: int,
                       seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Hashed word uni+bigram counts: (sorted bucket ids, counts)."""
    toks = _TOKEN_RE.findall(text.lower())
    feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    if not feats:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    b = (hash64_vec(feats, seed)
         % np.uint64(num_buckets)).astype(np.int64)
    uniq, counts = np.unique(b, return_counts=True)
    return uniq, counts.astype(np.int64)


def fit_hashed_lm(ds, text_col: str = "text", num_buckets: int = 65536,
                  seed: int = 0, driver_merge: bool = True,
                  num_partitions: int = 64) -> np.ndarray:
    """Bucket counts (int64, ``num_buckets``-long) of the corpus — one
    streaming pass with map-side combine; exact (integer) under any
    block layout.

    The final vector is fixed-size, so with ``driver_merge=True``
    (default) the per-block sparse partials stream through the driver
    into one dense accumulator — bounded memory (one partial block +
    the vector), no shuffle, no per-group aggregate overhead. At
    mega-block scale (partial volume ~ blocks x buckets becomes
    driver-bound) set ``driver_merge=False`` for a bucketed distributed
    reduce with one vectorized bincount per coarse group; both paths
    are integer-exact and tested equal."""

    def partial(t: pa.Table) -> pa.Table:
        us, cs = [], []
        for text in t[text_col].to_pylist():
            u, c = doc_feature_counts(text or "", num_buckets, seed)
            if len(u):
                us.append(u)
                cs.append(c)
        if not us:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        uu, inv = np.unique(np.concatenate(us), return_inverse=True)
        nn = np.bincount(inv, weights=np.concatenate(cs))
        return pa.table({"bucket": pa.array(uu, pa.int64()),
                         "n": pa.array(nn.astype(np.int64))})

    partials = (ds.select_columns([text_col])
                .map_batches(partial, batch_format="pyarrow"))
    counts = np.zeros(num_buckets, dtype=np.int64)
    if driver_merge:
        for b in partials.iter_batches(batch_format="pyarrow"):
            np.add.at(counts, b["bucket"].to_numpy(zero_copy_only=False),
                      b["n"].to_numpy(zero_copy_only=False))
        return counts

    def coarse(t: pa.Table) -> pa.Table:
        c = (t["bucket"].to_numpy(zero_copy_only=False)
             % num_partitions).astype(np.int32)
        return t.append_column("coarse", pa.array(c))

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        u, inv = np.unique(g["bucket"].to_numpy(), return_inverse=True)
        nn = np.bincount(inv, weights=g["n"].to_numpy())
        return pd.DataFrame({"bucket": u,
                             "n": nn.astype(np.int64)})

    agg = (partials.map_batches(coarse, batch_format="pyarrow")
           .groupby("coarse")
           .map_groups(reduce_bucket, batch_format="pandas")
           .to_pandas())
    if len(agg):
        counts[agg["bucket"].to_numpy()] = agg["n"].to_numpy()
    return counts


def log_ratio(target_counts: np.ndarray, raw_counts: np.ndarray,
              smoothing: float = 1.0) -> np.ndarray:
    """log p_target(b) - log p_raw(b) with add-``smoothing`` estimates."""
    t = target_counts + smoothing
    r = raw_counts + smoothing
    return (np.log(t) - np.log(t.sum())) - (np.log(r) - np.log(r.sum()))


def dsir_log_weights(ds, ratio: np.ndarray, text_col: str = "text",
                     id_col: str = "doc_id", seed: int = 0):
    """Dataset of (id, log_weight): one streaming pass against the
    broadcast log-ratio vector."""
    import ray

    num_buckets = len(ratio)
    ratio_ref = ray.put(ratio)

    def weigh(t: pa.Table) -> pa.Table:
        import ray as _ray

        lr = _ray.get(ratio_ref)
        ws = []
        for text in t[text_col].to_pylist():
            u, c = doc_feature_counts(text or "", num_buckets, seed)
            ws.append(float(c @ lr[u]) if len(u) else 0.0)
        return pa.table({id_col: t[id_col],
                         "log_weight": pa.array(ws, pa.float64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        weigh, batch_format="pyarrow")


def lm_cross_entropy(ds, counts: np.ndarray, smoothing: float = 1.0,
                     text_col: str = "text", id_col: str = "doc_id",
                     seed: int = 0, carry_cols: tuple = ()):
    """CCNet-style LM quality score: per-doc cross-entropy (bits per
    hashed feature) under the reference LM ``counts`` (from
    ``fit_hashed_lm`` over a trusted corpus). Low bits ⇒ target-like
    text, high bits ⇒ out-of-domain/noise — the standard public recipe
    (Wenzek et al. 2020) with a hashed bag-of-features model instead of
    KenLM (not in this container). One streaming pass against the
    broadcast log-prob vector; Dataset of (id, n_features, bits)."""
    import ray

    num_buckets = len(counts)
    logp = np.log2(counts + smoothing) - np.log2(
        counts.sum() + smoothing * num_buckets)
    logp_ref = ray.put(logp)

    def score(t: pa.Table) -> pa.Table:
        import ray as _ray

        lp = _ray.get(logp_ref)
        ns, bits = [], []
        for text in t[text_col].to_pylist():
            u, c = doc_feature_counts(text or "", num_buckets, seed)
            n = int(c.sum())
            ns.append(n)
            bits.append(float(-(c @ lp[u]) / n) if n else 0.0)
        cols = {id_col: t[id_col],
                "n_features": pa.array(ns, pa.int64()),
                "bits": pa.array(bits, pa.float64())}
        for c in carry_cols:  # pass-throughs (e.g. a language column)
            cols[c] = t[c]
        return pa.table(cols)

    keep = [id_col, text_col, *carry_cols]
    return ds.select_columns(keep).map_batches(
        score, batch_format="pyarrow")


def _gumbel_of_ids(ids, seed: int) -> np.ndarray:
    """Deterministic per-id standard Gumbel noise: u from the id's
    63-bit hash, g = -log(-log(u)). Pure function of (id, seed), so the
    Gumbel-top-k sample is reproducible and layout-invariant."""
    h = np.fromiter((stable_hash64(f"{seed}|{i}") for i in ids),
                    dtype=np.uint64, count=len(ids))
    u = (h.astype(np.float64) + 0.5) / float(2**63)
    return -np.log(-np.log(u))


def dsir_select(raw_ds, target_ds, k: int, text_col: str = "text",
                id_col: str = "doc_id", num_buckets: int = 65536,
                smoothing: float = 1.0, seed: int = 0,
                mode: str = "topk", gumbel_seed: int = 1):
    """Select k raw docs by DSIR importance: Dataset of (id, log_weight
    [, sample_key]) — ``mode="topk"`` takes the k largest weights
    (deterministic tiebreak by id); ``mode="gumbel"`` is Gumbel-top-k,
    i.e. sampling w/o replacement proportional to the importance weights
    but still fully deterministic given ``gumbel_seed``."""
    from .topk import topk_rows

    tc = fit_hashed_lm(target_ds, text_col, num_buckets, seed)
    rc = fit_hashed_lm(raw_ds, text_col, num_buckets, seed)
    ratio = log_ratio(tc, rc, smoothing)
    weights = dsir_log_weights(raw_ds, ratio, text_col, id_col, seed)

    if mode == "topk":
        return topk_rows(weights, keys=["log_weight", id_col],
                         descending=[True, False], k=k)
    if mode != "gumbel":
        raise ValueError(f"mode must be 'topk' or 'gumbel', got {mode!r}")

    def add_key(t: pa.Table) -> pa.Table:
        g = _gumbel_of_ids(t[id_col].to_pylist(), gumbel_seed)
        key = t["log_weight"].to_numpy(zero_copy_only=False) + g
        return t.append_column("sample_key", pa.array(key, pa.float64()))

    return topk_rows(weights.map_batches(add_key, batch_format="pyarrow"),
                     keys=["sample_key", id_col],
                     descending=[True, False], k=k)


def _ccnet_qs(fracs) -> list:
    qs = sorted(float(f) for f in fracs)
    if not qs or qs[-1] >= 1.0 or qs[0] <= 0.0:
        raise ValueError("fracs must be strictly inside (0, 1)")
    return qs


def _ccnet_labels(n_buckets: int) -> list:
    return (["head", "middle", "tail"] if n_buckets == 3
            else [f"b{i}" for i in range(n_buckets)])


def _ccnet_rounded(bits: np.ndarray, n_features: np.ndarray,
                   decimals: int) -> np.ndarray:
    """Bucket score: rounded bits, with FEATURELESS docs forced to +inf
    so empty/whitespace/tokenizer-hostile text lands in the LAST bucket
    — lm_cross_entropy reports bits=0.0 for n=0, which would otherwise
    rank such docs as maximally target-like 'head'."""
    b = np.round(np.asarray(bits, dtype=np.float64), decimals)
    return np.where(np.asarray(n_features) == 0, np.inf, b)


def _ccnet_cut_map(scored, lang_col, qs) -> dict:
    """{lang_or_None: sorted cutpoint array} — dropna=False so the
    NULL-language group (short docs under real lang detectors) keeps
    ITS OWN cutpoints instead of being silently discarded."""
    from .quantiles import exact_quantiles

    cuts_df = exact_quantiles(scored, "bits_r", qs=qs, by=lang_col)
    if not lang_col:
        return {None: np.asarray(sorted(cuts_df["value"]),
                                 dtype=np.float64)}
    cut_map = {}
    for k, g in cuts_df.groupby(lang_col, dropna=False):
        if k is None or (isinstance(k, float) and np.isnan(k)):
            k = None
        cut_map[k] = np.asarray(sorted(g["value"]), dtype=np.float64)
    return cut_map


def _ccnet_assign(bits_r: np.ndarray, langs, cut_map: dict,
                  n_buckets: int) -> np.ndarray:
    """Bucket index per row via searchsorted against the language's
    cutpoints (side='left': a doc AT the cutpoint goes in the lower
    bucket — DuckDB quantile_disc inclusive semantics). Featureless
    docs carry bits_r=+inf (_ccnet_rounded); they are forced to the
    LAST bucket explicitly — searchsorted alone would place inf AT an
    inf cutpoint (a group dominated by empty docs, e.g. the
    NULL-language group) into the lower bucket, inverting the
    'featureless docs always land in the tail' guarantee."""
    bits_r = np.asarray(bits_r, dtype=np.float64)
    if langs is None:
        idx = np.searchsorted(cut_map[None], bits_r, side="left")
    else:
        idx = np.empty(len(bits_r), dtype=np.int64)
        for lang in set(langs):
            mask = np.fromiter((x == lang for x in langs), bool,
                               len(langs))
            cuts = cut_map.get(lang)
            # a language genuinely absent from the cutpoint table (can
            # only happen when scoring NEW data against saved
            # cutpoints) buckets last deterministically
            idx[mask] = (np.searchsorted(cuts, bits_r[mask],
                                         side="left")
                         if cuts is not None else n_buckets - 1)
    idx[np.isinf(bits_r)] = n_buckets - 1
    return idx


def ccnet_buckets(ds, counts: np.ndarray, fracs=(1 / 3, 2 / 3),
                  lang_col: str | None = None, text_col: str = "text",
                  id_col: str = "doc_id", smoothing: float = 1.0,
                  seed: int = 0, round_decimals: int = 4,
                  cache_scores: bool = True):
    """CCNet's perplexity bucketing (Wenzek et al. 2020 §4.4): score
    every doc with the trusted-corpus LM, split the corpus at the given
    cumulative fractions of the score distribution — LOW bits = "head"
    (most target-like), then "middle", then "tail". With ``lang_col``,
    cutpoints are computed PER LANGUAGE (CCNet's per-language buckets;
    a NULL language is its own group); otherwise one global split.
    Featureless docs (empty/whitespace text) always land in the last
    bucket (see _ccnet_rounded).

    Returns (id[, lang], bits, bucket) — three buckets get the CCNet
    names head/middle/tail, other frac counts get b0..bN. Scores round
    to ``round_decimals`` before the quantile so the cutpoint pass is
    an exact_quantiles over BOUNDED distinct values (range/1e-4 — the
    scale contract exact_quantiles requires; DuckDB quantile_disc
    reproduces the cutpoints exactly). Dataflow: one streaming score
    pass, one bounded quantile aggregate, one broadcast assignment
    pass — no corpus-sized shuffle, no driver residency beyond the
    per-language cutpoint table.

    ``cache_scores``: the score table feeds BOTH the cutpoint pass and
    the assignment. True (default) materializes it once (doc-grain
    metadata — ~50 B/doc); at extreme scale set False and both
    consumers recompute the cheap scoring pass, so nothing doc-grain
    holds object-store residency (the cache_windows convention).
    """
    import ray

    carry = (lang_col,) if lang_col else ()
    scored = lm_cross_entropy(ds, counts, smoothing=smoothing,
                              text_col=text_col, id_col=id_col,
                              seed=seed, carry_cols=carry)

    def add_rounded(t: pa.Table) -> pa.Table:
        b = _ccnet_rounded(
            t["bits"].to_numpy(zero_copy_only=False),
            t["n_features"].to_numpy(zero_copy_only=False),
            round_decimals)
        return t.append_column("bits_r", pa.array(b))

    scored = scored.map_batches(add_rounded, batch_format="pyarrow")
    if cache_scores:
        scored = scored.materialize()

    qs = _ccnet_qs(fracs)
    cut_map = _ccnet_cut_map(scored, lang_col, qs)
    cuts_ref = ray.put(cut_map)
    n_buckets = len(qs) + 1
    labels = _ccnet_labels(n_buckets)

    def assign(t: pa.Table) -> pa.Table:
        cm = ray.get(cuts_ref)
        bits_r = np.asarray(t["bits_r"].to_numpy(zero_copy_only=False),
                            dtype=np.float64)
        langs = t[lang_col].to_pylist() if lang_col else None
        idx = _ccnet_assign(bits_r, langs, cm, n_buckets)
        lab = pa.array([labels[i] for i in idx], pa.string())
        return t.drop_columns(["bits_r"]).append_column("bucket", lab)

    return scored.map_batches(assign, batch_format="pyarrow")


def ccnet_filter(ds, counts: np.ndarray, keep=("head", "middle"),
                 fracs=(1 / 3, 2 / 3), lang_col: str | None = None,
                 text_col: str = "text", id_col: str = "doc_id",
                 smoothing: float = 1.0, seed: int = 0,
                 round_decimals: int = 4):
    """Filter a corpus IN PLACE to the requested CCNet buckets: one
    scoring pass computes the (per-language) cutpoints, then ONE pass
    over the full dataset rescores each row and keeps only rows whose
    bucket is in ``keep`` — every input column passes through, no id
    join, nothing doc-grain materializes. ``keep`` entries are
    validated against the bucket labels (a typo must error, not
    silently empty the corpus)."""
    import ray

    qs = _ccnet_qs(fracs)
    n_buckets = len(qs) + 1
    labels = _ccnet_labels(n_buckets)
    keep_set = {str(k).strip() for k in keep}
    bad = keep_set - set(labels)
    if bad or not keep_set:
        raise ValueError(
            f"ccnet keep buckets {sorted(bad) or '(empty)'} not in "
            f"{labels}")
    keep_idx = np.array(sorted(labels.index(k) for k in keep_set),
                        dtype=np.int64)

    carry = (lang_col,) if lang_col else ()
    scored = lm_cross_entropy(ds, counts, smoothing=smoothing,
                              text_col=text_col, id_col=id_col,
                              seed=seed, carry_cols=carry)

    def add_rounded(t: pa.Table) -> pa.Table:
        b = _ccnet_rounded(
            t["bits"].to_numpy(zero_copy_only=False),
            t["n_features"].to_numpy(zero_copy_only=False),
            round_decimals)
        return t.append_column("bits_r", pa.array(b))

    cut_map = _ccnet_cut_map(
        scored.map_batches(add_rounded, batch_format="pyarrow"),
        lang_col, qs)
    cuts_ref = ray.put(cut_map)
    num_buckets_lm = len(counts)
    logp = np.log2(counts + smoothing) - np.log2(
        counts.sum() + smoothing * num_buckets_lm)
    logp_ref = ray.put(logp)

    def keep_rows(t: pa.Table) -> pa.Table:
        cm = ray.get(cuts_ref)
        lp = ray.get(logp_ref)
        bits = np.empty(t.num_rows, dtype=np.float64)
        nf = np.empty(t.num_rows, dtype=np.int64)
        for i, text in enumerate(t[text_col].to_pylist()):
            u, c = doc_feature_counts(text or "", num_buckets_lm, seed)
            n = int(c.sum())
            nf[i] = n
            bits[i] = float(-(c @ lp[u]) / n) if n else 0.0
        bits_r = _ccnet_rounded(bits, nf, round_decimals)
        langs = t[lang_col].to_pylist() if lang_col else None
        idx = _ccnet_assign(bits_r, langs, cm, n_buckets)
        return t.filter(pa.array(np.isin(idx, keep_idx)))

    return ds.map_batches(keep_rows, batch_format="pyarrow")
