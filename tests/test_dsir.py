"""DSIR importance resampling: the streaming LM fits + weighting pass
must match an independent sequential oracle, prefer target-like docs,
and be exactly layout-invariant (integer counts, per-doc weights)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from temporal_knowledge_graphs_ray.functions.hashing import hash64_vec


def _h1(f, seed=0):
    """Per-feature singleton hash — independent of the module's one
    batched hash64_vec call per document."""
    return int(hash64_vec([f], seed)[0])

B = 4096


def _corpora():
    """Target: feline prose. Raw: a few feline docs buried in noise."""
    target = [f"the cat sat on the mat and the cat purred softly {i}"
              for i in range(20)]
    feline = [f"a cat and another cat sat near the warm mat today {i}"
              for i in range(5)]
    noise = [f"quarterly revenue grew {i} percent amid strong demand "
             f"for industrial machinery and logistics services"
             for i in range(40)]
    raw_texts = noise[:20] + feline + noise[20:]
    raw_ids = list(range(len(raw_texts)))
    return target, raw_ids, raw_texts


def _ds(ids, texts, blocks=None):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string())}))
    return ds.repartition(blocks) if blocks else ds


def _seq_counts(texts, num_buckets, seed=0):
    import re

    counts = np.zeros(num_buckets, dtype=np.int64)
    tok = re.compile(r"[a-z0-9]+")
    for t in texts:
        ws = tok.findall(t.lower())
        for f in ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]:
            counts[_h1(f, seed) % num_buckets] += 1
    return counts


def _seq_weights(texts, ratio, seed=0):
    import re

    tok = re.compile(r"[a-z0-9]+")
    out = []
    for t in texts:
        ws = tok.findall(t.lower())
        feats = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        b = np.array([_h1(f, seed) % len(ratio) for f in feats],
                     dtype=np.int64)
        u, c = np.unique(b, return_counts=True)
        out.append(float(c @ ratio[u]) if len(u) else 0.0)
    return np.array(out)


@pytest.mark.usefixtures("ray_session")
def test_lm_fit_matches_sequential_and_layout_invariant():
    from temporal_knowledge_graphs_ray.stages.dsir import fit_hashed_lm

    target, raw_ids, raw_texts = _corpora()
    want = _seq_counts(raw_texts, B)
    got1 = fit_hashed_lm(_ds(raw_ids, raw_texts, blocks=1),
                         num_buckets=B)
    got9 = fit_hashed_lm(_ds(raw_ids, raw_texts, blocks=9),
                         num_buckets=B)
    assert (got1 == want).all()
    assert (got9 == want).all()


@pytest.mark.usefixtures("ray_session")
def test_select_topk_matches_oracle_and_prefers_target():
    from temporal_knowledge_graphs_ray.stages.dsir import (
        dsir_select, fit_hashed_lm, log_ratio,
    )

    target, raw_ids, raw_texts = _corpora()
    got = (dsir_select(_ds(raw_ids, raw_texts, blocks=7),
                       _ds(list(range(len(target))), target),
                       k=5, num_buckets=B)
           .to_pandas())

    ratio = log_ratio(_seq_counts(target, B), _seq_counts(raw_texts, B))
    w = _seq_weights(raw_texts, ratio)
    order = np.lexsort((raw_ids, -w))
    assert list(got["doc_id"]) == [raw_ids[i] for i in order[:5]]
    assert np.allclose(got["log_weight"].to_numpy(),
                       w[order[:5]], atol=1e-9)
    # the 5 feline docs (ids 20..24) outrank all machinery noise
    assert set(got["doc_id"]) == {20, 21, 22, 23, 24}


@pytest.mark.usefixtures("ray_session")
def test_gumbel_mode_deterministic_and_seeded():
    from temporal_knowledge_graphs_ray.stages.dsir import dsir_select

    target, raw_ids, raw_texts = _corpora()
    t_ds = lambda: _ds(list(range(len(target))), target)  # noqa: E731
    a = dsir_select(_ds(raw_ids, raw_texts), t_ds(), k=10,
                    num_buckets=B, mode="gumbel",
                    gumbel_seed=5).to_pandas()
    b = dsir_select(_ds(raw_ids, raw_texts, blocks=11), t_ds(), k=10,
                    num_buckets=B, mode="gumbel",
                    gumbel_seed=5).to_pandas()
    assert list(a["doc_id"]) == list(b["doc_id"])
    c = dsir_select(_ds(raw_ids, raw_texts), t_ds(), k=10,
                    num_buckets=B, mode="gumbel",
                    gumbel_seed=6).to_pandas()
    assert list(a["doc_id"]) != list(c["doc_id"])
    # proportional sampling still concentrates on target-like docs
    assert len(set(a["doc_id"]) & {20, 21, 22, 23, 24}) >= 3

    with pytest.raises(ValueError):
        dsir_select(_ds(raw_ids, raw_texts), t_ds(), k=3,
                    num_buckets=B, mode="bogus")


@pytest.mark.usefixtures("ray_session")
def test_lm_cross_entropy_matches_oracle_and_orders_quality():
    from temporal_knowledge_graphs_ray.stages.dsir import (
        fit_hashed_lm, lm_cross_entropy,
    )

    target, raw_ids, raw_texts = _corpora()
    counts = fit_hashed_lm(_ds(list(range(len(target))), target),
                           num_buckets=B)
    got = (lm_cross_entropy(_ds(raw_ids, raw_texts, blocks=5), counts)
           .to_pandas().sort_values("doc_id", ignore_index=True))

    # independent sequential oracle
    want_counts = _seq_counts(target, B)
    logp = np.log2(want_counts + 1.0) - np.log2(want_counts.sum() + B)
    import re

    tok = re.compile(r"[a-z0-9]+")
    for i, text in enumerate(raw_texts):
        ws = tok.findall(text.lower())
        feats = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        b = np.array([_h1(f) % B for f in feats])
        u, c = np.unique(b, return_counts=True)
        bits = float(-(c @ logp[u]) / c.sum())
        assert abs(got["bits"].iloc[i] - bits) < 1e-9, i
        assert got["n_features"].iloc[i] == len(feats)
    # feline docs (target-like) score fewer bits than machinery noise
    feline = got[got["doc_id"].isin(range(20, 25))]["bits"].max()
    noise = got[~got["doc_id"].isin(range(20, 25))]["bits"].min()
    assert feline < noise


@pytest.mark.usefixtures("ray_session")
def test_empty_text_rows_get_zero_weight():
    from temporal_knowledge_graphs_ray.stages.dsir import (
        dsir_log_weights,
    )

    ratio = np.zeros(B)
    ratio[:10] = 1.0
    got = (dsir_log_weights(_ds([1, 2], ["", "   "]), ratio)
           .to_pandas())
    assert list(got["log_weight"]) == [0.0, 0.0]


@pytest.mark.usefixtures("ray_session")
def test_fit_hashed_lm_distributed_path_equal():
    """driver_merge=False (the mega-block distributed reduce) must give
    the same integer counts as the streaming driver merge."""
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.dsir import fit_hashed_lm

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["text"]).repartition(5)
    a = fit_hashed_lm(docs, "text", num_buckets=512)
    b = fit_hashed_lm(docs, "text", num_buckets=512, driver_merge=False)
    assert (a == b).all()
    assert a.sum() > 0


@pytest.mark.usefixtures("ray_session")
class TestCcnetBuckets:
    def _setup(self):
        from temporal_knowledge_graphs_ray.stages.dsir import fit_hashed_lm

        target, raw_ids, raw_texts = _corpora()
        counts = fit_hashed_lm(_ds(list(range(len(target))), target),
                               num_buckets=B)
        return counts, raw_ids, raw_texts

    def test_head_is_target_like_and_fracs_hold(self):
        from temporal_knowledge_graphs_ray.stages.dsir import ccnet_buckets

        counts, raw_ids, raw_texts = self._setup()
        out = ccnet_buckets(_ds(raw_ids, raw_texts), counts).to_pandas()
        assert set(out["bucket"]) <= {"head", "middle", "tail"}
        # the 5 planted feline docs (ids 20-24) score most target-like
        head_ids = set(out.loc[out["bucket"] == "head", "doc_id"])
        assert set(range(20, 25)) <= head_ids
        # cumulative fractions: head holds >= 1/3 (quantile_disc is
        # inclusive at the cutpoint), tail < 2/3
        n = len(out)
        assert (out["bucket"] == "head").sum() >= n / 3 - 1
        assert (out["bucket"] == "tail").sum() <= 2 * n / 3 + 1

    def test_matches_duckdb_cutpoint_oracle(self):
        import duckdb

        from temporal_knowledge_graphs_ray.stages.dsir import ccnet_buckets

        counts, raw_ids, raw_texts = self._setup()
        out = (ccnet_buckets(_ds(raw_ids, raw_texts), counts)
               .to_pandas().sort_values("doc_id", ignore_index=True))
        scored = out[["doc_id", "bits"]].copy()
        scored["bits_r"] = scored["bits"].round(4)
        con = duckdb.connect()
        con.register("scored", scored)
        want = con.execute("""
            WITH cuts AS (
              SELECT quantile_disc(bits_r, 1.0/3) AS c1,
                     quantile_disc(bits_r, 2.0/3) AS c2 FROM scored)
            SELECT doc_id, CASE WHEN bits_r <= c1 THEN 'head'
                                WHEN bits_r <= c2 THEN 'middle'
                                ELSE 'tail' END AS bucket
            FROM scored, cuts ORDER BY doc_id
        """).df()
        assert list(out["bucket"]) == list(want["bucket"])

    def test_per_language_cutpoints_and_layout_invariance(self):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.dsir import ccnet_buckets

        counts, raw_ids, raw_texts = self._setup()
        langs = ["en" if i % 2 else "de" for i in raw_ids]
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(raw_ids, pa.int64()),
            "text": pa.array(raw_texts, pa.string()),
            "lang": pa.array(langs, pa.string())}))
        by_lang = (ccnet_buckets(ds, counts, lang_col="lang")
                   .to_pandas().sort_values("doc_id", ignore_index=True))
        rep = (ccnet_buckets(ds.repartition(7), counts, lang_col="lang")
               .to_pandas().sort_values("doc_id", ignore_index=True))
        assert list(by_lang["bucket"]) == list(rep["bucket"])
        # streaming mode (no score materialization) is value-identical
        nocache = (ccnet_buckets(ds, counts, lang_col="lang",
                                 cache_scores=False)
                   .to_pandas().sort_values("doc_id",
                                            ignore_index=True))
        assert list(by_lang["bucket"]) == list(nocache["bucket"])
        # per-language: each language gets its own ~1/3 head
        for lang in ("en", "de"):
            g = by_lang[by_lang["lang"] == lang]
            assert (g["bucket"] == "head").sum() >= len(g) / 3 - 1

    def test_bad_fracs_raise(self):
        import pytest as _pytest

        from temporal_knowledge_graphs_ray.stages.dsir import ccnet_buckets

        counts, raw_ids, raw_texts = self._setup()
        with _pytest.raises(ValueError):
            ccnet_buckets(_ds(raw_ids, raw_texts), counts,
                          fracs=(0.5, 1.0))


@pytest.mark.usefixtures("ray_session")
class TestCcnetEdges:
    def _counts(self):
        from temporal_knowledge_graphs_ray.stages.dsir import fit_hashed_lm

        target, _, _ = _corpora()
        return fit_hashed_lm(_ds(list(range(len(target))), target),
                             num_buckets=B)

    def test_null_language_gets_own_cutpoints(self):
        """Docs with lang=None form their own cutpoint group (real
        lang detectors return None for short docs) — they must bucket
        by THEIR OWN score distribution, not be forced into 'tail'."""
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.dsir import ccnet_buckets

        counts = self._counts()
        _, raw_ids, raw_texts = _corpora()
        langs = [None if i % 3 == 0 else "en" for i in raw_ids]
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(raw_ids, pa.int64()),
            "text": pa.array(raw_texts, pa.string()),
            "lang": pa.array(langs, pa.string())}))
        out = (ccnet_buckets(ds, counts, lang_col="lang")
               .to_pandas())
        nulls = out[out["lang"].isna()]
        # the null group must split across buckets like any language
        assert (nulls["bucket"] == "head").sum() >= len(nulls) / 3 - 1
        assert set(nulls["bucket"]) != {"tail"}

    def test_featureless_docs_bucket_last_not_head(self):
        from temporal_knowledge_graphs_ray.stages.dsir import ccnet_buckets

        counts = self._counts()
        _, raw_ids, raw_texts = _corpora()
        texts = list(raw_texts) + ["", "   ", "!!! ???"]
        ids = list(raw_ids) + [900, 901, 902]
        out = (ccnet_buckets(_ds(ids, texts), counts).to_pandas()
               .set_index("doc_id"))
        for i in (900, 901, 902):
            assert out.loc[i, "bucket"] == "tail"

    def test_featureless_docs_bucket_last_even_with_inf_cutpoints(self):
        """A language group DOMINATED by empty docs has inf cutpoints;
        searchsorted(side='left') alone would place the inf-scored docs
        AT the inf cutpoint into 'head'. The assign step must override
        to the last bucket (ADVICE r4: dsir.py _ccnet_assign)."""
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.dsir import (
            ccnet_buckets,
            ccnet_filter,
        )

        counts = self._counts()
        _, raw_ids, raw_texts = _corpora()
        # lang=None group: 9 empty docs + 1 real doc → both the 1/3 and
        # 2/3 cutpoints of that group are +inf
        ids = list(raw_ids) + list(range(900, 910))
        texts = list(raw_texts) + [""] * 9 + ["one real document here"]
        langs = ["en"] * len(raw_ids) + [None] * 10
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string())}))
        out = (ccnet_buckets(ds, counts, lang_col="lang").to_pandas()
               .set_index("doc_id"))
        for i in range(900, 909):
            assert out.loc[i, "bucket"] == "tail"
        # and ccnet_filter(keep=head/middle) must therefore drop them
        kept = set(ccnet_filter(ds, counts, keep=("head", "middle"),
                                lang_col="lang")
                   .to_pandas()["doc_id"])
        assert not kept & set(range(900, 909))

    def test_ccnet_filter_equals_buckets_plus_keep(self):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.dsir import (
            ccnet_buckets,
            ccnet_filter,
        )

        counts = self._counts()
        _, raw_ids, raw_texts = _corpora()
        langs = ["en" if i % 2 else "de" for i in raw_ids]
        extra = pa.table({
            "doc_id": pa.array(raw_ids, pa.int64()),
            "text": pa.array(raw_texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "payload": pa.array([f"p{i}" for i in raw_ids], pa.string())})
        ds = rd.from_arrow(extra)
        keep = ("head", "middle")
        want = (ccnet_buckets(ds, counts, lang_col="lang").to_pandas())
        want_ids = sorted(want.loc[want["bucket"].isin(keep), "doc_id"])
        got = (ccnet_filter(ds, counts, keep=keep, lang_col="lang")
               .to_pandas().sort_values("doc_id", ignore_index=True))
        assert sorted(got["doc_id"]) == want_ids
        # every input column passes through
        assert list(got.columns) == ["doc_id", "text", "lang", "payload"]

    def test_keep_validation(self):
        from temporal_knowledge_graphs_ray.stages.dsir import ccnet_filter

        counts = self._counts()
        _, raw_ids, raw_texts = _corpora()
        ds = _ds(raw_ids, raw_texts)
        with pytest.raises(ValueError):
            ccnet_filter(ds, counts, keep=("Head",))
        with pytest.raises(ValueError):
            ccnet_filter(ds, counts, keep=())
        # stray whitespace is forgiven, not fatal
        out = ccnet_filter(ds, counts, keep=("head", " middle")).count()
        assert out > 0
