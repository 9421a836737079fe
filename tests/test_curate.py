"""Composed curation pipeline: quality filter -> exact dedup (native
semi-join) -> near-dup removal -> curated Parquet + funnel report."""

from __future__ import annotations

import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
def test_curation_funnel(tmp_path):
    import duckdb
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.curate import curate_corpus

    base = duckdb.sql(
        "SELECT doc_id, text FROM "
        "'/root/testdata/sf0.001/documents.parquet' ORDER BY doc_id"
    ).arrow()
    ids = base["doc_id"].to_pylist()
    texts = base["text"].to_pylist()
    nxt = max(ids) + 1
    rows = list(zip(ids, texts))
    # plant: 3 exact duplicates, 2 whitespace-variant duplicates (same
    # fingerprint), and junk rows the quality filter must drop
    rows += [(nxt + 0, texts[0]), (nxt + 1, texts[1]), (nxt + 2, texts[2])]
    rows += [(nxt + 3, "  " + texts[3].replace("\n", " \n") + "  ")]
    rows += [(nxt + 4, "!!! ??? ;;; ###"), (nxt + 5, "one two")]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.large_string()),
    })
    ds = rd.from_arrow(tbl)

    out = str(tmp_path / "curated")
    report = curate_corpus(ds, out, min_words=5, max_punct_ratio=0.3)

    assert report["input_docs"] == len(rows)
    # junk dropped by the quality gate
    assert report["after_quality_filter"] <= len(rows) - 2
    # 4 planted fingerprint-duplicates removed, originals kept
    assert (report["after_quality_filter"] - report["after_exact_dedup"]
            >= 4)
    assert report["curated_docs"] == (report["after_exact_dedup"]
                                      - report["neardup_dropped"])

    kept = rd.read_parquet(out).to_pandas()
    kept_ids = set(kept["doc_id"])
    # exact-dup winners are the MIN ids: originals survive, plants don't
    for orig, plant in ((ids[0], nxt + 0), (ids[1], nxt + 1),
                        (ids[2], nxt + 2)):
        assert orig in kept_ids and plant not in kept_ids
    assert nxt + 4 not in kept_ids and nxt + 5 not in kept_ids
    assert set(kept.columns) == {"doc_id", "text", "lang_pred", "n_words"}


@pytest.mark.usefixtures("ray_session")
def test_curation_substring_dup_cap(tmp_path):
    import numpy as np
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.curate import curate_corpus

    rng = np.random.default_rng(23)
    words = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliet kilo lima mike november oscar papa").split()
    texts = [" ".join(rng.choice(words, size=40)) for _ in range(10)]
    # doc 10 is ~all boilerplate: one 12-token phrase repeated 5x (its
    # windows repeat within the doc -> dup_fraction ~ 1); docs 0-9 are
    # random and share no 8-token window
    phrase = " ".join(rng.choice(words, size=12))
    texts.append(" ".join([phrase] * 5))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(11)), pa.int64()),
        "text": pa.array(texts, pa.string())}))

    out = str(tmp_path / "curated")
    report = curate_corpus(ds, out, min_words=5, max_punct_ratio=1.0,
                           max_dup_fraction=0.5, dup_window_tokens=8)
    assert report["substring_dup_dropped"] == 1
    kept = set(rd.read_parquet(out).to_pandas()["doc_id"])
    assert 10 not in kept
    assert kept == set(range(10))
    assert report["curated_docs"] == 10


@pytest.mark.usefixtures("ray_session")
def test_curation_model_quality_filter(tmp_path):
    """The optional classifier leg: a model trained on a planted
    good-vs-spam vocabulary drops the spam docs from the funnel and the
    report records the stage count (loaded from a saved .npz path)."""
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.curate import curate_corpus
    from temporal_knowledge_graphs_ray.stages.classifier import (
        featurize,
        fit_classifier,
    )

    good = ("the study presents measured evidence and careful analysis "
            "of the underlying theorem with detailed methodology")
    bad = ("click here to buy now free winner casino bonus offer "
           "限时 amazing deal subscribe cheap pills")
    rows = []
    for i in range(60):
        label = i % 2
        base = good if label else bad
        # per-doc unique filler keeps pairwise Jaccard well under the
        # near-dup threshold so ONLY the classifier leg drops docs
        uniq = " ".join(f"w{i}x{j}" for j in range(8))
        rows.append({"doc_id": i, "text": f"{base} {uniq}",
                     "label": label})
    import pandas as pd

    df = pd.DataFrame(rows)
    ds = rd.from_pandas(df)
    feats = featurize(ds, label_col="label", dim=2 ** 12, ngrams=2,
                      seed=5)
    model = fit_classifier(feats, dim=2 ** 12, ngrams=2, seed=5,
                           epochs=25, lr=8.0)
    mpath = str(tmp_path / "quality.npz")
    model.save(mpath)

    out = str(tmp_path / "curated")
    report = curate_corpus(
        ds.drop_columns(["label"]), out, min_words=3,
        max_punct_ratio=1.0, quality_model=mpath,
        min_quality_score=0.5)
    assert report["after_model_filter"] == 30
    kept = set(rd.read_parquet(out).to_pandas()["doc_id"])
    assert kept == {i for i in range(60) if i % 2 == 1}


@pytest.mark.usefixtures("ray_session")
def test_curation_paragraph_dedup_leg(tmp_path):
    """The optional CCNet paragraph-dedup leg at the funnel head: a
    boilerplate paragraph shared by every doc survives only in the
    smallest doc_id; a doc that is ONLY boilerplate drops entirely; the
    downstream signal/filter legs see the deduped text."""
    import numpy as np
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.curate import curate_corpus

    rng = np.random.default_rng(7)
    words = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliet kilo lima mike november oscar papa").split()
    boiler = "subscribe to our newsletter for more updates every day"
    texts = [boiler + "\n" + " ".join(rng.choice(words, size=40))
             for _ in range(6)]
    texts.append(boiler)  # doc 6: nothing but the boilerplate
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(7)), pa.int64()),
        "text": pa.array(texts, pa.string())}))

    out = str(tmp_path / "curated")
    report = curate_corpus(ds, out, min_words=5, max_punct_ratio=1.0,
                           paragraph_dedup_sep="\n")
    assert report["input_docs"] == 7
    assert report["after_paragraph_dedup"] == 6  # doc 6 fully deduped
    kept = rd.read_parquet(out).to_pandas().set_index("doc_id")
    assert 6 not in kept.index
    # doc 0 (smallest id) keeps the boilerplate; docs 1-5 lose it
    assert kept.loc[0, "text"].startswith(boiler + "\n")
    for i in range(1, 6):
        assert boiler not in kept.loc[i, "text"]
    # n_words was computed on the DEDUPED text (9 boilerplate words
    # stripped from docs 1-5)
    assert int(kept.loc[1, "n_words"]) == 40


@pytest.mark.usefixtures("ray_session")
def test_curation_substring_cap_anti_join_above_gate(tmp_path):
    """flag_broadcast_limit=0 forces the dataset-resident anti-join
    path for the flagged-id drop; the output must be identical to the
    broadcast path's — including when MANY docs are flagged (a user
    setting the cap low on a template-heavy corpus)."""
    import numpy as np
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.curate import curate_corpus

    rng = np.random.default_rng(7)
    words = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliet kilo lima mike november oscar papa").split()
    phrase = " ".join(rng.choice(words, size=12))
    texts = [" ".join(rng.choice(words, size=40)) for _ in range(8)]
    # 12 boilerplate docs -> MORE flagged than clean survivors
    texts += [" ".join([phrase] * 5) + f" tail{i}" for i in range(12)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(20)), pa.int64()),
        "text": pa.array(texts, pa.string())}))

    out_b = str(tmp_path / "broadcast")
    rep_b = curate_corpus(ds, out_b, min_words=5, max_punct_ratio=1.0,
                          jaccard_threshold=1.01,
                          max_dup_fraction=0.5, dup_window_tokens=8)
    out_a = str(tmp_path / "antijoin")
    rep_a = curate_corpus(ds, out_a, min_words=5, max_punct_ratio=1.0,
                          jaccard_threshold=1.01,
                          max_dup_fraction=0.5, dup_window_tokens=8,
                          flag_broadcast_limit=0)
    assert rep_a["substring_dup_dropped"] == \
        rep_b["substring_dup_dropped"] > 8  # the gate actually engaged
    kept_b = rd.read_parquet(out_b).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    kept_a = rd.read_parquet(out_a).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    assert list(kept_a["doc_id"]) == list(kept_b["doc_id"])
    assert list(kept_a.columns) == list(kept_b.columns)


@pytest.mark.usefixtures("ray_session")
def test_curation_substring_removal_leg(tmp_path):
    """The optional ExactSubstr REMOVAL leg at the funnel head: a
    shared >= w-token passage survives only in the smallest doc_id, a
    doc that is ONLY the passage drops, and the downstream signal legs
    see the cut text (n_words counts the post-cut words)."""
    import numpy as np
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.curate import curate_corpus

    rng = np.random.default_rng(11)
    words = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliet kilo lima mike november oscar papa").split()
    shared = " ".join(rng.choice(words, size=16))  # 16-token passage
    uniq = [" ".join(rng.choice(words, size=40)) for _ in range(3)]
    texts = [
        f"{uniq[0]} {shared}",   # doc 0: first occurrence, keeps it
        f"{uniq[1]} {shared}",   # doc 1: copy cut
        shared,                  # doc 2: only the passage -> drops
        uniq[2],                 # doc 3: untouched
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(4)), pa.int64()),
        "text": pa.array(texts, pa.string())}))

    out = str(tmp_path / "curated")
    report = curate_corpus(ds, out, min_words=5, max_punct_ratio=1.0,
                           substring_removal_window=8)
    assert report["input_docs"] == 4
    assert report["after_substring_removal"] == 3
    assert report["substring_removed_tokens"] >= 16
    kept = rd.read_parquet(out).to_pandas().set_index("doc_id")
    assert 2 not in kept.index
    assert kept.loc[0, "text"] == texts[0]
    assert shared not in kept.loc[1, "text"]
    assert kept.loc[3, "text"] == texts[3]
    # downstream signals computed on the CUT text
    assert int(kept.loc[1, "n_words"]) == 40


@pytest.mark.usefixtures("ray_session")
def test_curation_ccnet_perplexity_leg(tmp_path):
    """The optional CCNet LM leg: docs bucket per predicted language
    under the trusted-corpus LM; keep=('head',) drops the least
    target-like docs while the planted target-like docs survive."""
    import numpy as np
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.curate import curate_corpus
    from temporal_knowledge_graphs_ray.stages.dsir import fit_hashed_lm

    target = [f"the cat sat on the mat and the cat purred softly {i}"
              for i in range(20)]
    counts = fit_hashed_lm(
        rd.from_arrow(pa.table({
            "doc_id": pa.array(list(range(20)), pa.int64()),
            "text": pa.array(target, pa.string())})),
        num_buckets=4096)
    lm_path = str(tmp_path / "lm.npy")
    np.save(lm_path, counts)

    feline = [f"a cat and another cat sat near the warm mat today {i}"
              for i in range(6)]
    noise = [f"quarterly revenue grew {i} percent amid strong demand "
             f"for industrial machinery and logistics services"
             for i in range(12)]
    texts = feline + noise
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string())}))

    out = str(tmp_path / "curated")
    report = curate_corpus(ds, out, min_words=5, max_punct_ratio=1.0,
                           jaccard_threshold=0.99,
                           ccnet_lm=lm_path, ccnet_keep=("head",))
    assert report["after_quality_filter"] == 18
    # head = best-scoring ~third; all six feline docs are in it
    assert report["after_ccnet_filter"] <= 8
    kept = set(rd.read_parquet(out).to_pandas()["doc_id"])
    assert set(range(6)) <= kept


@pytest.mark.usefixtures("ray_session")
def test_curation_neardup_distributed_above_gate(tmp_path, monkeypatch):
    """Forcing the near-dup cluster gate to 0 routes cluster assignment
    through the distributed connected_components and the drop through a
    distributed anti-join — output must be identical to the driver
    union-find path (VERDICT r4 ask #1, curate leg)."""
    import ray.data as rd

    import temporal_knowledge_graphs_ray.stages.dedup as D
    from temporal_knowledge_graphs_ray.pipelines.curate import curate_corpus

    words = ("alpha beta gamma delta epsilon zeta eta theta iota "
             "kappa lambda mu nu xi omicron pi rho sigma").split()
    rows = []
    did = 0
    for c in range(3):
        base = " ".join(words[c:] + words[:c]) * 3
        for k in range(3):
            rows.append({"doc_id": did,
                         "text": base + f" tail{c} variant {k}"})
            did += 1
    for k in range(6):
        rows.append({"doc_id": did,
                     "text": f"unique document number {k} about "
                             f"{words[k]} {words[k + 1]} only " * 4})
        did += 1

    out_a = str(tmp_path / "driver")
    rep_a = curate_corpus(rd.from_items(rows), out_a, min_words=3,
                          jaccard_threshold=0.5)
    kept_a = (rd.read_parquet(out_a).to_pandas()
              .sort_values("doc_id", ignore_index=True))
    assert rep_a["neardup_dropped"] >= 6  # planted clusters collapsed

    monkeypatch.setattr(D, "_DRIVER_CLUSTER_MAX", 0)
    monkeypatch.setattr(D, "_CC_LOCAL_EDGE_CUTOFF", 0)
    out_b = str(tmp_path / "dist")
    rep_b = curate_corpus(rd.from_items(rows), out_b, min_words=3,
                          jaccard_threshold=0.5)
    kept_b = (rd.read_parquet(out_b).to_pandas()
              .sort_values("doc_id", ignore_index=True))
    assert rep_a == rep_b
    assert kept_a.equals(kept_b)
