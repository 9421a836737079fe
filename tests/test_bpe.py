"""BPE trainer/encoder tests: textbook example, from-scratch-recount
oracle equality, layout invariance, encode/apply parity, save/load."""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pytest
import ray.data as rd

from temporal_knowledge_graphs_ray.stages.bpe import (
    EOW,
    BpeModel,
    apply_bpe,
    learn_merges,
    train_bpe,
)


def _slow_learn_merges(word_counts, num_merges, min_pair_count=2):
    """Independent oracle: recompute ALL pair counts from scratch each
    round (no incremental bookkeeping)."""
    words = {}
    for w, n in word_counts:
        if w:
            words[tuple(list(w) + [EOW])] = (
                words.get(tuple(list(w) + [EOW]), 0) + int(n))
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, n in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_pair_count:
            break
        merges.append(best)
        a, b = best
        new_words = {}
        for syms, n in words.items():
            out = []
            i = 0
            while i < len(syms):
                if (i < len(syms) - 1 and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_words[key] = new_words.get(key, 0) + n
        words = new_words
    return merges


def test_sennrich_textbook_example():
    # Sennrich et al. 2016 running example
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = learn_merges(wc, num_merges=5)
    assert merges[0] == ("e", "s")       # 9 occurrences
    assert merges[1] == ("es", "t")      # 9
    assert merges[2] == ("est", EOW)     # 9
    assert merges[3] == ("l", "o")       # 7
    assert merges[4] == ("lo", "w")      # 7
    model = BpeModel(merges=merges)
    assert model.encode_word("lowest") == ("low", "est" + EOW)
    assert model.encode_word("newest") == ("n", "e", "w", "est" + EOW)


def test_incremental_equals_recount_oracle():
    # adversarial-ish word set: overlaps ("aaa"), shared prefixes,
    # singletons, ties
    wc = [("aaa", 7), ("aab", 7), ("banana", 4), ("bandana", 4),
          ("analysis", 3), ("anagram", 3), ("zz", 1), ("a", 10),
          ("the", 20), ("then", 9), ("them", 9), ("theme", 2)]
    for nm in (1, 3, 8, 25, 100):
        assert learn_merges(wc, nm) == _slow_learn_merges(wc, nm), nm


def test_merge_counts_stay_exact_under_overlaps():
    # "aaaa" x3: pair (a,a) count 9; after merging, ("aa","aa") count 3
    # and ("aa","</w>")... recount oracle must agree
    wc = [("aaaa", 3), ("aa", 2)]
    assert learn_merges(wc, 10) == _slow_learn_merges(wc, 10)


def test_encode_word_reconstructs_and_is_deterministic():
    wc = [("hello", 5), ("help", 4), ("hell", 3), ("yellow", 6)]
    model = BpeModel(merges=learn_merges(wc, 20))
    for w in ("hello", "help", "yelp", "unseen", "x"):
        enc = model.encode_word(w)
        assert "".join(enc) == w + EOW
        assert model.encode_word(w) == enc


def test_empty_and_trivial_corpora():
    assert learn_merges([], 10) == []
    # single chars: only (c, EOW) pairs exist
    merges = learn_merges([("a", 5), ("b", 1)], 10)
    assert merges == [("a", EOW)]  # (b,EOW) count 1 < min_pair_count


@pytest.fixture()
def docs_ds(ray_session):
    rows = []
    texts = ["the newest estimate", "the lowest estimate",
             "newest of the new", "lower and lower still",
             "the theme of the analysis"]
    for i in range(40):
        rows.append({"doc_id": f"d{i:03d}", "text": texts[i % len(texts)]})
    return rd.from_pandas(pd.DataFrame(rows))


def test_train_bpe_layout_invariance(docs_ds, ray_session):
    m1 = train_bpe(docs_ds, num_merges=30)
    m2 = train_bpe(docs_ds.repartition(7), num_merges=30)
    m3 = train_bpe(docs_ds.repartition(1), num_merges=30)
    assert m1.merges == m2.merges == m3.merges
    assert len(m1.merges) > 5


def test_train_bpe_matches_sequential_counts(docs_ds, ray_session):
    """Distributed word counts feed the same learner as local counts."""
    import re

    df = docs_ds.to_pandas()
    c: Counter = Counter()
    for t in df["text"]:
        c.update(re.findall(r"[a-z0-9]+", t.lower()))
    # (count desc, term asc) — same order train_bpe feeds learn_merges
    wc = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    expected = learn_merges(wc, 30)
    assert train_bpe(docs_ds, num_merges=30).merges == expected


def test_apply_bpe_matches_encode_word(docs_ds, ray_session):
    model = train_bpe(docs_ds, num_merges=25)
    out = apply_bpe(docs_ds, model).to_pandas()
    out = out.sort_values("doc_id", ignore_index=True)
    df = docs_ds.to_pandas().sort_values("doc_id", ignore_index=True)
    import re

    for i in range(len(df)):
        pieces = []
        for w in re.findall(r"[a-z0-9]+", df.loc[i, "text"].lower()):
            pieces.extend(model.encode_word(w))
        assert list(out.loc[i, "pieces"]) == pieces
        assert out.loc[i, "n_pieces"] == len(pieces)
        assert out.loc[i, "doc_id"] == df.loc[i, "doc_id"]


def test_max_words_cap(docs_ds, ray_session):
    """A tiny cap still trains (on the head of the Zipf table) and
    stays deterministic."""
    m1 = train_bpe(docs_ds, num_merges=10, max_words=3)
    m2 = train_bpe(docs_ds.repartition(5), num_merges=10, max_words=3)
    assert m1.merges == m2.merges


def test_save_load_roundtrip(tmp_path):
    wc = [("low", 5), ("lower", 2), ("newest", 6)]
    model = BpeModel(merges=learn_merges(wc, 10))
    p = str(tmp_path / "bpe.json")
    model.save(p)
    loaded = BpeModel.load(p)
    assert loaded.merges == model.merges
    assert loaded.encode_word("lowest") == model.encode_word("lowest")
