"""Distributed BPE tokenizer training + application (scale addition —
the tokenizer-training step of an LLM data pipeline; the reference has
no tokenizer surface, its nearest analogue is the token ESTIMATE in
chunking/token_counter.py:10-31).

Recipe (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of
Rare Words with Subword Units", and the shape used by subword-nmt /
SentencePiece / HF tokenizers): BPE merges are learned from the
WORD-FREQUENCY table, not the raw corpus, so the only corpus-sized work
is one distributed word-count aggregation — the same map-side-combined
shape as stages/vocab.py (each block collapses to its distinct words
before anything moves; shuffle volume is distinct-words x blocks, which
Zipf keeps tiny next to token count). The merge loop itself runs over
the bounded ``(word, count)`` table (capped at ``max_words``; the
dropped tail mass is logged) with the classic incremental pair-count
update: only words containing the merged pair are touched per round.

Applying a learned model is a pure streaming ``map_batches`` stage: the
merge-rank dict is built once per actor in ``__init__`` and per-word
encodings are memoised (Zipf again: a handful of distinct words cover
most tokens).

Everything is deterministic: word counts are exact, the merge pick is
(count desc, pair lexicographic asc), and encoding is the standard
lowest-rank-first greedy loop — so re-runs, retries and any partition
layout produce identical merges and identical encodings (tested in
tests/test_bpe.py, including equality with a from-scratch recount
oracle).
"""

from __future__ import annotations

import json
import logging
from collections import Counter
from dataclasses import dataclass, field

import pandas as pd
import pyarrow as pa

from .vocab import term_counts
from .topk import topk_rows

logger = logging.getLogger(__name__)

# End-of-word marker symbol (Sennrich-style): a separate final symbol so
# "est" mid-word and "est</w>" word-finally are distinct merge targets.
EOW = "</w>"

_INF = float("inf")


@dataclass
class BpeModel:
    """A learned BPE model: ordered merge list (rank = list position)."""

    merges: list[tuple[str, str]]
    _ranks: dict[tuple[str, str], int] = field(default=None, repr=False)

    @property
    def ranks(self) -> dict[tuple[str, str], int]:
        if self._ranks is None:
            self._ranks = {pair: i for i, pair in enumerate(self.merges)}
        return self._ranks

    def encode_word(self, word: str) -> tuple[str, ...]:
        """Standard greedy BPE encode: repeatedly merge the
        lowest-rank adjacent pair until none applies."""
        syms = list(word) + [EOW]
        ranks = self.ranks
        while len(syms) > 1:
            best_rank = _INF
            best_pair = None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]), _INF)
                if r < best_rank:
                    best_rank = r
                    best_pair = (syms[i], syms[i + 1])
            if best_pair is None:
                break
            syms = _merge_word(syms, best_pair)
        return tuple(syms)

    def vocab(self) -> list[str]:
        """All symbols producible by the model: single chars seen in
        merges plus every merged symbol, sorted."""
        out = set()
        for a, b in self.merges:
            out.update((a, b, a + b))
        return sorted(out)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"merges": [list(p) for p in self.merges]}, f)

    @classmethod
    def load(cls, path: str) -> "BpeModel":
        with open(path) as f:
            data = json.load(f)
        return cls(merges=[tuple(p) for p in data["merges"]])


def _merge_word(syms: list[str], pair: tuple[str, str]) -> list[str]:
    """Merge all non-overlapping left-to-right occurrences of ``pair``."""
    a, b = pair
    out = []
    i = 0
    n = len(syms)
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _word_pairs(syms: list[str]) -> Counter:
    """Adjacent-pair multiset of one symbol sequence."""
    c: Counter = Counter()
    for i in range(len(syms) - 1):
        c[(syms[i], syms[i + 1])] += 1
    return c


def learn_merges(word_counts: list[tuple[str, int]], num_merges: int,
                 min_pair_count: int = 2) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a (word, count) table with
    incremental pair-count maintenance (only words containing the
    merged pair are re-scanned per round — the subword-nmt trick).

    Pick rule per round: highest total count, ties broken by the
    lexicographically smallest (a, b) pair; stop early when the best
    pair's count drops below ``min_pair_count``.
    """
    words: list[list[str]] = []
    counts: list[int] = []
    for w, n in word_counts:
        if not w:
            continue
        words.append(list(w) + [EOW])
        counts.append(int(n))

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, syms in enumerate(words):
        n = counts[wi]
        for pair, k in _word_pairs(syms).items():
            pair_counts[pair] = pair_counts.get(pair, 0) + k * n
            pair_words.setdefault(pair, set()).add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        # max count, lexicographically smallest pair on ties
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < min_pair_count:
            break
        merges.append(best)
        for wi in sorted(pair_words.get(best, ())):
            old = words[wi]
            new = _merge_word(old, best)
            n = counts[wi]
            diff = _word_pairs(new)
            diff.subtract(_word_pairs(old))
            for pair, dk in diff.items():
                if not dk:
                    continue
                pair_counts[pair] = pair_counts.get(pair, 0) + dk * n
                if pair_counts[pair] <= 0:
                    del pair_counts[pair]
                    pair_words.pop(pair, None)
                elif dk > 0:
                    pair_words.setdefault(pair, set()).add(wi)
            words[wi] = new
        # the merged pair no longer exists anywhere
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
    return merges


def train_bpe(docs, text_col: str = "text", num_merges: int = 200,
              max_words: int = 100_000, min_pair_count: int = 2,
              num_buckets: int = 64) -> BpeModel:
    """Learn a BPE model from a document Dataset.

    Distributed part: exact word counts via stages/vocab.term_counts
    (house ``[a-z0-9]+`` words — consistent with the vocab/token-stat
    operators). The merge loop sees only the top-``max_words`` rows;
    at 100 TB the word-count table is the Zipf-bounded small side, and
    the cap guards pathological corpora (random strings) — the dropped
    tail's token mass is logged, never silently ignored.
    """
    # materialize the REDUCED (term, n) table once: both the top-k
    # selection and the dropped-mass audit below read it, and without
    # this the audit's sum() would re-execute the whole corpus count
    # pass (a second full read at 100 TB)
    counts = term_counts(docs, text_col=text_col,
                         num_buckets=num_buckets).materialize()
    top = topk_rows(counts, ["n", "term"], [True, False],
                    max_words).to_pandas()
    if len(top) == max_words:
        # how much mass the cap dropped (one tiny aggregate over the
        # already-reduced counts table)
        total = counts.sum("n")
        kept = int(top["n"].sum())
        if total and total > kept:
            logger.warning(
                "train_bpe: max_words=%d cap dropped %d/%d token mass "
                "(%.2f%%) from the merge-learning table",
                max_words, total - kept, total,
                100.0 * (total - kept) / total)
    top = top.sort_values(["n", "term"], ascending=[False, True],
                          ignore_index=True)
    pairs = list(zip(top["term"].tolist(),
                     top["n"].astype(int).tolist()))
    return BpeModel(merges=learn_merges(pairs, num_merges,
                                        min_pair_count=min_pair_count))


class BpeEncodeStage:
    """Actor-pool stage: encode each doc's text into BPE pieces.

    The merge-rank dict and the per-word memo live per actor
    (``__init__`` runs once per actor, not per batch); Zipf makes the
    memo hit rate very high, so the hot path is a dict lookup per word.
    Output columns: ``(id_col, pieces: list<string>, n_pieces: int64)``.
    """

    def __init__(self, merges: list[tuple[str, str]],
                 text_col: str = "text", id_col: str = "doc_id"):
        self._model = BpeModel(merges=[tuple(p) for p in merges])
        self._model.ranks  # build eagerly, once per actor
        self._memo: dict[str, tuple[str, ...]] = {}
        self._text_col = text_col
        self._id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        from .vocab import _TOKEN_RE

        memo = self._memo
        encode = self._model.encode_word
        pieces_col: list[list[str]] = []
        n_col: list[int] = []
        for text in t[self._text_col].to_pylist():
            pieces: list[str] = []
            for w in _TOKEN_RE.findall((text or "").lower()):
                enc = memo.get(w)
                if enc is None:
                    enc = encode(w)
                    # bounded per-actor memo: a heavy distinct-word tail
                    # (random strings / unicode soup — the pathology
                    # train_bpe's max_words cap documents) must not grow
                    # a long-lived encode actor without limit (the same
                    # cap rationale as functions/embed._GRAM_HASH_CACHE)
                    if len(memo) < 1 << 20:
                        memo[w] = enc
                pieces.extend(enc)
            pieces_col.append(pieces)
            n_col.append(len(pieces))
        return pa.table({
            self._id_col: t[self._id_col],
            "pieces": pa.array(pieces_col, pa.list_(pa.string())),
            "n_pieces": pa.array(n_col, pa.int64()),
        })


def apply_bpe(docs, model: BpeModel, text_col: str = "text",
              id_col: str = "doc_id", concurrency: int = 4,
              batch_size: int = 256):
    """Streaming BPE encoding of a corpus: one actor-pool map pass,
    no shuffle. Returns (id_col, pieces, n_pieces)."""
    return docs.select_columns([id_col, text_col]).map_batches(
        BpeEncodeStage,
        fn_constructor_kwargs={"merges": model.merges,
                               "text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
