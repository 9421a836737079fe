"""Text-analysis stages over a documents table (scale additions).

Each stage is a vectorized / per-batch map with an exact DuckDB SQL oracle
(see functions/textstats.py for the determinism rules).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.textstats import (
    LANG_ORDER,
    detect_language,
    fingerprint,
    quality_signals,
    repetition_signals,
    stopword_counts,
)
from ..functions.tokenize import count_tokens, estimate_chunks


def token_count_stage(ds, text_col: str = "text", id_col: str = "doc_id"):
    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        return pa.Table.from_arrays(
            [batch[id_col],
             pa.array([count_tokens(t) for t in texts], pa.int64())],
            names=[id_col, "n_tokens"],
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=4096)


def estimate_chunks_stage(ds, chunk_size: int = 100, chunk_overlap: int = 10,
                          text_col: str = "text", id_col: str = "doc_id"):
    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        return pa.Table.from_arrays(
            [batch[id_col],
             pa.array(
                 [estimate_chunks(count_tokens(t), chunk_size, chunk_overlap)
                  for t in texts], pa.int64())],
            names=[id_col, "n_chunks"],
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=4096)


def token_stats_stage(ds, chunk_size: int = 100, chunk_overlap: int = 10,
                      text_col: str = "text", id_col: str = "doc_id"):
    """Token count + chunk estimate in one pass (M4): tokenization is the
    shared cost, so the two derived columns come from one kernel call."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        n_tokens = [count_tokens(t) for t in texts]
        return pa.Table.from_arrays(
            [batch[id_col],
             pa.array(n_tokens, pa.int64()),
             pa.array([estimate_chunks(n, chunk_size, chunk_overlap)
                       for n in n_tokens], pa.int64())],
            names=[id_col, "n_tokens", "n_chunks"],
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=4096)


def language_id_stage(ds, text_col: str = "text", id_col: str = "doc_id"):
    """n-gram/stopword-heuristic language ID + per-language counts."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        counts = [stopword_counts(t) for t in texts]
        arrays = [batch[id_col]]
        names = [id_col]
        for lang in LANG_ORDER:
            arrays.append(pa.array([c[lang] for c in counts], pa.int64()))
            names.append(f"c_{lang}")
        arrays.append(pa.array([detect_language(t) for t in texts], pa.string()))
        names.append("lang_pred")
        return pa.Table.from_arrays(arrays, names=names)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=4096)


def quality_stage(ds, text_col: str = "text", id_col: str = "doc_id"):
    def fn(batch: pa.Table) -> pa.Table:
        sigs = [quality_signals(t) for t in batch[text_col].to_pylist()]
        return pa.Table.from_arrays(
            [
                batch[id_col],
                pa.array([s["n_chars"] for s in sigs], pa.int64()),
                pa.array([s["n_words"] for s in sigs], pa.int64()),
                pa.array([s["n_punct"] for s in sigs], pa.int64()),
                pa.array([s["punct_ratio"] for s in sigs], pa.float64()),
                pa.array([s["stop_ratio"] for s in sigs], pa.float64()),
            ],
            names=[id_col, "n_chars", "n_words", "n_punct", "punct_ratio",
                   "stop_ratio"],
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=4096)


def quality_fingerprint_stage(ds, text_col: str = "text",
                              id_col: str = "doc_id"):
    """Quality signals + content fingerprint in one pass (the per-doc
    text-analysis bundle: one read of the text column, all derived cols)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        sigs = [quality_signals(t) for t in texts]
        return pa.Table.from_arrays(
            [
                batch[id_col],
                pa.array([s["n_chars"] for s in sigs], pa.int64()),
                pa.array([s["n_words"] for s in sigs], pa.int64()),
                pa.array([s["n_punct"] for s in sigs], pa.int64()),
                pa.array([s["punct_ratio"] for s in sigs], pa.float64()),
                pa.array([s["stop_ratio"] for s in sigs], pa.float64()),
                pa.array([fingerprint(t) for t in texts], pa.string()),
            ],
            names=[id_col, "n_chars", "n_words", "n_punct", "punct_ratio",
                   "stop_ratio", "fingerprint"],
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=4096)


def text_stats_stage(ds, text_col: str = "text", id_col: str = "doc_id",
                     chunk_size: int = 100, chunk_overlap: int = 10):
    """Language ID + quality signals + fingerprint + token/chunk counts
    in ONE pass over the text column — the full per-document
    text-analysis bundle (language_id, quality_fingerprint AND
    token_stats merged so the driver registry stays within its 50-query
    budget while covering all the operators; one read of the text column
    instead of three)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        counts = [stopword_counts(t) for t in texts]
        sigs = [quality_signals(t) for t in texts]
        n_tokens = [count_tokens(t) for t in texts]
        arrays = [batch[id_col]]
        names = [id_col]
        for lang in LANG_ORDER:
            arrays.append(pa.array([c[lang] for c in counts], pa.int64()))
            names.append(f"c_{lang}")
        arrays.append(pa.array([detect_language(t) for t in texts],
                               pa.string()))
        names.append("lang_pred")
        for key, typ in (("n_chars", pa.int64()), ("n_words", pa.int64()),
                         ("n_punct", pa.int64()),
                         ("punct_ratio", pa.float64()),
                         ("stop_ratio", pa.float64())):
            arrays.append(pa.array([s[key] for s in sigs], typ))
            names.append(key)
        arrays.append(pa.array([fingerprint(t) for t in texts], pa.string()))
        names.append("fingerprint")
        arrays.append(pa.array(n_tokens, pa.int64()))
        names.append("n_tokens")
        arrays.append(pa.array([estimate_chunks(n, chunk_size, chunk_overlap)
                                for n in n_tokens], pa.int64()))
        names.append("n_chunks")
        return pa.Table.from_arrays(arrays, names=names)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=4096)


_REP_COLS = [
    ("n_lines", pa.int64()), ("dup_line_frac", pa.float64()),
    ("dup_line_char_frac", pa.float64()),
    ("n_paras", pa.int64()), ("dup_para_frac", pa.float64()),
    ("dup_para_char_frac", pa.float64()),
    ("top_2gram_char_frac", pa.float64()),
    ("top_3gram_char_frac", pa.float64()),
    ("top_4gram_char_frac", pa.float64()),
]


def repetition_stage(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Gopher-style repetition filter signals per document (duplicate
    line/paragraph fractions, top n-gram char fractions) — a pure
    streaming map, exact DuckDB oracle in tests/test_repetition.py."""

    def fn(batch: pa.Table) -> pa.Table:
        sigs = [repetition_signals(t) for t in batch[text_col].to_pylist()]
        arrays = [batch[id_col]]
        names = [id_col]
        for key, typ in _REP_COLS:
            arrays.append(pa.array([s[key] for s in sigs], typ))
            names.append(key)
        return pa.Table.from_arrays(arrays, names=names)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=2048)


def fingerprint_stage(ds, text_col: str = "text", id_col: str = "doc_id"):
    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        return pa.Table.from_arrays(
            [batch[id_col],
             pa.array([fingerprint(t) for t in texts], pa.string())],
            names=[id_col, "fingerprint"],
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=4096)
