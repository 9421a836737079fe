"""Chunking kernel — pure function of (text, config).

Replicates the reference's two strategies
(/root/reference/src/temporal_kg_rag/ingestion/chunker.py):

- semantic (chunker.py:92-178): split into sentences; greedily pack
  sentences into chunks of <= chunk_size tokens; when a chunk closes, carry
  a sentence-granular overlap built backwards from the end of the closed
  chunk until adding one more sentence would exceed chunk_overlap tokens
  (chunker.py:145-160); a single sentence longer than chunk_size is split
  into fixed token windows (chunker.py:119-134 -> :235-268). Sentences in a
  chunk are joined with " " (chunker.py:122, :139).
- fixed (chunker.py:195-233): fixed token windows of chunk_size with stride
  chunk_size - chunk_overlap, decoded back to text.

"Tokens" are this engine's canonical regex tokens (functions/tokenize.py);
"decode" of a token window is the source substring spanning the window's
first and last token (exact for our tokenizer since tokens never overlap).
"""

from __future__ import annotations

from dataclasses import dataclass

from .sentences import split_sentences
from .tokenize import count_tokens, token_spans


@dataclass(frozen=True)
class ChunkRow:
    chunk_index: int
    text: str
    token_count: int


def _window_split(text: str, chunk_size: int, chunk_overlap: int,
                  start_index: int) -> list[ChunkRow]:
    """Fixed token windows over one text (reference chunker.py:235-268)."""
    spans = token_spans(text)
    out: list[ChunkRow] = []
    idx = start_index
    start = 0
    stride = chunk_size - chunk_overlap
    while start < len(spans):
        end = min(start + chunk_size, len(spans))
        piece = text[spans[start][0]:spans[end - 1][1]]
        out.append(ChunkRow(idx, piece, count_tokens(piece)))
        idx += 1
        start += stride
    return out


def chunk_text(
    text: str,
    chunk_size: int = 1000,
    chunk_overlap: int = 100,
    strategy: str = "semantic",
) -> list[ChunkRow]:
    """Chunk one document's text. Deterministic; no I/O."""
    if strategy == "fixed":
        return _window_split(text, chunk_size, chunk_overlap, 0)
    if strategy != "semantic":
        raise ValueError(f"Unknown chunking strategy: {strategy}")

    sentences = split_sentences(text)
    chunks: list[ChunkRow] = []
    current: list[str] = []
    current_tokens = 0
    chunk_index = 0

    for sentence in sentences:
        sentence_tokens = count_tokens(sentence)

        if sentence_tokens > chunk_size:
            # flush current, then window-split the oversized sentence
            if current:
                joined = " ".join(current)
                chunks.append(ChunkRow(chunk_index, joined, count_tokens(joined)))
                chunk_index += 1
                current = []
                current_tokens = 0
            long_chunks = _window_split(sentence, chunk_size, chunk_overlap, chunk_index)
            chunks.extend(long_chunks)
            chunk_index += len(long_chunks)
            continue

        if current_tokens + sentence_tokens > chunk_size and current:
            joined = " ".join(current)
            chunks.append(ChunkRow(chunk_index, joined, count_tokens(joined)))
            chunk_index += 1
            # sentence-granular overlap, built backwards (chunker.py:145-160)
            overlap: list[str] = []
            overlap_tokens = 0
            for sent in reversed(current):
                sent_tokens = count_tokens(sent)
                if overlap_tokens + sent_tokens <= chunk_overlap:
                    overlap.insert(0, sent)
                    overlap_tokens += sent_tokens
                else:
                    break
            current = overlap + [sentence]
            current_tokens = overlap_tokens + sentence_tokens
        else:
            current.append(sentence)
            current_tokens += sentence_tokens

    if current:
        joined = " ".join(current)
        chunks.append(ChunkRow(chunk_index, joined, count_tokens(joined)))

    return chunks
