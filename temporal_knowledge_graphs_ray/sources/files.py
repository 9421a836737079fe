"""File-based document source with format dispatch (S1/S2/S3).

The reference's DocumentLoader maps file suffix -> loader
(/root/reference/src/temporal_kg_rag/ingestion/document_loader.py:20-102):
.pdf -> PyPDF2 page-text join, .md/.markdown -> markdown->html->text,
.html/.htm -> bs4 get_text, .txt -> raw read — then wraps the result in a
Document with (filename, file_size, file_extension) metadata.

Rebuilt as a Ray Data source: paths become a Dataset and EVERY file is
loaded inside ``map_batches`` tasks (the driver never opens a file), so a
million-file corpus loads with full-cluster parallelism. PDF extraction
is import-gated: PyPDF2 is absent from this container, so the PDF branch
raises NotImplementedError unless a reader factory is injected (the Ray
plumbing and the page-join semantics are real and tested with a fake).
"""

from __future__ import annotations

import os

import pyarrow as pa

SUPPORTED_FORMATS = {
    ".pdf": "pdf",
    ".md": "markdown",
    ".markdown": "markdown",
    ".txt": "text",
    ".html": "html",
    ".htm": "html",
}

DOCS_SCHEMA = pa.schema([
    ("source", pa.string()),
    ("title", pa.string()),
    ("content_type", pa.string()),
    ("filename", pa.string()),
    ("file_size", pa.int64()),
    ("file_extension", pa.string()),
    ("text", pa.large_string()),
])


class _FakePdfPage:
    def __init__(self, text: str, fail: bool = False):
        self._t, self._fail = text, fail

    def extract_text(self) -> str:
        if self._fail:
            raise RuntimeError("bad page")
        return self._t


class FakePdfReader:
    """Deterministic stand-in for PyPDF2.PdfReader (absent from this
    container) — same convention as the multimodal decode stub: the Ray
    plumbing, dispatch and page-join/skip semantics are real and tested;
    only the byte-level PDF parse is faked. Yields a fixed page set
    including an empty and a failing page to exercise the skip paths."""

    def __init__(self, fileobj):
        self.pages = [_FakePdfPage("page one"), _FakePdfPage(""),
                      _FakePdfPage("boom", fail=True),
                      _FakePdfPage("page two")]


def load_pdf_text(path: str, reader_factory=None) -> str:
    """PDF -> text: per-page extract_text, failed pages skipped, pages
    joined with blank lines (reference document_loader.py:104-140).

    ``reader_factory(fileobj) -> reader`` defaults to ``PyPDF2.PdfReader``
    when importable, else the vendored pure-stdlib ``MiniPdfReader``
    (functions/pdf_text.py) which handles the uncompressed/FlateDecode
    simple-PDF subset and raises NotImplementedError outside it —
    inject reader_factory= to use any other backend.
    """
    if reader_factory is None:
        try:
            import PyPDF2  # noqa: F401

            reader_factory = PyPDF2.PdfReader
        except ImportError:
            from ..functions.pdf_text import MiniPdfReader

            reader_factory = MiniPdfReader
    parts = []
    with open(path, "rb") as f:
        reader = reader_factory(f)
        for page in reader.pages:
            try:
                t = page.extract_text()
            except Exception:  # noqa: BLE001 - reference skips bad pages
                continue
            if t:
                parts.append(t)
    return "\n\n".join(parts)


def load_file_text(path: str, reader_factory=None) -> tuple[str, str]:
    """path -> (content_type, text), the reference's dispatch."""
    from ..functions.html_text import extract_text_from_html
    from ..functions.markdown_text import markdown_to_text

    suffix = os.path.splitext(path)[1].lower()
    if suffix not in SUPPORTED_FORMATS:
        raise ValueError(f"Unsupported file format: {suffix}. "
                         f"Supported formats: {list(SUPPORTED_FORMATS)}")
    ctype = SUPPORTED_FORMATS[suffix]
    if ctype == "pdf":
        return ctype, load_pdf_text(path, reader_factory)
    with open(path, "rb") as f:
        raw = f.read()
    if ctype == "html":
        return ctype, extract_text_from_html(raw)
    text = raw.decode("utf-8")
    if ctype == "markdown":
        return ctype, markdown_to_text(text)
    return ctype, text


def read_documents(paths: list[str], *, parallelism: int = 0,
                   reader_factory=None, on_error: str = "raise"):
    """Dispatch loader as a Ray Dataset: one row per file with the
    reference's Document metadata plus the extracted text.

    ``on_error``: ``"raise"`` (default — the reference re-raises after
    logging, document_loader.py:138-140) fails the job on the first
    unreadable file; ``"skip"`` drops unreadable files and keeps going —
    at web scale one poison PDF among a million files must not kill a
    cluster job (the skip is logged per file; count the output rows
    against ``len(paths)`` to audit drops).
    """
    import logging

    import ray
    import ray.data as rd

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', "
                         f"got {on_error!r}")
    if not parallelism:
        ncpu = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        parallelism = max(8, min(len(paths), ncpu * 2))

    def load(batch: dict) -> pa.Table:
        rows = []
        for p in batch["item"]:
            p = str(p)
            try:
                ctype, text = load_file_text(p, reader_factory)
            except Exception:
                if on_error == "raise":
                    raise
                logging.getLogger(__name__).warning(
                    "read_documents: skipping unreadable file %s", p,
                    exc_info=True)
                continue
            rows.append({
                "source": os.path.abspath(p),
                "title": os.path.splitext(os.path.basename(p))[0],
                "content_type": ctype,
                "filename": os.path.basename(p),
                "file_size": os.path.getsize(p),
                "file_extension": os.path.splitext(p)[1].lower(),
                "text": text,
            })
        return pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)

    return (
        rd.from_items(paths, override_num_blocks=parallelism)
        .map_batches(load, batch_format="numpy", batch_size=64)
    )
