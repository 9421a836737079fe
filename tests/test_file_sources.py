"""S1/S2/S3: file dispatch loader, markdown->text, gated PDF plumbing."""

from __future__ import annotations

import pytest

from temporal_knowledge_graphs_ray.functions.markdown_text import (
    markdown_to_text,
)


class TestMarkdownToText:
    def test_headers_paragraphs_emphasis(self):
        md = ("# Title\n\nSome **bold** and *em* text with `code`.\n\n"
              "## Sub ##\n\nNext para.")
        assert markdown_to_text(md) == (
            "Title\nSome bold and em text with code.\nSub\nNext para.")

    def test_links_lists_quotes_fences(self):
        md = ("A [link](https://x.example) here.\n\n"
              "- item one\n- item two\n\n"
              "1. first\n2) second\n\n"
              "> quoted line\n\n"
              "```python\nx = 1\n```\n\n---\n")
        assert markdown_to_text(md) == (
            "A link here.\nitem one\nitem two\nfirst\nsecond\n"
            "quoted line\nx = 1")


from temporal_knowledge_graphs_ray.sources.files import (  # noqa: E402
    FakePdfReader as FakeReader,
)


class TestPdfGate:
    def test_pdf_without_lib_raises_not_implemented(self, tmp_path):
        from temporal_knowledge_graphs_ray.sources.files import load_pdf_text

        p = tmp_path / "x.pdf"
        p.write_bytes(b"%PDF-fake")
        with pytest.raises(NotImplementedError):
            load_pdf_text(str(p))

    def test_page_join_and_skip_semantics_with_fake(self, tmp_path):
        from temporal_knowledge_graphs_ray.sources.files import load_pdf_text

        p = tmp_path / "x.pdf"
        p.write_bytes(b"%PDF-fake")
        # empty pages dropped, failing pages skipped, join = blank line
        assert load_pdf_text(str(p), FakeReader) == "page one\n\npage two"


@pytest.mark.usefixtures("ray_session")
def test_read_documents_dispatch(tmp_path):
    from temporal_knowledge_graphs_ray.sources.files import read_documents

    (tmp_path / "a.txt").write_text("plain text body")
    (tmp_path / "b.md").write_text("# Doc B\n\nHello *world*.")
    (tmp_path / "c.html").write_text(
        "<html><body><p> Hi </p><p>there</p></body></html>")
    (tmp_path / "d.pdf").write_bytes(b"%PDF-fake")

    paths = [str(tmp_path / n) for n in ("a.txt", "b.md", "c.html", "d.pdf")]
    out = read_documents(paths, reader_factory=FakeReader).to_pandas()
    by_name = {r["filename"]: r for _, r in out.iterrows()}
    assert by_name["a.txt"]["text"] == "plain text body"
    assert by_name["a.txt"]["content_type"] == "text"
    assert by_name["b.md"]["text"] == "Doc B\nHello world."
    assert by_name["c.html"]["text"] == "Hi\nthere"
    assert by_name["d.pdf"]["text"] == "page one\n\npage two"
    assert by_name["b.md"]["title"] == "b"
    assert set(out.columns) == {"source", "title", "content_type",
                                "filename", "file_size", "file_extension",
                                "text"}

    with pytest.raises(Exception):
        read_documents([str(tmp_path / "x.docx")]).take_all()


class TestMarkdownFuzz:
    from hypothesis import example, given, settings
    from hypothesis import strategies as st

    @given(st.text(max_size=400))
    # seed corpus: historical contract violations (empty block elements,
    # unicode-linebreak fragments) stay pinned regardless of the draw
    @example("-\t\x1e0")
    @example("# ")
    @example("1. ")
    @example("- ")
    @example("a\x1e\x1eb")
    @example("x\x85\x85y ")
    @settings(max_examples=200, deadline=None)
    def test_markdown_to_text_never_raises(self, md):
        out = markdown_to_text(md)
        assert isinstance(out, str)
        # contract: no blank lines, every line stripped — under BOTH
        # line-break definitions (\n and str.splitlines())
        for line in out.splitlines():
            assert line == line.strip() and line != ""
        if out:
            for line in out.split("\n"):
                assert line == line.strip() and line != ""


class TestMarkdownLineBreaks:
    """Pin the splitlines-vs-\\n divergence decision: block structure is
    parsed on \\n only (Python-Markdown normalizes \\r\\n/\\r then splits
    on \\n — document_loader.py:142-167's chain), while OUTPUT lines are
    normalized so no splitlines()-visible blank survives."""

    def test_unicode_separator_is_not_a_block_boundary(self):
        # \x1e inside a line must not start a new block: '-\t\x1e0' is
        # ONE list item whose body strips to '0' — splitlines() parsing
        # would see fragments '-\t' (empty item) and '0'.
        assert markdown_to_text("-\t\x1e0") == "0"

    def test_crlf_and_cr_normalize(self):
        assert markdown_to_text("# A\r\nb\rc") == "A\nb\nc"

    def test_empty_block_elements_drop(self):
        assert markdown_to_text("# ") == ""
        assert markdown_to_text("#") == ""
        assert markdown_to_text("1. ") == ""
        assert markdown_to_text("- ") == ""
        assert markdown_to_text("> ") == ""

    def test_interior_unicode_breaks_renormalize(self):
        # interior \x1e\x1e would leave a splitlines()-blank; the kernel
        # re-splits and drops it
        assert markdown_to_text("a\x1e\x1eb").splitlines() == ["a", "b"]


class TestMarkdownHeaderEdges:
    """Python-Markdown 3.x ATX semantics: NO whitespace required after
    the hashes (#Header is an h1, unlike CommonMark), lazy content with
    greedy trailing #* stripped, empty headers drop via
    get_text(strip=True)."""

    def test_no_space_header(self):
        assert markdown_to_text("#Header") == "Header"
        assert markdown_to_text("##Sub##") == "Sub"

    def test_seven_plus_hashes_is_empty_header(self):
        # level caps at 6; the 7th hash is absorbed as a trailing
        # closer, leaving an empty h6 that get_text drops
        assert markdown_to_text("#######") == ""
        assert markdown_to_text("####### x") == "# x"

    def test_trailing_closers(self):
        assert markdown_to_text("# x #") == "x"
        assert markdown_to_text("#x #y") == "x #y"
