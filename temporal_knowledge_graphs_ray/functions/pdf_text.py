"""Minimal pure-stdlib PDF text extraction (S2 byte-level backend).

The reference extracts PDF text via ``PyPDF2.PdfReader`` — per-page
``page.extract_text()``, empty pages dropped, failing pages skipped,
pages joined with blank lines
(/root/reference/src/temporal_kg_rag/ingestion/document_loader.py:104-140).
PyPDF2 is absent from this container, so this module vendors a minimal
reader for the SIMPLE-PDF SUBSET — uncompressed or FlateDecode content
streams, classic AND compressed (PDF 1.5+ xref-stream / object-stream)
cross-reference layouts, standard-font Latin-1/UTF-16BE string
encodings:

- indirect objects are discovered by a linear ``N G obj`` scan (works
  for incremental updates too: later definitions of the same object id
  win, matching xref-table precedence for appended revisions), then
  /Type /ObjStm containers are decoded and their compressed objects
  filled in (_expand_object_streams — direct definitions take
  precedence; the xref stream's index is never needed because
  discovery is scan-based, so /XRef objects only feed the encryption
  check),
- the page order follows the catalog's /Pages tree (/Kids recursion);
  documents without a parseable tree fall back to /Type /Page objects
  in file order,
- content streams are tokenized and the text-showing operators
  (Tj ' \" TJ) emit their strings; the line-advancing operators
  (Td/TD with a vertical component, T*, Tm with a new y, ' \") emit a
  newline — the same visible contract PyPDF2's extractor produces for
  simple one-column pages (recorded in tests/test_pdf_text.py),
- anything outside the subset (encryption, LZW/DCT/ASCII85 filters)
  raises NotImplementedError — an honest capability gate, not a wrong
  answer; load_pdf_text's per-page skip semantics then apply, or the
  whole reader refuses at construction.

``MiniPdfReader`` is shaped like ``PyPDF2.PdfReader`` (``.pages`` with
``.extract_text()``) so it drops into ``load_pdf_text``'s
``reader_factory`` seam: PyPDF2 is still preferred when importable.
"""

from __future__ import annotations

import re
import zlib

__all__ = ["MiniPdfReader", "MiniPdfPage"]

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num


class _Lexer:
    """Positional tokenizer over raw PDF bytes (object syntax subset)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = self.data[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # '%' comment to end of line
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def parse_value(self):
        """Parse one PDF object value at the cursor."""
        self._skip_ws()
        d = self.data
        p = self.pos
        if p >= len(d):
            raise ValueError("EOF in object")
        c = d[p]
        if d.startswith(b"<<", p):
            return self._parse_dict()
        if c == 0x3C:  # '<' hex string
            return self._parse_hex_string()
        if c == 0x28:  # '(' literal string
            return self._parse_literal_string()
        if c == 0x2F:  # '/' name
            return self._parse_name()
        if c == 0x5B:  # '['
            return self._parse_array()
        if d.startswith(b"true", p):
            self.pos = p + 4
            return True
        if d.startswith(b"false", p):
            self.pos = p + 5
            return False
        if d.startswith(b"null", p):
            self.pos = p + 4
            return None
        return self._parse_number_or_ref()

    def _parse_dict(self) -> dict:
        self.pos += 2
        out: dict = {}
        while True:
            self._skip_ws()
            if self.pos >= len(self.data):
                raise ValueError("EOF in dict")
            if self.data.startswith(b">>", self.pos):
                self.pos += 2
                return out
            key = self._parse_name()
            out[key] = self.parse_value()

    def _parse_array(self) -> list:
        self.pos += 1
        out: list = []
        while True:
            self._skip_ws()
            if self.pos >= len(self.data):
                raise ValueError("EOF in array")
            if self.data[self.pos] == 0x5D:
                self.pos += 1
                return out
            out.append(self.parse_value())

    def _parse_name(self) -> str:
        if self.pos >= len(self.data):
            raise ValueError("EOF where a name was expected")
        if self.data[self.pos] != 0x2F:
            raise ValueError(f"expected name at {self.pos}")
        self.pos += 1
        start = self.pos
        d, n = self.data, len(self.data)
        while self.pos < n and d[self.pos] not in _WS \
                and d[self.pos] not in _DELIM:
            self.pos += 1
        raw = d[start:self.pos]
        # #xx hex escapes in names
        if b"#" in raw:
            raw = re.sub(rb"#([0-9A-Fa-f]{2})",
                         lambda m: bytes([int(m.group(1), 16)]), raw)
        return raw.decode("latin-1")

    def _parse_literal_string(self) -> bytes:
        d = self.data
        self.pos += 1
        out = bytearray()
        depth = 1
        n = len(d)
        while self.pos < n:
            c = d[self.pos]
            if c == 0x5C:  # backslash escape
                self.pos += 1
                if self.pos >= n:
                    break
                e = d[self.pos]
                if e in b"nrtbf":
                    out.append({0x6E: 10, 0x72: 13, 0x74: 9,
                                0x62: 8, 0x66: 12}[e])
                    self.pos += 1
                elif e in b"()\\":
                    out.append(e)
                    self.pos += 1
                elif 0x30 <= e <= 0x37:  # octal \ddd (1-3 digits)
                    oct_digits = bytearray()
                    while len(oct_digits) < 3 and self.pos < n \
                            and 0x30 <= d[self.pos] <= 0x37:
                        oct_digits.append(d[self.pos])
                        self.pos += 1
                    out.append(int(oct_digits.decode(), 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if e == 0x0D and self.pos < n and d[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos += 1
                    return bytes(out)
                out.append(c)
                self.pos += 1
            else:
                out.append(c)
                self.pos += 1
        raise ValueError("unterminated literal string")

    def _parse_hex_string(self) -> bytes:
        self.pos += 1
        end = self.data.find(b">", self.pos)
        if end < 0:
            raise ValueError("unterminated hex string")
        hexs = re.sub(rb"\s", b"", self.data[self.pos:end])
        self.pos = end + 1
        if len(hexs) % 2:
            hexs += b"0"
        return bytes.fromhex(hexs.decode("latin-1"))

    def _parse_number_or_ref(self):
        d = self.data
        start = self.pos
        n = len(d)
        while self.pos < n and d[self.pos] not in _WS \
                and d[self.pos] not in _DELIM:
            self.pos += 1
        tok = d[start:self.pos]
        try:
            if b"." in tok:
                return float(tok)
            num = int(tok)
        except ValueError as e:
            raise ValueError(f"bad token {tok!r} at {start}") from e
        # lookahead: "N G R" is an indirect reference
        save = self.pos
        self._skip_ws()
        gstart = self.pos
        while self.pos < n and d[self.pos] not in _WS \
                and d[self.pos] not in _DELIM:
            self.pos += 1
        gtok = d[gstart:self.pos]
        if gtok.isdigit():
            self._skip_ws()
            if self.pos < n and d[self.pos] == 0x52 \
                    and (self.pos + 1 == n
                         or d[self.pos + 1] in _WS
                         or d[self.pos + 1] in _DELIM):
                self.pos += 1
                return _Ref(num)
        self.pos = save
        return num


def _decode_text_bytes(raw: bytes) -> str:
    """PDF string bytes -> str: UTF-16BE when BOM'd, else Latin-1 (the
    standard-font assumption for the simple subset)."""
    if raw.startswith(b"\xfe\xff"):
        return raw[2:].decode("utf-16-be", errors="replace")
    return raw.decode("latin-1")


class _Doc:
    def __init__(self, data: bytes):
        if not data.lstrip()[:5].startswith(b"%PDF-"):
            raise NotImplementedError("not a PDF (missing %PDF- header)")
        self.data = data
        self.objects: dict[int, tuple[dict | object, bytes | None]] = {}
        self._scan_order: list[int] = []
        self._scan_objects()
        if not self.objects:
            raise NotImplementedError(
                "no parseable objects (exotic layout is outside the "
                "vendored simple-PDF subset)")
        self._check_encryption()
        self._expand_object_streams()

    def _check_encryption(self) -> None:
        """Refuse only when an /Encrypt KEY exists in a trailer dict
        (classic layout) or an /XRef-type object dict (xref-stream
        trailer) — page text merely MENTIONING '/Encrypt' must not
        refuse a readable document."""
        for m in re.finditer(rb"trailer\b", self.data):
            try:
                d = _Lexer(self.data, m.end()).parse_value()
            except (ValueError, RecursionError, IndexError):
                # trailer dict the lexer can't parse: fall back to a
                # conservative byte-level check near the trailer — a
                # malformed-but-encrypted PDF must still refuse rather
                # than fall through and emit ciphertext as text. The
                # pattern requires a dict-KEY shape (/Encrypt N G R or
                # an inline dict), so page text merely MENTIONING
                # '/Encrypt' still parses (the method's contract).
                if re.search(rb"/Encrypt(?:\s+\d+\s+\d+\s+R|\s*<<)",
                             self.data[m.end():m.end() + 2048]):
                    raise NotImplementedError(
                        "encrypted PDFs are outside the vendored "
                        "subset (malformed trailer, /Encrypt key "
                        "nearby)")
                continue
            if isinstance(d, dict) and "Encrypt" in d:
                raise NotImplementedError(
                    "encrypted PDFs are outside the vendored subset")
        for _num, (val, _s) in self.objects.items():
            if isinstance(val, dict) and val.get("Type") == "XRef" \
                    and "Encrypt" in val:
                raise NotImplementedError(
                    "encrypted PDFs are outside the vendored subset")

    def _scan_objects(self) -> None:
        data = self.data
        for m in _OBJ_RE.finditer(data):
            num = int(m.group(1))
            try:
                lex = _Lexer(data, m.end())
                val = lex.parse_value()
            except (ValueError, RecursionError, IndexError, KeyError):
                # malformed object: skip it, keep scanning — the honest
                # gates (NotImplementedError) fire later if nothing
                # parseable remains
                continue
            stream: bytes | None = None
            lex._skip_ws()
            if data.startswith(b"stream", lex.pos):
                p = lex.pos + len(b"stream")
                if data.startswith(b"\r\n", p):
                    p += 2
                elif data.startswith(b"\n", p) or data.startswith(b"\r", p):
                    p += 1
                length = val.get("Length") if isinstance(val, dict) else None
                if isinstance(length, _Ref):
                    length = self._peek_int_object(length.num)
                if isinstance(length, int) and 0 <= length \
                        and p + length <= len(data) \
                        and data[p + length:p + length + 20].lstrip()[:9] \
                            == b"endstream":
                    stream = data[p:p + length]
                else:
                    end = data.find(b"endstream", p)
                    if end < 0:
                        continue
                    stream = data[p:end].rstrip(b"\r\n")
            # later definitions of the same id win (incremental updates)
            self.objects[num] = (val, stream)
            self._scan_order.append(num)

    def _peek_int_object(self, num: int) -> int | None:
        """Resolve an indirect /Length before the full scan finished."""
        got = self.objects.get(num)
        if got is not None and isinstance(got[0], int):
            return got[0]
        m = re.search(rb"(?m)^\s*%d\s+\d+\s+obj\b" % num, self.data)
        if m is None:
            return None
        try:
            v = _Lexer(self.data, m.end()).parse_value()
        except ValueError:
            return None
        return v if isinstance(v, int) else None

    def resolve(self, v):
        seen = 0
        while isinstance(v, _Ref):
            v = self.objects.get(v.num, (None, None))[0]
            seen += 1
            if seen > 32:
                raise NotImplementedError("reference cycle")
        return v

    def _decode_stream(self, val, stream: bytes) -> bytes:
        """Apply the object's /Filter chain (FlateDecode-or-nothing
        subset; optional /DecodeParms predictors for xref streams are
        never needed here because object DISCOVERY is scan-based)."""
        filt = self.resolve(val.get("Filter")) if isinstance(val, dict) \
            else None
        if filt is None:
            return stream
        filters = filt if isinstance(filt, list) else [filt]
        for f in filters:
            f = self.resolve(f)
            if f == "FlateDecode":
                try:
                    stream = zlib.decompress(stream)
                except zlib.error as e:
                    raise ValueError(f"corrupt FlateDecode stream: {e}") \
                        from e
            else:
                raise NotImplementedError(
                    f"/{f} filter is outside the vendored subset "
                    "(FlateDecode / uncompressed only)")
        return stream

    def stream_of(self, ref) -> bytes:
        if not isinstance(ref, _Ref):
            raise NotImplementedError("inline /Contents value")
        val, stream = self.objects.get(ref.num, (None, None))
        if stream is None:
            raise NotImplementedError(f"object {ref.num} has no stream")
        return self._decode_stream(val, stream)

    def _expand_object_streams(self) -> None:
        """PDF 1.5+ compressed objects (/Type /ObjStm): each container's
        decoded stream holds /N (objnum, offset) integer pairs up to
        /First, then the serialized objects themselves (no obj/endobj
        wrappers; stream-bearing objects are forbidden inside by spec).
        Discovery stays scan-based — the xref STREAM (/Type /XRef) is
        parsed only for its dict (encryption check); its index is not
        needed. Precedence: a DIRECT definition of an object number
        always wins (classic incremental updates append direct
        objects); among containers, the later one in file order wins.
        A container with an out-of-subset filter raises the honest
        NotImplementedError gate; a CORRUPT container is skipped like
        any malformed object."""
        direct = set(self.objects)
        compressed: dict[int, object] = {}
        for num in self._scan_order:
            val, stream = self.objects.get(num, (None, None))
            if not (isinstance(val, dict) and val.get("Type") == "ObjStm"
                    and stream is not None):
                continue
            try:
                # resolve the container dict's references FIRST so a
                # reference cycle or dangling ref anywhere in it reads
                # as corruption (skip) — only a genuinely out-of-subset
                # NAMED filter may refuse the document via the
                # _decode_stream gate below
                filt = self.resolve(val.get("Filter"))
                if isinstance(filt, list):
                    if any(self.resolve(x) is None for x in filt):
                        continue  # dangling ref inside /Filter list
                elif val.get("Filter") is not None and filt is None:
                    continue  # dangling /Filter ref
                n = self.resolve(val.get("N"))
                first = self.resolve(val.get("First"))
            except NotImplementedError:
                continue  # reference cycle in the dict: corrupt, skip
            try:
                data = self._decode_stream(val, stream)
            except ValueError:
                continue  # corrupt container: degrade, don't refuse
            if not isinstance(n, int) or not isinstance(first, int) \
                    or not 0 <= first <= len(data):
                continue
            ints = [int(x) for x in re.findall(rb"\d+", data[:first])]
            for i in range(min(n, len(ints) // 2)):
                objnum, off = ints[2 * i], ints[2 * i + 1]
                try:
                    v = _Lexer(data, first + off).parse_value()
                except (ValueError, RecursionError, IndexError, KeyError):
                    continue
                compressed[objnum] = v
        for objnum, v in compressed.items():
            if objnum not in direct:
                self.objects[objnum] = (v, None)

    def page_objects(self) -> list[dict]:
        """Pages in catalog-tree order; file order as the fallback."""
        root = None
        for _num, (val, _s) in sorted(self.objects.items()):
            if isinstance(val, dict) \
                    and self.resolve(val.get("Type")) == "Catalog":
                root = val
                break
        pages: list[dict] = []
        if root is not None:
            try:
                self._walk_pages(self.resolve(root.get("Pages")), pages, 0)
            except (NotImplementedError, AttributeError):
                pages = []
        if pages:
            return pages
        return [val for _num, (val, _s) in sorted(self.objects.items())
                if isinstance(val, dict)
                and self.resolve(val.get("Type")) == "Page"]

    def _walk_pages(self, node, out: list, depth: int) -> None:
        if depth > 64 or not isinstance(node, dict):
            return
        t = self.resolve(node.get("Type"))
        if t == "Page":
            out.append(node)
            return
        for kid in self.resolve(node.get("Kids")) or []:
            self._walk_pages(self.resolve(kid), out, depth + 1)


# content-stream token pattern: strings / hex strings / arrays handled
# by the lexer; names, numbers and operators matched here
_OP_RE = re.compile(rb"[^\s()<>\[\]{}/%]+")


def _extract_stream_text(content: bytes) -> str:
    """Text-showing subset of the content-stream grammar.

    Emits the strings of Tj ' \" TJ in stream order; emits a newline
    when the text cursor moves to a new line (Td/TD with ty != 0, T*,
    Tm with a changed y, and the implicit next-line of ' and \").
    Matches PyPDF2's visible output for simple one-column pages.
    """
    lex = _Lexer(content)
    parts: list[str] = []
    stack: list = []  # operands of the pending operator
    last_ty: float | None = None

    def newline() -> None:
        if parts and not parts[-1].endswith("\n"):
            parts.append("\n")

    data = content
    n = len(data)
    while True:
        lex._skip_ws()
        if lex.pos >= n:
            break
        c = data[lex.pos]
        if c == 0x28 or c == 0x3C or c == 0x5B or c == 0x2F:
            try:
                stack.append(lex.parse_value())
            except (ValueError, IndexError):
                # truncated/garbled tail: keep the text gathered so far
                break
            continue
        m = _OP_RE.match(data, lex.pos)
        if m is None:
            lex.pos += 1
            continue
        tok = m.group(0)
        lex.pos = m.end()
        try:
            stack.append(float(tok) if b"." in tok else int(tok))
            continue
        except ValueError:
            pass
        op = tok
        if op == b"Tj" and stack and isinstance(stack[-1], bytes):
            parts.append(_decode_text_bytes(stack[-1]))
        elif op == b"'" and stack and isinstance(stack[-1], bytes):
            newline()
            parts.append(_decode_text_bytes(stack[-1]))
        elif op == b'"' and stack and isinstance(stack[-1], bytes):
            newline()
            parts.append(_decode_text_bytes(stack[-1]))
        elif op == b"TJ" and stack and isinstance(stack[-1], list):
            for piece in stack[-1]:
                if isinstance(piece, bytes):
                    parts.append(_decode_text_bytes(piece))
        elif op in (b"Td", b"TD") and len(stack) >= 2 \
                and isinstance(stack[-1], (int, float)):
            if float(stack[-1]) != 0.0:
                newline()
        elif op == b"T*":
            newline()
        elif op == b"Tm" and len(stack) >= 6 \
                and isinstance(stack[-1], (int, float)):
            ty = float(stack[-1])
            if last_ty is not None and ty != last_ty:
                newline()
            last_ty = ty
        elif op == b"BT":
            last_ty = None
        stack.clear()
    return "".join(parts).strip("\n")


class MiniPdfPage:
    """Duck-typed PyPDF2 page: ``extract_text()``."""

    def __init__(self, doc: _Doc, page: dict):
        self._doc = doc
        self._page = page

    def extract_text(self) -> str:
        contents = self._page.get("Contents")
        if contents is None:
            return ""
        resolved = self._doc.resolve(contents) \
            if isinstance(contents, _Ref) else contents
        refs = contents if isinstance(contents, _Ref) else None
        texts: list[str] = []
        if isinstance(resolved, list):
            for ref in resolved:
                texts.append(_extract_stream_text(self._doc.stream_of(ref)))
        else:
            texts.append(_extract_stream_text(self._doc.stream_of(refs)))
        return "\n".join(t for t in texts if t)


class MiniPdfReader:
    """Duck-typed PyPDF2.PdfReader for the simple-PDF subset.

    Raises NotImplementedError at construction for documents outside
    the subset (non-PDF bytes, encryption, no parseable objects), and
    per page for unsupported stream filters — so ``load_pdf_text``'s
    skip-failing-pages semantics degrade exactly like the reference's.
    """

    def __init__(self, fileobj):
        data = fileobj.read() if hasattr(fileobj, "read") else bytes(fileobj)
        self._doc = _Doc(data)
        self.pages = [MiniPdfPage(self._doc, p)
                      for p in self._doc.page_objects()]
