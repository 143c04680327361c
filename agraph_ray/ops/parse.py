"""Document parsing — the processor registry as batch UDFs.

Re-expresses the reference's DocumentProcessor family over *rows* instead
of files: each row carries raw content plus a format tag, and one
``map_batches`` stage dispatches to the right parser (the factory's
extension routing, agraph/processer/factory.py:24-156).

Parsers (observable behaviour of the reference, no external deps):
- text/markdown: markdown stripping + frontmatter removal
  (agraph/processer/text_processor.py:96-159,237-265)
- json: recursive text-value extraction, binary-guard
  (agraph/processer/json_processor.py:177-232)
- csv: delimiter sniff + "col: val | col: val" row formatting
  (agraph/processer/spreadsheet_processor.py:137-204)
- html: tag stripping, script/style removal
  (agraph/processer/html_processor.py:17-379 semantics via stdlib
  HTMLParser — BeautifulSoup not available here)

PDF / Word / spreadsheet binary formats are parsed by the stdlib
implementations in ``officefmt`` (zipfile + ElementTree for docx/xlsx,
zlib + a text-operator evaluator for common-case PDF); when the real
libraries (pypdf / python-docx / openpyxl) are importable they are
preferred behind the same registry slots. Legacy .doc/.xls raise
NotImplementedError with the dependency named (binary OLE formats need
antiword/xlrd), keeping the dispatch surface complete.
"""

from __future__ import annotations

import csv
import io
import json
import re
from html.parser import HTMLParser
from typing import Callable, Dict, List

import pyarrow as pa

_MD_PATTERNS = [
    (re.compile(r"^---\n.*?\n---\n", re.DOTALL), ""),          # frontmatter
    (re.compile(r"```.*?```", re.DOTALL), ""),                 # code blocks
    (re.compile(r"`([^`]*)`"), r"\1"),                         # inline code
    (re.compile(r"!\[([^\]]*)\]\([^)]*\)"), r"\1"),            # images
    (re.compile(r"\[([^\]]*)\]\([^)]*\)"), r"\1"),             # links
    (re.compile(r"^#{1,6}\s*", re.MULTILINE), ""),             # headings
    (re.compile(r"(\*\*|__)(.*?)\1"), r"\2"),                  # bold
    (re.compile(r"(\*|_)(.*?)\1"), r"\2"),                     # italics
    (re.compile(r"^\s*[-*+]\s+", re.MULTILINE), ""),           # bullets
    (re.compile(r"^\s*\d+\.\s+", re.MULTILINE), ""),           # numbered
    (re.compile(r"^\s*>\s?", re.MULTILINE), ""),               # quotes
    (re.compile(r"\n{3,}"), "\n\n"),
]


def parse_markdown(content: str) -> str:
    out = content
    for pat, repl in _MD_PATTERNS:
        out = pat.sub(repl, out)
    return out.strip()


def parse_text(content: str) -> str:
    return content.strip()


def _json_texts(obj, out: List[str]):
    """Recursive text-value walk (json_processor.py:199-232)."""
    if isinstance(obj, str):
        if obj.strip():
            out.append(obj.strip())
    elif isinstance(obj, dict):
        for v in obj.values():
            _json_texts(v, out)
    elif isinstance(obj, list):
        for v in obj:
            _json_texts(v, out)


def parse_json(content: str) -> str:
    try:
        obj = json.loads(content)
    except json.JSONDecodeError:
        # jsonl fallback: parse line by line
        texts: List[str] = []
        for line in content.splitlines():
            line = line.strip()
            if not line:
                continue
            try:
                _json_texts(json.loads(line), texts)
            except json.JSONDecodeError:
                continue
        return "\n".join(texts)
    texts = []
    _json_texts(obj, texts)
    return "\n".join(texts)


def parse_csv(content: str) -> str:
    """Header-aware "col: val | col: val" rendering
    (spreadsheet_processor.py:137-204)."""
    try:
        dialect = csv.Sniffer().sniff(content[:4096])
    except csv.Error:
        dialect = csv.excel
    rows = list(csv.reader(io.StringIO(content), dialect))
    if not rows:
        return ""
    header, out = rows[0], []
    for row in rows[1:]:
        out.append(" | ".join(f"{h}: {v}" for h, v in zip(header, row)))
    return "\n".join(out)


class _TextExtractor(HTMLParser):
    SKIP = {"script", "style"}

    def __init__(self):
        super().__init__()
        self.parts: List[str] = []
        self._skip = 0

    def handle_starttag(self, tag, attrs):
        if tag in self.SKIP:
            self._skip += 1

    def handle_endtag(self, tag):
        if tag in self.SKIP and self._skip:
            self._skip -= 1

    def handle_data(self, data):
        if not self._skip and data.strip():
            self.parts.append(data.strip())


def parse_html(content: str) -> str:
    p = _TextExtractor()
    p.feed(content)
    return "\n".join(p.parts)


def _unsupported(dep: str) -> Callable[[str], str]:
    def f(content: str) -> str:
        raise NotImplementedError(
            f"parser requires {dep}, not available in this environment")
    return f


def parse_pdf(content) -> str:
    """Prefer pypdf when importable (full filter/encoding support);
    else the stdlib common-case evaluator (officefmt.parse_pdf)."""
    try:
        import pypdf  # noqa: F401
        from io import BytesIO
        from .officefmt import _as_bytes
        reader = pypdf.PdfReader(BytesIO(_as_bytes(content)))
        texts = [p.extract_text() for p in reader.pages]
        return "\n".join(t for t in texts if t.strip())
    except ImportError:
        from .officefmt import parse_pdf as _stdlib_pdf
        return _stdlib_pdf(content)


def parse_docx(content) -> str:
    """Prefer python-docx when importable; else the stdlib zip+XML walk
    (officefmt.parse_docx) with identical paragraph/table semantics."""
    try:
        import docx  # noqa: F401
        from io import BytesIO
        from .officefmt import _as_bytes
        d = docx.Document(BytesIO(_as_bytes(content)))
        parts = [p.text.strip() for p in d.paragraphs if p.text.strip()]
        for table in d.tables:
            for row in table.rows:
                cells = [c.text.strip() for c in row.cells]
                if any(cells):
                    parts.append("\t".join(cells))
        return "\n".join(parts)
    except ImportError:
        from .officefmt import parse_docx as _stdlib_docx
        return _stdlib_docx(content)


def parse_xlsx(content) -> str:
    """Stdlib zip+XML sheet walk (officefmt.parse_xlsx); openpyxl-based
    parsing would go through the same slot if the lib appears."""
    from .officefmt import parse_xlsx as _stdlib_xlsx
    return _stdlib_xlsx(content)


def parse_doc(content) -> str:
    """Legacy Word 97-2003 .doc: prefer docx2txt when importable, else
    the stdlib CFB + piece-table reader (olefmt.parse_doc)."""
    try:
        import docx2txt  # noqa: F401
        import tempfile
        from .officefmt import _as_bytes
        with tempfile.NamedTemporaryFile(suffix=".doc") as f:
            f.write(_as_bytes(content))
            f.flush()
            return docx2txt.process(f.name) or ""
    except ImportError:
        from .olefmt import parse_doc as _stdlib_doc
        return _stdlib_doc(content)


def parse_xls(content) -> str:
    """Legacy Excel 97-2003 .xls: stdlib CFB + BIFF8 record reader
    (olefmt.parse_xls); an xlrd-based path would use the same slot."""
    from .olefmt import parse_xls as _stdlib_xls
    return _stdlib_xls(content)


PARSERS: Dict[str, Callable[[str], str]] = {
    "txt": parse_text, "text": parse_text,
    "md": parse_markdown, "markdown": parse_markdown,
    "json": parse_json, "jsonl": parse_json, "ndjson": parse_json,
    "csv": parse_csv,
    "html": parse_html, "htm": parse_html,
    "pdf": parse_pdf,
    "doc": parse_doc,
    "docx": parse_docx,
    "xlsx": parse_xlsx,
    "xls": parse_xls,
}

# formats whose payload is binary: parse_documents reads these rows from
# the binary column when present
BINARY_FORMATS = {"pdf", "doc", "docx", "xlsx", "xls"}


def register_parser(fmt: str, fn: Callable[[str], str]) -> None:
    """Custom-processor registration (factory.py:58-77)."""
    PARSERS[fmt.lower()] = fn


def _meta_text(content: str) -> dict:
    lines = content.splitlines()
    return {"format": "text", "line_count": len(lines),
            "character_count": len(content),
            "word_count": len(content.split()),
            "non_empty_line_count": sum(1 for ln in lines if ln.strip())}


def _meta_json(content: str) -> dict:
    """json_processor.py:333-360 fields (jsonl gets line_count)."""
    out = {"format": "json"}
    try:
        data = json.loads(content)
    except json.JSONDecodeError:
        lines = [ln for ln in content.splitlines() if ln.strip()]
        ok = 0
        for ln in lines:
            try:
                json.loads(ln)
                ok += 1
            except json.JSONDecodeError:
                pass
        if ok:
            return {"format": "jsonl", "line_count": len(lines),
                    "valid_line_count": ok, "is_valid_json": True}
        return {"format": "json", "is_valid_json": False}
    out["is_valid_json"] = True
    out["data_type"] = type(data).__name__
    if isinstance(data, dict):
        out["key_count"] = len(data)
        out["top_level_keys"] = list(data.keys())[:10]
    elif isinstance(data, list):
        out["item_count"] = len(data)
    return out


def _meta_csv(content: str) -> dict:
    """spreadsheet_processor.py:340-352 fields."""
    try:
        dialect = csv.Sniffer().sniff(content[:4096])
        delim = dialect.delimiter
    except csv.Error:
        delim = ","
    rows = list(csv.reader(io.StringIO(content)))
    return {"format": "csv", "row_count": max(0, len(rows) - 1),
            "column_count": len(rows[0]) if rows else 0,
            "detected_delimiter": delim}


class _HtmlMeta(HTMLParser):
    def __init__(self):
        super().__init__()
        self.title_parts: List[str] = []
        self._in_title = False
        self.meta: dict = {}

    def handle_starttag(self, tag, attrs):
        if tag == "title":
            self._in_title = True
        elif tag == "meta":
            d = dict(attrs)
            name = d.get("name") or d.get("property") or d.get("http-equiv")
            if name and d.get("content") is not None:
                self.meta[name] = d["content"]

    def handle_endtag(self, tag):
        if tag == "title":
            self._in_title = False

    def handle_data(self, data):
        if self._in_title:
            self.title_parts.append(data)


def _meta_html(content: str) -> dict:
    """html_processor.py:295-315 fields via stdlib HTMLParser."""
    p = _HtmlMeta()
    p.feed(content)
    return {"format": "html", "title": "".join(p.title_parts).strip(),
            "meta_tags": p.meta}


def document_metadata(content, fmt: str) -> dict:
    """Per-payload metadata — the DocumentProcessor.extract_metadata
    surface minus filesystem stats (row payloads have no path/mtime;
    callers get ``content_bytes`` from the batch op instead)."""
    from .officefmt import (_as_bytes, docx_metadata, pdf_metadata,
                            xlsx_metadata)
    fmt = (fmt or "txt").lower()
    if fmt == "pdf":
        return pdf_metadata(content)
    if fmt == "docx":
        return docx_metadata(content)
    if fmt == "xlsx":
        return xlsx_metadata(content)
    if fmt == "doc":
        from .olefmt import doc_metadata
        return doc_metadata(content)
    if fmt == "xls":
        from .olefmt import xls_metadata
        return xls_metadata(content)
    if fmt in ("json", "jsonl", "ndjson"):
        return _meta_json(content or "")
    if fmt == "csv":
        return _meta_csv(content or "")
    if fmt in ("html", "htm"):
        return _meta_html(content or "")
    if fmt in ("md", "markdown"):
        return {**_meta_text(content or ""), "format": "markdown"}
    return _meta_text(content or "")


def extract_document_metadata(ds: "ray.data.Dataset",
                              content_col: str = "content",
                              format_col: str = "format",
                              binary_col: str = "content_binary"
                              ) -> "ray.data.Dataset":
    """Appends ``metadata`` (JSON string — heterogeneous per format, so
    a string column keeps the schema stable) and ``content_bytes``.
    Same poison-pill contract as parse_documents: a payload that fails
    analysis yields a metadata object with an ``error`` field, never a
    dead batch."""
    def f(t: pa.Table) -> pa.Table:
        blobs = (t[binary_col].to_pylist()
                 if binary_col in t.column_names else [None] * len(t))
        metas, sizes = [], []
        for content, fmt, blob in zip(t[content_col].to_pylist(),
                                      t[format_col].to_pylist(), blobs):
            payload = blob if blob is not None else (content or "")
            sizes.append(len(payload) if isinstance(payload, bytes)
                         else len(payload.encode("utf-8")))
            try:
                metas.append(json.dumps(
                    document_metadata(payload, fmt), sort_keys=True))
            except Exception as e:  # noqa: BLE001 — poison-pill guard
                metas.append(json.dumps(
                    {"error": f"{type(e).__name__}: {e}"}))
        return (t.append_column("metadata", pa.array(metas, pa.string()))
                 .append_column("content_bytes",
                                pa.array(sizes, pa.int64())))

    return ds.map_batches(f, batch_format="pyarrow")


def parse_documents(ds: "ray.data.Dataset", content_col: str = "content",
                    format_col: str = "format",
                    binary_col: str = "content_binary",
                    max_bytes: int = 256 << 20) -> "ray.data.Dataset":
    """Rows (content, format[, content_binary]) → rows + ``text`` column
    via registry dispatch. Binary formats (pdf/docx/xlsx) read their
    payload from ``binary_col`` (pa.binary()) when the column exists and
    the row is non-null; text formats read ``content_col``. Unknown or
    unsupported formats yield null text plus a ``parse_error`` column
    instead of failing the batch (poison-pill rows must not kill a
    100 TB job). ``max_bytes`` caps the per-row payload the parser will
    touch (the reference's validate_file size guard, row-payload
    analogue): one pathological multi-GB blob becomes an error row
    instead of an OOM-killed worker."""
    def f(t: pa.Table) -> pa.Table:
        texts, errs = [], []
        blobs = (t[binary_col].to_pylist()
                 if binary_col in t.column_names else [None] * len(t))
        for content, fmt, blob in zip(t[content_col].to_pylist(),
                                      t[format_col].to_pylist(), blobs):
            fmt_l = (fmt or "txt").lower()
            fn = PARSERS.get(fmt_l)
            if fn is None:
                texts.append(None)
                errs.append(f"no parser for format {fmt!r}")
                continue
            if fmt_l in BINARY_FORMATS and blob is not None:
                payload = blob
            else:
                payload = content or ""
            if len(payload) > max_bytes:
                texts.append(None)
                errs.append(f"payload {len(payload)} bytes exceeds "
                            f"max_bytes={max_bytes}")
                continue
            try:
                texts.append(fn(payload))
                errs.append(None)
            except NotImplementedError as e:
                texts.append(None)
                errs.append(str(e))
            except Exception as e:  # noqa: BLE001 — poison-pill guard
                texts.append(None)
                errs.append(f"{type(e).__name__}: {e}")
        return (t.append_column("text", pa.array(texts, pa.string()))
                 .append_column("parse_error", pa.array(errs, pa.string())))

    return ds.map_batches(f, batch_format="pyarrow")
