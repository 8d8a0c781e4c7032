"""Export sinks (SURVEY.md K1/K3/K4/K6/K7).

Two tiers, mirroring the reference:

1. **Corpus-scale sinks** — distributed, streaming, partitioned:
   ``write_results_parquet`` (K1, the engine's results/lineage store)
   and ``write_results_csv`` (K4 at scale; Arrow's CSV writer performs
   RFC-4180 quote-doubling/wrapping, matching the reference's manual
   escaping at src/ui/MainWindow.cpp:1873-1899).

2. **Single-result exports** — the reference's per-result file exports
   operate on ONE extraction result (driver-side, small):
   ``result_to_txt`` / ``result_to_markdown`` (K3, UTF-8 dump,
   src/ui/MainWindow.cpp:1900-1914), ``result_to_csv`` (K4 line-split +
   escaping + UTF-8 BOM for Excel, src/ui/MainWindow.cpp:1873-1899),
   ``result_to_doc_html`` (K6 MS-Office HTML envelope around escaped
   text, src/ui/MainWindow.cpp:1855-1872).
"""

from __future__ import annotations

import os

import ray.data as rd

from ..functions.textnorm import csv_escape, html_escape_text

# Columns that make sense in a flat CSV (no list/binary columns).
_CSV_COLS = [
    "url",
    "extracted_text",
    "success",
    "error",
    "engine",
    "processing_ms",
    "content_hash",
    "shard_id",
    "row_idx",
]


def write_results_parquet(ds: rd.Dataset, out_dir: str) -> None:
    """K1: partitioned parquet results store (one dir per shard —
    resumable, never one giant file)."""
    ds.write_parquet(out_dir, partition_cols=["shard_id"])


def write_results_csv(ds: rd.Dataset, out_dir: str) -> None:
    """K4 at corpus scale: distributed CSV with Arrow RFC-4180 escaping.
    List/binary columns are dropped (CSV is a flat format)."""
    cols = [c for c in _CSV_COLS if c in ds.schema().names]
    if not cols:
        raise ValueError(
            "write_results_csv: none of the flat result columns "
            f"{_CSV_COLS} are present in {ds.schema().names}"
        )
    ds.select_columns(cols).write_csv(out_dir)


def write_results_jsonl(ds: rd.Dataset, out_dir: str) -> None:
    """Distributed JSONL export (one object per row) — the standard
    interchange format for curated text corpora. ALL non-binary columns
    are written (JSON is not a flat format; the CSV whitelist exists
    only because CSV can't carry list/binary columns — silently
    applying it here dropped annotation columns like lang_pred/quality
    from curated exports)."""
    import pyarrow as _pa

    sch = ds.schema()
    # Ray's Schema.types may carry plain Python types for pandas-backed
    # blocks — only genuine Arrow binary types are excluded
    cols = [
        n for n, t in zip(sch.names, sch.types)
        if not (
            isinstance(t, _pa.DataType)
            and (_pa.types.is_binary(t) or _pa.types.is_large_binary(t))
        )
    ]
    if not cols:
        raise ValueError(
            "write_results_jsonl: no JSON-representable columns in "
            f"{sch.names} (binary payloads are excluded)"
        )
    ds.select_columns(cols).write_json(out_dir)


# --- single-result exports (driver-side, reference-exact) ----------------

_UTF8_BOM = b"\xef\xbb\xbf"


def result_to_txt(text: str, path: str) -> None:
    """K3: plain UTF-8 dump (also used for .md — the reference writes
    the same bytes for txt and markdown, MainWindow.cpp:1900-1914)."""
    _write_bytes(path, text.encode("utf-8"))


result_to_markdown = result_to_txt


def result_csv_bytes(text: str) -> bytes:
    """K4: line-split → one CSV row per line, RFC-4180 escaping, UTF-8
    BOM prefix for Excel (MainWindow.cpp:1873-1899). The reference
    streams ``csvLine << "\\n"`` for EVERY line — including the last —
    so the output always ends with a newline."""
    lines = text.split("\n")
    body = "".join(csv_escape(line) + "\n" for line in lines)
    return _UTF8_BOM + body.encode("utf-8")


def result_to_csv(text: str, path: str) -> None:
    _write_bytes(path, result_csv_bytes(text))


def result_doc_html(text: str) -> str:
    """K6: MS-Office Word-HTML envelope around HTML-escaped text,
    byte-matching the reference's stream writes (MainWindow.cpp:
    1855-1872): ``<title>OCR Result</title>`` and a ``<pre>`` block
    (newlines preserved verbatim — no ``<br>`` rewriting)."""
    escaped = html_escape_text(text)
    return (
        "<html xmlns:o='urn:schemas-microsoft-com:office:office' "
        "xmlns:w='urn:schemas-microsoft-com:office:word' "
        "xmlns='http://www.w3.org/TR/REC-html40'>"
        "<head><meta charset='utf-8'><title>OCR Result</title></head><body>"
        f"<pre style='font-family: Arial; font-size: 11pt;'>{escaped}</pre>"
        "</body></html>"
    )


def result_to_doc(text: str, path: str) -> None:
    _write_bytes(path, result_doc_html(text).encode("utf-8"))


def result_to_pdf(text: str, path: str) -> None:
    """K5: PDF export. The reference renders the result text through
    QPrinter into a PDF wrapped in ``<pre>`` (MainWindow.cpp:1843-1854).
    Here: a minimal, dependency-free, deterministic PDF 1.4 writer —
    one Helvetica text object per page, 54 lines/page, parenthes-escaped
    Latin-1 text (non-encodable chars degrade to '?'; a real deployment
    embeds a Unicode font). Valid per the PDF spec: catalog → page tree
    → page(s) → content stream(s), correct xref offsets."""
    _write_bytes(path, pdf_bytes(text))


_PDF_LINES_PER_PAGE = 54
_PDF_FONT_SIZE = 11
_PDF_LEADING = 13


def _pdf_escape(line: str) -> bytes:
    raw = line.encode("latin-1", errors="replace")
    return raw.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def pdf_bytes(text: str) -> bytes:
    """Deterministic single-font PDF document bytes for ``text``."""
    lines = text.split("\n")
    pages = [
        lines[i : i + _PDF_LINES_PER_PAGE]
        for i in range(0, max(len(lines), 1), _PDF_LINES_PER_PAGE)
    ] or [[""]]

    objs: list[bytes] = []  # 1-indexed PDF objects, in object-number order
    n_pages = len(pages)
    # object numbering: 1 catalog, 2 pages tree, 3 font,
    # then per page i: (4 + 2i) page object, (5 + 2i) content stream
    kids = b" ".join(b"%d 0 R" % (4 + 2 * i) for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages)
    # /WinAnsiEncoding: the text bytes are Latin-1 — without an explicit
    # encoding, viewers fall back to the font's built-in StandardEncoding
    # where every accented Latin-1 byte maps to a DIFFERENT glyph
    # (0xE9 is not é), silently corrupting non-ASCII exports
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>"
    )
    for i, page_lines in enumerate(pages):
        content = bytearray()
        content += b"BT /F1 %d Tf 1 0 0 1 54 770 Tm %d TL\n" % (
            _PDF_FONT_SIZE,
            _PDF_LEADING,
        )
        for ln in page_lines:
            content += b"(" + _pdf_escape(ln) + b") Tj T*\n"
        content += b"ET"
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>"
            % (5 + 2 * i)
        )
        objs.append(
            b"<< /Length %d >>\nstream\n" % len(content) + bytes(content) + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]  # object 0 is the free head
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_pos)
    )
    return bytes(out)


def write_payload_files(
    ds: rd.Dataset,
    out_dir: str,
    payload_col: str = "html",
    ext: str = "bin",
) -> int:
    """K2: payload-file sink — persist each row's binary payload as its
    own file, named by content hash (the engine's deterministic,
    collision-free analog of the reference's timestamp-named image saves,
    HistoryManager.cpp:284-293). Distributed: every task writes its own
    batch's files; identical payloads coalesce to one file (idempotent,
    retry-safe). Returns the number of rows with a non-empty payload."""
    import hashlib

    import pyarrow as pa

    out_dir = os.path.abspath(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(t: pa.Table) -> pa.Table:
        from ..stages.extract_stage import binary_views

        n = 0
        for v in binary_views(t[payload_col]):
            if v is None or len(v) == 0:
                continue
            name = hashlib.md5(v).hexdigest()
            p = os.path.join(out_dir, f"{name}.{ext}")
            if not os.path.exists(p):  # dedup + retry-safe
                tmp = f"{p}.{os.getpid()}.tmp"  # per-writer tmp: no cross-task clash
                with open(tmp, "wb") as f:
                    f.write(v)
                os.replace(tmp, p)
            n += 1
        return pa.table({"n_written": pa.array([n], pa.int64())})

    parts = ds.map_batches(write_batch, batch_format="pyarrow").to_pandas()
    # an empty dataset yields a column-less frame, not a zero row
    return int(parts["n_written"].sum()) if "n_written" in parts.columns else 0


def copy_result_text(df, url: str | None = None) -> str:
    """K7: clipboard sink — the reference copies ONE result's fullText
    to the system clipboard (MainWindow.cpp:1989,
    ClipboardManager::copyText, src/managers/ClipboardManager.cpp:17-27;
    empty text is refused and nothing is copied).

    Headless analog: select the result row (by ``url``, else the first
    row) and RETURN its extracted_text — the caller owns the actual
    clipboard integration. Empty text returns "" (the reference's
    refusal), never raises."""
    import pandas as pd

    if not isinstance(df, pd.DataFrame):  # Dataset / pa.Table
        df = df.to_pandas() if hasattr(df, "to_pandas") else pd.DataFrame(df)
    if df.empty:
        return ""
    if url is not None:
        df = df[df["url"] == url]
        if df.empty:
            return ""
    text = df.iloc[0]["extracted_text"]
    # NaN (missing text in a pandas frame) must also map to the
    # reference's empty-refusal, not leak a float to the caller
    return text if isinstance(text, str) else ""


def _write_bytes(path: str, data: bytes) -> None:
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
