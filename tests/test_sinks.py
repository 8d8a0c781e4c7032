"""Export sinks (SURVEY.md K1/K3/K4/K6)."""

import csv
import glob
import io
import os

import pandas as pd
import pytest

from xs_vlm_ocr_ray.sinks.export import (
    result_csv_bytes,
    result_doc_html,
    result_to_csv,
    result_to_txt,
    write_results_csv,
)


def test_result_txt_roundtrip(tmp_path):
    p = str(tmp_path / "out.txt")
    result_to_txt("héllo\nwörld", p)
    assert open(p, "rb").read() == "héllo\nwörld".encode("utf-8")


def test_result_csv_bom_and_escaping(tmp_path):
    text = 'plain line\nwith, comma\nwith "quote"\n'
    raw = result_csv_bytes(text)
    assert raw.startswith(b"\xef\xbb\xbf")  # Excel BOM (MainWindow.cpp:1879)
    body = raw[3:].decode("utf-8")
    # the reference writes "\n" after EVERY line, including the last
    # (empty) one produced by the trailing newline split
    assert body == 'plain line\n"with, comma"\n"with ""quote"""\n\n'
    # a std csv reader parses it back to the original lines
    p = str(tmp_path / "out.csv")
    result_to_csv(text, p)
    with open(p, encoding="utf-8-sig", newline="") as f:
        rows = [r[0] if r else "" for r in csv.reader(f)]
    assert rows == text.split("\n")


def test_csv_escape_ignores_carriage_return():
    # the reference checks only , " and \n — a bare \r is NOT quoted
    from xs_vlm_ocr_ray.functions.textnorm import csv_escape

    assert csv_escape("a\rb") == "a\rb"
    assert csv_escape("a,b") == '"a,b"'


def test_result_doc_html_escapes():
    html = result_doc_html('a<b>&"c"\nnext')
    assert "a&lt;b&gt;&amp;&quot;c&quot;" in html
    # reference envelope: <pre> block (newlines verbatim), OCR Result title
    assert "<pre style='font-family: Arial; font-size: 11pt;'>" in html
    assert "<title>OCR Result</title>" in html
    assert "<br>" not in html
    assert "schemas-microsoft-com:office:word" in html


def test_write_results_csv_distributed(ray_session, tiny_pages_dir, tmp_path):
    """Distributed CSV sink: Arrow escaping, readable back, flat columns
    only."""
    from xs_vlm_ocr_ray.pipelines.extract import build_extract_ds

    ds = build_extract_ds(tiny_pages_dir, engine_kwargs={"emit_spans": False})
    out = str(tmp_path / "csv_out")
    write_results_csv(ds, out)
    files = glob.glob(os.path.join(out, "*.csv"))
    assert files
    df = pd.concat([pd.read_csv(f, keep_default_na=False) for f in files])
    assert len(df) == 200
    assert "spans" not in df.columns and "html" not in df.columns
    # extracted text with embedded newlines survives the CSV round-trip
    ok = df[df["success"] == True]  # noqa: E712
    assert (ok["extracted_text"].str.len() > 0).any()


def test_write_results_jsonl(ray_session, tiny_pages_dir, tmp_path):
    import glob
    import json
    import os

    from xs_vlm_ocr_ray.pipelines.extract import build_extract_ds
    from xs_vlm_ocr_ray.sinks.export import write_results_jsonl

    ds = build_extract_ds(tiny_pages_dir, engine_kwargs={"emit_spans": False})
    out = str(tmp_path / "jsonl_out")
    write_results_jsonl(ds, out)
    rows = []
    for f in glob.glob(os.path.join(out, "*.json")):
        with open(f) as fh:
            rows.extend(json.loads(line) for line in fh if line.strip())
    assert len(rows) == 200
    assert {"url", "extracted_text", "success"} <= set(rows[0])


def test_result_to_pdf(tmp_path):
    """K5: the minimal PDF writer emits a structurally valid PDF."""
    from xs_vlm_ocr_ray.sinks.export import pdf_bytes, result_to_pdf

    text = "Hello PDF\nsecond (line) with \\ specials\n" + "\n".join(
        f"line {i}" for i in range(80)
    )
    raw = pdf_bytes(text)
    assert raw.startswith(b"%PDF-1.4\n") and raw.endswith(b"%%EOF\n")
    # 82 lines at 54/page -> 2 pages, each with page + content objects
    assert raw.count(b"/Type /Page ") == 2
    assert b"/Count 2" in raw
    assert b"(Hello PDF) Tj" in raw
    assert b"(second \\(line\\) with \\\\ specials) Tj" in raw
    # xref offsets must point at the actual object headers
    import re

    xref_pos = int(raw.rsplit(b"startxref\n", 1)[1].split(b"\n", 1)[0])
    assert raw[xref_pos : xref_pos + 4] == b"xref"
    entries = re.findall(rb"(\d{10}) 00000 n", raw)
    for num, off in enumerate(entries, start=1):
        assert raw[int(off) : int(off) + len(b"%d 0 obj" % num)] == b"%d 0 obj" % num

    p = str(tmp_path / "out.pdf")
    result_to_pdf("unicode dégradé 中文", p)
    body = open(p, "rb").read()
    assert body.startswith(b"%PDF-") and b"(unicode d\xe9grad\xe9 ??) Tj" in body


def test_write_payload_files(ray_session, tiny_pages_dir, tmp_path):
    """K2: distributed payload-file sink, hash-named, idempotent."""
    import glob as _glob
    import hashlib

    from xs_vlm_ocr_ray.sinks.export import write_payload_files
    from xs_vlm_ocr_ray.sources.pages import read_pages

    out = str(tmp_path / "payloads")
    ds = read_pages(tiny_pages_dir, columns=["url", "html"])
    n = write_payload_files(ds, out)
    files = _glob.glob(out + "/*.bin")
    # 200 pages, some planted empty payloads skipped; distinct contents
    assert n > 150 and len(files) > 150
    # file name == md5 of its content (the sink contract)
    f = files[0]
    data = open(f, "rb").read()
    assert os.path.basename(f) == hashlib.md5(data).hexdigest() + ".bin"
    # idempotent rerun: same file set, no .tmp leftovers
    n2 = write_payload_files(read_pages(tiny_pages_dir, columns=["url", "html"]), out)
    assert n2 == n
    assert sorted(_glob.glob(out + "/*")) == sorted(files)


def test_copy_result_text_nan():
    import numpy as np
    import pandas as pd

    from xs_vlm_ocr_ray.sinks.export import copy_result_text

    df = pd.DataFrame({"url": ["u"], "extracted_text": [np.nan]})
    assert copy_result_text(df) == ""


def test_pdf_declares_winansi_encoding():
    """Latin-1 text bytes need /WinAnsiEncoding — without it viewers
    use StandardEncoding and render every accented char as the wrong
    glyph."""
    from xs_vlm_ocr_ray.sinks.export import pdf_bytes

    b = pdf_bytes("café")
    assert b"/Encoding /WinAnsiEncoding" in b
    assert b"(caf\xe9) Tj" in b  # é encoded, not degraded to '?'


def test_jsonl_keeps_annotation_columns(ray_session, tmp_path):
    """JSONL export writes ALL non-binary columns (the CSV whitelist
    must not silently drop curation annotations)."""
    import json

    import pandas as pd
    import ray.data as rd

    from xs_vlm_ocr_ray.sinks.export import write_results_jsonl

    ds = rd.from_pandas(
        pd.DataFrame(
            {"url": ["u1"], "extracted_text": ["t"], "lang_pred": ["en"],
             "quality": [0.9], "n_tokens": [1]}
        )
    )
    out = tmp_path / "jsonl"
    write_results_jsonl(ds, str(out))
    rows = []
    for f in out.iterdir():
        rows += [json.loads(line) for line in f.read_text().splitlines()]
    assert rows and set(rows[0]) == {
        "url", "extracted_text", "lang_pred", "quality", "n_tokens"
    }
