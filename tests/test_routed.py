"""Payload router (M1) + layout engine: kind routing, reading-order
determinism, html parity."""

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _fake_pdf(i: int) -> bytes:
    return b"%PDF-1.4\n" + hashlib.blake2b(str(i).encode(), digest_size=32).digest()


def _fake_png(i: int) -> bytes:
    return b"\x89PNG\r\n\x1a\n" + hashlib.blake2b(str(-i).encode(), digest_size=32).digest()


@pytest.fixture(scope="module")
def mixed_pages_dir(tmp_path_factory):
    """100 pages: every 5th payload replaced by a fake PDF, every 10th
    by a fake PNG."""
    from xs_vlm_ocr_ray.fixtures import pages_table

    d = tmp_path_factory.mktemp("pages_mixed")
    t = pages_table(range(100), seed=42)
    html = t["html"].to_pylist()
    for i in range(len(html)):
        if i % 10 == 0:
            html[i] = _fake_png(i)
        elif i % 5 == 0:
            html[i] = _fake_pdf(i)
    t = t.set_column(2, "html", pa.array(html, pa.binary()))
    pq.write_table(t, d / "shard-000.parquet")
    return str(d)


@pytest.fixture(scope="module")
def routed_df(ray_session, mixed_pages_dir):
    from xs_vlm_ocr_ray.pipelines.routed import build_routed_extract_ds

    return build_routed_extract_ds(mixed_pages_dir).to_pandas()


def test_routing_by_kind(routed_df):
    assert len(routed_df) == 100
    by_engine = routed_df.groupby("engine").size().to_dict()
    assert by_engine.get("layout_ocr", 0) == 20  # 10 png + 10 pdf
    assert by_engine.get("local_html", 0) == 80
    layout_rows = routed_df[routed_df["engine"] == "layout_ocr"]
    assert layout_rows["success"].all()
    assert (layout_rows["extracted_text"].str.len() > 0).all()


def test_row_order_preserved(ray_session, mixed_pages_dir, routed_df):
    src = pq.read_table(f"{mixed_pages_dir}/shard-000.parquet")
    assert routed_df["url"].tolist()[:100] == src["url"].to_pylist()


def test_html_rows_match_direct(ray_session, mixed_pages_dir, routed_df):
    from xs_vlm_ocr_ray.pipelines.extract import build_extract_ds

    direct = (
        build_extract_ds(mixed_pages_dir, engine_kwargs={"emit_spans": True})
        .to_pandas()
        .set_index("url")
    )
    html_rows = routed_df[routed_df["engine"] == "local_html"].set_index("url")
    for url, row in html_rows.iterrows():
        assert row["extracted_text"] == direct.loc[url, "extracted_text"], url


def test_layout_deterministic_and_reading_ordered(ray_session, mixed_pages_dir):
    from xs_vlm_ocr_ray.pipelines.routed import build_routed_extract_ds

    a = build_routed_extract_ds(mixed_pages_dir).to_pandas()
    b = build_routed_extract_ds(mixed_pages_dir).to_pandas()
    la = a[a["engine"] == "layout_ocr"].set_index("url")["extracted_text"]
    lb = b[b["engine"] == "layout_ocr"].set_index("url")["extracted_text"]
    assert (la.sort_index() == lb.sort_index()).all()
    # spans come out reading-order sorted: (y0, x0) non-decreasing
    for spans in a[a["engine"] == "layout_ocr"]["spans"]:
        keys = [(s["y0"], s["x0"]) for s in spans]
        assert keys == sorted(keys)


def test_fake_layout_model_unit():
    from xs_vlm_ocr_ray.stages.layout import fake_layout_model, reading_order

    blocks = fake_layout_model(b"%PDF-sample")
    assert blocks == fake_layout_model(b"%PDF-sample")  # deterministic
    assert blocks != fake_layout_model(b"%PDF-other")
    order = reading_order(blocks)
    ys = [(blocks[i]["y0"], blocks[i]["x0"]) for i in order]
    assert ys == sorted(ys)
