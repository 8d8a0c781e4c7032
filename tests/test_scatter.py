"""Giant-doc scatter path: byte-identical to the direct pipeline,
giants actually split (SURVEY.md §4.2 skew handling)."""

import pytest


@pytest.fixture(scope="module")
def scatter_df(ray_session, tiny_pages_dir):
    from xs_vlm_ocr_ray.pipelines.scatter import build_scatter_extract_ds

    # low thresholds so the fixture's ~100-500 KB giants split into many
    # segments
    return build_scatter_extract_ds(
        tiny_pages_dir, threshold_bytes=32 << 10, segment_bytes=16 << 10
    ).to_pandas()


def test_byte_identity_vs_direct(ray_session, tiny_pages_dir, scatter_df):
    from xs_vlm_ocr_ray.pipelines.extract import build_extract_ds

    direct = (
        build_extract_ds(tiny_pages_dir, engine_kwargs={"emit_spans": False})
        .to_pandas()
        .set_index("url")
    )
    got = scatter_df.set_index("url")
    assert set(got.index) == set(direct.index)
    for url in direct.index:
        assert got.loc[url, "extracted_text"] == direct.loc[url, "extracted_text"], url
        assert got.loc[url, "success"] == direct.loc[url, "success"], url
        assert got.loc[url, "content_hash"] == direct.loc[url, "content_hash"], url


def test_giants_actually_split(scatter_df):
    multi = scatter_df[scatter_df["n_segs"] > 1]
    assert len(multi) >= 2  # the fixture plants giant DOMs
    assert (multi["n_segs"] >= 3).any()  # 100+ KB docs at 16 KB segments


def test_one_row_per_url(scatter_df):
    assert scatter_df["url"].nunique() == len(scatter_df) == 200
