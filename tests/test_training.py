"""Composite curation pipeline: gates enforced, dedup collapses
mirrors, no silent truncation."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def mirror_dir(tmp_path_factory):
    from xs_vlm_ocr_ray.fixtures import pages_table

    d = tmp_path_factory.mktemp("pages_train")
    t = pages_table(range(80), seed=42)
    pq.write_table(t, d / "shard-000.parquet")
    # mirror shard: same payloads, new urls → must dedup away
    m = pages_table(range(0, 80, 4), seed=42)
    urls = [u + "?m=1" for u in m["url"].to_pylist()]
    m = m.set_column(0, "url", pa.array(urls, pa.string()))
    pq.write_table(m, d / "shard-001.parquet")
    return str(d)


def test_training_pipeline_gates(ray_session, mirror_dir):
    from xs_vlm_ocr_ray.pipelines.training import build_training_ds, run_training_pipeline

    df = build_training_ds(mirror_dir, min_quality=0.5, min_tokens=20).to_pandas()
    assert len(df) > 0
    assert (df["quality"] >= 0.5).all()
    assert (df["n_tokens"] >= 20).all()
    assert df["success"].all()
    # exact dedup: one row per distinct extracted text
    assert df["text_hash"].is_unique
    # mirrors collapsed: no url appears in both plain and ?m=1 form
    plain = set(df[~df["url"].str.endswith("?m=1")]["url"])
    mirrored = {u[:-4] for u in df[df["url"].str.endswith("?m=1")]["url"]}
    assert not (plain & mirrored)

    summary = run_training_pipeline(mirror_dir, min_quality=0.5, min_tokens=20)
    assert summary["n_input"] == 100
    assert summary["n_curated"] == len(df)
    assert summary["n_dropped"] == 100 - len(df)


def test_training_write_roundtrip(ray_session, mirror_dir, tmp_path):
    import ray.data as rd

    from xs_vlm_ocr_ray.pipelines.training import run_training_pipeline

    out = str(tmp_path / "curated")
    s = run_training_pipeline(mirror_dir, out_dir=out)
    back = rd.read_parquet(out).to_pandas()
    assert len(back) == s["n_curated"]
    assert {"url", "extracted_text", "lang_pred", "quality", "n_tokens"} <= set(back.columns)
