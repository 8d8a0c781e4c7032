"""Round-2 upgrades of the formerly-partial operators: S2 drag-drop
source, K7 clipboard sink, O4 preload-recent cache, T8 hot config
reload."""

import json
import os

import pyarrow.parquet as pq
import pytest


# --- S2: drag-drop source ------------------------------------------------


def test_read_dropped_mixed(ray_session, tiny_pages_dir, tmp_path):
    """Mixed drop: parquet shards + raw html files union into one pages
    Dataset with the standard schema, and flow through extraction."""
    from xs_vlm_ocr_ray.pipelines.extract import build_extract_ds
    from xs_vlm_ocr_ray.sources.pages import list_shards, read_dropped_files

    raw1 = tmp_path / "note.html"
    raw1.write_bytes(b"<html><body><p>" + b"dropped file text " * 20 + b"</p></body></html>")
    raw2 = tmp_path / "other.htm"
    raw2.write_bytes(b"<p>" + b"second dropped doc " * 20 + b"</p>")

    paths = list_shards(tiny_pages_dir) + [str(raw1), str(raw2)]
    ds = read_dropped_files(paths)
    df = ds.to_pandas()
    assert len(df) == 202
    assert set(df.columns) == {"url", "html", "shard_id", "row_idx"}
    # raw files numbered after the 4 parquet shards, one row each
    file_rows = df[df["url"].str.startswith("file://")]
    assert sorted(file_rows["shard_id"]) == [4, 5]
    assert (file_rows["row_idx"] == 0).all()

    # and the drop feeds the SAME extraction pipeline (S2 = submit
    # source, not a separate engine path)
    out = build_extract_ds(
        read_dropped_files(paths), engine_kwargs={"emit_spans": False}
    ).to_pandas()
    dropped = out[out["url"] == "file://" + str(raw1)]
    assert len(dropped) == 1 and bool(dropped.iloc[0]["success"])
    assert "dropped file text" in dropped.iloc[0]["extracted_text"]


def test_read_dropped_only_raw(ray_session, tmp_path):
    from xs_vlm_ocr_ray.sources.pages import read_dropped_files

    p = tmp_path / "single.html"
    p.write_bytes(b"<p>lone doc</p>")
    df = read_dropped_files([str(p)]).to_pandas()
    assert len(df) == 1 and df.iloc[0]["shard_id"] == 0


# --- K7: clipboard sink --------------------------------------------------


def test_copy_result_text():
    import pandas as pd

    from xs_vlm_ocr_ray.sinks.export import copy_result_text

    df = pd.DataFrame(
        {
            "url": ["u1", "u2"],
            "extracted_text": ["first text", "second text"],
        }
    )
    assert copy_result_text(df) == "first text"
    assert copy_result_text(df, url="u2") == "second text"
    assert copy_result_text(df, url="missing") == ""
    # the reference refuses to copy empty text (ClipboardManager.cpp:19)
    empty = pd.DataFrame({"url": ["u"], "extracted_text": [""]})
    assert copy_result_text(empty) == ""
    assert copy_result_text(pd.DataFrame({"url": [], "extracted_text": []})) == ""


# --- O4: preload-recent cache --------------------------------------------


def test_preload_recent(ray_session, tiny_pages_dir, tmp_path):
    from xs_vlm_ocr_ray.pipelines.extract import preload_recent, run_extract

    out = str(tmp_path / "results")
    run_extract(tiny_pages_dir, out, resume=False)
    cache = preload_recent(out, limit=10)
    assert 0 < len(cache) <= 10
    for h, item in cache.items():
        assert h and item["extracted_text"]
    # recency: entries come from the tail of the lineage order — the
    # last shard's rows dominate a limit-10 preload of a 4-shard store
    urls = {item["url"] for item in cache.values()}
    assert urls  # non-empty, hash-keyed like the reference memory cache


# --- T8: hot config reload -----------------------------------------------


def _write_cfg(path, row_timeout_ms):
    doc = {
        "providers": [],
        "models": [{"id": "m1", "engine": "local_html"}],
        "templates": [],
        "settings": {"row_timeout_ms": row_timeout_ms},
    }
    with open(path, "w", encoding="utf-8") as f:
        json.dump(doc, f)


def test_config_watcher_reloads_on_change(tmp_path):
    from xs_vlm_ocr_ray.engines.config import ConfigWatcher

    p = str(tmp_path / "cfg.json")
    _write_cfg(p, 1000)
    w = ConfigWatcher(p)
    assert w.config is not None and w.config.settings.row_timeout_ms == 1000
    assert w.poll() is False  # unchanged → no reload

    _write_cfg(p, 2000)
    assert w.poll() is True
    assert w.config.settings.row_timeout_ms == 2000


def test_config_watcher_keeps_last_good_on_breakage(tmp_path):
    from xs_vlm_ocr_ray.engines.config import ConfigWatcher

    p = str(tmp_path / "cfg.json")
    _write_cfg(p, 1000)
    w = ConfigWatcher(p)
    with open(p, "w") as f:
        f.write("{not json")
    assert w.poll() is False
    assert w.config.settings.row_timeout_ms == 1000  # last good retained
    assert w.last_error
    # and a subsequent fix is picked up
    _write_cfg(p, 3000)
    assert w.poll() is True and w.config.settings.row_timeout_ms == 3000


def test_config_watcher_missing_file(tmp_path):
    from xs_vlm_ocr_ray.engines.config import ConfigWatcher

    p = str(tmp_path / "absent.json")
    w = ConfigWatcher(p)
    assert w.config is None
    _write_cfg(p, 500)
    assert w.poll() is True and w.config.settings.row_timeout_ms == 500


def test_preload_recent_prunes_to_tail_shards(ray_session, tiny_pages_dir, tmp_path):
    """O4 preload reads only the minimal newest-shard suffix covering
    ``limit`` successes (manifest-pruned), and returns the same cache
    as an unpruned recency scan."""
    from xs_vlm_ocr_ray.pipelines.extract import (
        preload_recent,
        read_results,
        run_extract,
    )
    from xs_vlm_ocr_ray.state.manifest import load_manifest

    out = str(tmp_path / "results")
    run_extract(tiny_pages_dir, out, resume=False)
    man = load_manifest(out)
    assert len(man) >= 4
    # limit covered by the last shard alone -> the tail suffix is small
    last = max(man)
    limit = max(1, man[last]["n_success"] // 2)
    cache = preload_recent(out, limit=limit)
    # reference scan: unpruned read, same recency rule
    full = (
        read_results(out, columns=["url", "success", "content_hash",
                                   "extracted_text", "shard_id", "row_idx"])
        .to_pandas()
    )
    full = full[full["success"]].sort_values(
        ["shard_id", "row_idx"], ascending=False
    ).head(limit)
    want: dict = {}
    for _, r in full.iterrows():
        if r["content_hash"] and r["content_hash"] not in want:
            want[r["content_hash"]] = r["url"]
    assert {h: i["url"] for h, i in cache.items()} == want
