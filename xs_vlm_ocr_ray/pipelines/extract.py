"""The flagship pipeline: pages parquet → extracted text + lineage.

RD restatement of the reference lifecycle (SURVEY.md §3.3):

    read_pages (lineage-preserving, resumable)
      → map_batches(classify_payload_kind)            stateless task
      → map_batches(HtmlExtractor, concurrency=N)     actor pool
      → write_parquet(out/results, partition by shard)
      → manifest records per shard (from the durable output)

Execution is streaming end-to-end within a *wave*; waves bound the
checkpoint granularity: each wave is one Dataset execution over a slice
of the shard list, and its shards become resumable only when their
results are durable (manifest written after read-back of the written
files). A 100 TB run is just many waves of a few thousand shards each;
a single-wave run is fully streaming with one checkpoint at the end.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa

import ray.data as rd

from ..sources.pages import list_shards, read_pages
from ..stages.classify import classify_payload_kind
from ..stages.extract_stage import HtmlExtractor
from ..state.manifest import (
    completed_shards,
    load_manifest,
    write_shard_record,
    xor_hex_digests,
)


def build_extract_ds(
    sf_dir_or_paths,
    engine_cls=HtmlExtractor,
    engine_kwargs: dict | None = None,
    concurrency=None,
    batch_size: int | None = None,
    skip_shards=frozenset(),
    classify: bool = True,
) -> rd.Dataset:
    """Lazy Dataset for the extraction pipeline (no execution).

    Execution mode by engine cost profile (SURVEY.md §4.2):

    - ``concurrency=None`` (default, cheap-setup engines like the local
      HTML extractor): the engine runs as a TASK-pool stage and fuses
      with the reader into one task per work item — tasks share the
      node's CPUs fluidly with the write stage, which is what makes the
      8→32-CPU scaling linear (actor pools would statically partition
      the CPUs between reader/extractor and starve one side);
    - ``concurrency=N`` (heavy engines that pin weights/models): the
      engine class becomes a ``map_batches`` ACTOR pool with per-actor
      ``__init__`` setup — the reference's adapter-initialize semantics
      (T1). Pass an explicit ``batch_size`` sized so a batch ≈ 1-4 s.
    """
    ds = read_pages(
        sf_dir_or_paths, columns=["url", "html"], skip_shards=skip_shards
    )
    if classify:
        ds = ds.map_batches(classify_payload_kind, batch_format="pyarrow")
    kwargs = dict(engine_kwargs or {})
    if concurrency is None:
        # task mode: a picklable engine INSTANCE fuses with the reader
        return ds.map_batches(
            engine_cls(**kwargs),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    return ds.map_batches(
        engine_cls,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=batch_size if batch_size is not None else 512,
        concurrency=concurrency,
    )


def default_pool_size() -> int:
    """Actor-pool size for a HEAVY engine stage (concurrency=N path):
    leave headroom for the read and write stages so the pipeline never
    serializes on one operator (SURVEY.md §4 admission control)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(2, cpus - 2)


def run_extract(
    sf_dir: str,
    out_dir: str,
    engine_cls=HtmlExtractor,
    engine_kwargs: dict | None = None,
    concurrency=None,
    batch_size: int = 512,
    resume: bool = True,
    wave_shards: int | None = None,
    max_waves: int | None = None,
) -> dict:
    """Execute the flagship pipeline with checkpoint/resume.

    A wave's output is written to a hidden temp directory and renamed
    into place before its manifest records are derived — a crash at any
    point leaves either nothing or a ``.tmp-`` directory that readers
    ignore, never a half-recorded shard. ``max_waves`` bounds this run
    (incremental processing / crash simulation in tests).

    Returns a summary dict (rows, successes, wall seconds, waves run).
    """
    paths = list_shards(sf_dir)
    done = completed_shards(out_dir) if resume else set()
    pending = [sid for sid in range(len(paths)) if sid not in done]
    results_dir = os.path.join(out_dir, "results")
    os.makedirs(results_dir, exist_ok=True)
    t_start = time.perf_counter()
    waves = 0
    if wave_shards is None:
        wave_shards = len(pending) or 1
    for w0 in range(0, len(pending), wave_shards):
        if max_waves is not None and waves >= max_waves:
            break
        wave = pending[w0 : w0 + wave_shards]
        waves += 1
        wave_name = f"wave-{wave[0]:06d}-{wave[-1]:06d}"
        wave_dir = os.path.join(results_dir, wave_name)
        tmp_dir = os.path.join(results_dir, f".tmp-{wave_name}")
        import shutil

        if os.path.isdir(tmp_dir):
            shutil.rmtree(tmp_dir)  # leftover from a crashed run
        if os.path.isdir(wave_dir):
            # renamed but un-manifested (crash between rename and
            # manifest write): the shards are pending, so redo the wave
            shutil.rmtree(wave_dir)
        skip = frozenset(set(range(len(paths))) - set(wave))
        ds = build_extract_ds(
            paths,
            engine_cls=engine_cls,
            engine_kwargs=engine_kwargs,
            concurrency=concurrency,
            batch_size=batch_size,
            skip_shards=skip,
        )
        t0 = time.perf_counter()
        ds.write_parquet(tmp_dir, partition_cols=["shard_id"])
        os.replace(tmp_dir, wave_dir)
        wall = time.perf_counter() - t0
        _write_wave_manifest(out_dir, wave_dir, paths, wall)
    total_wall = time.perf_counter() - t_start
    man = load_manifest(out_dir)
    return {
        "shards": len(paths),
        "waves": waves,
        "rows": sum(r["n_rows"] for r in man.values()),
        "n_success": sum(r["n_success"] for r in man.values()),
        "n_error": sum(r["n_error"] for r in man.values()),
        "wall_s": total_wall,
        "out_dir": out_dir,
    }


def read_results(out_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    """Read back the engine's results authoritatively via the manifest.

    Each shard is read only from the wave directory its manifest record
    points at, so stale data from crashed/partially-manifested waves is
    never surfaced (the analog of the reference reading results only
    through its committed SQLite table, HistoryManager.cpp:153-229).
    """
    man = load_manifest(out_dir)
    by_wave: dict[str, set[int]] = {}
    for sid, rec in man.items():
        by_wave.setdefault(rec["wave_dir"], set()).add(sid)
    parts: list[rd.Dataset] = []
    for wd, sids in sorted(by_wave.items()):
        cols = columns
        if cols is not None and "shard_id" not in cols:
            cols = list(cols) + ["shard_id"]
        ds = rd.read_parquet(wd, columns=cols)
        wanted = {str(s) for s in sids}

        def keep(t: pa.Table, _wanted=wanted) -> pa.Table:
            import pyarrow.compute as pc

            sid_col = pc.cast(t["shard_id"], pa.string())
            return t.filter(pc.is_in(sid_col, value_set=pa.array(_wanted)))

        parts.append(ds.map_batches(keep, batch_format="pyarrow"))
    if not parts:
        return rd.from_items([])
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def _write_wave_manifest(
    out_dir: str, wave_dir: str, shard_paths: list[str], wall_s: float
) -> None:
    """Derive per-shard lineage records from the DURABLE wave output.

    Reading back only the tiny metric columns (column-pruned parquet
    scan) means the manifest describes what is actually on disk — a
    crash before this point leaves the shard un-recorded and it simply
    reruns (SURVEY.md §7.4 hard part 4).
    """
    stats = rd.read_parquet(
        wave_dir, columns=["success", "processing_ms", "content_hash", "row_idx", "shard_id"]
    )

    def per_batch(df):
        import pandas as pd

        df = df.assign(shard_id=df["shard_id"].astype(int))
        rows = []
        for sid, g in df.groupby("shard_id"):
            rows.append(
                {
                    "shard_id": int(sid),
                    "n_rows": len(g),
                    "n_success": int(g["success"].sum()),
                    "processing_ms": int(g["processing_ms"].sum()),
                    "hash_xor": xor_hex_digests(g["content_hash"]),
                    "row_min": int(g["row_idx"].min()),
                    "row_max": int(g["row_idx"].max()),
                }
            )
        return pd.DataFrame(rows)

    # partial per-batch stats → tiny driver-side combine — the metric
    # columns are a few bytes/row; row data itself is never shuffled
    partials = stats.map_batches(per_batch, batch_format="pandas").to_pandas()
    grouped = partials.groupby("shard_id")
    for sid, g in grouped:
        rec = {
            "shard_id": int(sid),
            "path": shard_paths[int(sid)],
            "n_rows": int(g["n_rows"].sum()),
            "n_success": int(g["n_success"].sum()),
            "n_error": int(g["n_rows"].sum() - g["n_success"].sum()),
            "processing_ms": int(g["processing_ms"].sum()),
            "hash_xor": xor_hex_digests(g["hash_xor"]),
            "row_min": int(g["row_min"].min()),
            "row_max": int(g["row_max"].max()),
            "wave_dir": wave_dir,
            "wave_wall_s": round(wall_s, 3),
        }
        write_shard_record(out_dir, rec)
