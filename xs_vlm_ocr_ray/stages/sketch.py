"""Distinct-count sketch (HyperLogLog) — the "novel sketch" custom
operator family (SURVEY.md §2.6 notes the reference has no sketches;
a 100 TB engine needs approximate distinct counts where exact
``unique()`` would shuffle every value).

Distributed shape: each batch reduces to ONE row holding its 2^p
register array (a few hundred bytes); registers merge by elementwise
max — associative/commutative, so the combine is a tiny driver-side
fold (or a one-row-per-batch groupby at cluster scale). No value ever
crosses the wire.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _hash64(values) -> np.ndarray:
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        b = str(v).encode("utf-8")
        out[i] = int.from_bytes(hashlib.blake2b(b, digest_size=8).digest(), "big")
    return out


def hll_partial(values, p: int = 12) -> np.ndarray:
    """One batch of values → 2^p uint8 registers. Nulls are skipped —
    SQL COUNT(DISTINCT) excludes them, and hashing ``str(None)`` would
    both count nulls as a distinct value and collide with a literal
    ``'None'`` string."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    values = [v for v in values if v is not None]
    if len(values) == 0:
        return regs
    h = _hash64(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)
    # rank = leading zeros of the remaining 64-p bits, +1
    ranks = np.empty(len(h), dtype=np.uint8)
    for i, r in enumerate(rest):
        r = int(r)
        if r == 0:
            ranks[i] = 64 - p + 1
        else:
            ranks[i] = min(64 - p + 1, 65 - r.bit_length())
    np.maximum.at(regs, idx, ranks)
    return regs


def hll_merge(partials: list[np.ndarray]) -> np.ndarray:
    out = partials[0].copy()
    for r in partials[1:]:
        np.maximum(out, r, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    est = _alpha(m) * m * m / np.sum(2.0 ** -regs.astype(np.float64))
    if est <= 2.5 * m:
        zeros = int(np.sum(regs == 0))
        if zeros:
            est = m * np.log(m / zeros)  # small-range correction
    return float(est)


def approx_distinct(ds: rd.Dataset, column: str, p: int = 12) -> int:
    """Distributed approximate COUNT(DISTINCT column): per-batch
    registers → driver fold → estimate (±~1.04/sqrt(2^p))."""

    def partial(t: pa.Table) -> pa.Table:
        regs = hll_partial(t[column].to_pylist(), p)
        return pa.table({"regs": pa.array([regs], pa.list_(pa.uint8(), len(regs)))})

    rows = ds.select_columns([column]).map_batches(
        partial, batch_format="pyarrow"
    ).to_pandas()
    if rows.empty:
        # zero input blocks: the partial never ran (schema-less collect)
        return 0
    merged = hll_merge([np.asarray(r, dtype=np.uint8) for r in rows["regs"]])
    return int(round(hll_estimate(merged)))


# --- approximate quantiles (mergeable fixed-grid histogram) ---------------


def approx_quantiles(
    ds: rd.Dataset,
    column: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    bins: int = 4096,
) -> list[float]:
    """Distributed approximate quantiles of a numeric column.

    Two passes, both partial-reduced (nothing but tiny summaries cross
    the wire):

    1. a (min, max) aggregate fixes a value grid;
    2. each batch reduces to ONE row holding its ``bins``-bucket count
       histogram over that grid; histograms merge by elementwise sum
       (associative/commutative, like the HLL registers above); the
       quantile is read off the merged CDF, interpolated inside its
       bucket.

    Error bound: a quantile is off by at most one bucket width,
    ``(max - min) / bins`` in VALUE terms (rank error depends on the
    distribution; pytest gates the value bound). Null values are
    ignored; an all-null/empty column returns NaNs.
    """
    import pyarrow.compute as pc

    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile out of range: {q}")

    def minmax_partial(t: pa.Table) -> pa.Table:
        col = t[column]
        return pa.table(
            {
                "lo": pa.array([pc.min(col).as_py()], pa.float64()),
                "hi": pa.array([pc.max(col).as_py()], pa.float64()),
                "n": pa.array([len(col) - col.null_count], pa.int64()),
            }
        )

    ds = ds.select_columns([column]).materialize()  # two passes, one read
    mm = ds.map_batches(minmax_partial, batch_format="pyarrow").to_pandas()
    # an empty dataset produces no partial rows at all (Ray skips the
    # fn on empty blocks) — treat like an all-null column
    n_total = int(mm["n"].sum()) if "n" in mm.columns else 0
    if n_total == 0:
        return [float("nan")] * len(qs)
    lo = float(mm["lo"].min())
    hi = float(mm["hi"].max())
    if hi == lo:
        return [lo] * len(qs)
    width = (hi - lo) / bins

    def hist_partial(t: pa.Table) -> pa.Table:
        v = t[column].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        idx = np.clip(((v - lo) / width).astype(np.int64), 0, bins - 1)
        counts = np.bincount(idx, minlength=bins).astype(np.int64)
        return pa.table({"h": pa.array([counts], pa.list_(pa.int64(), bins))})

    rows = ds.map_batches(hist_partial, batch_format="pyarrow").to_pandas()
    hist = np.zeros(bins, dtype=np.int64)
    for h in rows["h"]:
        hist += np.asarray(h, dtype=np.int64)
    cdf = np.cumsum(hist)
    out: list[float] = []
    for q in qs:
        target = q * n_total
        b = int(np.searchsorted(cdf, target, side="left"))
        b = min(b, bins - 1)
        prev = int(cdf[b - 1]) if b > 0 else 0
        inside = int(hist[b])
        frac = ((target - prev) / inside) if inside else 0.0
        out.append(lo + (b + min(max(frac, 0.0), 1.0)) * width)
    return out
