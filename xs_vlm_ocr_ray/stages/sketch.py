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
    """One batch of values → 2^p uint8 registers."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
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
    merged = hll_merge([np.asarray(r, dtype=np.uint8) for r in rows["regs"]])
    return int(round(hll_estimate(merged)))
