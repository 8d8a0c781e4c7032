"""Payload classification (reference M1, SURVEY.md §2.3).

The reference routes each work item by payload validity/kind
(src/adapters/QwenAdapter.cpp:503, src/adapters/PaddleAdapter.cpp:89-94).
Here the same routing is a vectorized Arrow kernel appending a
``payload_kind`` dictionary column computed from magic bytes:

- ``html``  — non-empty payload that is not a known binary format
- ``pdf``   — %PDF- magic
- ``image`` — PNG / JPEG / GIF / BMP / WEBP magic
- ``empty`` — null or zero-length payload (→ in-band error downstream)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MAGICS: list[tuple[bytes, str]] = [
    (b"%PDF-", "pdf"),
    (b"\x89PNG\r\n\x1a\n", "image"),
    (b"\xff\xd8\xff", "image"),
    (b"GIF87a", "image"),
    (b"GIF89a", "image"),
]


def _classify_one(h: bytes) -> str:
    for magic, kind in _MAGICS:
        if h.startswith(magic):
            return kind
    # short prefixes need corroboration or plain text starting with the
    # same letters ("BMW dealers…", "RIFF format notes…") would be
    # routed to the image engine:
    # WEBP = RIFF container with the WEBP fourcc at offset 8
    if h.startswith(b"RIFF") and h[8:12] == b"WEBP":
        return "image"
    # BMP = "BM" + 4-byte size + 4 reserved ZERO bytes at offset 6
    if h.startswith(b"BM") and len(h) >= 10 and h[6:10] == b"\x00\x00\x00\x00":
        return "image"
    return "html"


def classify_payload_kind(batch: pa.Table, payload_col: str = "html") -> pa.Table:
    col = batch[payload_col]
    # prefix of first 12 bytes, vectorized slice; the Python loop runs
    # only over the 12-byte heads of NON-empty rows (the mask decides
    # empties vectorized — per-row magic sniffing over a dozen bytes is
    # the irreducible Python part)
    head = pc.binary_slice(col, 0, 12)
    lengths = pc.binary_length(col)
    empty_mask = pc.fill_null(pc.equal(lengths, 0), True)
    em = empty_mask.to_numpy(zero_copy_only=False)
    kinds = np.full(len(batch), "html", dtype=object)
    kinds[em] = "empty"
    for i, h in enumerate(head.to_pylist()):
        if not em[i]:
            kinds[i] = _classify_one(h)
    return batch.append_column(
        "payload_kind", pa.array(kinds, pa.string()).dictionary_encode()
    )
