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
    (b"GIF8", "image"),
    (b"BM", "image"),
    (b"RIFF", "image"),  # WEBP container
]


def classify_payload_kind(batch: pa.Table, payload_col: str = "html") -> pa.Table:
    col = batch[payload_col]
    # prefix of first 8 bytes, vectorized
    head = pc.binary_slice(col, 0, 8)
    kinds = np.full(len(batch), "html", dtype=object)
    lengths = pc.binary_length(col)
    empty_mask = pc.fill_null(pc.equal(lengths, 0), True)
    head_py = head.to_pylist()
    for i, h in enumerate(head_py):
        if h is None or h == b"":
            kinds[i] = "empty"
            continue
        for magic, kind in _MAGICS:
            if h.startswith(magic):
                kinds[i] = kind
                break
    # empty mask wins over magic
    em = empty_mask.to_numpy(zero_copy_only=False)
    kinds[em] = "empty"
    return batch.append_column(
        "payload_kind", pa.array(kinds, pa.string()).dictionary_encode()
    )
