"""Produce the committed golden fixtures (run once; rerun only when the
extraction contract deliberately changes).

The golden is the serial, Ray-free run of the single-source-of-truth
extractor (xs_vlm_ocr_ray.extract.extract_html) over the deterministic
tiny pages table (FIXTURES.md F1, 200 rows, seed=42). The Ray pipeline
must reproduce `extracted_text` byte-identically per url
(BASELINE.json gate).
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from xs_vlm_ocr_ray.extract import extract_html
from xs_vlm_ocr_ray.fixtures import gen_page
from xs_vlm_ocr_ray.functions.hashing import content_hash

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def main(n: int = 200, seed: int = 42) -> None:
    rows = []
    for i in range(n):
        p = gen_page(i, seed)
        r = extract_html(p["html"])
        rows.append(
            {
                "url": p["url"],
                "extracted_text": r.full_text,
                "success": r.success,
                "error": r.error,
                "n_spans": len(r.span_texts),
                "content_hash": content_hash(p["html"], "", "local_html", {}),
            }
        )
    t = pa.Table.from_pylist(rows)
    os.makedirs(OUT, exist_ok=True)
    dest = os.path.join(OUT, f"pages_tiny_golden_seed{seed}.parquet")
    pq.write_table(t, dest)
    print(f"wrote {t.num_rows} golden rows -> {dest}")


if __name__ == "__main__":
    main()
