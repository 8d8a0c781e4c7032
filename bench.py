"""Benchmark harness (driver contract: prints ONE JSON line, last).

Headline: the flagship extraction pipeline (pages parquet → classify →
actor-pool HTML extract → partitioned parquet + lineage manifest) over
the deterministic synthetic pages corpus sized for $GRAFT_SF_DIR
(sf0.1 → 200k pages, FIXTURES.md). Corpus generation and an OS
page-cache warm read are untimed; the measured wall-clock covers the
full streaming execution read→extract→write→manifest.

Also times a representative query set over the driver tables.

Env:
  GRAFT_SF_DIR   input table dir (default /root/testdata/sf0.1)
  RAY_GRAFT_CPUS num_cpus for ray.init (default 32)

`--scaling`: run the headline twice in fresh processes at num_cpus=8
and 32 on the SAME corpus; report throughputs + scaling efficiency
(the sandbox stand-in for the N vs 4N cluster-size criterion).
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import subprocess
import sys
import time


SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "q1_lineitem_agg",
    "q_broadcast_join",
    "q_top1_per_key",
    "q_history_page",
    "q_doc_exact_dedup",
    "q_doc_minhash_neardup",
    "q_ann_topk",
]


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level=logging.ERROR,
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from xs_vlm_ocr_ray.pipelines.extract import run_extract
    from xs_vlm_ocr_ray.pipelines.queries import QUERIES, pages_dir_for
    from xs_vlm_ocr_ray.sources.pages import read_pages_simple

    # --- corpus (cached, untimed) + warm the OS page cache ---
    pages_dir = pages_dir_for(SF_DIR)
    n_rows = read_pages_simple(pages_dir, columns=["url"]).count()

    # --- headline: full extraction pipeline ---
    out_dir = f"/tmp/xs_bench_out_{NUM_CPUS}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    summary = run_extract(pages_dir, out_dir, resume=False)
    headline = time.perf_counter() - t0
    docs_per_sec = n_rows / headline

    # --- representative query set over the driver tables ---
    q_times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        QUERIES[name](SF_DIR)
        q_times[name] = round(time.perf_counter() - t0, 3)

    result = {
        "metric": "flagship extraction wall-clock (read→extract→write→manifest)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": {"extract_pages": round(headline, 3), **q_times},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "pages": n_rows,
        "docs_per_sec": round(docs_per_sec, 1),
        "n_success": summary["n_success"],
        "n_error": summary["n_error"],
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same job, fresh processes, two parallelism levels (8 vs 32)."""

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo = one(lo)
    r_hi = one(hi)
    tp_lo = r_lo["docs_per_sec"]
    tp_hi = r_hi["docs_per_sec"]
    eff = (tp_hi / tp_lo) / (hi / lo)
    return {
        "metric": "throughput scaling efficiency (num_cpus 8 -> 32)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "docs_per_sec_8": tp_lo,
        "docs_per_sec_32": tp_hi,
        "sec_8": r_lo["value"],
        "sec_32": r_hi["value"],
        "pages": r_lo["pages"],
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
