import logging
import os

import pytest

os.environ.setdefault("RAY_DEDUP_LOGS", "0")


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level=logging.ERROR,
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_pages_dir(tmp_path_factory):
    """200-row deterministic pages table (FIXTURES.md tiny size), written
    serially as 4 fixed shards so shard contents are reproducible."""
    import pyarrow.parquet as pq

    from xs_vlm_ocr_ray.fixtures import pages_table

    d = tmp_path_factory.mktemp("pages_tiny")
    for s in range(4):
        t = pages_table(range(s * 50, (s + 1) * 50), seed=42)
        pq.write_table(t, d / f"shard-{s:03d}.parquet")
    return str(d)
