"""Row-level retry policy (M19): transient rows healed by escalation,
deterministic failures never retried."""

import pyarrow as pa

from xs_vlm_ocr_ray.engines.retry import RetryingEngine
from xs_vlm_ocr_ray.engines.vlm_stub import StubVlmExtractor

GOOD = {"api_key": "k", "api_host": "h"}


def _batch(payloads):
    return pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(len(payloads))], pa.string()),
            "html": pa.array(payloads, pa.binary()),
        }
    )


def test_timeouts_healed_by_escalation():
    eng = RetryingEngine(
        StubVlmExtractor,
        {"params": GOOD, "row_timeout_ms": 1},
        retry_overrides={"row_timeout_ms": 60_000},
    )
    big = b"<p>" + b"looooong content " * 1000 + b"</p>"
    small = b"<p>short but plenty long enough to be a kept content block.</p>"
    out = eng(_batch([big, small, big]))
    assert out["success"].to_pylist() == [True, True, True]
    assert out["attempts"].to_pylist() == [2, 1, 2]
    assert out["error"].to_pylist() == ["", "", ""]


def test_deterministic_failures_not_retried():
    eng = RetryingEngine(
        StubVlmExtractor,
        {"params": {}},  # uninitialized → not_initialized, non-retryable
        retry_overrides={"params": GOOD},
        max_attempts=3,
    )
    out = eng(_batch([b"<p>x</p>"]))
    assert out["success"].to_pylist() == [False]
    assert out["attempts"].to_pylist() == [1]  # never retried


def test_exhausted_attempts_keep_error():
    eng = RetryingEngine(
        StubVlmExtractor,
        {"params": GOOD, "row_timeout_ms": 1},
        retry_overrides={"row_timeout_ms": 1},  # escalation doesn't help
        max_attempts=3,
    )
    big = b"<p>" + b"x" * 50_000 + b"</p>"
    out = eng(_batch([big]))
    assert out["success"].to_pylist() == [False]
    assert out["error_kind"].to_pylist() == ["timeout"]
    assert out["attempts"].to_pylist() == [3]


def test_retry_in_ray_pipeline(ray_session, tiny_pages_dir):
    """RetryingEngine as the map_batches stage in the real pipeline."""
    from xs_vlm_ocr_ray.pipelines.extract import build_extract_ds

    ds = build_extract_ds(
        tiny_pages_dir,
        engine_cls=RetryingEngine,
        engine_kwargs={
            "engine_cls": StubVlmExtractor,
            "engine_kwargs": {"params": GOOD, "row_timeout_ms": 5},
            "retry_overrides": {"row_timeout_ms": 60_000},
        },
    )
    df = ds.to_pandas()
    assert len(df) == 200
    # giant docs (>5 KB simulated ms) timed out on attempt 1, healed on 2
    assert (df["attempts"] == 2).any()
    assert df["success"].all()


def test_retry_null_retryable_and_lazy_escalation():
    """A null in the retryable column means 'not retryable', not a
    TypeError; the escalated engine is built lazily (heavy engines must
    not pay max_attempts× their footprint when nothing retries)."""
    import pyarrow as pa

    from xs_vlm_ocr_ray.engines.retry import RetryingEngine

    class NullableEngine:
        def __init__(self, **kw):
            pass

        def __call__(self, t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table(
                {
                    "url": t["url"],
                    "retryable": pa.array([None] * n, pa.bool_()),
                }
            )

    eng = RetryingEngine(NullableEngine, max_attempts=3)
    out = eng(pa.table({"url": pa.array(["a", "b"])}))
    assert out["attempts"].to_pylist() == [1, 1]
    assert eng._escalated is None  # nothing retried → never constructed


def test_http_codes_reach_retryable_column():
    """http_429/http_5xx are retryable through the in-band column;
    http_4xx and parse errors are not (the documented throttle policy
    was unreachable when KIND_HTTP collapsed to never-retry)."""
    from xs_vlm_ocr_ray.engines.errors import is_retryable_error

    assert is_retryable_error("http_429: throttled")
    assert is_retryable_error("http_503: unavailable")
    assert not is_retryable_error("http_404: not found")
    assert not is_retryable_error("http_bogus")
    assert is_retryable_error("timeout: slow")
    assert not is_retryable_error("parse: bad json")
