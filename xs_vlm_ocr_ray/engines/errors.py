"""In-band error classification (SURVEY.md M19).

The reference distinguishes timeout / transport error (salvage-parse
attempted) / HTTP != 200 (server message extracted) / parse failure
(src/adapters/QwenAdapter.cpp:341-462, GLMAdapter.cpp:319-383,
PaddleAdapter.cpp:258-285). Here the classification is an in-band
``error_kind`` column; ``retryable`` feeds the pipeline-level retry
policy (retry rows whose kind is transient, never rows that will fail
identically again).
"""

from __future__ import annotations

KIND_NONE = ""
KIND_TIMEOUT = "timeout"
KIND_TRANSPORT = "transport"
KIND_HTTP = "http"
KIND_PARSE = "parse"
KIND_INPUT = "input"
KIND_INIT = "not_initialized"

_RETRYABLE = {KIND_TIMEOUT, KIND_TRANSPORT}


def classify_error(error: str) -> str:
    """Map an in-band error string to its kind (prefix convention)."""
    if not error:
        return KIND_NONE
    if error.startswith("timeout"):
        return KIND_TIMEOUT
    if error.startswith("transport"):
        return KIND_TRANSPORT
    if error.startswith("http_"):
        return KIND_HTTP
    if error.startswith("parse"):
        return KIND_PARSE
    if error.startswith("not_initialized"):
        return KIND_INIT
    if error.startswith(("empty_payload", "decode_error", "invalid")):
        return KIND_INPUT
    return KIND_PARSE


def is_retryable(error_kind: str) -> bool:
    """Transient kinds are retryable; deterministic failures are not.
    HTTP is retryable only for throttle/server codes (http_429/http_5xx)."""
    if error_kind in _RETRYABLE:
        return True
    if error_kind == KIND_HTTP:
        return False  # callers with a code use is_retryable_http
    return False


def is_retryable_http(status: int) -> bool:
    return status == 429 or 500 <= status < 600


def is_retryable_error(error: str) -> bool:
    """Raw-error form of the policy — what the in-band ``retryable``
    column should carry. Applies the HTTP throttle/server-code rule
    (http_429 / http_5xx retry; http_4xx don't): the status code is
    embedded in the error string by the prefix convention, and without
    parsing it here KIND_HTTP collapsed to never-retry, making the
    documented throttle policy unreachable through the column."""
    kind = classify_error(error)
    if kind == KIND_HTTP:
        import re

        m = re.match(r"http_(\d{3})", error)
        return m is not None and is_retryable_http(int(m.group(1)))
    return is_retryable(kind)
