"""Row-level retry policy (SURVEY.md M19 / §4.1 "Retries: design").

The reference makes ONE attempt per row and only classifies the error
(src/adapters/QwenAdapter.cpp:341-462); Ray retries whole tasks, not
rows. This wrapper closes the gap: rows whose in-band ``error_kind`` is
transient (``retryable`` column — timeouts, transport) are re-run
*inside the same task* against an escalated engine configuration (e.g.
a longer ``row_timeout_ms``), up to ``max_attempts``. Deterministic
failures (parse, input, auth) are never retried — they would fail
identically again.

In-task escalation keeps the pattern scalable: no second pass over the
corpus, no re-read of payloads, no extra shuffle; the retry touches
only the (rare) failed rows already in memory.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class RetryingEngine:
    """Wraps any engine class; usable anywhere the engine itself is
    (task-pool instance or actor-pool class via fn_constructor_kwargs).
    Emits the inner engine's schema plus an ``attempts`` column."""

    def __init__(
        self,
        engine_cls: type,
        engine_kwargs: dict | None = None,
        retry_overrides: dict | None = None,
        max_attempts: int = 2,
    ):
        engine_kwargs = dict(engine_kwargs or {})
        self.engine = engine_cls(**engine_kwargs)
        self._esc_cls = engine_cls
        self._esc_kwargs = {**engine_kwargs, **(retry_overrides or {})}
        self._escalated = None  # built on FIRST retry, reused after:
        # every escalation round uses the same config, and an eager
        # max_attempts-1 instances would multiply a heavy engine's
        # footprint (model weights, connection pools) per actor even
        # when no row ever retries
        self.max_attempts = max_attempts

    def _esc_engine(self):
        if self._escalated is None:
            self._escalated = self._esc_cls(**self._esc_kwargs)
        return self._escalated

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = self.engine(batch)
        attempts = np.ones(out.num_rows, dtype=np.int32)
        for _ in range(1, self.max_attempts):
            if "retryable" not in out.column_names:
                break
            # a null retryable (a row the engine never attempted /
            # nullable-bool schema) means "not retryable", not a crash:
            # the raw object-dtype numpy of a null-carrying bool column
            # holds None, and ~mask raises on it
            mask = pc.fill_null(out["retryable"], False).to_numpy(
                zero_copy_only=False
            )
            idx = np.nonzero(mask)[0]
            if len(idx) == 0:
                break
            fixed = self._esc_engine()(batch.take(idx))
            attempts[idx] += 1
            # patch via concat + positional take — no Python round-trip
            # of the unretried rows (they carry the large text payloads)
            keep_idx = np.nonzero(~mask)[0]
            merged = pa.concat_tables(
                [out.take(keep_idx), fixed.select(out.column_names)]
            )
            # merged row j came from original position order[j]; invert
            order = np.concatenate([keep_idx, idx])
            out = merged.take(pa.array(np.argsort(order)))
        return out.append_column("attempts", pa.array(attempts))
