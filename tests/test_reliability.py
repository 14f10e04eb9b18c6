"""Failure detection helpers: NaN guard and transient-error retry."""

import pytest

from edge_diffusion_tts_tpu.utils.reliability import (
    DivergenceError,
    make_nan_guard,
    retry_transient,
)


def test_nan_guard_triggers_after_patience():
    guard = make_nan_guard(patience=2)
    guard(1, 0.5)
    guard(2, float("nan"))  # streak 1 — tolerated
    with pytest.raises(DivergenceError):
        guard(3, float("inf"))  # streak 2


def test_nan_guard_resets_on_recovery():
    guard = make_nan_guard(patience=2)
    guard(1, float("nan"))
    guard(2, 0.3)  # recovery resets the streak
    guard(3, float("nan"))  # streak 1 again — no raise


def test_retry_transient_recovers():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("UNAVAILABLE: connection reset by peer")
        return "ok"

    assert retry_transient(flaky, base_delay_s=0.01) == "ok"
    assert calls["n"] == 3


def test_retry_transient_reraises_permanent():
    def broken():
        raise RuntimeError("invalid argument: shapes do not match")

    with pytest.raises(RuntimeError, match="shapes"):
        retry_transient(broken, base_delay_s=0.01)


def test_retry_transient_exhausts():
    def always():
        raise RuntimeError("INTERNAL: rpc failed")

    with pytest.raises(RuntimeError, match="INTERNAL"):
        retry_transient(always, max_retries=2, base_delay_s=0.01)
