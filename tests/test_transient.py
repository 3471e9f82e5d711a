"""obs.transient: transient-fault classification and retry semantics."""

import jax
import pytest

from tpu_icp_slam.obs.transient import is_transient, retry_transient


def _jre(msg):
    return jax.errors.JaxRuntimeError(msg)


def test_is_transient_matches_observed_tunnel_fault():
    # the exact shape of the fault that killed the r3 endurance run
    e = _jre(
        "INTERNAL: http://127.0.0.1:8113/remote_compile: read body: "
        "response body closed before all bytes were read"
    )
    assert is_transient(e)


def test_is_transient_rejects_program_errors():
    assert not is_transient(_jre("INTERNAL: Mosaic failed to compile"))
    assert not is_transient(_jre("RESOURCE_EXHAUSTED: out of memory"))
    assert not is_transient(ValueError("response body closed"))  # not a JRE msg shape


def test_retry_transient_reissues_then_succeeds():
    calls = {"n": 0}

    def flaky(x):
        calls["n"] += 1
        if calls["n"] < 3:
            raise _jre("INTERNAL: read body: response body closed")
        return x + 1

    assert retry_transient(flaky, 41, retries=3, backoff_s=0.0) == 42
    assert calls["n"] == 3


def test_retry_transient_propagates_non_transient():
    def bad():
        raise _jre("INVALID_ARGUMENT: shapes do not match")

    with pytest.raises(jax.errors.JaxRuntimeError):
        retry_transient(bad, retries=3, backoff_s=0.0)


def test_retry_transient_exhausts():
    calls = {"n": 0}

    def always(x):
        calls["n"] += 1
        raise _jre("INTERNAL: read body: response body closed")

    with pytest.raises(jax.errors.JaxRuntimeError):
        retry_transient(always, 0, retries=2, backoff_s=0.0)
    assert calls["n"] == 3  # initial + 2 retries
