"""Retry helper for transient backend/tunnel faults.

The axon TPU is reached through an HTTP tunnel; long runs occasionally see
one dispatch die with an INTERNAL error whose message is a transport
failure, not a program failure (measured r3: a 1,051-frame endurance run
died ~1 h in with ``INTERNAL: http://127.0.0.1:<port>/remote_compile: read
body: response body closed before all bytes were read`` inside a
loop-closure verification dispatch). Because JAX programs are pure, such a
dispatch is safe to re-issue with the same inputs.

This is the failure-detection/recovery mechanism SURVEY.md §5 mandates at
the dispatch level: value-based NaN detection catches poisoned *results*
(slam/runner.py), checkpoints catch process death (slam/checkpoint.py), and
this catches transport-level dispatch loss. Only errors matching known
transient signatures are retried — anything else (compile errors, OOM,
shape errors) re-raises immediately.
"""

from __future__ import annotations

import logging
import time
from typing import Callable, TypeVar

T = TypeVar("T")

log = logging.getLogger(__name__)

# substrings that identify a transport-level fault in a JaxRuntimeError
# message (each observed on the axon tunnel or standard gRPC transients)
TRANSIENT_SIGNATURES = (
    "response body closed",
    "read body",
    "remote_compile",
    "connection reset",
    "connection refused",
    "broken pipe",
    "unavailable",
    "deadline exceeded",
    "socket closed",
)


def is_transient(exc: BaseException) -> bool:
    """True when the exception message matches a known transport fault."""
    msg = str(exc).lower()
    if "internal" not in msg and "unavailable" not in msg:
        return False
    return any(sig in msg for sig in TRANSIENT_SIGNATURES)


def retry_transient(
    fn: Callable[..., T],
    *args,
    retries: int = 3,
    backoff_s: float = 5.0,
    **kwargs,
) -> T:
    """Call ``fn(*args, **kwargs)``, re-issuing on transient backend faults.

    Retries up to ``retries`` times with linear backoff (the tunnel needs a
    few seconds to re-establish). Non-transient exceptions propagate
    unchanged; the final transient failure propagates too.
    """
    import jax

    attempt = 0
    while True:
        try:
            return fn(*args, **kwargs)
        except jax.errors.JaxRuntimeError as e:
            if not is_transient(e) or attempt >= retries:
                raise
            attempt += 1
            wait = backoff_s * attempt
            log.warning(
                "transient backend fault (attempt %d/%d), retrying in %.0fs: %s",
                attempt, retries, wait, str(e).splitlines()[0][:200],
            )
            time.sleep(wait)
