"""Nearest-neighbor dispatch: Pallas TPU kernel or XLA fallback.

`nearest_neighbor(src, dst, backend=...)`:
  - "pallas": the tiled MXU kernel (kernels/nn_pallas.py)
  - "xla":    the chunked distance-matrix fallback (kernels/nn_xla.py)
  - "auto":   pallas on TPU backends, xla elsewhere (CPU tests, debugging)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_icp_slam.kernels.nn_xla import nn_bruteforce_xla

_warned_precision_ignored = False


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def nearest_neighbor(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    backend: str = "auto",
    chunk: int = 2048,
    tile_m: int = 0,
    tile_n: int = 0,
    precision: str = "highest",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(M, D), (N, D) -> (idx (M,) int32, dist_sq (M,) f32).

    precision (pallas backend only): "highest" = f32 multi-pass MXU
    contraction; "bf16" = recentered single-pass (see nn_pallas.py header
    for why that's safe for correspondence *selection*); "rescore" =
    exact selection at near-bf16 cost (bf16 shortlist prefilter + f32
    difference-form rescore, nn_pallas.py header).
    """
    if backend == "auto":
        backend = "pallas" if _on_tpu() else "xla"
    if backend == "pallas":
        from tpu_icp_slam.kernels.nn_pallas import nn_bruteforce_pallas

        kw = {"precision": precision}
        if tile_m:
            kw["tile_m"] = tile_m
        if tile_n:
            kw["tile_n"] = tile_n
        return nn_bruteforce_pallas(src, dst, **kw)
    if backend == "xla":
        # "rescore" needs no warning here: the f32 fallback IS exact
        # selection, which is exactly what rescore promises.
        if precision not in ("highest", "rescore"):
            # bf16 mode exists only in the Pallas kernel; running the f32
            # fallback silently would make cross-backend A/B comparisons
            # vacuous (ADVICE r2) — warn once, loudly.
            global _warned_precision_ignored
            if not _warned_precision_ignored:
                _warned_precision_ignored = True
                import logging

                logging.getLogger(__name__).warning(
                    "nn_precision=%r requested but nn backend resolved to "
                    "'xla' (f32 only) — the precision setting is ignored on "
                    "this backend", precision,
                )
        return nn_bruteforce_xla(src, dst, chunk=chunk)
    raise ValueError(f"unknown NN backend: {backend}")
