"""Pallas TPU kernel: fused point-to-plane normal-equation accumulation (N6).

The 6×6 Gauss-Newton system H = Jᵀdiag(w)J, g = Jᵀ(w·r) with per-row
J = [nᵀ, (p×n)ᵀ] and r = nᵀ(p−q). The XLA path materializes J (M, 6) in HBM
and runs two matmuls; this kernel streams (TM, ·) tiles once through VMEM,
builds the Jacobian rows on the VPU (cross products + dot), and contracts
both products on the MXU into a revisited (8, 8) accumulator block — J never
exists in HBM. This is the TPU-native equivalent of the reference's fused
reduction kernels (SURVEY.md §2a R7 / §2c; mount empty, §0).

Lane layout: columns padded 6 → 8 (f32 sublane alignment); row tiles padded
with w = 0 so they contribute nothing. Output: H (8, 8) and g8 (1, 8); the
caller slices [..., :6].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 8


def _gn_kernel(p_ref, q_ref, n_ref, w_ref, h_ref, g_ref):
    i = pl.program_id(0)
    p = p_ref[:]  # (TM, 8): [x, y, z, 0, ...]
    q = q_ref[:]
    n = n_ref[:]
    w = w_ref[0, :]  # (TM,)

    px, py, pz = p[:, 0], p[:, 1], p[:, 2]
    nx, ny, nz = n[:, 0], n[:, 1], n[:, 2]
    # cross(p, n) on the VPU
    cx = py * nz - pz * ny
    cy = pz * nx - px * nz
    cz = px * ny - py * nx
    # residual r = n · (p − q)
    d = p - q
    r = d[:, 0] * nx + d[:, 1] * ny + d[:, 2] * nz

    zero = jnp.zeros_like(px)
    J = jnp.stack([nx, ny, nz, cx, cy, cz, zero, zero], axis=1)  # (TM, 8)
    Jw = J * w[:, None]
    h_tile = jax.lax.dot_general(
        J, Jw, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (8, 8)
    wr = (w * r)[:, None]  # (TM, 1)
    g_tile = jax.lax.dot_general(
        wr, J, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, 8)

    @pl.when(i == 0)
    def _init():
        h_ref[:, :] = h_tile
        g_ref[:, :] = g_tile

    @pl.when(i > 0)
    def _fold():
        h_ref[:, :] += h_tile
        g_ref[:, :] += g_tile


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret"))
def gn_accum_pallas(
    p: jnp.ndarray,
    q: jnp.ndarray,
    n: jnp.ndarray,
    w: jnp.ndarray,
    tile_m: int = 2048,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(M,3) p/q/n + (M,) w -> (H (6,6), g (6,)), fused single pass."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    m = p.shape[0]
    tile_m = min(tile_m, _round_up(m, 8))
    mp = _round_up(m, tile_m)

    def prep(x):
        x = jnp.pad(x.astype(jnp.float32), ((0, mp - m), (0, 0)))
        return jnp.pad(x, ((0, 0), (0, _LANES - x.shape[1])))

    p8, q8, n8 = prep(p), prep(q), prep(n)
    w_p = jnp.pad(w.astype(jnp.float32), (0, mp - m)).reshape(1, mp)

    grid = (mp // tile_m,)
    H, g = pl.pallas_call(
        _gn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_LANES, _LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((_LANES, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((1, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(p8, q8, n8, w_p)
    return H[:6, :6], g[0, :6]
