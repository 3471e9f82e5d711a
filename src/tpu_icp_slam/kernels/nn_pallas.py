"""Pallas TPU kernel: tiled brute-force nearest neighbor (SURVEY.md §2b N3).

This is the TPU-native replacement for the reference's NN CUDA kernels — both
the brute-force all-pairs kernel and the KD-tree build/traverse pair
(SURVEY.md §2a R5/R6; mount empty, §0 — no file:line citations possible).
Pointer-chasing a KD-tree is hostile to the TPU's vector/matrix units; the
idiomatic design instead streams (TM × TN) tiles of the M×N interaction
matrix through the MXU and keeps a *running* (best, argbest) pair per source
point in the revisited output block — the full distance matrix never exists
anywhere, not even in VMEM.

Key trick: the argmin over j of ‖a_i − b_j‖² doesn't need the ‖a_i‖² term
(constant per row), and the ‖b_j‖² term can ride the matmul as an extra
contraction lane:

    e_ij = ‖b_j‖² − 2 a_i·b_j = ã_i · b̃_j,   ã = [−2a, 1],  b̃ = [b, ‖b‖²]

so the whole distance tile is ONE MXU matmul and the VPU does only the
min/argmin folds. True squared distances are recovered at the end by adding
‖a_i‖² once per source point (then clamped ≥ 0).

Grid: (M/TM, N/TN) with the target axis innermost, so each output block is
initialized at j == 0 and folded over all target tiles while resident in
VMEM — the standard Pallas reduction-over-inner-grid-dim pattern.

Padding: callers pad clouds with the PAD_COORD sentinel (core.pointcloud),
whose ‖b‖² ≈ 3e12 means padded target slots never win the argmin; padded
source rows produce garbage that the caller slices off.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Augmented coordinate width: [x, y, z, ‖·‖²-lane, 0, 0, 0, 0] — K=8 keeps the
# f32 contraction sublane-aligned.
COORD_PAD = 8


def _nn_kernel(precision, src_ref, dst_ref, dist_ref, idx_ref):
    j = pl.program_id(1)
    tn = dst_ref.shape[0]

    a = src_ref[:]  # (TM, 8): [-2x, -2y, -2z, 1, 0...]
    b = dst_ref[:]  # (TN, 8): [x, y, z, ‖b‖², 0...]
    # ONE MXU op per tile: e = ‖b‖² − 2 a·b. Full-f32 passes (HIGHEST):
    # Mosaic supports only DEFAULT (single bf16 pass — corrupts coordinates
    # at scene scale) and HIGHEST; with K=8 the matmul is ~6% MXU-utilized
    # either way, so the extra passes are not the bottleneck.
    e = jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # (TM, TN)
    local_best = jnp.min(e, axis=1)  # (TM,)
    local_arg = jnp.argmin(e, axis=1).astype(jnp.int32) + j * tn  # (TM,)

    @pl.when(j == 0)
    def _init():
        dist_ref[0, :] = local_best
        idx_ref[0, :] = local_arg

    @pl.when(j > 0)
    def _fold():
        prev = dist_ref[0, :]
        take_new = local_best < prev
        dist_ref[0, :] = jnp.where(take_new, local_best, prev)
        idx_ref[0, :] = jnp.where(take_new, local_arg, idx_ref[0, :])


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("tile_m", "tile_n", "interpret")
)
def nn_bruteforce_pallas(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    tile_m: int = 1024,
    tile_n: int = 8192,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(M, D), (N, D) f32 -> (idx (M,) int32, dist_sq (M,) f32).

    Shapes need not be tile-aligned; inputs are padded here (sentinel 1e6 for
    targets so padding never wins, zeros for sources whose outputs are sliced
    off). dist_sq comes from the factored form: recompute in difference form
    where f32 cancellation matters (icp.loop does).

    Tile defaults are the measured optimum of the fused scan-to-map pipeline
    on the axon v5e (512×4096: 31.7k fps, 1024×8192: 39.8k fps, 2048×8192:
    33.4k, 4096×8192: VMEM OOM at the 16 MB scoped limit).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    m, dim = src.shape
    n, _ = dst.shape
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    tile_m = min(tile_m, _round_up(m, 8))
    tile_n = min(tile_n, _round_up(n, 128))
    mp = _round_up(m, tile_m)
    np_ = _round_up(n, tile_n)

    # augmented layouts (padding rows first, then the extra lanes)
    a_sq = jnp.sum(src * src, axis=1)  # (M,) for d² recovery
    src_p = jnp.pad(src, ((0, mp - m), (0, 0)))
    dst_p = jnp.pad(dst, ((0, np_ - n), (0, 0)), constant_values=1.0e6)
    b_sq = jnp.sum(dst_p * dst_p, axis=1, keepdims=True)  # (Np, 1)
    ones = jnp.ones((mp, 1), jnp.float32)
    a_aug = jnp.concatenate([-2.0 * src_p, ones], axis=1)  # (Mp, D+1)
    b_aug = jnp.concatenate([dst_p, b_sq], axis=1)  # (Np, D+1)
    lanes_pad = COORD_PAD - (dim + 1)
    a_aug = jnp.pad(a_aug, ((0, 0), (0, lanes_pad)))
    b_aug = jnp.pad(b_aug, ((0, 0), (0, lanes_pad)))

    # Mosaic rejects Precision.HIGH (bf16x3); DEFAULT's single bf16 pass is
    # too coarse for scene-scale coordinates, so always use HIGHEST.
    precision = jax.lax.Precision.HIGHEST
    grid = (mp // tile_m, np_ // tile_n)
    e_min, idx = pl.pallas_call(
        functools.partial(_nn_kernel, precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, COORD_PAD), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, COORD_PAD), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_m), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, mp), jnp.float32),
            jax.ShapeDtypeStruct((1, mp), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * COORD_PAD,
            bytes_accessed=(mp + np_) * COORD_PAD * 4 + 2 * mp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_aug, b_aug)
    d2 = jnp.maximum(e_min[0, :m] + a_sq, 0.0)
    return idx[0, :m], d2
