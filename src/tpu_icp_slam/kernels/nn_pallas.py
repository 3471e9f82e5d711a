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
(constant per row), so the per-tile score is

    e_ij = ‖b_j‖² − 2 a_i·b_j

where the cross term is ONE MXU matmul and ‖b_j‖² is a precomputed f32 row
vector added on the VPU (kept OUT of the matmul so its magnitude never
rides a low-precision contraction). True squared distances are recovered at
the end by adding ‖a_i‖² once per source point (then clamped ≥ 0).

Precision modes (the r2 A/B, VERDICT r1 item 3; "rescore" added r5):
- "highest": f32 multi-pass contraction. Bit-conservative; ~6 MXU passes.
- "rescore": EXACT-selection at near-bf16 cost (VERDICT r4 item 1). One
  bf16 MXU pass (same packed contraction as "bf16") acts as a PREFILTER:
  instead of folding tiles into a single running argmin, the kernel emits a
  per-(row, target-tile) top-1 shortlist — N/TN candidates per source
  point — and the true nearest neighbor is then selected OUTSIDE the kernel
  by an exact f32 difference-form rescore of the shortlist only (a gather of
  C≈8–64 candidate points per row plus elementwise work; ~free next to
  the M×N contraction). Near-tie selection jitter — the mechanism that
  diverged the 200-frame lap under plain bf16 (BASELINE.md r4 lap sweep) —
  is resolved in f32.

  The load-bearing structural trick is the DEAL-INTERLEAVE of the target:
  candidate slots (one per tile) only help near-ties that land in
  DIFFERENT tiles, and real target orders are adversarial — the voxel map
  is lexsorted and sensor scans are ring/angular-major, so the
  bf16-confusable near-ties (spatially adjacent points) are index-ADJACENT
  (and a naive blocked layout measured 10/256 wrong picks on the chip).
  Targets are therefore dealt round-robin across the tiles (permuted
  position j·TN + t holds original index t·(N/TN) + j), which places any
  run of up to N/TN adjacent indices in PAIRWISE-DISTINCT tiles — each
  near-tie reaches the f32 rescore as its own tile's candidate.
  extract_local re-sorts its selection back into map order for exactly
  this reason. A wrong pick needs two near-ties far apart in index that
  also collide mod-(N/TN) (tile_n auto-shrinks so N/TN ≥ 8 where shapes
  allow) — and the shortlist ALWAYS contains plain bf16's global pick, so
  the failure mode degrades to plain-bf16 selection (excess bounded by the
  bf16 score error) instead of compounding. Returned d² is exact
  (difference form), unlike the other modes' factored form. (A G-segment
  per-tile shortlist would multiply the slots at no extra traffic, but no
  formulation lowers on this Mosaic — see the comment at the `groups`
  constant.)
- "bf16": ONE bf16 MXU pass with TWO tricks stacked:
  1. recentering — subtract the valid-target bounding-box midpoint (f32) so
     bf16 sees scene-extent magnitudes, not world offsets;
  2. hi/lo lane packing — plain bf16 is still too coarse (score error
     ~|a|·|b|·2⁻⁹ ≈ metres² at 30 m extent, measured to mis-select by
     >1 m), so each coordinate splits Dekker-style into bf16 hi+lo halves
     and the cross products PLUS both squared-norm terms fold into one
     contraction (13 lanes, padded to 16):
         ã = [-2a_hi, -2a_lo, -2a_hi, ‖a‖²_hi, ‖a‖²_lo, 1, 1]
         b̃ = [ b_hi,   b_hi,   b_lo,  1,       1,  ‖b‖²_hi, ‖b‖²_lo]
         ã·b̃ ≈ ‖a‖² + ‖b‖² − 2 a·b = d²
     dropping only lo·lo terms (~1e-2 m²). Emitting d² itself (not the
     cross term) also removes the post-kernel ‖a‖² add and keeps the
     score small near the decision point. The MXU contraction is 128
     lanes wide — 13 lanes cost the same ONE pass as 3; ~6× fewer MXU
     passes than HIGHEST.

     CONFORMANCE CAVEAT (measured r2): under standard XLA semantics the
     bf16 dot accumulates in f32 (verified at the XLA level on axon:
     7.6e-6 max error) and this packing is near-exact — the CPU-interpret
     tests hold ≤5 cm selection excess under a 500 m world offset. The
     axon EMULATOR, however, accumulates Mosaic-lowered bf16 dots at
     bf16 (error ≈ term·2⁻⁷·⁴ regardless of formulation), so on this
     backend bf16 is an APPROXIMATE-selection mode (~0.1–0.6 m picked-
     neighbor excess at KITTI extents). Kept as the perf-path default
     anyway: callers recompute true residuals in f32 difference form
     from the returned index (icp/loop.py), so only correspondence
     *selection* jitters, and the measured end-to-end cost is ATE
     0.0153 vs 0.0082 m for +53% frames/s (BASELINE.md r2 A/B). On
     conformant hardware the mode is near-exact AND fast.

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

# Contraction lane counts: [x, y, z, 0…] padded to 8 for f32; the bf16
# hi/lo packing uses 3×3 = 9 lanes padded to 16 (bf16 sublane tile is 16).
# Both are far under the MXU's native 128-lane contraction — one pass each.
COORD_PAD = 8
COORD_PAD_BF16 = 16


def _nn_kernel(precision, src_ref, dst_ref, bsq_ref, dist_ref, idx_ref):
    j = pl.program_id(1)
    tn = dst_ref.shape[0]

    a = src_ref[:]  # (TM, 8): [-2x, -2y, -2z, 0...] (f32 or bf16)
    b = dst_ref[:]  # (TN, 8): [x, y, z, 0...]
    # ONE MXU op per tile: the cross term −2 a·b, f32 accumulation.
    e = jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # (TM, TN)
    e = e + bsq_ref[:]  # + ‖b‖² (f32 row vector, broadcast over TM)
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


def _nn_kernel_shortlist(precision, groups, src_ref, dst_ref, bsq_ref,
                         i1_ref):
    """Per-(row, target-tile) G-group shortlist variant (rescore mode).

    Emits the argmin of each of `groups` contiguous column segments — one
    pass over the score matrix, G candidates per (row, tile), expressed as
    a ROW-MAJOR RESHAPE (TM, TN) → (TM·G, TN/G) + one argmin + one
    dynamic-row store. Rejected formulations, all measured/failed on chip:
    per-group column slices each relayout a copy of e (6.06 ms vs bf16's
    1.77 at the 16k headline); partial-row dynamic stores don't lower
    ("dynamic store with unaligned indices"); 1-D concatenates don't lower
    ("input offsets outside the first tile"). The output block spans all
    target tiles ((N/TN, G·TM), revisited while j varies); row j holds the
    segment-LOCAL argmins laid out (src-row-major × group) — the caller
    adds the j·TN + g·W offsets and inverts the deal-interleave. Near-tie
    robustness comes from the deal across the (tile × group) slots (module
    docstring)."""
    j = pl.program_id(1)
    tm = src_ref.shape[0]
    tn = dst_ref.shape[0]
    a = src_ref[:]
    b = dst_ref[:]
    e = jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # (TM, TN)
    e = e + bsq_ref[:]
    if groups > 1:
        # row-major segmentation as a reshape — identity when groups == 1
        e = e.reshape(tm * groups, tn // groups)
    i1_ref[j, :] = jnp.argmin(e, axis=1).astype(jnp.int32)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("tile_m", "tile_n", "interpret", "precision")
)
def nn_bruteforce_pallas(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    tile_m: int = 0,
    tile_n: int = 0,
    interpret: bool | None = None,
    precision: str = "highest",  # highest | bf16 | rescore (see header)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(M, D), (N, D) f32 -> (idx (M,) int32, dist_sq (M,) f32).

    Shapes need not be tile-aligned; inputs are padded here (sentinel 1e6 for
    targets so padding never wins, zeros for sources whose outputs are sliced
    off). dist_sq comes from the factored form: recompute in difference form
    where f32 cancellation matters (icp.loop does) — EXCEPT rescore mode,
    whose dist_sq is already exact difference-form.

    Tile defaults (0 = auto): 512×8192 for highest/bf16, from the r4 honest
    sweep at the headline 16,384×131,072 regime (`scripts/exp_tiles_headline
    .py`, obs.realize fence, 2026-08-19: bf16 1.829 ms/call vs 1.953 at the
    old r2-era 1024×8192 — table in BASELINE.md "NN tile sweep"). Rescore
    mode defaults to 512×2048 and additionally auto-shrinks tile_n so at
    least ~8 tiles cover the target where shapes allow — the shortlist has
    one candidate per tile, and near-tie robustness needs adjacent-index
    runs (up to the tile count) to land in distinct tiles under the
    deal-interleave. Single-regime sweeps; pin tile_m/tile_n at call sites
    for very different shapes. (The r1 sweep numbers previously cited here
    were enqueue rates and were formally invalidated; 4096×8192 VMEM-OOMs
    at the 16 MB scoped limit, which still bounds tile_m·tile_n.)
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    m, dim = src.shape
    n, _ = dst.shape
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    if not tile_m:
        tile_m = 512
    if not tile_n:
        tile_n = 2048 if precision == "rescore" else 8192
    if precision == "rescore":
        # ≥ ~8 shortlist candidates where the target is big enough
        tile_n = min(tile_n, max(128, _round_up(-(-n // 8), 128)))
    tile_m = min(tile_m, _round_up(m, 8))
    tile_n = min(tile_n, _round_up(n, 128))
    mp = _round_up(m, tile_m)
    np_ = _round_up(n, tile_n)

    if precision in ("bf16", "rescore"):
        # Recenter on the valid-target bounding-box midpoint (f32) so bf16
        # sees scene-extent magnitudes, not world/sensor-range offsets. The
        # argmin is invariant to a common shift; padded slots (sentinel
        # ~1e6) are excluded from the stats but keep losing via ‖b‖².
        valid = jnp.all(jnp.abs(dst) < 1.0e5, axis=1, keepdims=True)
        big = jnp.float32(3.0e38)
        lo = jnp.min(jnp.where(valid, dst, big), axis=0)
        hi = jnp.max(jnp.where(valid, dst, -big), axis=0)
        any_valid = jnp.any(valid)
        center = jnp.where(any_valid, 0.5 * (lo + hi), 0.0)
        src = src - center
        dst = dst - center

    # padding rows first, then the extra lanes
    a_sq = jnp.sum(src * src, axis=1)  # (M,) for d² recovery
    src_p = jnp.pad(src, ((0, mp - m), (0, 0)))
    dst_p = jnp.pad(dst, ((0, np_ - n), (0, 0)), constant_values=1.0e6)
    ntj = np_ // tile_n
    # G-group shortlists (one candidate per contiguous column segment, G·ntj
    # slots) would multiply near-tie robustness for free in traffic terms,
    # but EVERY formulation fails on this Mosaic (measured 2026-08-20):
    # per-group column slices relayout full copies of e (6.06 ms vs bf16's
    # 1.77), the (TM,TN)→(TM·G,TN/G) reshape is an "unsupported shape
    # cast", partial-row dynamic stores and 1-D concatenates don't lower.
    # groups therefore stays 1 (per-TILE shortlist); robustness rests on
    # the deal-interleave + adjacency-coherent target layouts (lexsorted
    # maps — extract_local re-sorts its selection for exactly this — and
    # ring/angular-major sensor scans). Arbitrary target orders degrade
    # gracefully: ~1/ntj of near-tie pairs collide per tile and those picks
    # are still bounded by the bf16 score error (never worse than plain
    # bf16, whose global pick is always shortlisted).
    groups = 1
    w0 = tile_n // groups
    s_slots = ntj * groups
    dst_p_orig = dst_p  # original index order (the rescore gather's target)
    if precision == "rescore" and s_slots > 1:
        # deal-interleave across ALL (tile × group) shortlist slots:
        # permuted position p = j·TN + g·W + w holds original index
        # w·S + j·G + g, so runs of up to S adjacent original indices
        # (the sorted-layout near-tie clusters) land in pairwise-distinct
        # slots and each reaches the f32 rescore as its own candidate
        dst_p = dst_p.reshape(w0, ntj, groups, dim).transpose(
            1, 2, 0, 3
        ).reshape(np_, dim)
    b_sq = jnp.sum(dst_p * dst_p, axis=1)[None, :]  # (1, Np) f32, stays f32

    if precision in ("bf16", "rescore"):
        # hi/lo split (Dekker): x = hi + lo with hi = bf16(x). The ×(−2)
        # scale is exact in bf16 (exponent bump), so apply it post-split.
        a_hi = src_p.astype(jnp.bfloat16)
        a_lo = (src_p - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b_hi = dst_p.astype(jnp.bfloat16)
        b_lo = (dst_p - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        two = jnp.bfloat16(-2.0)
        # The norm terms ALSO ride the contraction (hi/lo split against a
        # 1-lane), so the kernel's accumulator output is d² itself rather
        # than the cross term: d² ≈ 0 exactly where selection is decided,
        # so any RELATIVE rounding of the dot output (measured on the axon
        # emulator: bf16-level rounding of the result, ~|e|·2⁻⁹, which
        # corrupted the cross-term formulation by ±0.15 m) becomes harmless.
        # bf16 products are exact in the f32 accumulator; the only absolute
        # errors left are the dropped lo·lo terms (~1e-2 m² at 40 m extent).
        a_sq32 = jnp.sum(src_p * src_p, axis=1, keepdims=True)
        b_sq32 = jnp.sum(dst_p * dst_p, axis=1, keepdims=True)
        asq_hi = a_sq32.astype(jnp.bfloat16)
        asq_lo = (a_sq32 - asq_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        bsq_hi = b_sq32.astype(jnp.bfloat16)
        bsq_lo = (b_sq32 - bsq_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        ones_a = jnp.ones_like(asq_hi)
        ones_b = jnp.ones_like(bsq_hi)
        a_aug = jnp.concatenate(
            [two * a_hi, two * a_lo, two * a_hi, asq_hi, asq_lo,
             ones_a, ones_a], axis=1)
        b_aug = jnp.concatenate(
            [b_hi, b_hi, b_lo, ones_b, ones_b, bsq_hi, bsq_lo], axis=1)
        lanes = COORD_PAD_BF16
        a_aug = jnp.pad(a_aug, ((0, 0), (0, lanes - (3 * dim + 4))))
        b_aug = jnp.pad(b_aug, ((0, 0), (0, lanes - (3 * dim + 4))))
        # the separate f32 ‖b‖² add is folded into the contraction here
        b_sq = jnp.zeros_like(b_sq)
        mxu_precision = jax.lax.Precision.DEFAULT
        passes = 1
    else:
        # Mosaic rejects Precision.HIGH (bf16x3); DEFAULT on f32 operands at
        # scene scale corrupts the cross term, so full-f32 passes (HIGHEST).
        lanes = COORD_PAD
        a_aug = jnp.pad(-2.0 * src_p, ((0, 0), (0, lanes - dim)))
        b_aug = jnp.pad(dst_p, ((0, 0), (0, lanes - dim)))
        mxu_precision = jax.lax.Precision.HIGHEST
        passes = 6
    grid = (mp // tile_m, np_ // tile_n)
    if precision == "rescore":
        i1 = pl.pallas_call(
            functools.partial(_nn_kernel_shortlist, mxu_precision, groups),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_m, lanes), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, lanes), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_n), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ntj, groups * tile_m),
                                   lambda i, j: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ntj, groups * mp), jnp.int32),
            cost_estimate=pl.CostEstimate(
                flops=2 * mp * np_ * lanes * passes,
                bytes_accessed=(mp + np_) * lanes * a_aug.dtype.itemsize
                + np_ * 4 + ntj * groups * mp * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(a_aug, b_aug, b_sq)
        # unpack: row j of i1 holds blocks of (tile_m × groups)
        # segment-LOCAL argmins per source block i; rebuild the global
        # PERMUTED position p = j·TN + g·W + local
        nb = mp // tile_m
        v = i1.reshape(ntj, nb, tile_m, groups)
        jv = jnp.arange(ntj, dtype=jnp.int32)[:, None, None, None]
        gv = jnp.arange(groups, dtype=jnp.int32)[None, None, None, :]
        p = v + jv * tile_n + gv * w0
        cand_p = p.transpose(1, 2, 0, 3).reshape(mp, s_slots)[:m]  # (m, S)
        if s_slots > 1:
            # invert the deal: o = w·S + j·G + g from p = j·TN + g·W + w
            jt = cand_p // tile_n
            c = cand_p % tile_n
            cand = (c % w0) * s_slots + jt * groups + c // w0
        else:
            cand = cand_p
        # exact f32 rescore of the shortlist (difference form — shift-
        # invariant, so the recentered coords are as exact as the originals;
        # sentinel-padded target rows carry ~1e6 coords and lose naturally)
        cp = dst_p_orig[cand]  # (m, C, D)
        diff = src[:, None, :] - cp
        d2c = jnp.sum(diff * diff, axis=-1)  # (m, C) exact f32
        best = jnp.argmin(d2c, axis=1)
        idx = jnp.take_along_axis(cand, best[:, None], axis=1)[:, 0]
        d2 = jnp.take_along_axis(d2c, best[:, None], axis=1)[:, 0]
        return idx.astype(jnp.int32), d2
    e_min, idx = pl.pallas_call(
        functools.partial(_nn_kernel, mxu_precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, lanes), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, lanes), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
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
            flops=2 * mp * np_ * lanes * passes,
            bytes_accessed=(mp + np_) * lanes * a_aug.dtype.itemsize
            + np_ * 4 + 2 * mp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_aug, b_aug, b_sq)
    if precision == "bf16":
        # the contraction already produced d² (norm lanes folded in)
        d2 = jnp.maximum(e_min[0, :m], 0.0)
    else:
        d2 = jnp.maximum(e_min[0, :m] + a_sq, 0.0)
    return idx[0, :m], d2
