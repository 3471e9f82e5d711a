"""Pallas TPU kernel: the ENTIRE point-to-plane ICP loop in one pallas_call.

Motivation (BASELINE.md r3 speed-of-light decomposition): at the flagship
KITTI regime each ICP iteration costs ~1.0-1.2 ms wall of which only
~0.74 ms is traced device work — the rest is per-`while_loop`-step backend
overhead, and the iteration itself is split across four dispatch units
(NN kernel, XLA gather, GN kernel, XLA solve) with HBM round-trips for the
correspondence index/coordinate arrays between them. This kernel keeps the
scan, the local model, and ALL iteration state resident in VMEM and runs
the full iterate-until-converged loop on-core:

    All point arrays are stored TRANSPOSED — (8|16 rows, N points-on-lanes)
    — because (N, 8)/(N, 16) layouts pad their narrow last dim to 128 lanes
    (6-12% utilization; measured 20.11 MB resident -> compile-time VMEM OOM
    at the 16,384x16,384 flagship regime, r4).

    while not converged and it < max_iters:
      1. cur  = T @ src                         (one (8,8)x(8,M) MXU pass)
      2. NN   = tiled d^2-packed bf16 argmin     (same math as nn_pallas
               over the model                     "bf16" mode, incl. hi/lo
                                                  Dekker lane packing)
      3. q,n  = one-hot(argmin) @ [model|modelN] (gather AS A MATMUL — see
                                                  "gather-free" note below)
      4. w    = dist gate * coverage gate * src mask * Huber
      5. H,g  = J^T W J, J^T W r                 (two MXU passes, J on VPU)
      6. xi   = damped 6x6 Cholesky solve        (unrolled scalar code)
               + trust clamps + step scaling
      7. T    = exp(xi) @ T                      (Rodrigues, scalar code)
      8. converged = |rmse - prev| < tol or step < tol_update

The host sees ONE kernel launch per align; the correspondence arrays never
exist in HBM. Semantics mirror icp.loop.align_with_correspondence +
slam.scan_to_map's coverage-gated correspondence for the supported config
subset (3D point-to-plane, no Anderson, no normal gate); equivalence is
test-enforced against that path (tests/test_icp_fused.py).

This is the TPU-native analogue of fusing the reference's per-iteration
kernel relay (transform -> NN -> reduce -> solve, SURVEY.md §3a; mount
empty, §0) into a single resident program.

Precision: the NN selection uses the same recentered hi/lo-packed bf16
contraction as kernels/nn_pallas.py (one MXU pass; see the conformance
caveat in that header — on the axon emulator selection is approximate, on
conformant hardware near-exact). All residual/GN math is f32: distances
are recomputed in difference form from the gathered q, exactly like the
unfused path. A "highest" mode runs the NN contraction in full f32.

Gather-free correspondence fetch: Mosaic's `lax.gather` lowering supports
only same-shape take_along_axis (jax pallas/mosaic/lowering.py
_gather_lowering_rule — verified: the original in-kernel dynamic row
gather `dstc_ref[:][arg, :]` raises "Shape mismatch in input, indices and
output" when lowered for TPU; it only ever worked in CPU interpret mode).
The TPU-native replacement: inside the NN fold, each (TM, TN) distance
tile's local argmin is turned into a one-hot matrix and the matched model
row is fetched with ONE extra MXU pass per tile,

    qn_tile = onehot(ll) @ [dst_hi | dst_lo | nrm_hi | nrm_lo]   (TM, 16)

folded across model tiles with the same `take` mask as the running argmin.
In bf16 mode the operand is Dekker hi/lo packed bf16, and one-hot rows make
every MXU product exact (1.0·bf16 with all other terms +0.0), so the
reconstructed q = q_hi + q_lo recovers the f32 model coordinates to ~2^-16
relative (bf16 carries ~9 bits of precision per limb) — mm-exact at map
scale — even with non-conformant bf16 accumulation. In "highest" mode the
fetch is one f32 HIGHEST-precision pass against the f32 [coords|normals]
operand instead: exact f32 end to end (advisor r3 — routing the highest
tier through the bf16 hi/lo operand silently weakened its residual
promise). Either way it costs ≈ one extra MXU pass per tile, buys TPU
compilability, and keeps correspondence arrays out of HBM entirely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_L8 = 8  # f32 lane padding for coordinate arrays
_L16 = 16  # bf16 lane padding for the packed NN contraction


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _split_hi_lo(x: jnp.ndarray):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def fused_tile_shrink(m: int, n: int, tile_m: int, tile_n: int):
    """VMEM-aware tile shrink for the fused kernel (pure, testable).

    Everything is resident (operands + scratch, ~168 B/src col + ~100
    B/model col in the transposed layout — the pre-transpose (N, 8)
    layouts padded 8 lanes to 128 and measured 20.11 MB resident at the
    flagship regime, a compile-time OOM) PLUS the per-fold temporaries
    (distance tile f32, one-hot, and Mosaic's intermediate copies).
    Budget 13 MB of the 16 MB scope leaves slack; callers can still pin
    tiles via nn_tile_m/n but the shrink is a floor against compile OOM.

    Calibration history (flagship 16,384x16,384, compiler-reported scoped
    allocations): pre-transpose resident alone was 20.11M; transposed with
    1024x512 tiles measured 17.67M => resident ~5.8M (the (1, Mp) rows
    pad 1->8 sublanes) and ~23 B per tile element (Mosaic carries several
    copies of the distance tile through min/argmin/one-hot).
    r5 RECALIBRATION: the r4 coefficient was an UNDERESTIMATE — the r5
    fused A/B still compile-OOMed at the flagship regime (17.61M scoped vs
    the 16M limit at the shrunken tiles), implying ~47-58 B per tile
    element on the current kernel (more Mosaic-carried copies through the
    min/argmin/one-hot/fold chain than r4's measurement). 50 B/elem keeps
    ~3 MB of headroom at the tiles this now selects — and compiled on the
    chip for the first time (scripts/exp_fused_smoke.py, r5b queue).

    Returns (tile_m, tile_n, vmem_estimate_bytes). Guarded by
    tests/test_icp_fused.py::test_vmem_shrink_flagship_regime so a future
    recalibration can't silently reopen the compile-OOM class.
    """
    tile_m_ = min(tile_m, _round_up(m, 128))
    tile_n_ = min(tile_n, _round_up(n, 128))
    # the estimate deliberately uses the PRE-shrink padded extents: resident
    # operand cost does not shrink with the tiles
    mp = _round_up(m, tile_m_)
    np_ = _round_up(n, tile_n_)

    def _vmem_est(tm, tn):
        return mp * 200 + np_ * 120 + tm * tn * 50

    while (tile_n_ > 256 and tile_n_ % 256 == 0
           and _vmem_est(tile_m_, tile_n_) > 13_000_000):
        tile_n_ = tile_n_ // 2
    while (tile_m_ > 256 and tile_m_ % 256 == 0
           and _vmem_est(tile_m_, tile_n_) > 13_000_000):
        tile_m_ = tile_m_ // 2
    return tile_m_, tile_n_, _vmem_est(tile_m_, tile_n_)


def _chol6_solve(h, g):
    """Unrolled 6x6 Cholesky solve of H xi = -g on scalars.

    h: 6x6 nested list of scalar values, g: list of 6 scalars.
    Returns xi as a list of 6 scalars. NaN-guarding is done by the caller
    (mirrors icp.point_to_plane.solve_increment's finite check).
    """
    L = [[jnp.float32(0.0)] * 6 for _ in range(6)]
    for j in range(6):
        s = h[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        # guard: a non-positive pivot yields NaN -> caught by the caller's
        # finite check, same as jnp.linalg.cholesky would
        L[j][j] = jnp.sqrt(s)
        inv = 1.0 / L[j][j]
        for i in range(j + 1, 6):
            s = h[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    # forward: L y = -g
    y = [jnp.float32(0.0)] * 6
    for i in range(6):
        s = -g[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # backward: L^T xi = y
    xi = [jnp.float32(0.0)] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * xi[k]
        xi[i] = s / L[i][i]
    return xi


def _acos_scalar(x):
    """arccos via the Abramowitz–Stegun 4.4.45 polynomial (|err| ≤ 5e-5
    rad): Mosaic has NO inverse-trig lowering (acos/asin/atan/atan2 all
    unimplemented — the r4 fused A/B failed at trace time on `acos` the
    moment the in-kernel trust region pulled in the log map). Branchless:
    sqrt/mul/add/select only.
    """
    t = jnp.abs(x)
    p = jnp.sqrt(jnp.maximum(1.0 - t, 0.0)) * (
        1.5707288 + t * (-0.2121144 + t * (0.0742610 + t * (-0.0187293)))
    )
    return jnp.where(x >= 0.0, p, jnp.float32(np.pi) - p)


def _se3_log_scalars(R, t):
    """se3.log on scalars: (R 3x3 lists, t 3 list) -> xi = [rho(3), phi(3)].

    Matches core.se3.log including the small-angle branches (theta via the
    polynomial arccos above, ~5e-5 rad). Used by the in-kernel motion
    prior and the trust region (cost λ/2‖log(T·T0⁻¹)‖², mirroring
    icp.loop's prior_w/xi_prior path).
    """
    tr = R[0][0] + R[1][1] + R[2][2]
    cos_t = jnp.clip(0.5 * (tr - 1.0), -1.0, 1.0)
    theta = _acos_scalar(cos_t)
    t2 = theta * theta
    small = t2 < 1e-8
    # phi = theta/(2 sin theta) * vee(R - R^T); small-angle -> 0.5 * vee
    s = jnp.sin(theta)
    k = jnp.where(small, 0.5 + t2 / 12.0, theta / jnp.maximum(2.0 * s, 1e-12))
    phi = [k * (R[2][1] - R[1][2]), k * (R[0][2] - R[2][0]),
           k * (R[1][0] - R[0][1])]
    # V^{-1} = I - 0.5 W + c W^2, c = (1 - A/(2B))/theta^2, small -> 1/12
    A = jnp.where(small, 1.0 - t2 / 6.0, s / jnp.maximum(theta, 1e-12))
    B = jnp.where(small, 0.5 - t2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.maximum(t2, 1e-16))
    c = jnp.where(small, 1.0 / 12.0,
                  (1.0 - A / jnp.maximum(2.0 * B, 1e-12))
                  / jnp.maximum(t2, 1e-16))
    wx, wy, wz = phi
    W = [[jnp.float32(0.0), -wz, wy], [wz, jnp.float32(0.0), -wx],
         [-wy, wx, jnp.float32(0.0)]]
    W2 = [[W[i][0] * W[0][j] + W[i][1] * W[1][j] + W[i][2] * W[2][j]
           for j in range(3)] for i in range(3)]
    eye = [[jnp.float32(1.0 if i == j else 0.0) for j in range(3)]
           for i in range(3)]
    Vinv = [[eye[i][j] - 0.5 * W[i][j] + c * W2[i][j] for j in range(3)]
            for i in range(3)]
    rho = [Vinv[i][0] * t[0] + Vinv[i][1] * t[1] + Vinv[i][2] * t[2]
           for i in range(3)]
    return rho + phi


def _orig_correction_scalars(Tc_, T0_, cc):
    """Original-frame correction X = S·(T_cent·T0c⁻¹)·S⁻¹ on scalars.

    Tc_: current T (recentered frame) as 4x4 scalar lists; T0_: init T in
    the recentered frame; cc: the recenter offset c. With X_cent =
    T_cent·T0c⁻¹ the original-frame correction keeps the rotation and has
    t_orig = t_x + c − R_x·c (shift conjugation). Shared by the in-kernel
    motion prior and the total-correction trust region.
    """
    R0T = [[T0_[j][i] for j in range(3)] for i in range(3)]
    t0i = [-(R0T[i][0] * T0_[0][3] + R0T[i][1] * T0_[1][3]
             + R0T[i][2] * T0_[2][3]) for i in range(3)]
    Rx = [[Tc_[i][0] * R0T[0][j] + Tc_[i][1] * R0T[1][j]
           + Tc_[i][2] * R0T[2][j] for j in range(3)]
          for i in range(3)]
    tx = [Tc_[i][0] * t0i[0] + Tc_[i][1] * t0i[1]
          + Tc_[i][2] * t0i[2] + Tc_[i][3] for i in range(3)]
    t_orig = [tx[i] + cc[i]
              - (Rx[i][0] * cc[0] + Rx[i][1] * cc[1]
                 + Rx[i][2] * cc[2]) for i in range(3)]
    return Rx, t_orig


def _se3_exp_scalars(xi):
    """se3.exp on scalars: xi = [rho(3), phi(3)] -> (R 3x3 lists, t 3 list).

    Matches core.se3.exp including the small-angle Taylor branches.
    """
    rho, phi = xi[:3], xi[3:]
    t2 = phi[0] * phi[0] + phi[1] * phi[1] + phi[2] * phi[2]
    theta = jnp.sqrt(t2 + jnp.float32(1e-16))
    small = t2 < 1e-8
    A = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(t2, 1e-16))
    C = jnp.where(
        small, 1.0 / 6.0 - t2 / 120.0,
        (theta - jnp.sin(theta)) / jnp.maximum(t2 * theta, 1e-24),
    )
    wx, wy, wz = phi
    W = [[jnp.float32(0.0), -wz, wy], [wz, jnp.float32(0.0), -wx],
         [-wy, wx, jnp.float32(0.0)]]
    W2 = [[W[i][0] * W[0][j] + W[i][1] * W[1][j] + W[i][2] * W[2][j]
           for j in range(3)] for i in range(3)]
    eye = [[jnp.float32(1.0 if i == j else 0.0) for j in range(3)]
           for i in range(3)]
    R = [[eye[i][j] + A * W[i][j] + B * W2[i][j] for j in range(3)]
         for i in range(3)]
    V = [[eye[i][j] + B * W[i][j] + C * W2[i][j] for j in range(3)]
         for i in range(3)]
    t = [V[i][0] * rho[0] + V[i][1] * rho[1] + V[i][2] * rho[2]
         for i in range(3)]
    return R, t


def _icp_kernel(
    # static python params baked via functools.partial
    params,
    # scalar-prefetch style inputs (SMEM): r_gate etc.
    rgate_ref,
    # VMEM inputs — ALL point arrays are TRANSPOSED (lanes along points).
    # The original (Np, 8)/(Np, 16) layouts padded their narrow last dim to
    # 128 lanes (6-12% lane utilization): ~20.11 MB resident at the
    # 16,384x16,384 flagship regime, a measured compile-time VMEM OOM (r4).
    # (rows, Np) layouts use every lane: ~4.4 MB for the same data.
    src_ref,    # (8, Mp) f32 rows [x; y; z; 1; 0...]; padded cols zero
    smask_ref,  # (1, Mp) f32 source validity
    dstc_ref,   # (8, Np) f32 RECENTERED model rows [x; y; z; nx; ny; nz; 0; 0]
                # (normals ride rows 3..5: the source operand's rows 3..7
                # are zeroed, so they never enter the NN contraction; the
                # highest-mode f32 gather fetches coords+normals in one pass)
    baug_ref,   # (16, Np) bf16 packed model rows (d^2 trick) — bf16 mode
    bsq_ref,    # (1, Np) f32 ||b||^2 of recentered model — highest mode
    gat_ref,    # (16, Np) bf16 gather operand rows [d_hi(3); d_lo(3); n_hi(3); n_lo(3); 0(4)]
    initT_ref,  # (8, 8) f32, top-left 4x4 = initial T (recentered frame)
    # outputs
    outT_ref,   # (8, 8) f32
    stats_ref,  # (1, 8) f32: [rmse, iters, n_inl, converged, 0...]
    # scratch
    T_ref,      # (8, 8) f32 current transform
    cur_ref,    # (8, Mp) f32 transformed source
    aaug_ref,   # (16, Mp) bf16 packed source rows
    best_ref,   # (1, Mp) f32 running best NN score
    qn_ref,     # (16, Mp) f32 gathered correspondence rows [q_hi; q_lo; n_hi; n_lo]
    h_ref,      # (8, 8) f32 normal equations accumulator
    sg_ref,     # (1, 16) f32 [g(6) | wsum, wd2, ninl, ...] accumulator
):
    (tile_m, tile_n, mp, np_, max_iters, tol, tol_update, max_d2, huber,
     damping, step_scale, max_step_trans, max_step_rot, min_inliers,
     precision, prior_t, prior_r, max_total_trans, max_total_rot) = params
    nmt = mp // tile_m
    nnt = np_ // tile_n
    f32 = jnp.float32

    T_ref[:, :] = initT_ref[:, :]
    r_gate = rgate_ref[0]
    # recenter offset c: cur is in the SHIFTED frame; the coverage gate is
    # measured from the sensor origin of the ORIGINAL frame, i.e. on cur + c
    c0, c1, c2 = rgate_ref[1], rgate_ref[2], rgate_ref[3]

    row_xyz = (jax.lax.broadcasted_iota(jnp.int32, (_L8, 1), 0) < 3
               ).astype(f32)  # column mask [1;1;1;0;...]

    def one_iteration(prev_rmse):
        # ---- 1. transform: cur = T @ src (contract row dims) --------------
        cur = jax.lax.dot_general(
            T_ref[:, :], src_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (8, Mp): rows [x'; y'; z'; 1; 0...]
        cur = cur * row_xyz  # zero the homogeneous/pad rows
        cur_ref[:, :] = cur

        # ---- 2. pack source rows for the NN contraction -------------------
        if precision == "bf16":
            a_hi, a_lo = _split_hi_lo(cur)
            asq = jnp.sum(cur * cur, axis=0, keepdims=True)  # (1, Mp)
            asq_hi, asq_lo = _split_hi_lo(asq)
            two = jnp.bfloat16(-2.0)
            one = jnp.ones_like(asq_hi)
            # row layout MUST mirror the (transposed) model packing:
            #   a: [-2a_hi(3); -2a_lo(3); -2a_hi(3); asq_hi; asq_lo; 1; 1]
            #   b: [ b_hi(3);   b_hi(3);   b_lo(3);  1;      1; bsq_hi; bsq_lo]
            aaug_ref[:, :] = jnp.concatenate(
                [two * a_hi[0:3], two * a_lo[0:3],
                 two * a_hi[0:3], asq_hi, asq_lo, one, one,
                 jnp.zeros_like(a_hi[0:3])], axis=0)
        # highest mode reads cur_ref directly in the NN tiles (f32 end to
        # end); routing through the bf16 aaug scratch would silently lose
        # the precision the mode promises

        # ---- 3. tiled NN argmin over the model ----------------------------
        def src_tile(i, _):
            def dst_tile(j, _):
                if precision == "bf16":
                    a_tile = aaug_ref[:, pl.ds(i * tile_m, tile_m)]
                    b_tile = baug_ref[:, pl.ds(j * tile_n, tile_n)]
                    e = jax.lax.dot_general(
                        a_tile, b_tile,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=f32,
                        precision=jax.lax.Precision.DEFAULT,
                    )  # (TM, TN) ≈ d^2 directly
                else:
                    # e = ||b||^2 - 2 a·b (row-constant ||a||^2 omitted —
                    # argmin-invariant), all f32
                    a_tile = cur_ref[:, pl.ds(i * tile_m, tile_m)]
                    e = jax.lax.dot_general(
                        a_tile,
                        dstc_ref[:, pl.ds(j * tile_n, tile_n)],
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=f32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    e = (bsq_ref[0, pl.ds(j * tile_n, tile_n)][None, :]
                         - 2.0 * e)
                lb = jnp.min(e, axis=1)  # (TM,)
                ll = jnp.argmin(e, axis=1).astype(jnp.int32)  # in-tile idx

                # gather-as-matmul (header note): one-hot rows fetch the
                # matched model column.
                oh_i = jax.lax.broadcasted_iota(
                    jnp.int32, (tile_m, tile_n), 1) == ll[:, None]
                if precision == "bf16":
                    # packed hi/lo coords+normals; exact per lane: each
                    # output is 1.0*bf16 + zeros (~2^-16 on reconstruction)
                    qn_tile = jax.lax.dot_general(
                        gat_ref[:, pl.ds(j * tile_n, tile_n)],
                        oh_i.astype(jnp.bfloat16),
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=f32,
                        # explicit: the ambient jax_default_matmul_precision
                        # is HIGHEST (core/__init__), which Mosaic rejects
                        # for bf16 operands; one-hot rows make DEFAULT exact
                        precision=jax.lax.Precision.DEFAULT,
                    )  # (16, TM)
                else:
                    # exact f32 fetch against the f32 [coords|normals]
                    # operand (advisor r3): one HIGHEST pass; 1.0*f32 is
                    # exact through the hi/lo MXU decomposition. Re-spread
                    # to the hi/lo row layout gn_tile reconstructs from
                    # (lo rows zero -> q_hi + 0 = exact q).
                    qt = jax.lax.dot_general(
                        dstc_ref[:, pl.ds(j * tile_n, tile_n)],
                        oh_i.astype(f32),
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=f32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # (8, TM): rows [q(3); n(3); 0; 0]
                    z = jnp.zeros((3, tile_m), f32)
                    qn_tile = jnp.concatenate(
                        [qt[0:3], z, qt[3:6], z,
                         jnp.zeros((_L16 - 12, tile_m), f32)], axis=0)

                def init():
                    best_ref[0, pl.ds(i * tile_m, tile_m)] = lb
                    qn_ref[:, pl.ds(i * tile_m, tile_m)] = qn_tile

                def fold():
                    prev = best_ref[0, pl.ds(i * tile_m, tile_m)]
                    take = lb < prev
                    best_ref[0, pl.ds(i * tile_m, tile_m)] = jnp.where(
                        take, lb, prev)
                    pq = qn_ref[:, pl.ds(i * tile_m, tile_m)]
                    qn_ref[:, pl.ds(i * tile_m, tile_m)] = jnp.where(
                        take[None, :], qn_tile, pq)

                jax.lax.cond(j == 0, init, fold)
                return 0

            jax.lax.fori_loop(0, nnt, dst_tile, 0, unroll=False)
            return 0

        jax.lax.fori_loop(0, nmt, src_tile, 0, unroll=False)

        # ---- 4. gather correspondences + build weights, 5. GN -------------
        def gn_tile(i, _):
            sl = pl.ds(i * tile_m, tile_m)
            qn = qn_ref[:, sl]  # (16, TM) gathered rows [q_hi; q_lo; n_hi; n_lo]
            qx = qn[0] + qn[3]
            qy = qn[1] + qn[4]
            qz = qn[2] + qn[5]
            nx = qn[6] + qn[9]
            ny = qn[7] + qn[10]
            nz = qn[8] + qn[11]
            p = cur_ref[:, sl]  # (8, TM)
            dx = p[0] - qx
            dy = p[1] - qy
            dz = p[2] - qz
            d2 = dx * dx + dy * dy + dz * dz  # f32 difference form, (TM,)
            w = (d2 <= max_d2).astype(f32) * smask_ref[0, sl]
            # coverage gate: scan points beyond the model's coverage radius
            # must not latch onto its boundary (slam.scan_to_map). Measured
            # in the ORIGINAL sensor frame: ||cur + c||.
            g0 = p[0] + c0
            g1 = p[1] + c1
            g2 = p[2] + c2
            pn2 = g0 * g0 + g1 * g1 + g2 * g2
            w = w * (pn2 <= r_gate * r_gate).astype(f32)
            n_inl_t = w  # inlier indicator BEFORE Huber downweighting
            if huber > 0.0:
                dist = jnp.sqrt(jnp.maximum(d2, 1e-20))
                w = w * jnp.minimum(1.0, huber / dist)
            px, py, pz = p[0], p[1], p[2]
            cx = py * nz - pz * ny
            cy = pz * nx - px * nz
            cz = px * ny - py * nx
            r = dx * nx + dy * ny + dz * nz
            zero = jnp.zeros_like(px)
            J = jnp.stack([nx, ny, nz, cx, cy, cz, zero, zero], axis=0)
            Jw = J * w[None, :]  # (8, TM)
            h_tile = jax.lax.dot_general(
                J, Jw, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )  # (8, 8)
            # stats lanes: [g(6) | wsum, wd2] via ONE contraction: S rows
            # = [J*w*r (6); w; w*d2; ...] summed over points by a ones dot
            wr = w * r
            S = jnp.stack(
                [nx * wr, ny * wr, nz * wr, cx * wr, cy * wr, cz * wr,
                 w, w * d2, n_inl_t, zero, zero, zero, zero, zero, zero,
                 zero],
                axis=0,
            )  # (16, TM)
            ones = jnp.ones((1, tile_m), f32)
            s_tile = jax.lax.dot_general(
                ones, S, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )  # (1, 16)

            def init():
                h_ref[:, :] = h_tile
                sg_ref[:, :] = s_tile

            def fold():
                h_ref[:, :] += h_tile
                sg_ref[:, :] += s_tile

            jax.lax.cond(i == 0, init, fold)
            return 0

        jax.lax.fori_loop(0, nmt, gn_tile, 0, unroll=False)

        # ---- 6. damped Cholesky solve on scalars --------------------------
        h = [[h_ref[i, j] for j in range(6)] for i in range(6)]
        g = [sg_ref[0, j] for j in range(6)]
        if prior_t > 0.0 or prior_r > 0.0:
            # motion-model prior (mirrors icp.loop's prior_w/xi_prior):
            # anchor = the init pose. Twist measured in the ORIGINAL
            # (uncentered) frame: with X_cent = T_cent·T0c⁻¹ the original
            # relative transform is S·X_cent·S⁻¹ (S = Shift(c)), i.e. same
            # rotation, translation t_orig = t_x + c − R_x·c.
            Tc_ = [[T_ref[i, j] for j in range(4)] for i in range(4)]
            T0_ = [[initT_ref[i, j] for j in range(4)] for i in range(4)]
            cc = [c0, c1, c2]
            Rx, t_orig = _orig_correction_scalars(Tc_, T0_, cc)
            xi_cur = _se3_log_scalars(Rx, t_orig)
            # λ = fraction × Σw, matching icp.loop (scale-relative prior)
            wsum_pr = jnp.maximum(sg_ref[0, 6], 1e-6)
            pw = ([wsum_pr * jnp.float32(prior_t)] * 3
                  + [wsum_pr * jnp.float32(prior_r)] * 3)
            for k in range(6):
                h[k][k] = h[k][k] + pw[k]
                g[k] = g[k] + pw[k] * xi_cur[k]
        wsum = jnp.maximum(sg_ref[0, 6], 1e-12)
        wd2 = sg_ref[0, 7]
        n_inl = sg_ref[0, 8]
        trace = h[0][0] + h[1][1] + h[2][2] + h[3][3] + h[4][4] + h[5][5]
        lam = damping * jnp.maximum(trace / 6.0, 1.0)
        for k in range(6):
            h[k][k] = h[k][k] + lam
        xi = _chol6_solve(h, g)
        finite = jnp.bool_(True)
        for k in range(6):
            finite = jnp.logical_and(finite, jnp.isfinite(xi[k]))
        xi = [jnp.where(finite, x, 0.0) for x in xi]
        # trust clamps (match solve_increment: translation first, then rot,
        # both scaling the WHOLE step)
        if max_step_trans > 0.0:
            tn = jnp.sqrt(xi[0] ** 2 + xi[1] ** 2 + xi[2] ** 2)
            s = jnp.minimum(1.0, max_step_trans / jnp.maximum(tn, 1e-12))
            xi = [x * s for x in xi]
        if max_step_rot > 0.0:
            wn = jnp.sqrt(xi[3] ** 2 + xi[4] ** 2 + xi[5] ** 2)
            s = jnp.minimum(1.0, max_step_rot / jnp.maximum(wn, 1e-12))
            xi = [x * s for x in xi]
        if step_scale != 1.0:
            # exp(beta * log(exp(xi))) == exp(beta * xi)
            xi = [x * jnp.float32(step_scale) for x in xi]
        # min-inlier guard: hold the pose
        ok = n_inl >= jnp.float32(max(min_inliers, 4))
        xi = [jnp.where(ok, x, 0.0) for x in xi]

        # ---- 7. T = exp(xi) @ T -------------------------------------------
        # Mosaic forbids scalar stores to VMEM: place the exp(xi) scalars
        # into an (8,8) matrix with one-hot iota masks and update T with a
        # single f32 matmul (vector store), instead of 12 scalar stores.
        R, t = _se3_exp_scalars(xi)
        ri8 = jax.lax.broadcasted_iota(jnp.int32, (_L8, _L8), 0)
        ci8 = jax.lax.broadcasted_iota(jnp.int32, (_L8, _L8), 1)
        E = jnp.zeros((_L8, _L8), f32)
        for i in range(3):
            for j in range(3):
                E = E + R[i][j] * ((ri8 == i) & (ci8 == j)).astype(f32)
            E = E + t[i] * ((ri8 == i) & (ci8 == 3)).astype(f32)
        E = E + ((ri8 == 3) & (ci8 == 3)).astype(f32)  # homogeneous 1
        T_ref[:, :] = jax.lax.dot_general(
            E, T_ref[:, :], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )

        # ---- 7b. trust region on the TOTAL correction (parity with
        # icp.loop's max_total_trans/rot): project log(T·T0⁻¹) — measured
        # in the ORIGINAL frame via the shift conjugation — back onto the
        # trust ball, and rebuild T_cent = S⁻¹·exp(s·xi)·S·T0c when the
        # clamp binds. All scalar ops; one (8,8) masked blend store.
        if max_total_trans > 0.0 or max_total_rot > 0.0:
            Tc_ = [[T_ref[i, j] for j in range(4)] for i in range(4)]
            T0_ = [[initT_ref[i, j] for j in range(4)] for i in range(4)]
            cc = [c0, c1, c2]
            Rx, t_orig = _orig_correction_scalars(Tc_, T0_, cc)
            xi_tot = _se3_log_scalars(Rx, t_orig)
            s = jnp.float32(1.0)
            if max_total_trans > 0.0:
                tnrm = jnp.sqrt(xi_tot[0] ** 2 + xi_tot[1] ** 2
                                + xi_tot[2] ** 2)
                s = jnp.minimum(
                    s, max_total_trans / jnp.maximum(tnrm, 1e-12))
            if max_total_rot > 0.0:
                rnrm = jnp.sqrt(xi_tot[3] ** 2 + xi_tot[4] ** 2
                                + xi_tot[5] ** 2)
                s = jnp.minimum(
                    s, max_total_rot / jnp.maximum(rnrm, 1e-12))
            Rc, tc = _se3_exp_scalars([x * s for x in xi_tot])
            # X_cent = S⁻¹·X_orig·S: same rotation, t_cent = t + (Rc−I)c
            tcent = [tc[i]
                     + (Rc[i][0] * cc[0] + Rc[i][1] * cc[1]
                        + Rc[i][2] * cc[2]) - cc[i] for i in range(3)]
            # T_new = X_cent @ T0c (T0_ row 3 = [0,0,0,1])
            Tn = [[Rc[i][0] * T0_[0][j] + Rc[i][1] * T0_[1][j]
                   + Rc[i][2] * T0_[2][j] + tcent[i] * T0_[3][j]
                   for j in range(4)] for i in range(3)]
            ri8b = jax.lax.broadcasted_iota(jnp.int32, (_L8, _L8), 0)
            ci8b = jax.lax.broadcasted_iota(jnp.int32, (_L8, _L8), 1)
            M = jnp.zeros((_L8, _L8), f32)
            for i in range(3):
                for j in range(4):
                    M = M + Tn[i][j] * ((ri8b == i) & (ci8b == j)).astype(f32)
            M = M + ((ri8b == 3) & (ci8b == 3)).astype(f32)
            T_ref[:, :] = jnp.where(s < 1.0, M, T_ref[:, :])

        # ---- 8. convergence ----------------------------------------------
        rmse = jnp.sqrt(wd2 / wsum)
        conv = jnp.abs(prev_rmse - rmse) < tol
        if tol_update > 0.0:
            # step magnitude of dT: ||dT_t|| + ||dT_R - I||_F
            tmag = jnp.sqrt(sum(t[i] ** 2 for i in range(3)))
            rfro = jnp.sqrt(sum(
                (R[i][j] - (1.0 if i == j else 0.0)) ** 2
                for i in range(3) for j in range(3)))
            conv = jnp.logical_or(conv, tmag + rfro < tol_update)
        return rmse, conv, n_inl

    def loop_cond(carry):
        it, _, conv, _ = carry
        return jnp.logical_and(it < max_iters, jnp.logical_not(conv))

    def loop_body(carry):
        it, prev_rmse, _, _ = carry
        rmse, conv, n_inl = one_iteration(prev_rmse)
        return it + 1, rmse, conv, n_inl

    it, rmse, conv, n_inl = jax.lax.while_loop(
        loop_cond, loop_body,
        (jnp.int32(0), jnp.float32(jnp.inf), jnp.bool_(False),
         jnp.float32(0.0)),
    )

    outT_ref[:, :] = T_ref[:, :]
    # stats row assembled with one-hot masks (no scalar VMEM stores)
    li = jax.lax.broadcasted_iota(jnp.int32, (1, _L8), 1)
    stats_ref[:, :] = (
        rmse * (li == 0).astype(f32)
        + it.astype(f32) * (li == 1).astype(f32)
        + n_inl * (li == 2).astype(f32)
        + conv.astype(f32) * (li == 3).astype(f32)
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_iters", "tol", "tol_update", "max_corr_dist", "huber_delta",
        "damping", "step_scale", "max_step_trans", "max_step_rot",
        "min_inliers", "precision", "tile_m", "tile_n",
        "prior_trans_weight", "prior_rot_weight",
        "max_total_trans", "max_total_rot", "interpret",
    ),
)
def icp_fused_pallas(
    src_pts: jnp.ndarray,   # (M, 3) f32 scan in the (predicted) sensor frame
    src_mask: jnp.ndarray,  # (M,) bool
    dst_pts: jnp.ndarray,   # (N, 3) f32 model, same frame; invalid rows ~1e6
    dst_nrm: jnp.ndarray,   # (N, 3) f32 model normals
    dst_mask: jnp.ndarray,  # (N,) bool
    init_T: jnp.ndarray | None = None,  # (4, 4) f32
    r_gate: jnp.ndarray | float = 1e9,  # coverage-gate radius (0 disables all)
    *,
    max_iters: int = 6,
    tol: float = 1e-5,
    tol_update: float = 0.01,
    max_corr_dist: float = 1.5,
    huber_delta: float = 0.3,
    damping: float = 1e-3,
    step_scale: float = 1.4,
    max_step_trans: float = 1.0,
    max_step_rot: float = 0.3,
    min_inliers: int = 50,
    precision: str = "bf16",
    tile_m: int = 1024,
    tile_n: int = 2048,
    prior_trans_weight: float = 0.0,
    prior_rot_weight: float = 0.0,
    max_total_trans: float = 0.0,
    max_total_rot: float = 0.0,
    interpret: bool | None = None,
):
    """Whole-loop fused point-to-plane ICP. Returns (T, rmse, iters,
    n_inliers, converged) matching icp.loop's ICPResult fields.

    The model (dst) is recentered on its valid bounding-box midpoint for
    the bf16 NN contraction (argmin-invariant; see nn_pallas). GN runs in
    the ORIGINAL (uncentered) frame — the p x n Jacobian block is not
    shift-invariant — by carrying T in the recentered frame and conjugating
    back at the end: T_orig = Shift(c) @ T_cent @ Shift(-c) would change
    the optimization geometry, so instead both clouds are shifted and the
    RESULT is exact because ICP on jointly-shifted clouds yields
    T_orig = Shift(c) @ T_cent @ Shift(-c) — the returned transform is
    conjugated accordingly. The GN linearization point differs from the
    unfused path by the shift (p x n vs (p-c) x n rows); both are valid
    Gauss-Newton parameterizations of the same least-squares problem and
    converge to the same pose (equivalence is tested to f32 tolerance at
    convergence, not per-iteration).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    m = src_pts.shape[0]
    n = dst_pts.shape[0]
    f32 = jnp.float32
    src_pts = src_pts.astype(f32)
    dst_pts = dst_pts.astype(f32)
    dst_nrm = dst_nrm.astype(f32)
    T0 = jnp.eye(4, dtype=f32) if init_T is None else init_T.astype(f32)

    # both point axes now live on the LANE dimension (transposed layout):
    # tiles should be 128-multiples where the sizes allow. VMEM-aware
    # shrink + calibration history: see fused_tile_shrink above.
    tile_m_, tile_n_, _ = fused_tile_shrink(m, n, tile_m, tile_n)
    mp = _round_up(m, tile_m_)
    np_ = _round_up(n, tile_n_)

    # recenter both clouds on the valid-model bbox midpoint (bf16 range fix)
    valid = jnp.all(jnp.abs(dst_pts) < 1.0e5, axis=1) & dst_mask
    big = f32(3.0e38)
    vcol = valid[:, None]
    lo = jnp.min(jnp.where(vcol, dst_pts, big), axis=0)
    hi = jnp.max(jnp.where(vcol, dst_pts, -big), axis=0)
    c = jnp.where(jnp.any(valid), 0.5 * (lo + hi), 0.0)

    dstc = jnp.where(vcol, dst_pts - c, 1.0e6)
    srcc = src_pts - c
    # conjugate the initial transform into the shifted frame:
    # x' = x - c; T_cent = Shift(-c) T Shift(c)
    T0c = T0.at[:3, 3].set(T0[:3, 3] + T0[:3, :3] @ c - c)
    # SMEM scalars: [r_gate, cx, cy, cz] — the kernel gates coverage on
    # ||cur + c|| (the point's position in the ORIGINAL sensor frame)
    rg = jnp.concatenate(
        [jnp.asarray(r_gate, f32).reshape(1), c.astype(f32)])

    # pad + row-expand: TRANSPOSED layout, points along lanes (see kernel
    # docstring — the (N, 8) layouts cost 16x their data in VMEM)
    def pad8T(x, cols, fill=0.0):
        x = jnp.pad(x.T, ((0, _L8 - x.shape[1]), (0, cols - x.shape[0])),
                    constant_values=fill)
        return x  # (8, cols)

    src8 = pad8T(srcc, mp)
    # zero the fill rows 3..7 then set homogeneous row = 1 for ALL cols
    # (padded cols are masked by smask)
    src8 = src8 * (jax.lax.broadcasted_iota(jnp.int32, (_L8, 1), 0) < 3)
    src8 = src8.at[3, :].set(1.0)
    smask = jnp.pad(src_mask.astype(f32), (0, mp - m)).reshape(1, mp)
    dst8 = pad8T(dstc, np_, fill=1.0e6)
    # rows 3..7 must be zero (they enter the d^2 contraction): zero them
    dst8 = dst8 * (jax.lax.broadcasted_iota(jnp.int32, (_L8, 1), 0) < 3)
    nrm_np = jnp.pad(jnp.where(vcol, dst_nrm, 0.0),
                     ((0, np_ - n), (0, 0))).T  # (3, Np)

    # gather operand (header note): Dekker hi/lo packed coords + normals,
    # fetched by the in-fold one-hot matmul. 1e6-padded cols reconstruct to
    # ~1e6 -> d^2 >> max_corr_dist^2 -> gated, same as the old gather path.
    d_hi, d_lo = _split_hi_lo(dst8[:3])
    n_hi, n_lo = _split_hi_lo(nrm_np)
    gat = jnp.concatenate([d_hi, d_lo, n_hi, n_lo], axis=0)
    gat = jnp.pad(gat, ((0, _L16 - gat.shape[0]), (0, 0)))

    # bf16 packed model rows (mirrors nn_pallas, transposed)
    b_hi, b_lo = _split_hi_lo(dst8[:3])
    bsq32 = jnp.sum(dst8 * dst8, axis=0, keepdims=True)  # (1, Np)
    bsq_hi, bsq_lo = _split_hi_lo(bsq32)
    oneb = jnp.ones_like(bsq_hi)
    baug = jnp.concatenate(
        [b_hi, b_hi, b_lo, oneb, oneb, bsq_hi, bsq_lo], axis=0)
    baug = jnp.pad(baug, ((0, _L16 - baug.shape[0]), (0, 0)))
    bsq = bsq32
    # normals ride the f32 operand's rows 3..5 for the highest-mode exact
    # gather; safe because the source operand's rows 3..7 are zeroed before
    # the NN contraction (and bsq/baug above were built from coords only)
    dst8 = dst8.at[3:6, :].set(nrm_np)

    params = (
        tile_m_, tile_n_, mp, np_, max_iters, float(tol), float(tol_update),
        float(max_corr_dist) ** 2, float(huber_delta), float(damping),
        float(step_scale), float(max_step_trans), float(max_step_rot),
        int(min_inliers), precision,
        float(prior_trans_weight), float(prior_rot_weight),
        float(max_total_trans), float(max_total_rot),
    )
    outT, stats = pl.pallas_call(
        functools.partial(_icp_kernel, params),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((_L8, _L8), f32),
            jax.ShapeDtypeStruct((1, _L8), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_L8, _L8), f32),      # T
            pltpu.VMEM((_L8, mp), f32),       # cur (transposed)
            pltpu.VMEM((_L16, mp), jnp.bfloat16),  # aaug (transposed)
            pltpu.VMEM((1, mp), f32),         # best
            pltpu.VMEM((_L16, mp), f32),      # qn (gathered corr, transposed)
            pltpu.VMEM((_L8, _L8), f32),      # H
            pltpu.VMEM((1, _L16), f32),       # g/stats
        ],
        interpret=interpret,
    )(rg, src8, smask, dst8, baug, bsq, gat,
      jnp.zeros((_L8, _L8), f32).at[:4, :4].set(T0c))

    Tc = outT[:4, :4]
    # conjugate back: T = Shift(c) T_cent Shift(-c)
    T = Tc.at[:3, 3].set(Tc[:3, 3] - Tc[:3, :3] @ c + c)
    rmse = stats[0, 0]
    iters = stats[0, 1].astype(jnp.int32)
    n_inl = stats[0, 2].astype(jnp.int32)
    conv = stats[0, 3] > 0.5
    return T, rmse, iters, n_inl, conv
