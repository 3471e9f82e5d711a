"""Probe Mosaic-on-axon capabilities needed by the fused ICP kernel
(kernels/icp_fused_pallas.py): in-kernel dynamic gather, lax.while_loop
with scalar carry, lax.cond work-skipping, scalar sqrt/div, and small
matmuls. Each probe compiles+runs standalone so one unsupported feature
doesn't mask the others.
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "src"))

from tpu_icp_slam.obs.compile_cache import enable as _enable_cache

_enable_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn):
    try:
        out = fn()
        print(f"PASS {name}: {out}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " | ")[:300]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")
        return False


def probe_dynamic_gather():
    def kern(b_ref, i_ref, o_ref):
        idx = i_ref[0, :]
        o_ref[:, :] = b_ref[:][idx, :]

    b = jnp.arange(64 * 8, dtype=jnp.float32).reshape(64, 8)
    idx = jnp.asarray([[3, 0, 63, 7, 1, 2, 5, 9]], jnp.int32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 8), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(b, idx)
    exp = np.asarray(b)[np.asarray(idx)[0]]
    assert np.allclose(np.asarray(out), exp), (out, exp)
    return "exact"


def probe_take_along():
    # row-wise argmin gather: (M, N) values -> per-row selected column
    def kern(e_ref, b_ref, o_ref):
        e = e_ref[:]
        arg = jnp.argmin(e, axis=1).astype(jnp.int32)  # (M,)
        o_ref[:, :] = b_ref[:][arg, :]

    M, N = 16, 128
    rng = np.random.default_rng(0)
    e = jnp.asarray(rng.uniform(size=(M, N)), jnp.float32)
    b = jnp.asarray(rng.uniform(size=(N, 8)), jnp.float32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((M, 8), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(e, b)
    exp = np.asarray(b)[np.asarray(jnp.argmin(e, axis=1))]
    assert np.allclose(np.asarray(out), exp)
    return "exact"


def probe_while_loop():
    def kern(x_ref, o_ref):
        def cond(c):
            i, s = c
            return jnp.logical_and(i < 10, s < 100.0)

        def body(c):
            i, s = c
            return i + 1, s + x_ref[0, 0]

        i, s = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(0)))
        o_ref[0, 0] = s
        o_ref[0, 1] = i.astype(jnp.float32)

    x = jnp.full((1, 8), 30.0, jnp.float32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    assert float(out[0, 0]) == 120.0 and float(out[0, 1]) == 4.0, out
    return "dynamic trip count ok"


def probe_cond_scalar():
    def kern(x_ref, o_ref):
        v = jax.lax.cond(
            x_ref[0, 0] > 0.0,
            lambda: x_ref[:] * 2.0,
            lambda: x_ref[:] * 0.0,
        )
        o_ref[:, :] = v

    x = jnp.full((8, 128), 3.0, jnp.float32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    assert float(out[0, 0]) == 6.0
    return "ok"


def probe_scalar_math():
    def kern(x_ref, o_ref):
        a = x_ref[0, 0]
        o_ref[0, 0] = jnp.sqrt(a)
        o_ref[0, 1] = 1.0 / a
        o_ref[0, 2] = jnp.sin(a)
        o_ref[0, 3] = jnp.cos(a)

    x = jnp.full((1, 8), 4.0, jnp.float32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    assert abs(float(out[0, 0]) - 2.0) < 1e-6
    assert abs(float(out[0, 1]) - 0.25) < 1e-6
    assert abs(float(out[0, 2]) - np.sin(4.0)) < 1e-5
    return "sqrt/div/sin/cos ok"


def probe_scratch_carry():
    # fori_loop writing a running argmin into VMEM scratch, then reading it
    def kern(e_ref, o_ref, best_ref, barg_ref):
        n_tiles = 4

        def body(j, _):
            e = e_ref[:, j * 32:(j + 1) * 32]
            lb = jnp.min(e, axis=1)
            la = jnp.argmin(e, axis=1).astype(jnp.int32) + j * 32

            def init():
                best_ref[:] = lb
                barg_ref[:] = la

            def fold():
                prev = best_ref[:]
                take = lb < prev
                best_ref[:] = jnp.where(take, lb, prev)
                barg_ref[:] = jnp.where(take, la, barg_ref[:])

            jax.lax.cond(j == 0, init, fold)
            return 0

        jax.lax.fori_loop(0, n_tiles, body, 0)
        o_ref[0, :] = barg_ref[:].astype(jnp.float32)

    M, N = 8, 128
    rng = np.random.default_rng(1)
    e = jnp.asarray(rng.uniform(size=(M, N)), jnp.float32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, M), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((M,), jnp.float32),
                        pltpu.VMEM((M,), jnp.int32)],
    )(e)
    exp = np.argmin(np.asarray(e), axis=1)
    assert np.array_equal(np.asarray(out[0]).astype(np.int64), exp), (out, exp)
    return "running argmin in scratch ok"


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}")
    results = {}
    for name, fn in [
        ("dynamic_gather", probe_dynamic_gather),
        ("take_along_argmin", probe_take_along),
        ("while_loop", probe_while_loop),
        ("cond_scalar", probe_cond_scalar),
        ("scalar_math", probe_scalar_math),
        ("scratch_carry", probe_scratch_carry),
    ]:
        results[name] = run(name, fn)
    print(results)
