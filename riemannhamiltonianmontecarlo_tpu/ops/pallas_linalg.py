"""Pallas TPU kernels: chain-batched small-matrix Cholesky / solves.

Layout rationale (pallas_guide: MXU/VPU tiling): a (chains, D, D) batch
with D = 7..25 puts the tiny D axes in the lane dimension -- hopeless
tiling.  These kernels transpose to **chains-last** (D, D, C) so the
chain axis rides the 128-wide lanes and every elimination step of the
factorization is a full-width VPU op over a (D, D, TILE_C) block held in
VMEM.  The D-loop is unrolled in-kernel (static D), so one pallas program
performs the whole factorization for TILE_C chains with no intermediate
HBM traffic -- replacing the ~D fused-but-separate HLO ops of the
unrolled XLA path.

Exposed ops (all with XLA fallback in ``ops.linalg``):

* ``cholesky(g)``: lower factor, (C, D, D) -> (C, D, D);
* ``cho_solve_vec(l, b)``: forward+back substitution, (C, D, D), (C, D);
* ``chol_solve_logdet(g, b)``: fused factor + solve + log-det -- the
  exact bundle an RMHMC geometry evaluation needs.

Interpret mode makes the same kernels run on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

TILE_C = 128  # chains per program: one full lane width


def _is_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _interpret() -> bool:
    return not _is_tpu()


def _chol_body(g, d: int):
    """Unrolled outer-product Cholesky on a (D, D, TC) block."""
    rem = g
    cols = []
    for j in range(d):
        diag = jnp.sqrt(rem[j, j, :])  # (TC,)
        col = rem[:, j, :] / diag[None, :]  # (D, TC)
        keep = (jax.lax.broadcasted_iota(jnp.int32, col.shape, 0) >= j)
        col = jnp.where(keep, col, 0.0)
        cols.append(col)
        rem = rem - col[:, None, :] * col[None, :, :]
    return jnp.stack(cols, axis=1)  # (D, D, TC): l[:, j] = cols[j]


def _solve_body(l, b, d: int):
    """L L^T x = b on (D, D, TC) factor and (D, TC) rhs."""
    # forward: L y = b
    ys = []
    for i in range(d):
        s = b[i, :]
        for k in range(i):
            s = s - l[i, k, :] * ys[k]
        ys.append(s / l[i, i, :])
    # backward: L^T x = y
    xs = [None] * d
    for i in reversed(range(d)):
        s = ys[i]
        for k in range(i + 1, d):
            s = s - l[k, i, :] * xs[k]
        xs[i] = s / l[i, i, :]
    return jnp.stack(xs, axis=0)  # (D, TC)


def _chol_kernel(g_ref, l_ref, *, d: int):
    l_ref[:] = _chol_body(g_ref[:], d)


def _fused_kernel(g_ref, b_ref, x_ref, logdet_ref, *, d: int):
    l = _chol_body(g_ref[:], d)
    x_ref[:] = _solve_body(l, b_ref[:], d)
    diag = jnp.stack([l[j, j, :] for j in range(d)], axis=0)  # (D, TC)
    logdet_ref[:] = 2.0 * jnp.sum(jnp.log(diag), axis=0)[None, :]  # (1, TC)


def _pad_chains(x: Array, tile: int) -> tuple[Array, int]:
    c = x.shape[-1]
    pad = (-c) % tile
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return x, c


@functools.partial(jax.jit, static_argnames=("interpret",))
def cholesky(g: Array, *, interpret: bool | None = None) -> Array:
    """Lower Cholesky of a (C, D, D) PD batch via the chains-last kernel."""
    if interpret is None:
        interpret = _interpret()
    c, d, _ = g.shape
    gt = jnp.moveaxis(g, 0, -1)  # (D, D, C)
    # Padding with identity keeps sqrt/division well-defined on pad lanes.
    gt, c_orig = _pad_chains(gt, TILE_C)
    eye_pad = jnp.equal(
        jax.lax.broadcasted_iota(jnp.int32, gt.shape, 0),
        jax.lax.broadcasted_iota(jnp.int32, gt.shape, 1),
    ) & (jax.lax.broadcasted_iota(jnp.int32, gt.shape, 2) >= c_orig)
    gt = jnp.where(eye_pad, 1.0, gt)
    cp = gt.shape[-1]

    out = pl.pallas_call(
        functools.partial(_chol_kernel, d=d),
        out_shape=jax.ShapeDtypeStruct((d, d, cp), g.dtype),
        grid=(cp // TILE_C,),
        in_specs=[
            pl.BlockSpec((d, d, TILE_C), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (d, d, TILE_C), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(gt)
    return jnp.moveaxis(out[..., :c_orig], -1, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def chol_solve_logdet(
    g: Array, b: Array, *, interpret: bool | None = None
) -> tuple[Array, Array]:
    """Fused Cholesky + solve(G, b) + log|G| for a (C, D, D), (C, D) batch."""
    if interpret is None:
        interpret = _interpret()
    c, d, _ = g.shape
    gt = jnp.moveaxis(g, 0, -1)  # (D, D, C)
    bt = jnp.moveaxis(b, 0, -1)  # (D, C)
    gt, c_orig = _pad_chains(gt, TILE_C)
    bt, _ = _pad_chains(bt, TILE_C)
    eye_pad = jnp.equal(
        jax.lax.broadcasted_iota(jnp.int32, gt.shape, 0),
        jax.lax.broadcasted_iota(jnp.int32, gt.shape, 1),
    ) & (jax.lax.broadcasted_iota(jnp.int32, gt.shape, 2) >= c_orig)
    gt = jnp.where(eye_pad, 1.0, gt)
    cp = gt.shape[-1]

    x, logdet = pl.pallas_call(
        functools.partial(_fused_kernel, d=d),
        out_shape=(
            jax.ShapeDtypeStruct((d, cp), g.dtype),
            jax.ShapeDtypeStruct((1, cp), g.dtype),
        ),
        grid=(cp // TILE_C,),
        in_specs=[
            pl.BlockSpec((d, d, TILE_C), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, TILE_C), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((d, TILE_C), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_C), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(gt, bt)
    return jnp.moveaxis(x[..., :c_orig], -1, 0), logdet[0, :c_orig]
