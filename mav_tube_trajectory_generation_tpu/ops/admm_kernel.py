"""Pallas TPU kernel for the ADMM inner loop of the tube QCQP.

Why a kernel: one ADMM stage runs n_iters sequential iterations, each needing
the per-scenario matrices A1 = (W G^T)^T and A2 = G^T (~0.5 MB/scenario).
The XLA scan re-streams both matrices from HBM every iteration
(~2 GB/iteration at batch 4096), making the solver HBM-bandwidth-bound.
This kernel pins a scenario's matrices in VMEM once and runs the whole
stage's iterations on-chip, cutting HBM traffic by ~n_iters x.

Layout (all padded to lane multiples of 128):
  x (free variables, flattened):       row vector (1, nfd_p)
  constraint vector z/u/b:             row vector (1, m_p),
      m_p = 3 * nb_p + nh_p laid out **component-major**:
      [ball-x (nb_p) | ball-y (nb_p) | ball-z (nb_p) | halfspace (nh_p)]
      so the ball projection is three aligned lane slices -- no reshapes.
  A1 = wgt^T (m_p, nfd_p):   x-update   x = xq + rho * (v @ A1)
  A2 = g^T  (nfd_p, m_p):    y-update   y = x @ A2 + b

Padding is benign by construction: padded G rows/cols are zero, padded ball
radii are 1 with y = 0 (inside the ball), padded half rows have y = 0
(feasible), so padded entries stay exactly 0 through every iteration.

The iteration math matches the XLA scan path in solver/qcqp.py line for
line (over-relaxation alpha, scaled duals u); tests assert both paths agree.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _admm_stage_kernel(rho_ref, a1_ref, a2_ref, b_ref, rb_ref, xq_ref,
                       z0_ref, u0_ref,
                       x_out, z_out, zp_out, u_out, prim_out,
                       *, n_iters: int, alpha: float, nb_p: int):
    rho = rho_ref[0, 0]
    a1 = a1_ref[:]                       # (m_p, nfd_p)
    a2 = a2_ref[:]                       # (nfd_p, m_p)
    b = b_ref[:]                         # (1, m_p)
    rb = rb_ref[:]                       # (1, nb_p)
    xq = xq_ref[:]                       # (1, nfd_p)

    def project(w):
        wx = w[:, 0:nb_p]
        wy = w[:, nb_p:2 * nb_p]
        wz = w[:, 2 * nb_p:3 * nb_p]
        sq = wx * wx + wy * wy + wz * wz
        scale = jnp.where(
            sq > rb * rb,
            rb * jax.lax.rsqrt(jnp.maximum(sq, 1e-30)), 1.0)
        zh = jnp.minimum(w[:, 3 * nb_p:], 0.0)
        return jnp.concatenate(
            [wx * scale, wy * scale, wz * scale, zh], axis=1)

    def body(_, carry):
        x, z, zp, u, prim = carry
        v = z - u - b
        x_new = xq + rho * jnp.dot(v, a1,
                                   preferred_element_type=jnp.float32)
        y = jnp.dot(x_new, a2, preferred_element_type=jnp.float32) + b
        y_rel = alpha * y + (1.0 - alpha) * z
        z_new = project(y_rel + u)
        u_new = u + y_rel - z_new
        prim = jnp.max(jnp.abs(y - z_new))
        return x_new, z_new, z, u_new, prim

    init = (xq, z0_ref[:], z0_ref[:], u0_ref[:],
            jnp.asarray(jnp.inf, jnp.float32))
    x, z, zp, u, prim = jax.lax.fori_loop(0, n_iters, body, init)
    x_out[:] = x
    z_out[:] = z
    zp_out[:] = zp
    u_out[:] = u
    prim_out[0, 0] = prim


@functools.partial(jax.jit, static_argnames=("n_iters", "alpha", "nb_p",
                                             "interpret"))
def admm_stage(rho, a1, a2, b, rb, xq, z0, u0, *,
               n_iters: int, alpha: float, nb_p: int,
               interpret: bool = False):
    """One ADMM stage fully on-chip.  Single scenario; vmap for batches
    (vmap turns the pallas_call into a grid over scenarios, which is exactly
    the VMEM-resident pipeline we want).

    Args:
      rho: (1, 1) penalty.
      a1: (m_p, nfd_p), a2: (nfd_p, m_p), b: (1, m_p), rb: (1, nb_p),
      xq: (1, nfd_p), z0/u0: (1, m_p).

    Returns:
      (x (1, nfd_p), z, z_prev, u (1, m_p), prim (1, 1)).
    """
    m_p, nfd_p = a1.shape
    kernel = functools.partial(_admm_stage_kernel, n_iters=n_iters,
                               alpha=alpha, nb_p=nb_p)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, nfd_p), jnp.float32),
            jax.ShapeDtypeStruct((1, m_p), jnp.float32),
            jax.ShapeDtypeStruct((1, m_p), jnp.float32),
            jax.ShapeDtypeStruct((1, m_p), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
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
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(rho, a1, a2, b, rb, xq, z0, u0)
