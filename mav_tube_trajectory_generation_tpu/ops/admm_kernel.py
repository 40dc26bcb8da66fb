"""Pallas TPU kernel for the ADMM inner loop: VPU broadcast-reduce matvecs.

Why a kernel: one ADMM stage runs n_iters sequential iterations, each needing
the per-scenario matrices (~0.28 MB each).  The XLA scan re-streams both from
HBM every iteration (~GBs/iteration at batch 8192), making the solver
HBM-bandwidth-bound; here they stay VMEM-resident for the whole stage.

A naive MXU formulation (jnp.dot with a 1-row operand) wastes 7/8 of the
systolic array's sublanes and pads nfd to a 256-lane multiple.  Instead both
matvecs are elementwise broadcast-multiplies followed by lane/sublane
reductions on the VPU, with BOTH matrices stored in the same (nfd, m_p)
orientation:

    x_col (nfd, 1) = sum_lanes   ( M1 (nfd, m_p) * v_row (1, m_p) )
    y_row (1, m_p) = sum_sublane ( Gt (nfd, m_p) * x_col (nfd, 1) )

where M1 = wgt (the KKT-inverse-times-G^T) and Gt = G^T.  The alternating
row/column vector orientation means no transposes anywhere.

Scenario blocking: every ref carries a leading S axis and one kernel
instance runs S independent scenarios.  The iteration is a sequential
dependency chain of small reduces -- LATENCY-bound, not throughput-bound
(measured: halving the lane count changed nothing) -- so interleaving S
chains hides the latency: S=4 runs the same batch in ~55% of the S=1 wall
time on a v5e.  S is capped by the ~16 MB scoped VMEM (S=4 uses ~9 MB for
the flagship shape).

Constraint vector layout (lanes): [ball-x | ball-y | ball-z | half], each
ball plane nb_p lanes with lanes >= n_ball carrying packed half-space rows
(solver.qcqp._PadLayout).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(rho_ref, m1_ref, gt_ref, b_ref, rb_ref, xq_ref, z0_ref, u0_ref,
            x_out, z_out, zp_out, u_out, prim_out,
            *, n_iters: int, alpha: float, nb_p: int, n_ball: int):
    rho = rho_ref[:]                      # (S, 1, 1)
    m1 = m1_ref[:]                        # (S, nfd, m_p) == wgt
    gt = gt_ref[:]                        # (S, nfd, m_p) == G^T
    b = b_ref[:]                          # (S, 1, m_p)
    rb = rb_ref[:]                        # (S, 1, nb_p)
    xq = xq_ref[:]                        # (S, nfd, 1) column!

    def project(w):
        # Ball planes: lanes < n_ball are the coupled (x,y,z) ball rows;
        # lanes >= n_ball are PACKED half-space rows, projected by min(.,0).
        wx = w[:, :, 0:nb_p]
        wy = w[:, :, nb_p:2 * nb_p]
        wz = w[:, :, 2 * nb_p:3 * nb_p]
        sq = wx * wx + wy * wy + wz * wz
        scale = jnp.where(
            sq > rb * rb, rb * jax.lax.rsqrt(jnp.maximum(sq, 1e-30)),
            jnp.float32(1.0))   # f32 literal: a weak f64 scalar under x64
                                # fails Mosaic legalization
        ball = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nb_p), 2) < n_ball
        parts = [jnp.where(ball, wx * scale, jnp.minimum(wx, 0.0)),
                 jnp.where(ball, wy * scale, jnp.minimum(wy, 0.0)),
                 jnp.where(ball, wz * scale, jnp.minimum(wz, 0.0))]
        if w.shape[2] > 3 * nb_p:   # final half-space plane (may be absent)
            parts.append(jnp.minimum(w[:, :, 3 * nb_p:], 0.0))
        return jnp.concatenate(parts, axis=2)

    def body(_, carry):
        x, z, zp, u, prim = carry
        v = z - u - b                                     # (S, 1, m_p)
        x_new = xq + rho * jnp.sum(m1 * v, axis=2, keepdims=True)
        y = jnp.sum(gt * x_new, axis=1, keepdims=True) + b
        y_rel = alpha * y + (1.0 - alpha) * z
        z_new = project(y_rel + u)
        u_new = u + y_rel - z_new
        # Single-axis reduce: y/z are (S, 1, m_p), so axis=2 alone yields
        # (S, 1, 1).  (A multi-axis keepdims reduce crashes Mosaic's
        # VectorLayoutInferer::inferReshape on v5e.)
        prim = jnp.max(jnp.abs(y - z_new), axis=2, keepdims=True)
        return x_new, z_new, z, u_new, prim

    init = (xq, z0_ref[:], z0_ref[:], u0_ref[:],
            jnp.full(rho.shape, jnp.inf, jnp.float32))
    # int32 bounds: under x64 a Python-int bound makes the induction
    # variable i64, which Mosaic cannot legalize.
    x, z, zp, u, prim = jax.lax.fori_loop(jnp.int32(0),
                                          jnp.int32(n_iters), body, init)
    x_out[:] = x
    z_out[:] = z
    zp_out[:] = zp
    u_out[:] = u
    prim_out[:] = prim


def _stage_core(rho, m1, gt, b, rb, xq, x0_ref, z0_ref, u0_ref,
                x_out, z_out, zp_out, u_out, prim_out, dual_out, y_out,
                *, n_iters: int, alpha: float, nb_p: int, n_ball: int,
                init_z: bool):
    """Shared fused-stage body: iteration chain on a VMEM-resident m1/gt,
    z/u warm-start init, final y = G x + b and the dual-residual matvec."""

    def project(w):
        wx = w[:, :, 0:nb_p]
        wy = w[:, :, nb_p:2 * nb_p]
        wz = w[:, :, 2 * nb_p:3 * nb_p]
        sq = wx * wx + wy * wy + wz * wz
        scale = jnp.where(
            sq > rb * rb, rb * jax.lax.rsqrt(jnp.maximum(sq, 1e-30)),
            jnp.float32(1.0))   # f32 literal: a weak f64 scalar under x64
                                # fails Mosaic legalization
        ball = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nb_p), 2) < n_ball
        parts = [jnp.where(ball, wx * scale, jnp.minimum(wx, 0.0)),
                 jnp.where(ball, wy * scale, jnp.minimum(wy, 0.0)),
                 jnp.where(ball, wz * scale, jnp.minimum(wz, 0.0))]
        if w.shape[2] > 3 * nb_p:
            parts.append(jnp.minimum(w[:, :, 3 * nb_p:], 0.0))
        return jnp.concatenate(parts, axis=2)

    def body(_, carry):
        x, z, zp, u, prim, y = carry
        v = z - u - b                                     # (S, 1, m_p)
        x_new = xq + rho * jnp.sum(m1 * v, axis=2, keepdims=True)
        y = jnp.sum(gt * x_new, axis=1, keepdims=True) + b
        y_rel = alpha * y + (1.0 - alpha) * z
        z_new = project(y_rel + u)
        u_new = u + y_rel - z_new
        prim = jnp.max(jnp.abs(y - z_new), axis=2, keepdims=True)
        return x_new, z_new, z, u_new, prim, y

    if init_z:
        x0 = x0_ref[:]                                    # (S, nfd, 1)
        y0 = jnp.sum(gt * x0, axis=1, keepdims=True) + b
        z_init = project(y0)
        u_init = jnp.zeros_like(z_init)
    else:
        x0, z_init, u_init = x0_ref[:], z0_ref[:], u0_ref[:]
        y0 = jnp.sum(gt * x0, axis=1, keepdims=True) + b
    init = (x0, z_init, z_init, u_init,
            jnp.full(rho.shape, jnp.inf, jnp.float32), y0)
    x, z, zp, u, prim, y = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(n_iters), body, init)  # i32: see above
    # Dual-residual matvec G^T' dz: two single-axis reduces (a multi-axis
    # keepdims reduce crashes Mosaic's VectorLayoutInferer on v5e).
    dz = z - zp                                           # (S, 1, m_p)
    gdz = jnp.sum(gt * dz, axis=2, keepdims=True)         # (S, nfd, 1)
    dual = jnp.max(jnp.abs(gdz), axis=1, keepdims=True)   # (S, 1, 1)
    x_out[:] = x
    z_out[:] = z
    zp_out[:] = zp
    u_out[:] = u
    prim_out[:] = prim
    dual_out[:] = dual
    y_out[:] = y


def _sdot(a, b):
    """Per-scenario full-f32 MXU dot of stacked (S, n, k) @ (S, k, m)."""
    return jnp.stack([
        jax.lax.dot(a[i], b[i], precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
        for i in range(a.shape[0])], axis=0)


def _expand_gt(e, w):
    """In-VMEM G^T assembly from its rank-1 row factors:
    ``gt[s, p*dw + d, m] = e[s, p, m] * w[s, d, m]``.

    Every constraint row of G^T is an outer product ``ecp_row (x)
    direction*scale`` (solver.qcqp._padded_gather_maps); materializing gt
    in XLA costs an HBM write + read of the full (nfd, m_p) tensor PLUS a
    ~5.2 ms/batch-6144 relayout copy that layout assignment pins on the
    assembly fusion (docs/PERF.md round-4: no user-level control reaches
    it).  Here the kernel receives the factors (~1/3 the HBM bytes) and
    expands them in VMEM.

    The sublane interleave (row p*dw+d) is built by ONE constant 0/1-matrix
    MXU dot plus a Mosaic tile-repeat -- no jnp.repeat / reshape across the
    sublane dim (Mosaic's inferReshape rejects those merges) and no
    sublane gather:
      e_rep = P @ e  with P[r, p] = (r // dw == p)    (MXU select)
      w_rep = pltpu.repeat(w, nf, axis=0)             (row r is w[r %% dw])
      gt    = e_rep * w_rep
    """
    s, nf, m_p = e.shape
    dw = w.shape[1]
    nfd = nf * dw
    row_e = jax.lax.broadcasted_iota(jnp.int32, (nfd, nf), 0)
    col_e = jax.lax.broadcasted_iota(jnp.int32, (nfd, nf), 1)
    p_mat = jnp.where(row_e // dw == col_e, jnp.float32(1.0),
                      jnp.float32(0.0))
    outs = []
    for i in range(s):
        e_rep = jax.lax.dot(p_mat, e[i],
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
        # Tile-repeat [w; w; ...]: row r carries w[r % dw] -- exactly the
        # interleave's d index.
        w_rep = pltpu.repeat(w[i], nf, 0)
        outs.append(e_rep * w_rep)
    return jnp.stack(outs, axis=0)


def _kernel_fused(rho_ref, winv_ref, gt_ref, b_ref, rb_ref, xq_ref,
                  x0_ref, z0_ref, u0_ref,
                  x_out, z_out, zp_out, u_out, prim_out, dual_out, y_out,
                  *, n_iters: int, alpha: float, nb_p: int, n_ball: int,
                  init_z: bool):
    """Fused ADMM stage: forms m1 = W^{-1} G^T on the MXU in VMEM, runs the
    iteration chain, and emits the final y = G x + b and the dual-residual
    matvec -- so the (S, nfd, m_p) G^T tensor makes ONE HBM round trip per
    stage instead of five (m1 formation, z0 init, iterations, final y, dual
    residual each re-streamed it in the XLA formulation; ~1.7 GB each at the
    flagship batch).

    init_z: stage-0 entry -- z/u are initialized from the warm start x0
    (z = project(G x0 + b), u = 0) instead of carried in.
    """
    gt = gt_ref[:]                        # (S, nfd, m_p)
    # m1[s] = winv[s] @ gt[s]: small per-scenario MXU matmuls (full f32).
    m1 = _sdot(winv_ref[:], gt)           # (S, nfd, m_p)
    _stage_core(rho_ref[:], m1, gt, b_ref[:], rb_ref[:], xq_ref[:],
                x0_ref, z0_ref, u0_ref,
                x_out, z_out, zp_out, u_out, prim_out, dual_out, y_out,
                n_iters=n_iters, alpha=alpha, nb_p=nb_p, n_ball=n_ball,
                init_z=init_z)


def _kernel_fused_factored(rho_ref, sinv_ref, t_ref, tt_ref, gt_ref, b_ref,
                           rb_ref, xq_ref, x0_ref, z0_ref, u0_ref,
                           x_out, z_out, zp_out, u_out, prim_out, dual_out,
                           y_out, *, n_iters: int, alpha: float, nb_p: int,
                           n_ball: int, init_z: bool):
    """Fused ADMM stage from the block-LDL^T KKT FACTORS: m1 = W^{-1} G^T is
    computed in VMEM by the block-Thomas sweeps (banded.spd_block_tridiag_
    factor's S_i^{-1}/T_i blocks) against the resident G^T -- the dense
    (S, nfd, nfd) inverse is never materialized anywhere.  In the XLA
    formulation, assembling that dense inverse from the tridiagonal factors
    (identity-panel back-substitution + concatenate + kernel-layout copy) and
    the xq matvec against it profiled ~19 ms/batch 6144 -- the single
    largest non-kernel cost of the headline program.

    sinv: (S, m, b, b) inverted pivot blocks; t/tt: (S, m-1, b, b) with
    t[:, i-1] = T_i = U_{i-1}^T S_{i-1}^{-1} and tt its transpose (passed
    separately -- transposing in-kernel costs a relayout).
    """
    gt = gt_ref[:]                        # (S, nfd, m_p)
    sinv = sinv_ref[:]                    # (S, m, b, b)
    t = t_ref[:]                          # (S, m-1, b, b)
    tt = tt_ref[:]                        # (S, m-1, b, b)
    m_blk = sinv.shape[1]
    bsz = sinv.shape[-1]

    # Forward (I+L) y = G^T, diagonal z = S^{-1} y, backward (I+L)^T x = z;
    # every step is S tiny (b, b) @ (b, m_p) MXU dots, once per stage.
    y_p = []
    for i in range(m_blk):
        r_i = gt[:, i * bsz:(i + 1) * bsz, :]
        if i:
            r_i = r_i - _sdot(t[:, i - 1], y_p[i - 1])
        y_p.append(r_i)
    z_p = [_sdot(sinv[:, i], y_p[i]) for i in range(m_blk)]
    x_p = [None] * m_blk
    x_p[m_blk - 1] = z_p[m_blk - 1]
    for i in range(m_blk - 2, -1, -1):
        x_p[i] = z_p[i] - _sdot(tt[:, i], x_p[i + 1])
    m1 = jnp.concatenate(x_p, axis=1)     # (S, nfd, m_p)
    _stage_core(rho_ref[:], m1, gt, b_ref[:], rb_ref[:], xq_ref[:],
                x0_ref, z0_ref, u0_ref,
                x_out, z_out, zp_out, u_out, prim_out, dual_out, y_out,
                n_iters=n_iters, alpha=alpha, nb_p=nb_p, n_ball=n_ball,
                init_z=init_z)


def _kernel_fused_factored_ew(rho_ref, sinv_ref, t_ref, tt_ref, e_ref,
                              w_ref, b_ref, rb_ref, xq_ref, x0_ref, z0_ref,
                              u0_ref, x_out, z_out, zp_out, u_out, prim_out,
                              dual_out, y_out, *, n_iters: int, alpha: float,
                              nb_p: int, n_ball: int, init_z: bool):
    """_kernel_fused_factored with the G^T ASSEMBLY fused in: the kernel
    receives the rank-1 row factors (e (S, nf, m_p), w (S, dw, m_p)) and
    expands gt in VMEM (_expand_gt) -- the (S, nfd, m_p) tensor never
    exists in HBM, killing its write+read traffic AND the XLA assembly
    relayout copy (docs/PERF.md round-4 deferred lever)."""
    gt = _expand_gt(e_ref[:], w_ref[:])   # (S, nfd, m_p) in VMEM
    sinv = sinv_ref[:]
    t = t_ref[:]
    tt = tt_ref[:]
    m_blk = sinv.shape[1]
    bsz = sinv.shape[-1]
    y_p = []
    for i in range(m_blk):
        r_i = gt[:, i * bsz:(i + 1) * bsz, :]
        if i:
            r_i = r_i - _sdot(t[:, i - 1], y_p[i - 1])
        y_p.append(r_i)
    z_p = [_sdot(sinv[:, i], y_p[i]) for i in range(m_blk)]
    x_p = [None] * m_blk
    x_p[m_blk - 1] = z_p[m_blk - 1]
    for i in range(m_blk - 2, -1, -1):
        x_p[i] = z_p[i] - _sdot(tt[:, i], x_p[i + 1])
    m1 = jnp.concatenate(x_p, axis=1)     # (S, nfd, m_p)
    _stage_core(rho_ref[:], m1, gt, b_ref[:], rb_ref[:], xq_ref[:],
                x0_ref, z0_ref, u0_ref,
                x_out, z_out, zp_out, u_out, prim_out, dual_out, y_out,
                n_iters=n_iters, alpha=alpha, nb_p=nb_p, n_ball=n_ball,
                init_z=init_z)


def admm_stage_fused_factored_ew(rho, sinv, t, tt, e, w, b, rb, xq, x0,
                                 z0=None, u0=None, *, n_iters: int,
                                 alpha: float, nb_p: int, n_ball: int = -1,
                                 init_z: bool = True, interpret=None):
    """admm_stage_fused_factored from G^T row factors (e, w) instead of the
    materialized gt (see _kernel_fused_factored_ew)."""
    return _admm_stage_fused_factored_ew_jit(
        rho, sinv, t, tt, e, w, b, rb, xq, x0, z0, u0, n_iters=n_iters,
        alpha=alpha, nb_p=nb_p, n_ball=n_ball, init_z=init_z,
        interpret=_resolve_interpret(interpret))


@functools.partial(jax.jit, static_argnames=("n_iters", "alpha", "nb_p",
                                             "n_ball", "init_z", "interpret"))
def _admm_stage_fused_factored_ew_jit(rho, sinv, t, tt, e, w, b, rb, xq, x0,
                                      z0=None, u0=None, *, n_iters: int,
                                      alpha: float, nb_p: int,
                                      n_ball: int = -1, init_z: bool = True,
                                      interpret: bool = False):
    s, nf, m_p = e.shape
    nfd = nf * w.shape[1]
    if n_ball < 0:
        n_ball = nb_p
    if z0 is None:
        z0 = jnp.zeros((s, 1, m_p), jnp.float32)
        u0 = jnp.zeros((s, 1, m_p), jnp.float32)
    kernel = functools.partial(_kernel_fused_factored_ew, n_iters=n_iters,
                               alpha=alpha, nb_p=nb_p, n_ball=n_ball,
                               init_z=init_z)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((s, nfd, 1), jnp.float32),
            jax.ShapeDtypeStruct((s, 1, m_p), jnp.float32),
            jax.ShapeDtypeStruct((s, 1, m_p), jnp.float32),
            jax.ShapeDtypeStruct((s, 1, m_p), jnp.float32),
            jax.ShapeDtypeStruct((s, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((s, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((s, 1, m_p), jnp.float32),
        ),
        in_specs=[vmem] * 12,
        out_specs=(vmem,) * 7,
        interpret=interpret,
    )(rho, sinv, t, tt, e, w, b, rb, xq, x0, z0, u0)


def _kernel_gram_band_factors_ew(e_ref, w_ref, pb_d_ref, pb_u_ref, rho_ref,
                                 db_out, ub_out, *, blk: int, sigma: float):
    """_kernel_gram_band_factors with the G^T assembly fused in (rank-1 row
    factors in, assembled KKT band out; gt lives only in VMEM)."""
    gt = _expand_gt(e_ref[:], w_ref[:])   # (S, nfd, m_p) in VMEM
    rho = rho_ref[:]
    s, nfd, _ = gt.shape
    m_blk = nfd // blk
    g = _gram_pair(gt, gt)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, blk, blk), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, blk, blk), 2)
    eye_b = jnp.where(row == col, jnp.float32(sigma), jnp.float32(0.0))
    for i in range(m_blk):
        gd_i = g[:, i * blk:(i + 1) * blk, i * blk:(i + 1) * blk]
        db_out[:, i, :, :] = pb_d_ref[:, i, :, :] + rho * gd_i + eye_b
    for i in range(m_blk - 1):
        gu_i = g[:, i * blk:(i + 1) * blk, (i + 1) * blk:(i + 2) * blk]
        ub_out[:, i, :, :] = pb_u_ref[:, i, :, :] + rho * gu_i


def gram_band_factors_ew(e, w, pb_d, pb_u, rho, *, blk: int, sigma: float,
                         interpret=None):
    """G^T row factors + kron'd objective band + rho -> assembled KKT band
    (db, ub) with gt existing only in VMEM."""
    return _gram_band_factors_ew_jit(e, w, pb_d, pb_u, rho, blk=blk,
                                     sigma=sigma,
                                     interpret=_resolve_interpret(interpret))


@functools.partial(jax.jit, static_argnames=("blk", "sigma", "interpret"))
def _gram_band_factors_ew_jit(e, w, pb_d, pb_u, rho, *, blk: int,
                              sigma: float, interpret: bool):
    s, nf, m_p = e.shape
    nfd = nf * w.shape[1]
    m_blk = nfd // blk
    kernel = functools.partial(_kernel_gram_band_factors_ew, blk=blk,
                               sigma=sigma)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((s, m_blk, blk, blk), jnp.float32),
            jax.ShapeDtypeStruct((s, m_blk - 1, blk, blk), jnp.float32),
        ),
        in_specs=[vmem] * 5,
        out_specs=(vmem,) * 2,
        interpret=interpret,
    )(e, w, pb_d, pb_u, rho)


def _kernel_gram_band_factors(gt_ref, pb_d_ref, pb_u_ref, rho_ref,
                              db_out, ub_out, *, blk: int, sigma: float):
    """gram_band fused one step further: emits the assembled KKT band
    db = pb_d + rho * gd + sigma I, ub = pb_u + rho * gu directly (the
    block-Thomas factor's inputs), so the band add/scale never exists as
    separate XLA fusions + layout copies (~4.7 ms/batch 6144 measured
    on the band_gram="pallas" profile)."""
    gt = gt_ref[:]                        # (S, nfd, m_p)
    rho = rho_ref[:]                      # (S, 1, 1)
    s, nfd, _ = gt.shape
    m_blk = nfd // blk
    g = _gram_pair(gt, gt)                # (S, nfd, nfd) in VMEM
    row = jax.lax.broadcasted_iota(jnp.int32, (1, blk, blk), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, blk, blk), 2)
    eye_b = jnp.where(row == col, jnp.float32(sigma), jnp.float32(0.0))
    for i in range(m_blk):
        gd_i = g[:, i * blk:(i + 1) * blk, i * blk:(i + 1) * blk]
        db_out[:, i, :, :] = pb_d_ref[:, i, :, :] + rho * gd_i + eye_b
    for i in range(m_blk - 1):
        gu_i = g[:, i * blk:(i + 1) * blk, (i + 1) * blk:(i + 2) * blk]
        ub_out[:, i, :, :] = pb_u_ref[:, i, :, :] + rho * gu_i


def gram_band_factors(gt, pb_d, pb_u, rho, *, blk: int, sigma: float,
                      interpret=None):
    """(S, nfd, m_p) G^T + kron'd objective band + rho -> assembled KKT
    band (db (S, m, blk, blk), ub (S, m-1, blk, blk)) in one kernel."""
    return _gram_band_factors_jit(gt, pb_d, pb_u, rho, blk=blk,
                                  sigma=sigma,
                                  interpret=_resolve_interpret(interpret))


@functools.partial(jax.jit, static_argnames=("blk", "sigma", "interpret"))
def _gram_band_factors_jit(gt, pb_d, pb_u, rho, *, blk: int, sigma: float,
                           interpret: bool):
    s, nfd, m_p = gt.shape
    m_blk = nfd // blk
    kernel = functools.partial(_kernel_gram_band_factors, blk=blk,
                               sigma=sigma)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((s, m_blk, blk, blk), jnp.float32),
            jax.ShapeDtypeStruct((s, m_blk - 1, blk, blk), jnp.float32),
        ),
        in_specs=[vmem] * 4,
        out_specs=(vmem,) * 2,
        interpret=interpret,
    )(gt, pb_d, pb_u, rho)


def _kernel_gram_band(gt_ref, gd_out, gu_out, *, blk: int, per_block: bool):
    """Block-tridiagonal BAND of the Gram G^T G, computed in VMEM.

    The XLA formulation materializes the full (S, nfd, nfd) Gram in HBM
    (fusion ~8.7 ms/batch 6144), relayouts it for the band slicing
    (~2.1 ms), and separately relayouts gt into the ADMM kernel's standard
    layout (~5.2 ms) because the Gram matmul prefers a different gt layout.
    Here BOTH consumers of gt are Pallas kernels (standard layout), so gt
    is materialized once, and only the band (17/81 of the blocks) ever
    touches HBM.

    per_block: compute each band block as its own (blk, m_p) x (blk, m_p)
    lane-contraction (no unaligned slicing) instead of slicing the full
    in-VMEM Gram -- two Mosaic codegen strategies, measured against each
    other on hardware.
    """
    gt = gt_ref[:]                        # (S, nfd, m_p)
    s, nfd, _ = gt.shape
    m_blk = nfd // blk
    if per_block:
        rows = [gt[:, i * blk:(i + 1) * blk, :] for i in range(m_blk)]
        for i in range(m_blk):
            gd_out[:, i, :, :] = _gram_pair(rows[i], rows[i])
        for i in range(m_blk - 1):
            gu_out[:, i, :, :] = _gram_pair(rows[i], rows[i + 1])
    else:
        g = _gram_pair(gt, gt)            # (S, nfd, nfd) in VMEM
        for i in range(m_blk):
            gd_out[:, i, :, :] = g[:, i * blk:(i + 1) * blk,
                                   i * blk:(i + 1) * blk]
        for i in range(m_blk - 1):
            gu_out[:, i, :, :] = g[:, i * blk:(i + 1) * blk,
                                   (i + 1) * blk:(i + 2) * blk]


def _gram_pair(a, b):
    """Per-scenario (S, n, L) x (S, m, L) -> (S, n, m) contracting lanes
    (a @ b^T without an explicit transpose), full-f32 MXU passes."""
    return jnp.stack([
        jax.lax.dot_general(
            a[i], b[i], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        for i in range(a.shape[0])], axis=0)


def gram_band(gt, *, blk: int, per_block: bool = False, interpret=None):
    """(S, nfd, m_p) G^T -> block-tridiagonal Gram band
    (gd (S, m, blk, blk) diagonal blocks, gu (S, m-1, blk, blk) super-
    diagonal blocks) with gt consumed in the kernel-standard layout."""
    return _gram_band_jit(gt, blk=blk, per_block=per_block,
                          interpret=_resolve_interpret(interpret))


@functools.partial(jax.jit, static_argnames=("blk", "per_block",
                                             "interpret"))
def _gram_band_jit(gt, *, blk: int, per_block: bool, interpret: bool):
    s, nfd, m_p = gt.shape
    m_blk = nfd // blk
    kernel = functools.partial(_kernel_gram_band, blk=blk,
                               per_block=per_block)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((s, m_blk, blk, blk), jnp.float32),
            jax.ShapeDtypeStruct((s, m_blk - 1, blk, blk), jnp.float32),
        ),
        in_specs=[vmem],
        out_specs=(vmem,) * 2,
        interpret=interpret,
    )(gt)


def _resolve_interpret(interpret):
    """None = auto (interpret on CPU, compiled on TPU); explicit True/False
    is honored as given.  Resolved OUTSIDE the jitted wrappers so the choice
    is part of the jit cache key, not a trace-time backend probe."""
    if interpret is None:
        return jax.default_backend() == "cpu"
    return bool(interpret)


def admm_stage_fused(rho, winv, gt, b, rb, xq, x0, z0=None, u0=None, *,
                     n_iters: int, alpha: float, nb_p: int,
                     n_ball: int = -1, init_z: bool = True,
                     interpret=None):
    """Fused ADMM stage: in-kernel m1 formation, z/u init from the warm
    start (init_z=True; pass z0/u0 and init_z=False for stage > 0), and the
    final y / dual-residual matvecs emitted by the kernel.

    Args:
      rho: (S, 1, 1).  winv: (S, nfd, nfd) KKT inverse.  gt: (S, nfd, m_p).
      b: (S, 1, m_p).  rb: (S, 1, nb_p).  xq: (S, nfd, 1).  x0: (S, nfd, 1).

    Returns:
      (x (S, nfd, 1), z, z_prev, u (S, 1, m_p), prim (S, 1, 1),
       dual_matvec_max (S, 1, 1) -- multiply by rho for the dual residual,
       y (S, 1, m_p) = G x + b).
    """
    return _admm_stage_fused_jit(
        rho, winv, gt, b, rb, xq, x0, z0, u0, n_iters=n_iters, alpha=alpha,
        nb_p=nb_p, n_ball=n_ball, init_z=init_z,
        interpret=_resolve_interpret(interpret))


@functools.partial(jax.jit, static_argnames=("n_iters", "alpha", "nb_p",
                                             "n_ball", "init_z", "interpret"))
def _admm_stage_fused_jit(rho, winv, gt, b, rb, xq, x0, z0=None, u0=None, *,
                          n_iters: int, alpha: float, nb_p: int,
                          n_ball: int = -1, init_z: bool = True,
                          interpret: bool = False):
    s, nfd, m_p = gt.shape
    if n_ball < 0:
        n_ball = nb_p
    if z0 is None:
        z0 = jnp.zeros((s, 1, m_p), jnp.float32)
        u0 = jnp.zeros((s, 1, m_p), jnp.float32)
    kernel = functools.partial(_kernel_fused, n_iters=n_iters, alpha=alpha,
                               nb_p=nb_p, n_ball=n_ball, init_z=init_z)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((s, nfd, 1), jnp.float32),
            jax.ShapeDtypeStruct((s, 1, m_p), jnp.float32),
            jax.ShapeDtypeStruct((s, 1, m_p), jnp.float32),
            jax.ShapeDtypeStruct((s, 1, m_p), jnp.float32),
            jax.ShapeDtypeStruct((s, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((s, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((s, 1, m_p), jnp.float32),
        ),
        in_specs=[vmem] * 9,
        out_specs=(vmem,) * 7,
        interpret=interpret,
    )(rho, winv, gt, b, rb, xq, x0, z0, u0)


def admm_stage_fused_factored(rho, sinv, t, tt, gt, b, rb, xq, x0,
                              z0=None, u0=None, *,
                              n_iters: int, alpha: float, nb_p: int,
                              n_ball: int = -1, init_z: bool = True,
                              interpret=None):
    """Fused ADMM stage from block-LDL^T KKT factors (_kernel_fused_factored):
    m1 = W^{-1} G^T via in-VMEM block-Thomas sweeps -- no dense (nfd, nfd)
    inverse anywhere.

    Args:
      rho: (S, 1, 1).  sinv: (S, m, b, b) pivot-block inverses.
      t/tt: (S, m-1, b, b) subdiagonal factors T_i and their transposes
      (banded.spd_block_tridiag_factor).  gt: (S, nfd, m_p) with
      nfd = m * b.  b: (S, 1, m_p).  rb: (S, 1, nb_p).  xq/x0: (S, nfd, 1).

    Returns: same tuple as admm_stage_fused.
    """
    return _admm_stage_fused_factored_jit(
        rho, sinv, t, tt, gt, b, rb, xq, x0, z0, u0, n_iters=n_iters,
        alpha=alpha, nb_p=nb_p, n_ball=n_ball, init_z=init_z,
        interpret=_resolve_interpret(interpret))


@functools.partial(jax.jit, static_argnames=("n_iters", "alpha", "nb_p",
                                             "n_ball", "init_z", "interpret"))
def _admm_stage_fused_factored_jit(rho, sinv, t, tt, gt, b, rb, xq, x0,
                                   z0=None, u0=None, *,
                                   n_iters: int, alpha: float, nb_p: int,
                                   n_ball: int = -1, init_z: bool = True,
                                   interpret: bool = False):
    s, nfd, m_p = gt.shape
    if n_ball < 0:
        n_ball = nb_p
    if z0 is None:
        z0 = jnp.zeros((s, 1, m_p), jnp.float32)
        u0 = jnp.zeros((s, 1, m_p), jnp.float32)
    kernel = functools.partial(_kernel_fused_factored, n_iters=n_iters,
                               alpha=alpha, nb_p=nb_p, n_ball=n_ball,
                               init_z=init_z)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((s, nfd, 1), jnp.float32),
            jax.ShapeDtypeStruct((s, 1, m_p), jnp.float32),
            jax.ShapeDtypeStruct((s, 1, m_p), jnp.float32),
            jax.ShapeDtypeStruct((s, 1, m_p), jnp.float32),
            jax.ShapeDtypeStruct((s, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((s, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((s, 1, m_p), jnp.float32),
        ),
        in_specs=[vmem] * 11,
        out_specs=(vmem,) * 7,
        interpret=interpret,
    )(rho, sinv, t, tt, gt, b, rb, xq, x0, z0, u0)


@functools.partial(jax.jit, static_argnames=("n_iters", "alpha", "nb_p",
                                             "n_ball", "interpret"))
def admm_stage(rho, m1, gt, b, rb, xq, z0, u0, *,
                  n_iters: int, alpha: float, nb_p: int,
                  n_ball: int = -1, interpret: bool = False):
    """One ADMM stage on-chip for an S-scenario block; vmap over blocks to
    batch (adds a grid axis).

    Args:
      rho: (S, 1, 1).  m1/gt: (S, nfd, m_p).  b: (S, 1, m_p).
      rb: (S, 1, nb_p).  xq: (S, nfd, 1) COLUMN.  z0/u0: (S, 1, m_p).
      n_ball: lanes < n_ball of each ball plane are ball rows; the rest are
        packed half-space rows (default: the whole plane is ball rows).

    Returns:
      (x (S, nfd, 1), z, z_prev, u (S, 1, m_p), prim (S, 1, 1)).
    """
    s, nfd, m_p = m1.shape
    if n_ball < 0:
        n_ball = nb_p
    kernel = functools.partial(_kernel, n_iters=n_iters, alpha=alpha,
                               nb_p=nb_p, n_ball=n_ball)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((s, nfd, 1), jnp.float32),
            jax.ShapeDtypeStruct((s, 1, m_p), jnp.float32),
            jax.ShapeDtypeStruct((s, 1, m_p), jnp.float32),
            jax.ShapeDtypeStruct((s, 1, m_p), jnp.float32),
            jax.ShapeDtypeStruct((s, 1, 1), jnp.float32),
        ),
        in_specs=[vmem] * 8,
        out_specs=(vmem,) * 5,
        interpret=interpret,
    )(rho, m1, gt, b, rb, xq, z0, u0)
