"""Pallas TPU kernel for the IPM Newton-step evaluation: one G^T stream.

The interior-point polish (solver/ipm.py) is HBM-streaming-bound: every
Newton step re-reads the per-scenario constraint tensors several times (the
Jacobian build, the weighted-Gram stack, and 3+ matvecs each stream the
(~0.28 MB/scenario) tensors from HBM -- measured ~8 streams/step at batch
6144).  This kernel fuses everything the step needs from the constraint
tensor into ONE pass with G^T VMEM-resident, in the SAME padded
component-plane lane layout as the ADMM kernel (ops/admm_kernel.py,
solver/qcqp._PadLayout): lanes [ball-x | ball-y | ball-z | half], ball
constraint i at lane c*nb_p + i of plane c, packed half-space rows in the
ball planes' tails.

Per step the kernel emits (everything else is small-tensor math in XLA):

  y      = G x + b                       (constraint-space point)
  c      = constraint values in LANE layout (ball values replicated over the
           3 planes, halves in place, pads carry y=0)
  jtwr2  = J^T (w * r2)                  (the Jacobian part of the affine
           Newton rhs; J^T lam cancels against r1's +J^T lam)
  jts    = J^T (1/s)                     (so the Mehrotra corrector rhs is
           rhs_a - sigma*mu * jts -- no second kernel pass)
  gram   = J^T W J + sum_i lam_i G_i^T G_i   (as its block-tridiagonal
           BAND -- stacked diagonal/super blocks -- when band_block is set;
           exporting the full (S, nfd, nfd) gram and band-slicing in XLA
           profiled ~27 ms/step at batch 6144 in relayout/slice copies)

Jacobian rows are never materialized: for ball i, J_i = sum_c y_ic G_ic, so
every J^T v is a lane-weighted reduce of the resident G^T (weights v_i y_ic
on ball lanes, v_j on half lanes), and the J-row Gram term uses the derived
plane matrix aj = sum_c gt_c * y_c (ball lanes of plane 0; halves as-is).

Reference: the role of Mosek's per-iteration task data
(qcqp_impl.h:477-788); the math matches solver/ipm.solve_qcqp_ipm.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _eval_core(gt, b, rb, x, s, lam, *, nb_p: int, n_ball: int,
               w_cap: float, phr: bool = False):
    """Shared math of the kernel and the XLA fallback.

    gt: (S, nfd, m_p); b/s/lam: (S, 1, m_p); rb: (S, 1, nb_p);
    x: (S, nfd, 1).  Returns (y, c, jtwr2, jts, gram1_scale, aj, w_aj) where
    the caller finishes gram = (gt*gram1_scale) @ gt^T + (aj*w_aj) @ aj^T
    (kept separate so the MXU contraction can differ per backend).

    phr=True switches to the clipped-penalty (PHR) evaluation used by the
    feasibility snap (solver/ipm_lanes): with s fed as lam/rho, the
    kernel's w*r2 equals the multiplier estimate lam + rho*c, CLIPPED at
    zero -- jtwr2 becomes J^T max(lam + rho c, 0) (Gauss-Newton pull on
    violated rows only), the Gram keeps weight rho on every lam > 0 row
    (tangency stiffness for near-boundary rows the caller floors), and the
    curvature weight is the clipped estimate instead of lam.
    """
    m_p = gt.shape[2]
    y = jnp.sum(gt * x, axis=1, keepdims=True) + b        # (S, 1, m_p)
    yx = y[:, :, 0:nb_p]
    yy = y[:, :, nb_p:2 * nb_p]
    yz = y[:, :, 2 * nb_p:3 * nb_p]
    cb = 0.5 * (yx * yx + yy * yy + yz * yz - rb * rb)    # (S, 1, nb_p)
    ball = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nb_p), 2) < n_ball
    # c in lane layout: ball lanes carry the (replicated) ball value, the
    # packed half lanes their own y.  Pads have y=0, b=0 -> c = -0.5 rb^2;
    # the caller masks pads out of every lane reduce.
    parts = [jnp.where(ball, cb, yx), jnp.where(ball, cb, yy),
             jnp.where(ball, cb, yz)]
    if m_p > 3 * nb_p:
        parts.append(y[:, :, 3 * nb_p:])
    c = jnp.concatenate(parts, axis=2)                    # (S, 1, m_p)

    s_safe = jnp.maximum(s, 1e-14)
    r2 = c + s
    w = jnp.minimum(lam / s_safe, w_cap)                  # (S, 1, m_p)

    # ymul: ball lanes y_ic, half lanes 1, pads 0 (gt is 0 there anyway).
    ones = jnp.ones_like(yx)
    parts_m = [jnp.where(ball, yx, ones), jnp.where(ball, yy, ones),
               jnp.where(ball, yz, ones)]
    if m_p > 3 * nb_p:
        parts_m.append(jnp.ones_like(y[:, :, 3 * nb_p:]))
    ymul = jnp.concatenate(parts_m, axis=2)

    if phr:
        # Clipped PHR multiplier estimate drives the gradient.  The Gram
        # keeps weight w = rho on EVERY lam > 0 lane (not just estimate-
        # positive ones): the feasibility snap floors lam on near-boundary
        # rows so their rho J J^T stiffness keeps the step TANGENT to
        # boundaries it would otherwise push through, with no rhs force.
        m_est = jnp.maximum(w * r2, 0.0)      # max(lam + rho c, 0) per lane
        jtwr2 = jnp.sum(gt * (m_est * ymul), axis=2, keepdims=True)
    else:
        jtwr2 = jnp.sum(gt * (w * r2 * ymul), axis=2, keepdims=True)
    jts = jnp.sum(gt * (ymul / s_safe), axis=2, keepdims=True)

    # Curvature part sum_i lam_i sum_c G_ic G_ic^T: one-sided lane scale of
    # gt (ball lanes only).  J-row part: aj holds J_i on plane-0 ball lanes,
    # the half rows as-is, zeros elsewhere; weight w per matching lane.
    zeros = jnp.zeros_like(y)
    curv = m_est if phr else lam              # ball-curvature lane weights
    lam_ball = jnp.concatenate(
        [jnp.where(ball, curv[:, :, 0:nb_p], zeros[:, :, 0:nb_p]),
         jnp.where(ball, curv[:, :, nb_p:2 * nb_p], zeros[:, :, 0:nb_p]),
         jnp.where(ball, curv[:, :, 2 * nb_p:3 * nb_p], zeros[:, :, 0:nb_p])]
        + ([zeros[:, :, 3 * nb_p:]] if m_p > 3 * nb_p else []), axis=2)

    gtx = gt[:, :, 0:nb_p]
    gty = gt[:, :, nb_p:2 * nb_p]
    gtz = gt[:, :, 2 * nb_p:3 * nb_p]
    j_plane0 = gtx * yx + gty * yy + gtz * yz             # (S, nfd, nb_p)
    aj_parts = [jnp.where(ball, j_plane0, gtx),
                jnp.where(ball, jnp.zeros_like(gty), gty),
                jnp.where(ball, jnp.zeros_like(gtz), gtz)]
    if m_p > 3 * nb_p:
        aj_parts.append(gt[:, :, 3 * nb_p:])
    aj = jnp.concatenate(aj_parts, axis=2)                # (S, nfd, m_p)
    # Plane 0 keeps w as-is: ball lanes carry the ball w (replicated lane
    # vector), tail lanes their packed half w.
    w_aj_parts = [w[:, :, 0:nb_p],
                  jnp.where(ball, zeros[:, :, 0:nb_p], w[:, :, nb_p:2 * nb_p]),
                  jnp.where(ball, zeros[:, :, 0:nb_p],
                            w[:, :, 2 * nb_p:3 * nb_p])]
    if m_p > 3 * nb_p:
        w_aj_parts.append(w[:, :, 3 * nb_p:])
    w_aj = jnp.concatenate(w_aj_parts, axis=2)
    return y, c, jtwr2, jts, lam_ball, aj, w_aj


_PRECISIONS = {"highest": jax.lax.Precision.HIGHEST,
               "high": jax.lax.Precision.HIGH,
               "default": jax.lax.Precision.DEFAULT}


def _gram_dot(a, b, precision="highest"):
    """Per-scenario (S, n, L) x (S, n, L) -> (S, n, n) contracting lanes."""
    return jnp.stack([
        jax.lax.dot_general(
            a[i], b[i], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_PRECISIONS[precision])
        for i in range(a.shape[0])], axis=0)


def _kernel(gt_ref, b_ref, rb_ref, x_ref, s_ref, lam_ref,
            y_out, c_out, jtwr2_out, jts_out, gram_out,
            *, nb_p: int, n_ball: int, w_cap: float, phr: bool,
            gram_precision: str):
    gt = gt_ref[:]
    y, c, jtwr2, jts, lam_ball, aj, w_aj = _eval_core(
        gt, b_ref[:], rb_ref[:], x_ref[:], s_ref[:], lam_ref[:],
        nb_p=nb_p, n_ball=n_ball, w_cap=w_cap, phr=phr)
    gram = (_gram_dot(gt * lam_ball, gt, gram_precision)
            + _gram_dot(aj * w_aj, aj, gram_precision))
    y_out[:] = y
    c_out[:] = c
    jtwr2_out[:] = jtwr2
    jts_out[:] = jts
    gram_out[:] = gram


def _kernel_band(gt_ref, b_ref, rb_ref, x_ref, s_ref, lam_ref,
                 y_out, c_out, jtwr2_out, jts_out, hd_out, hu_out,
                 *, nb_p: int, n_ball: int, w_cap: float, phr: bool,
                 gram_precision: str, band_block: int):
    """Band-output variant: the weighted Gram is block-tridiagonal in
    ``band_block``-sized vertex blocks (banded.kkt_tridiag_block), so only
    its band leaves the kernel -- hd (S, nfd, blk) stacked diagonal blocks,
    hu (S, nfd - blk, blk) stacked super blocks.  Exporting the full
    (S, nfd, nfd) gram and band-slicing it in XLA profiled ~27 ms/step at
    batch 6144 (a full relayout of a 450 MB tensor plus slice-copy chains);
    the in-kernel slices are register moves."""
    gt = gt_ref[:]
    y, c, jtwr2, jts, lam_ball, aj, w_aj = _eval_core(
        gt, b_ref[:], rb_ref[:], x_ref[:], s_ref[:], lam_ref[:],
        nb_p=nb_p, n_ball=n_ball, w_cap=w_cap, phr=phr)
    gram = (_gram_dot(gt * lam_ball, gt, gram_precision)
            + _gram_dot(aj * w_aj, aj, gram_precision))
    blk = band_block
    m_blk = gram.shape[-1] // blk
    y_out[:] = y
    c_out[:] = c
    jtwr2_out[:] = jtwr2
    jts_out[:] = jts
    for i in range(m_blk):
        hd_out[:, i * blk:(i + 1) * blk, :] = \
            gram[:, i * blk:(i + 1) * blk, i * blk:(i + 1) * blk]
        if i + 1 < m_blk:
            hu_out[:, i * blk:(i + 1) * blk, :] = \
                gram[:, i * blk:(i + 1) * blk,
                     (i + 1) * blk:(i + 2) * blk]


def _resolve_interpret(interpret):
    if interpret is None:
        return jax.default_backend() == "cpu"
    return bool(interpret)


def ipm_eval_step(gt, b, rb, x, s, lam, *, nb_p: int, n_ball: int,
                  w_cap: float = 1e10, phr: bool = False,
                  gram_precision: str = "highest", band_block: int = 0,
                  interpret=None):
    """One fused IPM evaluation at (x, s, lam): G^T streamed once.

    Args (S-blocked; group a batch as (B/S, S, ...) and vmap over the
    leading axis):
      gt: (S, nfd, m_p) equilibrated G^T in the padded plane layout.
      b: (S, 1, m_p).  rb: (S, 1, nb_p) scaled ball radii (pads 1).
      x: (S, nfd, 1).  s, lam: (S, 1, m_p) slack/multiplier LANE vectors
        (ball entries replicated across the 3 planes, pads s=1, lam=0).

    Returns (y, c, jtwr2, jts, gram) per the module docstring.
    """
    return _ipm_eval_step_jit(gt, b, rb, x, s, lam, nb_p=nb_p,
                              n_ball=n_ball, w_cap=w_cap, phr=phr,
                              gram_precision=gram_precision,
                              band_block=band_block,
                              interpret=_resolve_interpret(interpret))


@functools.partial(jax.jit, static_argnames=("nb_p", "n_ball", "w_cap",
                                             "phr", "gram_precision",
                                             "band_block", "interpret"))
def _ipm_eval_step_jit(gt, b, rb, x, s, lam, *, nb_p: int, n_ball: int,
                       w_cap: float, phr: bool, gram_precision: str,
                       band_block: int, interpret: bool):
    s_blk, nfd, m_p = gt.shape
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    if band_block:
        kernel = functools.partial(_kernel_band, nb_p=nb_p, n_ball=n_ball,
                                   w_cap=w_cap, phr=phr,
                                   gram_precision=gram_precision,
                                   band_block=band_block)
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((s_blk, 1, m_p), jnp.float32),   # y
                jax.ShapeDtypeStruct((s_blk, 1, m_p), jnp.float32),   # c
                jax.ShapeDtypeStruct((s_blk, nfd, 1), jnp.float32),   # jtwr2
                jax.ShapeDtypeStruct((s_blk, nfd, 1), jnp.float32),   # jts
                jax.ShapeDtypeStruct((s_blk, nfd, band_block),
                                     jnp.float32),                    # hd
                jax.ShapeDtypeStruct((s_blk, nfd - band_block,
                                      band_block), jnp.float32),      # hu
            ),
            in_specs=[vmem] * 6,
            out_specs=(vmem,) * 6,
            interpret=interpret,
        )(gt, b, rb, x, s, lam)
    kernel = functools.partial(_kernel, nb_p=nb_p, n_ball=n_ball,
                               w_cap=w_cap, phr=phr,
                               gram_precision=gram_precision)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((s_blk, 1, m_p), jnp.float32),    # y
            jax.ShapeDtypeStruct((s_blk, 1, m_p), jnp.float32),    # c
            jax.ShapeDtypeStruct((s_blk, nfd, 1), jnp.float32),    # jtwr2
            jax.ShapeDtypeStruct((s_blk, nfd, 1), jnp.float32),    # jts
            jax.ShapeDtypeStruct((s_blk, nfd, nfd), jnp.float32),  # gram
        ),
        in_specs=[vmem] * 6,
        out_specs=(vmem,) * 5,
        interpret=interpret,
    )(gt, b, rb, x, s, lam)


def _matvec_kernel(gt_ref, x_ref, out_ref):
    out_ref[:] = jnp.sum(gt_ref[:] * x_ref[:], axis=1, keepdims=True)


def gt_matvec(gt, x, interpret=None):
    """y_row = G x as a broadcast-reduce Pallas matvec: (S, nfd, m_p) x
    (S, nfd, 1) -> (S, 1, m_p).

    XLA lowers the same batched contraction to a multiply-reduce fusion that
    runs ~7x slower than HBM speed-of-light at the flagship shapes (measured
    11-17 ms/batch 6144 per matvec in the IPM profile); this kernel is the
    ADMM kernel's y-matvec pattern as a standalone op."""
    return _gt_matvec_jit(gt, x, interpret=_resolve_interpret(interpret))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gt_matvec_jit(gt, x, *, interpret: bool):
    s_blk, nfd, m_p = gt.shape
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _matvec_kernel,
        out_shape=jax.ShapeDtypeStruct((s_blk, 1, m_p), jnp.float32),
        in_specs=[vmem, vmem],
        out_specs=vmem,
        interpret=interpret,
    )(gt, x)
