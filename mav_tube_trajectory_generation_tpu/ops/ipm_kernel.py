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


def _pipe_kernel(gt_ref, b_ref, rb_ref, pe_d_ref, pe_u_ref, q_ref,
                 x_ref, s_ref, lam_ref, y_ref,
                 bx_ref, by_ref, bm_ref,
                 sinv_ref, t_ref, tt_ref, dsc_ref, rhs_ref,
                 act_ref, cw_ref,
                 x_out, s_out, lam_out, y_out, bx_out, by_out, bm_out,
                 maxlam_out, hd_out, hu_out, rhs_out,
                 *, nb_p: int, n_ball: int, mc: int, sigma_min: float,
                 tau: float, alpha_max: float, w_cap: float, reg: float,
                 snap_rho: float, blk: int, upd_mode: str, eval_mode: str,
                 gram_precision: str = "highest"):
    """One PIPELINED IPM step: finish the previous Newton/snap step (solve
    its direction from the XLA-computed block-Thomas factors + apply the
    update) and evaluate the next point (emit the Hessian BAND + rhs for
    XLA to factor) -- one kernel dispatch and ONE G^T stream per step.

    The profile of the scan path (docs/PERF.md round 3) shows the eval
    kernel near its MXU floor (~14 ms/step, the two weighted-Gram dots)
    while the per-step XLA epilogue -- gt_matvec dispatch, the solve's
    block concatenates, and the elementwise update chain -- costs about as
    much again.  This kernel keeps XLA's massively-batched band factor (a
    per-instance in-kernel factor measured SLOWER: sequential micro-op
    chain, see ipm_solve_fused) and moves everything else in here.

    upd_mode / eval_mode: "none" | "newton" | "snap".  Snap updates act on
    the best-iterate state (bx/by); Newton updates on the running x/s/lam/y
    with the finite-direction gate and best-iterate tracking.
    """
    gt = gt_ref[:]
    rb = rb_ref[:]
    act = act_ref[:]
    cw = cw_ref[:]
    s_blk_n = gt.shape[0]
    inf32 = jnp.float32(jnp.inf)

    x, s, lam, y = x_ref[:], s_ref[:], lam_ref[:], y_ref[:]
    best_x, best_y, best_merit = bx_ref[:], by_ref[:], bm_ref[:]
    s = jnp.maximum(s, 1e-14) * act + (1.0 - act)

    if upd_mode == "newton":
        dx = _factored_col_solve(sinv_ref[:], t_ref[:], tt_ref[:],
                                 dsc_ref[:], rhs_ref[:], blk)
        gdx = jnp.sum(gt * dx, axis=1, keepdims=True)
        c = _c_lanes_k(y, rb, nb_p, n_ball)
        r2 = (c + s) * act
        w = jnp.minimum(lam / s, w_cap)
        mu = jnp.sum(cw * s * lam, axis=2, keepdims=True) / mc
        sig_mu = sigma_min * mu
        jdx = _jdx_lanes_k(gdx, y, nb_p, n_ball)
        ds = (-r2 - jdx) * act
        dlam = ((sig_mu - lam * s) / s - w * ds) * act
        alpha = jnp.minimum(jnp.minimum(_max_step_k(s, ds, tau),
                                        _max_step_k(lam, dlam, tau)),
                            alpha_max)
        fin = jnp.min(jnp.where((jnp.abs(ds) < inf32)
                                & (jnp.abs(dlam) < inf32),
                                jnp.float32(1.0), jnp.float32(0.0)),
                      axis=2, keepdims=True)
        upd = (alpha > 0) & (fin > 0)
        x = jnp.where(upd, x + alpha * dx, x)
        s = jnp.where(upd, s + alpha * ds, s)
        lam = jnp.where(upd & (act > 0),
                        jnp.maximum(lam + alpha * dlam, 1e-16), lam)
        y = jnp.where(upd, y + alpha * gdx, y)
        c_new = _c_lanes_k(y, rb, nb_p, n_ball)
        merit = _merit_k(c_new, s, lam, act, cw, mc)
        better = merit < best_merit
        best_x = jnp.where(better, x, best_x)
        best_y = jnp.where(better, y, best_y)
        best_merit = jnp.where(better, merit, best_merit)
    elif upd_mode == "snap":
        dx = _factored_col_solve(sinv_ref[:], t_ref[:], tt_ref[:],
                                 dsc_ref[:], rhs_ref[:], blk)
        gdx = jnp.sum(gt * dx, axis=1, keepdims=True)

        def phi(y_a):
            c_a = _c_lanes_k(y_a, rb, nb_p, n_ball)
            v = jnp.maximum(c_a, 0.0)
            return jnp.sum(cw * v * v, axis=2, keepdims=True)

        best_a = jnp.zeros((s_blk_n, 1, 1), jnp.float32)
        best_p = phi(best_y)
        for a_t in map(jnp.float32, (1.0, 0.5, 0.25, 0.1, 0.03, 0.01,
                                     0.003)):
            p_t = phi(best_y + a_t * gdx)
            better = p_t < best_p
            best_a = jnp.where(better, a_t, best_a)
            best_p = jnp.where(better, p_t, best_p)
        best_x = jnp.where(best_a > 0, best_x + best_a * dx, best_x)
        best_y = jnp.where(best_a > 0, best_y + best_a * gdx, best_y)

    # ---- Eval at the (possibly updated) point. ---------------------------
    if eval_mode == "newton":
        y_e, c_e, jtwr2, jts, lam_ball, aj, w_aj = _eval_core(
            gt, b_ref[:], rb, x, s, lam, nb_p=nb_p, n_ball=n_ball,
            w_cap=w_cap, phr=False)
        gram = (_gram_dot(gt * lam_ball, gt, gram_precision)
                + _gram_dot(aj * w_aj, aj, gram_precision))
        mu = jnp.sum(cw * s * lam, axis=2, keepdims=True) / mc
        sig_mu = sigma_min * mu
        rhs_new = -(_pe_band_mv(pe_d_ref[:], pe_u_ref[:], x, blk) + q_ref[:]
                    + jtwr2 + sig_mu * jts)
        y = y_e                      # fresh matvec point, as the scan path
        reg_e = reg
    elif eval_mode == "snap":
        c_b = _c_lanes_k(best_y, rb, nb_p, n_ball)
        margin = 3.0 / snap_rho
        lam_s = jnp.where((c_b > -margin) & (act > 0), jnp.float32(1e-6),
                          jnp.float32(0.0))
        s_s = lam_s / snap_rho
        _, _, jtwr2, _, lam_ball, aj, w_aj = _eval_core(
            gt, b_ref[:], rb, best_x, s_s, lam_s, nb_p=nb_p,
            n_ball=n_ball, w_cap=snap_rho, phr=True)
        gram = (_gram_dot(gt * lam_ball, gt, gram_precision)
                + _gram_dot(aj * w_aj, aj, gram_precision))
        rhs_new = -jtwr2
        reg_e = 1e-6

    if eval_mode == "none":
        hd_out[:] = jnp.zeros(hd_out.shape, jnp.float32)
        hu_out[:] = jnp.zeros(hu_out.shape, jnp.float32)
        rhs_out[:] = jnp.zeros(rhs_out.shape, jnp.float32)
    else:
        pe_d = pe_d_ref[:]
        pe_u = pe_u_ref[:]
        row = jax.lax.broadcasted_iota(jnp.int32, (1, blk, 1), 1)
        colb = jax.lax.broadcasted_iota(jnp.int32, (1, 1, blk), 2)
        eye_b = (row == colb).astype(jnp.float32)
        m_blk = gram.shape[-1] // blk
        for i in range(m_blk):
            hd_out[:, i * blk:(i + 1) * blk, :] = \
                (gram[:, i * blk:(i + 1) * blk, i * blk:(i + 1) * blk]
                 + pe_d[:, i] + reg_e * eye_b)
            if i + 1 < m_blk:
                hu_out[:, i * blk:(i + 1) * blk, :] = \
                    (gram[:, i * blk:(i + 1) * blk,
                          (i + 1) * blk:(i + 2) * blk] + pe_u[:, i])
        rhs_out[:] = rhs_new

    x_out[:] = x
    s_out[:] = s
    lam_out[:] = lam
    y_out[:] = y
    bx_out[:] = best_x
    by_out[:] = best_y
    bm_out[:] = best_merit
    maxlam_out[:] = jnp.max(jnp.where(act > 0, lam, jnp.float32(0.0)), axis=2,
                            keepdims=True)


def _pe_band_mv(pe_d, pe_u, x, blk: int):
    """Block-tridiagonal matvec kron-band(P) @ x from the stacked band."""
    m_blk = pe_d.shape[1]
    out = []
    for i in range(m_blk):
        o = _sdot3(pe_d[:, i], x[:, i * blk:(i + 1) * blk, :])
        if i + 1 < m_blk:
            o = o + _sdot3(pe_u[:, i], x[:, (i + 1) * blk:(i + 2) * blk, :])
        if i:
            o = o + _dot_t(pe_u[:, i - 1], x[:, (i - 1) * blk:i * blk, :])
        out.append(o)
    return jnp.concatenate(out, axis=1)


def ipm_pipe_step(gt, b, rb, pe_d, pe_u, q, x, s, lam, y, bx, by, bm,
                  sinv, t, tt, dsc, rhs, act, cw, *,
                  nb_p: int, n_ball: int, mc: int, sigma_min: float,
                  tau: float, alpha_max: float, w_cap: float, reg: float,
                  snap_rho: float, blk: int, upd_mode: str, eval_mode: str,
                  gram_precision: str = "highest", interpret=None):
    """Pipelined IPM step (see _pipe_kernel).  All args S-blocked; returns
    (x, s, lam, y, bx, by, bm, max_lam, hd, hu, rhs)."""
    return _ipm_pipe_step_jit(
        gt, b, rb, pe_d, pe_u, q, x, s, lam, y, bx, by, bm, sinv, t, tt,
        dsc, rhs, act, cw, nb_p=nb_p, n_ball=n_ball, mc=mc,
        sigma_min=sigma_min, tau=tau, alpha_max=alpha_max, w_cap=w_cap,
        reg=reg, snap_rho=snap_rho, blk=blk, upd_mode=upd_mode,
        eval_mode=eval_mode, gram_precision=gram_precision,
        interpret=_resolve_interpret(interpret))


@functools.partial(jax.jit, static_argnames=(
    "nb_p", "n_ball", "mc", "sigma_min", "tau", "alpha_max", "w_cap",
    "reg", "snap_rho", "blk", "upd_mode", "eval_mode", "gram_precision",
    "interpret"))
def _ipm_pipe_step_jit(gt, b, rb, pe_d, pe_u, q, x, s, lam, y, bx, by, bm,
                       sinv, t, tt, dsc, rhs, act, cw, *,
                       nb_p: int, n_ball: int, mc: int, sigma_min: float,
                       tau: float, alpha_max: float, w_cap: float,
                       reg: float, snap_rho: float, blk: int,
                       upd_mode: str, eval_mode: str, gram_precision: str,
                       interpret: bool):
    s_blk, nfd, m_p = gt.shape
    kernel = functools.partial(
        _pipe_kernel, nb_p=nb_p, n_ball=n_ball, mc=mc, sigma_min=sigma_min,
        tau=tau, alpha_max=alpha_max, w_cap=w_cap, reg=reg,
        snap_rho=snap_rho, blk=blk, upd_mode=upd_mode, eval_mode=eval_mode,
        gram_precision=gram_precision)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    row = jax.ShapeDtypeStruct((s_blk, 1, m_p), jnp.float32)
    col = jax.ShapeDtypeStruct((s_blk, nfd, 1), jnp.float32)
    one = jax.ShapeDtypeStruct((s_blk, 1, 1), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=(
            col, row, row, row,                              # x s lam y
            col, row, one,                                   # bx by bm
            one,                                             # max_lam
            jax.ShapeDtypeStruct((s_blk, nfd, blk), jnp.float32),   # hd
            jax.ShapeDtypeStruct((s_blk, nfd - blk, blk), jnp.float32),
            col,                                             # rhs
        ),
        in_specs=[vmem] * 20,
        out_specs=(vmem,) * 11,
        interpret=interpret,
    )(gt, b, rb, pe_d, pe_u, q, x, s, lam, y, bx, by, bm, sinv, t, tt,
      dsc, rhs, act, cw)


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


def _gj_inverse(m):
    """(S, b, b) SPD inverse via Gauss-Jordan -- diagonal pivoting (no row
    swaps: the callers feed equilibrated SPD pivot blocks).  Pure jnp ops,
    fully unrolled over the b pivots, so it lowers inside a Pallas kernel
    (no linalg custom calls exist there).  Two-matrix formulation (the row
    ops applied to M and to a running identity) -- the classic augmented
    [M | I] tile hits a Mosaic concatenate layout limitation
    ("result/input offset mismatch on non-concat dimension") on v5e.
    """
    s, bb, _ = m.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (1, bb, 1), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, bb), 2)
    inv = jnp.broadcast_to((row == col).astype(m.dtype), m.shape)
    a = m
    for p in range(bb):
        d = a[:, p:p + 1, p:p + 1]                        # (S, 1, 1)
        prow_a = a[:, p:p + 1, :] / d
        prow_i = inv[:, p:p + 1, :] / d
        elim = jnp.where(row == p, jnp.float32(0.0), a[:, :, p:p + 1])
        a = jnp.where(row == p, prow_a, a - elim * prow_a)
        inv = jnp.where(row == p, prow_i, inv - elim * prow_i)
    return inv


def _dot_t(a, b):
    """Per-batch a^T @ b for stacked (S, r, n) x (S, r, m) -> (S, n, m).
    Explicit swapaxes + standard dot: Mosaic's small-tile relayout for the
    transpose is cheap and the standard matmul lowering is the well-trodden
    path."""
    return _sdot3(jnp.swapaxes(a, 1, 2), b)


def _sdot3(a, b):
    """Per-scenario stacked (S, n, k) @ (S, k, m), unrolled over S (the
    ADMM kernel's _sdot idiom)."""
    return jnp.stack([
        jax.lax.dot(a[i], b[i], precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
        for i in range(a.shape[0])], axis=0)


def _band_factor_solve(gram, pe_d, pe_u, reg, rhs, blk: int):
    """Equilibrated block-Thomas factor + single-column solve, all in VMEM.

    H = blocktridiag(pe_d + gram_diag + reg*I, pe_u + gram_super) is
    Jacobi-equilibrated (D H D with D = diag(rsqrt(diag H)) -- the same
    scheme as solver/ipm_lanes._equilibrated_band_solve, which measured the
    unscaled f32 factor flipping dx to an ascent direction on stiff active
    sets), factored level by level with Gauss-Jordan pivot-block inverses,
    and applied to ``rhs`` (S, nfd, 1).  Returns dx (S, nfd, 1).

    gram: (S, nfd, nfd).  pe_d: (S, m, blk, blk).  pe_u: (S, m-1, blk, blk).
    """
    s, nfd, _ = gram.shape
    m_blk = nfd // blk
    row = jax.lax.broadcasted_iota(jnp.int32, (1, blk, 1), 1)
    colb = jax.lax.broadcasted_iota(jnp.int32, (1, 1, blk), 2)
    eye_b = (row == colb).astype(gram.dtype)

    hd, hu, dsc = [], [], []
    for i in range(m_blk):
        h_i = (gram[:, i * blk:(i + 1) * blk, i * blk:(i + 1) * blk]
               + pe_d[:, i] + reg * eye_b)
        diag = jnp.sum(h_i * eye_b, axis=2, keepdims=True)   # (S, blk, 1)
        d_i = jax.lax.rsqrt(jnp.maximum(diag, 1e-30))
        dsc.append(d_i)
        hd.append(h_i * d_i * jnp.swapaxes(d_i, 1, 2))
    for i in range(m_blk - 1):
        hu.append((gram[:, i * blk:(i + 1) * blk,
                        (i + 1) * blk:(i + 2) * blk] + pe_u[:, i])
                  * dsc[i] * jnp.swapaxes(dsc[i + 1], 1, 2))

    sinv = [None] * m_blk
    w_f = [None] * (m_blk - 1)
    s_cur = hd[0]
    for i in range(m_blk):
        sinv[i] = _gj_inverse(s_cur)
        if i + 1 < m_blk:
            w_f[i] = _sdot3(sinv[i], hu[i])                # S_i^{-1} U_i
            s_cur = hd[i + 1] - _dot_t(hu[i], w_f[i])

    # Solve (on the equilibrated system: scale rhs, unscale dx).
    z = [None] * m_blk
    for i in range(m_blk):
        r_i = rhs[:, i * blk:(i + 1) * blk, :] * dsc[i]
        if i:
            r_i = r_i - _dot_t(hu[i - 1], z[i - 1])
        z[i] = _sdot3(sinv[i], r_i)
    x_p = [None] * m_blk
    x_p[m_blk - 1] = z[m_blk - 1]
    for i in range(m_blk - 2, -1, -1):
        x_p[i] = z[i] - _sdot3(w_f[i], x_p[i + 1])
    return jnp.concatenate([x_p[i] * dsc[i] for i in range(m_blk)], axis=1)


def _c_lanes_k(y, rb, nb_p: int, n_ball: int):
    """Constraint values in lane layout from y (S, 1, m_p) (shared by the
    fused/pipelined kernels; same math as solver/ipm_lanes._c_lanes)."""
    m_p = y.shape[-1]
    yx = y[:, :, 0:nb_p]
    yy = y[:, :, nb_p:2 * nb_p]
    yz = y[:, :, 2 * nb_p:3 * nb_p]
    cb = 0.5 * (yx * yx + yy * yy + yz * yz - rb * rb)
    ball = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nb_p), 2) < n_ball
    parts = [jnp.where(ball, cb, yx), jnp.where(ball, cb, yy),
             jnp.where(ball, cb, yz)]
    if m_p > 3 * nb_p:
        parts.append(y[:, :, 3 * nb_p:])
    return jnp.concatenate(parts, axis=2)


def _jdx_lanes_k(gdx, y, nb_p: int, n_ball: int):
    """J dx in lane layout from gdx = G dx (both (S, 1, m_p))."""
    m_p = y.shape[-1]
    jb = (y[:, :, 0:nb_p] * gdx[:, :, 0:nb_p]
          + y[:, :, nb_p:2 * nb_p] * gdx[:, :, nb_p:2 * nb_p]
          + y[:, :, 2 * nb_p:3 * nb_p] * gdx[:, :, 2 * nb_p:3 * nb_p])
    ball = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nb_p), 2) < n_ball
    parts = [jnp.where(ball, jb, gdx[:, :, c * nb_p:(c + 1) * nb_p])
             for c in range(3)]
    if m_p > 3 * nb_p:
        parts.append(gdx[:, :, 3 * nb_p:])
    return jnp.concatenate(parts, axis=2)


def _max_step_k(v, dv, tau: float):
    inf32 = jnp.float32(jnp.inf)
    ratio = jnp.where(dv < 0,
                      -v / jnp.where(dv < 0, dv, jnp.float32(-1.0)), inf32)
    return jnp.minimum(1.0, tau * jnp.min(ratio, axis=2, keepdims=True))


def _merit_k(c, s, lam, act, cw, mc: int):
    inf32 = jnp.float32(jnp.inf)
    m1 = jnp.max(jnp.where(act > 0, jnp.maximum(c, 0.0), -inf32),
                 axis=2, keepdims=True)
    m2 = jnp.max(jnp.where(act > 0, jnp.abs(c + s), -inf32),
                 axis=2, keepdims=True)
    m3 = jnp.sum(cw * s * lam, axis=2, keepdims=True) / mc
    return m1 + m2 + m3


def _factored_col_solve(sinv, t, tt, dsc, rhs, blk: int):
    """Block-Thomas solve of one column against precomputed equilibrated
    factors, all in VMEM (the ADMM _kernel_fused_factored sweep pattern,
    single-column RHS).  sinv: (S, m, b, b); t/tt: (S, m-1, b, b) with
    t[:, i-1] = U_{i-1}^T S_{i-1}^{-1} and tt its transpose; dsc:
    (S, nfd, 1) Jacobi scale.  Returns dx (S, nfd, 1)."""
    m_blk = sinv.shape[1]
    r = rhs * dsc
    u = [None] * m_blk
    z = [None] * m_blk
    for i in range(m_blk):
        u[i] = r[:, i * blk:(i + 1) * blk, :]
        if i:
            u[i] = u[i] - _sdot3(t[:, i - 1], u[i - 1])
        z[i] = _sdot3(sinv[:, i], u[i])
    x_p = [None] * m_blk
    x_p[m_blk - 1] = z[m_blk - 1]
    for i in range(m_blk - 2, -1, -1):
        x_p[i] = z[i] - _sdot3(tt[:, i], x_p[i + 1])
    return jnp.concatenate(x_p, axis=1) * dsc


def _solve_kernel(gt_ref, b_ref, rb_ref, pe_d_ref, pe_u_ref, q_ref,
                  x0_ref, s0_ref, lam0_ref, y0_ref, act_ref, cw_ref,
                  x_fin_out, y_fin_out, s_out, lam_out, y_last_out,
                  merit_out, lam_mid_out, lam_fin_out,
                  *, nb_p: int, n_ball: int, mc: int, n_iters: int,
                  snap_iters: int, sigma_min: float, tau: float,
                  alpha_max: float, w_cap: float, reg: float,
                  snap_rho: float, blk: int,
                  gram_precision: str = "highest"):
    """The WHOLE plane-layout IPM polish in one kernel: n_iters single-
    direction Newton steps (fixed centering sigma_min, the production
    corrector=False schedule of solve_qcqp_polished_batch) followed by
    snap_iters Gauss-Newton feasibility sweeps, with G^T, the Gram, and the
    block-Thomas factors VMEM-resident throughout.

    The XLA formulation dispatches per Newton step one eval kernel, ~80
    small batched ops for the band factor, two factored solves, and a
    matvec kernel -- profiled latency-bound (the factor chain dominates);
    here the entire chain is one dispatch and G^T makes ONE HBM round trip
    for the whole solve.  Math identical to solver/ipm_lanes's scan bodies.
    """
    gt = gt_ref[:]                        # (S, nfd, m_p)
    b = b_ref[:]                          # (S, 1, m_p)
    rb = rb_ref[:]                        # (S, 1, nb_p)
    pe_d = pe_d_ref[:]                    # (S, m, blk, blk)
    pe_u = pe_u_ref[:]                    # (S, m-1, blk, blk)
    q = q_ref[:]                          # (S, nfd, 1)
    act = act_ref[:]                      # (1, 1, m_p)
    cw = cw_ref[:]                        # (1, 1, m_p)
    s_blk, nfd, m_p = gt.shape
    m_blk = nfd // blk
    inf32 = jnp.float32(jnp.inf)

    def p_big_mv(x):
        out = []
        for i in range(m_blk):
            o = _sdot3(pe_d[:, i], x[:, i * blk:(i + 1) * blk, :])
            if i + 1 < m_blk:
                o = o + _sdot3(pe_u[:, i],
                               x[:, (i + 1) * blk:(i + 2) * blk, :])
            if i:
                o = o + _dot_t(pe_u[:, i - 1],
                               x[:, (i - 1) * blk:i * blk, :])
            out.append(o)
        return jnp.concatenate(out, axis=1)

    def c_lanes(y):
        yx = y[:, :, 0:nb_p]
        yy = y[:, :, nb_p:2 * nb_p]
        yz = y[:, :, 2 * nb_p:3 * nb_p]
        cb = 0.5 * (yx * yx + yy * yy + yz * yz - rb * rb)
        ball = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nb_p), 2) < n_ball
        parts = [jnp.where(ball, cb, yx), jnp.where(ball, cb, yy),
                 jnp.where(ball, cb, yz)]
        if m_p > 3 * nb_p:
            parts.append(y[:, :, 3 * nb_p:])
        return jnp.concatenate(parts, axis=2)

    def jdx_lanes(gdx, y):
        jb = (y[:, :, 0:nb_p] * gdx[:, :, 0:nb_p]
              + y[:, :, nb_p:2 * nb_p] * gdx[:, :, nb_p:2 * nb_p]
              + y[:, :, 2 * nb_p:3 * nb_p] * gdx[:, :, 2 * nb_p:3 * nb_p])
        ball = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nb_p), 2) < n_ball
        parts = [jnp.where(ball, jb, gdx[:, :, c * nb_p:(c + 1) * nb_p])
                 for c in range(3)]
        if m_p > 3 * nb_p:
            parts.append(gdx[:, :, 3 * nb_p:])
        return jnp.concatenate(parts, axis=2)

    def max_step(v, dv):
        ratio = jnp.where(dv < 0,
                      -v / jnp.where(dv < 0, dv, jnp.float32(-1.0)), inf32)
        return jnp.minimum(1.0, tau * jnp.min(ratio, axis=2, keepdims=True))

    def merit_lane(c, s, lam):
        m1 = jnp.max(jnp.where(act > 0, jnp.maximum(c, 0.0), -inf32),
                     axis=2, keepdims=True)
        m2 = jnp.max(jnp.where(act > 0, jnp.abs(c + s), -inf32),
                     axis=2, keepdims=True)
        m3 = jnp.sum(cw * s * lam, axis=2, keepdims=True) / mc
        return m1 + m2 + m3

    def eval_grams(s_v, lam_v, x, w_cap_k, phr):
        y, c, jtwr2, jts, lam_ball, aj, w_aj = _eval_core(
            gt, b, rb, x, s_v, lam_v, nb_p=nb_p, n_ball=n_ball,
            w_cap=w_cap_k, phr=phr)
        gram = (_gram_dot(gt * lam_ball, gt, gram_precision)
                + _gram_dot(aj * w_aj, aj, gram_precision))
        return y, c, jtwr2, jts, gram

    def newton_body(it, carry):
        x, s, lam, y, best_x, best_y, best_merit, lam_mid = carry
        s = jnp.maximum(s, 1e-14) * act + (1.0 - act)
        y_e, c, jtwr2, jts, gram = eval_grams(s, lam, x, w_cap, False)
        r2 = (c + s) * act
        w = jnp.minimum(lam / s, w_cap)
        mu = jnp.sum(cw * s * lam, axis=2, keepdims=True) / mc
        sig_mu = sigma_min * mu                            # (S, 1, 1)
        rhs = -(p_big_mv(x) + q + jtwr2 + sig_mu * jts)
        dx = _band_factor_solve(gram, pe_d, pe_u, reg, rhs, blk)
        gdx = jnp.sum(gt * dx, axis=1, keepdims=True)      # (S, 1, m_p)
        jdx = jdx_lanes(gdx, y_e)
        ds = (-r2 - jdx) * act
        dlam = ((sig_mu - lam * s) / s - w * ds) * act
        alpha = jnp.minimum(jnp.minimum(max_step(s, ds),
                                        max_step(lam, dlam)), alpha_max)
        # Finite-direction gate (see ipm_lanes._finite_step_mask): a NaN
        # direction yields a finite alpha, so check ds/dlam themselves.
        fin = jnp.min(jnp.where((jnp.abs(ds) < inf32)
                                & (jnp.abs(dlam) < inf32),
                                jnp.float32(1.0), jnp.float32(0.0)),
                      axis=2, keepdims=True)
        upd = (alpha > 0) & (fin > 0)
        x = jnp.where(upd, x + alpha * dx, x)
        s = jnp.where(upd, s + alpha * ds, s)
        lam = jnp.where(upd & (act > 0),
                        jnp.maximum(lam + alpha * dlam, 1e-16), lam)
        y = jnp.where(upd, y + alpha * gdx, y)
        c_new = c_lanes(y)
        merit = merit_lane(c_new, s, lam)
        better = merit < best_merit
        best_x = jnp.where(better, x, best_x)
        best_y = jnp.where(better, y, best_y)
        best_merit = jnp.where(better, merit, best_merit)
        max_lam = jnp.max(jnp.where(act > 0, lam, jnp.float32(0.0)), axis=2,
                          keepdims=True)
        lam_mid = jnp.where(it == n_iters // 2, max_lam, lam_mid)
        return x, s, lam, y, best_x, best_y, best_merit, lam_mid

    x0 = x0_ref[:]
    y0 = y0_ref[:]
    init = (x0, s0_ref[:], lam0_ref[:], y0, x0, y0,
            jnp.full((s_blk, 1, 1), jnp.inf, jnp.float32),
            jnp.zeros((s_blk, 1, 1), jnp.float32))
    (x_l, s_f, lam_f, y_l, best_x, best_y, best_merit, lam_mid) = \
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_iters),
                          newton_body, init)   # i32: i64 breaks Mosaic

    def phi(y_a):
        c_a = c_lanes(y_a)
        v = jnp.maximum(c_a, 0.0)
        return jnp.sum(cw * v * v, axis=2, keepdims=True)

    def snap_body(_, carry):
        x, y = carry
        c = c_lanes(y)
        margin = 3.0 / snap_rho
        lam_s = jnp.where((c > -margin) & (act > 0), jnp.float32(1e-6),
                          jnp.float32(0.0))
        s_s = lam_s / snap_rho
        _, _, jtwr2, _, gram = eval_grams(s_s, lam_s, x, snap_rho, True)
        dx = _band_factor_solve(gram, pe_d, pe_u, 1e-6, -jtwr2, blk)
        gdx = jnp.sum(gt * dx, axis=1, keepdims=True)
        best_a = jnp.zeros((s_blk, 1, 1), jnp.float32)
        best_p = phi(y)
        for a_t in map(jnp.float32, (1.0, 0.5, 0.25, 0.1, 0.03, 0.01,
                                     0.003)):
            p_t = phi(y + a_t * gdx)
            better = p_t < best_p
            best_a = jnp.where(better, a_t, best_a)
            best_p = jnp.where(better, p_t, best_p)
        x = jnp.where(best_a > 0, x + best_a * dx, x)
        y = jnp.where(best_a > 0, y + best_a * gdx, y)
        return x, y

    if snap_iters:
        best_x, best_y = jax.lax.fori_loop(jnp.int32(0),
                                       jnp.int32(snap_iters), snap_body,
                                           (best_x, best_y))

    lam_fin_max = jnp.max(jnp.where(act > 0, lam_f, jnp.float32(0.0)), axis=2,
                          keepdims=True)
    x_fin_out[:] = best_x
    y_fin_out[:] = best_y
    s_out[:] = s_f
    lam_out[:] = lam_f
    y_last_out[:] = y_l
    merit_out[:] = best_merit
    lam_mid_out[:] = lam_mid
    lam_fin_out[:] = lam_fin_max


def ipm_solve_fused(gt, b, rb, pe_d, pe_u, q, x0, s0, lam0, y0, act, cw, *,
                    nb_p: int, n_ball: int, mc: int, n_iters: int,
                    snap_iters: int, sigma_min: float, tau: float,
                    alpha_max: float, w_cap: float, reg: float,
                    snap_rho: float, blk: int,
                    gram_precision: str = "highest", interpret=None):
    """Whole-IPM fused kernel (see _solve_kernel).  All args S-blocked.

    Returns (x_fin, y_fin, s_fin, lam_fin, y_last, best_merit, lam_mid,
    lam_fin_max); the caller runs the certificate/output epilogue in XLA.
    """
    return _ipm_solve_fused_jit(
        gt, b, rb, pe_d, pe_u, q, x0, s0, lam0, y0, act, cw, nb_p=nb_p,
        n_ball=n_ball, mc=mc, n_iters=n_iters, snap_iters=snap_iters,
        sigma_min=sigma_min, tau=tau, alpha_max=alpha_max, w_cap=w_cap,
        reg=reg, snap_rho=snap_rho, blk=blk, gram_precision=gram_precision,
        interpret=_resolve_interpret(interpret))


@functools.partial(jax.jit, static_argnames=(
    "nb_p", "n_ball", "mc", "n_iters", "snap_iters", "sigma_min", "tau",
    "alpha_max", "w_cap", "reg", "snap_rho", "blk", "gram_precision",
    "interpret"))
def _ipm_solve_fused_jit(gt, b, rb, pe_d, pe_u, q, x0, s0, lam0, y0, act,
                         cw, *, nb_p: int, n_ball: int, mc: int,
                         n_iters: int, snap_iters: int, sigma_min: float,
                         tau: float, alpha_max: float, w_cap: float,
                         reg: float, snap_rho: float, blk: int,
                         gram_precision: str, interpret: bool):
    s_blk, nfd, m_p = gt.shape
    kernel = functools.partial(
        _solve_kernel, nb_p=nb_p, n_ball=n_ball, mc=mc, n_iters=n_iters,
        snap_iters=snap_iters, sigma_min=sigma_min, tau=tau,
        alpha_max=alpha_max, w_cap=w_cap, reg=reg, snap_rho=snap_rho,
        blk=blk, gram_precision=gram_precision)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    row = jax.ShapeDtypeStruct((s_blk, 1, m_p), jnp.float32)
    one = jax.ShapeDtypeStruct((s_blk, 1, 1), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((s_blk, nfd, 1), jnp.float32),  # x_fin
            row,                                                 # y_fin
            row,                                                 # s_fin
            row,                                                 # lam_fin
            row,                                                 # y_last
            one,                                                 # merit
            one,                                                 # lam_mid
            one,                                                 # lam_fin
        ),
        in_specs=[vmem] * 12,
        out_specs=(vmem,) * 8,
        interpret=interpret,
    )(gt, b, rb, pe_d, pe_u, q, x0, s0, lam0, y0, act, cw)


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
