"""Fused single-kernel SMO for precomputed-Gram SVMs (Pallas TPU).

The pairwise SMO loop in ``kernel_svm._smo_solve_general`` is the
exactness contract (LIBSVM Solver::Solve, svm.cpp:411-1028: second-order
working-set selection + analytic pair update + ``gmax+gmax2 < eps``
stop). As a jitted ``lax.while_loop`` its iteration is *dispatch-bound*:
~a dozen tiny O(n) fusions per update cost ~0.7 ms each on a v5e
regardless of n, so an 11k-iteration solve pays ~8 s of launch latency
for ~0.1 s of arithmetic (NOTES_ROUND2).

This module runs the ENTIRE loop inside one Pallas kernel:

- solver state (alpha, grad — 26 KB each at n=6.5k) lives in VMEM for
  the whole solve;
- Q stays in HBM, viewed as ``[n/8, 8, n]`` so the two Q-rows each
  iteration needs arrive via dynamic-index async DMA of the 8-row
  sublane block containing the row (f32 HBM tiling requires 8-row
  alignment; the target row is selected from the block in VMEM);
- selection/update arithmetic is identical, op for op, to
  ``_smo_solve_general``'s body, so the kernel converges to the same
  eps-KKT fixed point — the hermetic test asserts trajectory equality
  against the lax.while_loop solver in interpret mode, and the device
  test does the same on real hardware.

Per-iteration cost drops from fusion-launch latency to one DMA
round-trip (2 x 8 x n x 4 B ≈ 0.4 MB) plus ~25 VPU passes over
(1, n) vectors — single-digit microseconds at n=6.5k.

Shapes are bucketed to multiples of ``_LANE_BUCKET`` lanes so Platt CV
folds (n x 4/5) and OvO subproblems reuse compiled programs instead of
recompiling per fold size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_TAU = 1e-12
_LANE_BUCKET = 512  # shape bucket: multiples of 512 lanes (and of 8 rows)


def _bucket(n: int) -> int:
    return max(_LANE_BUCKET, -(-n // _LANE_BUCKET) * _LANE_BUCKET)


def _kernel_helpers(q3, npad):
    """Shared in-kernel machinery: lane/sublane iotas, the dynamic-index
    8-row-block DMA fetch, and the masked-reduction scalar read (lane-
    dynamic VMEM scalar loads are not a Mosaic-supported addressing
    mode). Used identically by the C-SVC and nu kernels."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, npad), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, npad), 0)

    def fetch(i, blk, sem):
        dma = pltpu.make_async_copy(q3.at[pl.ds(i // 8, 1)], blk, sem)
        dma.start()
        dma.wait()
        return jnp.sum(
            jnp.where(sub == (i % 8), blk[0], 0.0), axis=0, keepdims=True
        )

    def sel(vec, i):
        return jnp.sum(jnp.where(lane == i, vec, 0.0))

    return lane, fetch, sel


def _pad_and_call(kernel, Q, y, C_vec, p, alpha0, eps, max_iter, n_sems,
                  interpret):
    """Shared wrapper for both fused solvers: HIGHEST-precision grad0
    (grad is only ever updated incrementally in-kernel), zero-padding to
    the shape bucket with inert lanes (y=+1, C=0, alpha=0 join neither
    I_up nor I_low; padded Q rows/cols are 0 so grad stays put), the
    [npad/8, 8, npad] HBM view, and the pallas_call plumbing with
    ``n_sems`` row-block scratch buffers."""
    n = Q.shape[0]
    npad = _bucket(n)
    grad0 = jnp.matmul(Q, alpha0, precision=jax.lax.Precision.HIGHEST) + p
    qd = jnp.diagonal(Q)

    pad = npad - n
    Qp = jnp.pad(Q.astype(jnp.float32), ((0, pad), (0, pad)))
    q3 = Qp.reshape(npad // 8, 8, npad)
    row = lambda v, fill: jnp.pad(
        v.astype(jnp.float32), (0, pad), constant_values=fill
    )[None, :]
    eps_arr = jnp.full((1, 1), eps, jnp.float32)

    alpha, grad, iters = pl.pallas_call(
        functools.partial(kernel, max_iter=max_iter),
        out_shape=(
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[pltpu.VMEM((1, 8, npad), jnp.float32)] * n_sems
        + [pltpu.SemaphoreType.DMA(())] * n_sems,
        interpret=interpret,
    )(q3, row(y, 1.0), row(C_vec, 0.0), row(qd, 0.0),
      row(alpha0, 0.0), row(grad0, 0.0), eps_arr)
    return alpha[0, :n], grad[0, :n], iters[0, 0]


def _smo_kernel(
    # inputs
    q3,  # [npad/8, 8, npad] f32 in HBM/ANY
    y_ref,  # (1, npad) VMEM
    c_ref,  # (1, npad) VMEM
    qd_ref,  # (1, npad) VMEM
    a0_ref,  # (1, npad) VMEM
    g0_ref,  # (1, npad) VMEM
    eps_ref,  # (1, 1) SMEM
    # outputs
    a_ref,  # (1, npad) VMEM
    g_ref,  # (1, npad) VMEM
    it_ref,  # (1, 1) SMEM int32
    # scratch
    blk_i,  # (1, 8, npad) VMEM
    blk_j,  # (1, 8, npad) VMEM
    sem_i,
    sem_j,
    *,
    max_iter: int,
):
    npad = y_ref.shape[1]
    a_ref[:] = a0_ref[:]
    g_ref[:] = g0_ref[:]
    eps = eps_ref[0, 0]
    y = y_ref[:]
    C = c_ref[:]
    qd = qd_ref[:]
    lane, fetch, sel = _kernel_helpers(q3, npad)

    def body(state):
        it, _ = state
        alpha = a_ref[:]
        grad = g_ref[:]
        # identical selection to kernel_svm._smo_solve_general
        # (jnp.where over two i1 vectors hits an unsupported i8->i1
        # truncation in Mosaic; the boolean algebra is equivalent)
        pos = y > 0
        up = (pos & (alpha < C)) | (~pos & (alpha > 0))
        low = (pos & (alpha > 0)) | (~pos & (alpha < C))
        minus_yg = -y * grad
        up_sc = jnp.where(up, minus_yg, _NEG_INF)
        gmax = jnp.max(up_sc)
        i = jnp.argmax(up_sc[0, :]).astype(jnp.int32)
        gmax2 = jnp.max(jnp.where(low, -minus_yg, _NEG_INF))

        row_i = fetch(i, blk_i, sem_i)
        yi = sel(y, i)
        qdi = sel(qd, i)
        b = gmax + y * grad
        a_coef = qdi + qd - 2.0 * yi * y * row_i
        a_coef = jnp.where(a_coef <= 0, _TAU, a_coef)
        obj_diff = -(b * b) / a_coef
        cand = low & (b > 0)
        j = jnp.argmin(jnp.where(cand, obj_diff, -_NEG_INF)[0, :]).astype(
            jnp.int32
        )
        row_j = fetch(j, blk_j, sem_j)

        yj = sel(y, j)
        qdj = sel(qd, j)
        qij = sel(row_i, j)
        quad = qdi + qdj - 2.0 * yi * yj * qij
        quad = jnp.where(quad <= 0, _TAU, quad)
        ai = sel(alpha, i)
        aj = sel(alpha, j)
        gi = sel(grad, i)
        gj = sel(grad, j)
        ci = sel(C, i)
        cj = sel(C, j)
        same_sign = yi == yj
        delta_eq = (gi - gj) / quad
        delta_neq = (-gi - gj) / quad
        new_ai = jnp.where(same_sign, ai - delta_eq, ai + delta_neq)

        s_term = jnp.where(same_sign, ai + aj, ai - aj)
        lo_i = jnp.where(
            same_sign,
            jnp.maximum(0.0, s_term - cj),
            jnp.maximum(0.0, s_term),
        )
        hi_i = jnp.where(
            same_sign, jnp.minimum(ci, s_term), jnp.minimum(ci, cj + s_term)
        )
        new_ai = jnp.clip(new_ai, lo_i, hi_i)
        new_aj = jnp.where(same_sign, s_term - new_ai, new_ai - s_term)

        dai = new_ai - ai
        daj = new_aj - aj
        g_ref[:] = grad + row_i * dai + row_j * daj
        a_ref[:] = jnp.where(
            lane == i, new_ai, jnp.where(lane == j, new_aj, alpha)
        )
        return it + 1, gmax + gmax2

    it, _ = jax.lax.while_loop(
        lambda s: (s[0] < max_iter) & (s[1] >= eps),
        body,
        (jnp.int32(0), jnp.float32(jnp.inf)),
    )
    it_ref[0, 0] = it


@functools.partial(
    jax.jit, static_argnames=("max_iter", "interpret")
)
def smo_solve_fused(
    Q: jnp.ndarray,  # [n, n] f32, Q = (y y^T) * K
    y: jnp.ndarray,  # [n] f32 {-1, +1}
    C_vec: jnp.ndarray,  # [n] per-sample upper bound
    p: jnp.ndarray,  # [n] linear term
    alpha0: jnp.ndarray,  # [n] feasible start
    eps: float,
    max_iter: int,
    interpret: bool = False,
):
    """Drop-in for the loop portion of ``_smo_solve_general``: returns
    (alpha, grad, iters) at the eps-KKT point; the caller finalizes rho
    (kernel_svm._finalize_rho) exactly as the while_loop solver does."""
    return _pad_and_call(
        _smo_kernel, Q, y, C_vec, p, alpha0, eps, max_iter,
        n_sems=2, interpret=interpret,
    )


# --------------------------------------------------------------------------
# Fused Solver_NU (LIBSVM svm.cpp:1029-1285): two equality constraints, so
# the working pair is chosen within a class — the i candidate is computed
# per class (ip from {y=+1, a<C} maximizing -G; in from {y=-1, a>0}
# maximizing +G), j is the global second-order argmin across both classes,
# and i follows j's class. Identical arithmetic, op for op, to
# kernel_svm._smo_solve_nu's while_loop body; three row DMAs per
# iteration (both i candidates + j).
# --------------------------------------------------------------------------


def _smo_nu_kernel(
    q3,  # [npad/8, 8, npad] f32 in HBM/ANY
    y_ref,  # (1, npad) VMEM
    c_ref,  # (1, npad) VMEM
    qd_ref,  # (1, npad) VMEM
    a0_ref,  # (1, npad) VMEM
    g0_ref,  # (1, npad) VMEM
    eps_ref,  # (1, 1) SMEM
    a_ref,  # (1, npad) VMEM out
    g_ref,  # (1, npad) VMEM out
    it_ref,  # (1, 1) SMEM int32 out
    blk_p,  # (1, 8, npad) VMEM scratch
    blk_n,  # (1, 8, npad) VMEM scratch
    blk_j,  # (1, 8, npad) VMEM scratch
    sem_p,
    sem_n,
    sem_j,
    *,
    max_iter: int,
):
    npad = y_ref.shape[1]
    a_ref[:] = a0_ref[:]
    g_ref[:] = g0_ref[:]
    eps = eps_ref[0, 0]
    y = y_ref[:]
    C = c_ref[:]
    qd = qd_ref[:]
    lane, fetch, sel = _kernel_helpers(q3, npad)

    pos = y > 0

    def body(state):
        it, _ = state
        alpha = a_ref[:]
        grad = g_ref[:]
        # class-wise candidate sets (svm.cpp:1049-1068); padded lanes
        # have y=+1, C=0, alpha=0 and never qualify
        upP = pos & (alpha < C)
        lowP = pos & (alpha > 0)
        upN = ~pos & (alpha > 0)
        lowN = ~pos & (alpha < C)
        sp = jnp.where(upP, -grad, _NEG_INF)
        gmaxp = jnp.max(sp)
        ip = jnp.argmax(sp[0, :]).astype(jnp.int32)
        sn = jnp.where(upN, grad, _NEG_INF)
        gmaxn = jnp.max(sn)
        in_ = jnp.argmax(sn[0, :]).astype(jnp.int32)
        gmaxp2 = jnp.max(jnp.where(lowP, grad, _NEG_INF))
        gmaxn2 = jnp.max(jnp.where(lowN, -grad, _NEG_INF))

        row_p = fetch(ip, blk_p, sem_p)
        row_n = fetch(in_, blk_n, sem_n)
        qdp = sel(qd, ip)
        qdn = sel(qd, in_)

        # j: global second-order choice across both classes
        # (svm.cpp:1078-1127)
        bP = gmaxp + grad
        bN = gmaxn - grad
        aP = qdp + qd - 2.0 * row_p
        aN = qdn + qd - 2.0 * row_n
        objP = -(bP * bP) / jnp.maximum(aP, _TAU)
        objN = -(bN * bN) / jnp.maximum(aN, _TAU)
        candP = lowP & (bP > 0)
        candN = lowN & (bN > 0)
        obj_all = jnp.where(candP, objP, jnp.where(candN, objN, -_NEG_INF))
        j = jnp.argmin(obj_all[0, :]).astype(jnp.int32)
        yj_pos = sel(y, j) > 0
        i = jnp.where(yj_pos, ip, in_)
        row_i = jnp.where(yj_pos, row_p, row_n)
        row_j = fetch(j, blk_j, sem_j)

        qdi = jnp.where(yj_pos, qdp, qdn)
        qdj = sel(qd, j)
        qij = sel(row_i, j)
        quad = qdi + qdj - 2.0 * qij
        quad = jnp.where(quad <= 0, _TAU, quad)
        ai = sel(alpha, i)
        aj = sel(alpha, j)
        gi = sel(grad, i)
        gj = sel(grad, j)
        ci = sel(C, i)
        cj = sel(C, j)
        delta = (gi - gj) / quad  # same-class pair update
        s_term = ai + aj
        lo_i = jnp.maximum(0.0, s_term - cj)
        hi_i = jnp.minimum(ci, s_term)
        new_ai = jnp.clip(ai - delta, lo_i, hi_i)
        new_aj = s_term - new_ai
        dai = new_ai - ai
        daj = new_aj - aj
        g_ref[:] = grad + row_i * dai + row_j * daj
        a_ref[:] = jnp.where(
            lane == i, new_ai, jnp.where(lane == j, new_aj, alpha)
        )
        viol = jnp.maximum(gmaxp + gmaxp2, gmaxn + gmaxn2)
        return it + 1, viol

    it, _ = jax.lax.while_loop(
        lambda s: (s[0] < max_iter) & (s[1] >= eps),
        body,
        (jnp.int32(0), jnp.float32(jnp.inf)),
    )
    it_ref[0, 0] = it


@functools.partial(
    jax.jit, static_argnames=("max_iter", "interpret")
)
def smo_solve_nu_fused(
    Q: jnp.ndarray,  # [n, n] f32, Q = (y y^T) * K
    y: jnp.ndarray,  # [n] f32 {-1, +1}
    C_vec: jnp.ndarray,  # [n] upper bounds
    p: jnp.ndarray,  # [n] linear term
    alpha0: jnp.ndarray,  # [n] feasible start (per-class sums fixed)
    eps: float,
    max_iter: int,
    interpret: bool = False,
):
    """Loop portion of ``_smo_solve_nu``: returns (alpha, grad, iters);
    the caller finalizes the class-wise rho/r exactly as the while_loop
    solver does (kernel_svm._finalize_nu)."""
    return _pad_and_call(
        _smo_nu_kernel, Q, y, C_vec, p, alpha0, eps, max_iter,
        n_sems=3, interpret=interpret,
    )
