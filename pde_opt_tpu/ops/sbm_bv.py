"""Fused Pallas macro for the smoothed-boundary galvanostatic BV env.

The SBM chemical potential uses ψ-weighted *variable-coefficient* fluxes
(reference ``allen_cahn.py:284-383``: ``div(ψ_face · grad c)/ψ``), which are
not circular convolutions — the cas-matmul trick of :mod:`.bv_cas` does not
apply.  Instead the whole RK4 macro-step runs as a roll-stencil VMEM-resident
kernel in the style of :mod:`.fused`: the field block is read from HBM once,
every substep's fluxes, ψ-weighted constraint integrals and closed-form
overpotential evaluate in VMEM, and the result is written once.  The ψ
fields (ψ, its face averages, κ/ψ, ψ·cell) are compile-time constants shared
by all envs.

Env packing is deliberately NOT used here: rolls on a packed tile would wrap
across env boundaries (unlike the block-diagonal cas transforms), so each
env keeps its own (H, W) tile.

Differentiable via a custom VJP through a checkpointed roll-stencil oracle
(:func:`sbm_bv_reference`), exactly as :mod:`.bv_cas` does.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sbm_bv_reference", "make_sbm_bv_fused_macro"]


def sbm_bv_reference(mu_fn, j0_fn, kappa, psi, hx, hy, dt, n_steps,
                     remat=True):
    """Roll-stencil RK4 oracle: ``macro(u, crate) -> u1`` (jnp, batched).

    Mirrors ``AllenCahn2DSmoothedBoundaryButlerVolmerConstantCurrent``
    (reference ``allen_cahn.py:299-321``) op-for-op: ψ-face-weighted flux
    divergence, ψ-weighted constraint integrals, α=1/2 closed-form voltage.
    """
    from . import stencils as st

    psi = jnp.asarray(psi)
    psi_ax = st.avg_c2f(psi, -2)
    psi_ay = st.avg_c2f(psi, -1)
    cell = hx * hy

    def rhs(u, crate):
        div = (
            st.div_f2c(psi_ax * st.grad_c2f(u, hx, -2), hx, -2)
            + st.div_f2c(psi_ay * st.grad_c2f(u, hy, -1), hy, -1)
        )
        m = mu_fn(u) - (kappa / psi) * div
        j = j0_fn(u)
        em = jnp.exp(0.5 * m)
        ip = jnp.sum(j * em * psi, axis=(-2, -1), keepdims=True) * cell
        im = jnp.sum(j * psi / em, axis=(-2, -1), keepdims=True) * cell
        y = (-crate + jnp.sqrt(crate**2 + 4.0 * ip * im)) / (2.0 * ip)
        return j * (1.0 / (em * y) - em * y)

    def macro(u, crate):
        crate = jnp.asarray(crate)
        if crate.ndim <= u.ndim - 2:
            crate = crate.reshape(crate.shape + (1, 1))

        def substep(u, _):
            k1 = rhs(u, crate)
            k2 = rhs(u + 0.5 * dt * k1, crate)
            k3 = rhs(u + 0.5 * dt * k2, crate)
            k4 = rhs(u + dt * k3, crate)
            u1 = u + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
            return u1.astype(u.dtype), None

        body = jax.checkpoint(substep) if remat else substep
        u, _ = jax.lax.scan(body, u, None, length=n_steps)
        return u

    return macro


def _pick_block(H: int, W: int, vmem_budget_bytes: int = 8 * 2**20) -> int:
    """Largest power-of-two env block fitting ~12 live f32 (bb,H,W) buffers."""
    per_env = H * W * 4 * 12
    bb = max(1, vmem_budget_bytes // per_env)
    return 1 << (bb.bit_length() - 1)


def make_sbm_bv_fused_macro(
    mu_fn: Callable,
    j0_fn: Callable,
    kappa: float,
    psi,
    hx: float,
    hy: float,
    dt: float,
    n_steps: int,
    *,
    block_envs: Optional[int] = None,
    interpret: Optional[bool] = None,
):
    """Build ``macro(u, crate) -> u1``: the fused SBM-BV charging macro-step.

    ``u``: (..., H, W) concentration; ``crate``: per-env applied C-rate
    broadcastable to the batch; ``psi``: the (H, W) smoothed-boundary level
    set (compile-time constant).  α is fixed at 1/2 (closed-form closure).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    psi_np = np.asarray(psi, np.float32)
    H, W = psi_np.shape
    psi_ax_np = 0.5 * (psi_np + np.roll(psi_np, -1, 0))
    psi_ay_np = 0.5 * (psi_np + np.roll(psi_np, -1, 1))
    kop_np = np.float32(kappa) / psi_np          # κ/ψ, folds one divide
    psic_np = psi_np * np.float32(hx * hy)       # ψ·cell, folds the quadrature

    inv_hx = np.float32(1.0 / hx)
    inv_hy = np.float32(1.0 / hy)
    dt_f = float(dt)

    def kernel(u_ref, crate_ref, psi_ax_ref, psi_ay_ref, kop_ref, psic_ref,
               out_ref):
        u = u_ref[:].astype(jnp.float32)          # (bb, H, W)
        crate = crate_ref[:].astype(jnp.float32)  # (bb, 1, 1)
        psi_ax = psi_ax_ref[:]                    # (H, W) consts
        psi_ay = psi_ay_ref[:]
        kop = kop_ref[:]
        psic = psic_ref[:]
        bb = u.shape[0]

        def rx(a, s):
            return pltpu.roll(a, s % a.shape[1], 1)

        def ry(a, s):
            return pltpu.roll(a, s % a.shape[2], 2)

        def grid_sum(z):
            s = jnp.sum(jnp.sum(z, axis=2, keepdims=True), axis=1,
                        keepdims=True)
            return jnp.broadcast_to(s, (bb, 1, 1))

        def rhs(z):
            Fx = psi_ax[None] * (rx(z, -1) - z) * inv_hx
            Fy = psi_ay[None] * (ry(z, -1) - z) * inv_hy
            div = (Fx - rx(Fx, 1)) * inv_hx + (Fy - ry(Fy, 1)) * inv_hy
            m = mu_fn(z) - kop[None] * div
            j = j0_fn(z)
            em = jnp.exp(0.5 * m)
            inv_em = 1.0 / em
            ip = grid_sum(j * em * psic[None])
            im = grid_sum(j * inv_em * psic[None])
            y = (-crate + jnp.sqrt(crate * crate + 4.0 * ip * im)) / (
                2.0 * ip
            )
            return j * (inv_em / y - em * y)

        def rk4(z):
            k1 = rhs(z)
            k2 = rhs(z + (0.5 * dt_f) * k1)
            k3 = rhs(z + (0.5 * dt_f) * k2)
            k4 = rhs(z + dt_f * k3)
            return z + (dt_f / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)

        # Keep the Mosaic program small: each unrolled RK4 substep is ~40
        # ops x 4 stages, and a 10-substep unroll stalled the relay's
        # remote-compile service indefinitely (r4 finding — the kernel
        # compiled only in interpret mode until then).  Unroll at most 2
        # substeps; the fori_loop body is compiled once.
        if n_steps <= 2:
            for _ in range(n_steps):
                u = rk4(u)
        else:
            u = jax.lax.fori_loop(0, n_steps, lambda _i, z: rk4(z), u)

        out_ref[:] = u.astype(out_ref.dtype)

    def _run(x, crate_b):
        B = x.shape[0]
        # Cap the block at the next power of two >= B so a small/debug
        # fleet is not padded up to the full VMEM-derived block.
        bb = block_envs or min(_pick_block(H, W),
                               1 << max(0, B - 1).bit_length())
        Bp = -(-B // bb) * bb
        if Bp != B:
            reps = Bp - B
            x = jnp.concatenate(
                [x, jnp.broadcast_to(x[-1:], (reps, H, W))], 0)
            crate_b = jnp.concatenate(
                [crate_b, jnp.broadcast_to(crate_b[-1:], (reps, 1, 1))], 0)

        consts = [
            jnp.asarray(psi_ax_np), jnp.asarray(psi_ay_np),
            jnp.asarray(kop_np), jnp.asarray(psic_np),
        ]
        const_specs = [
            pl.BlockSpec((H, W), lambda i: (0, 0), memory_space=pltpu.VMEM)
            for _ in consts
        ]
        field_spec = pl.BlockSpec((bb, H, W), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
        crate_spec = pl.BlockSpec((bb, 1, 1), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(Bp // bb,),
            in_specs=[field_spec, crate_spec, *const_specs],
            out_specs=field_spec,
            out_shape=jax.ShapeDtypeStruct((Bp, H, W), x.dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * n_steps * Bp * H * W * 40,
                bytes_accessed=2 * Bp * H * W * 4,
                transcendentals=4 * 3 * n_steps * Bp * H * W,
            ),
            interpret=interpret,
        )(x, crate_b, *consts)
        if Bp != B:
            out = out[:B]
        return out

    oracle = sbm_bv_reference(mu_fn, j0_fn, float(kappa), psi_np, hx, hy,
                              dt, n_steps)

    @jax.custom_vjp
    def _core(u, crate):
        *batch, h, w = u.shape
        if (h, w) != (H, W):
            raise ValueError(f"state trailing shape {(h, w)} != {(H, W)}")
        B = math.prod(batch) if batch else 1
        x = u.reshape(B, H, W)
        crate_arr = jnp.asarray(crate, jnp.float32)
        crate_b = jnp.broadcast_to(crate_arr.reshape(-1)[..., None, None]
                                   if crate_arr.ndim <= 1
                                   else crate_arr.reshape(B, 1, 1),
                                   (B, 1, 1))
        out = _run(x, crate_b)
        return out.reshape(*batch, H, W)

    def _core_fwd(u, crate):
        return _core(u, crate), (u, crate)

    def _core_bwd(res, gbar):
        u, crate = res
        _, vjp = jax.vjp(oracle, u, crate)
        return vjp(gbar)

    _core.defvjp(_core_fwd, _core_bwd)
    return _core
