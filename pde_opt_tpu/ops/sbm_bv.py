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

Env packing (round 5): grids < 128 pack ``(128//H)·(128//W)`` envs per
tile exactly as the cas kernels do — an unpacked (bb, 64, 64) f32 tile
leaves half of every (8, 128) vector register empty, so EVERY VPU op
(and this kernel is pure VPU: stencils + exp/log/sqrt closure) ran at
half throughput.  Plain rolls would wrap across env boundaries on the
packed tile, so each neighbor fetch is seam-corrected: two ``pltpu.roll``
results blended by a constant 0/1 seam mask (arithmetic select — Mosaic
rejects broadcasting ``jnp.where``), giving each env its own periodic
wrap.  Constants (ψ faces, κ/ψ, ψ·cell) tile per quadrant; the per-env
constraint integrals become per-quadrant keepdims sums broadcast back
over their quadrant (the ``bv_cas`` idiom).

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
    epilogue: Optional[dict] = None,
):
    """Build ``macro(u, crate) -> u1``: the fused SBM-BV charging macro-step.

    ``u``: (..., H, W) concentration; ``crate``: per-env applied C-rate
    broadcastable to the batch; ``psi``: the (H, W) smoothed-boundary level
    set (compile-time constant).  α is fixed at 1/2 (closed-form closure).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from .cas_spectral import (
        _ep_qscal,
        _ep_stats_to_envs,
        _pack_factors,
        _pack_field,
        _pack_kappa,
        _pick_block as _pick_block_packed,
        _unpack_field,
    )

    psi_np = np.asarray(psi, np.float32)
    H, W = psi_np.shape
    ph, pw = _pack_factors(H, W)
    HP, WP = ph * H, pw * W
    pack = ph * pw
    psi_ax_np = 0.5 * (psi_np + np.roll(psi_np, -1, 0))
    psi_ay_np = 0.5 * (psi_np + np.roll(psi_np, -1, 1))
    kop_np = np.float32(kappa) / psi_np          # κ/ψ, folds one divide
    psic_np = psi_np * np.float32(hx * hy)       # ψ·cell, folds the quadrature

    def _tile(a):
        return np.tile(a, (ph, pw))

    # 0/1 seam masks on the packed tile: rows/cols where a plain roll would
    # fetch the neighboring env instead of this env's periodic wrap.
    row_last = np.zeros((HP, WP), np.float32)
    row_last[H - 1::H, :] = 1.0
    row_first = np.zeros((HP, WP), np.float32)
    row_first[0::H, :] = 1.0
    col_last = np.zeros((HP, WP), np.float32)
    col_last[:, W - 1::W] = 1.0
    col_first = np.zeros((HP, WP), np.float32)
    col_first[:, 0::W] = 1.0

    inv_hx = np.float32(1.0 / hx)
    inv_hy = np.float32(1.0 / hy)
    dt_f = float(dt)

    def _evolve_packed(u_ref, crate_ref, psi_ax_ref, psi_ay_ref, kop_ref,
                       psic_ref, mrl_ref, mrf_ref, mcl_ref, mcf_ref):
        """Whole-macro-step body on the PACKED field; returns packed u so
        the epilogue variant can emit stats without re-packing the state
        it just unpacked."""
        u = _pack_field(u_ref[:].astype(jnp.float32), ph, pw)  # (bb4, HP, WP)
        CQ = _pack_kappa(crate_ref[:].astype(jnp.float32), ph, pw, H, W)
        psi_ax = psi_ax_ref[:]                    # (HP, WP) tiled consts
        psi_ay = psi_ay_ref[:]
        kop = kop_ref[:]
        psic = psic_ref[:]
        mrl, mrf = mrl_ref[:], mrf_ref[:]
        mcl, mcf = mcl_ref[:], mcf_ref[:]
        bb4 = u.shape[0]

        def nb(z, axis, seam_mask, plain_s, seam_s, n_packed):
            """Seam-corrected periodic neighbor on the packed tile."""
            plain = pltpu.roll(z, plain_s % n_packed, axis)
            if pack == 1 or (axis == 1 and ph == 1) or (axis == 2 and pw == 1):
                return plain
            seam = pltpu.roll(z, seam_s % n_packed, axis)
            return seam_mask[None] * seam + (1.0 - seam_mask[None]) * plain

        def quadrant_sums(z):
            rows = []
            for i in range(ph):
                s = jnp.sum(z[:, i * H:(i + 1) * H, :], axis=1,
                            keepdims=True)
                rows.append(jnp.broadcast_to(s, (bb4, H, WP)))
            z2 = jnp.concatenate(rows, axis=1) if ph > 1 else rows[0]
            cols = []
            for j in range(pw):
                s = jnp.sum(z2[:, :, j * W:(j + 1) * W], axis=2,
                            keepdims=True)
                cols.append(jnp.broadcast_to(s, (bb4, HP, W)))
            return jnp.concatenate(cols, axis=2) if pw > 1 else cols[0]

        def rhs(z):
            # z_{i+1}: plain roll -1; each env's row H-1 must instead wrap
            # to its own row 0 (= packed roll by +(H-1) at the seam rows).
            zxp = nb(z, 1, mrl, -1, H - 1, HP)
            zyp = nb(z, 2, mcl, -1, W - 1, WP)
            Fx = psi_ax[None] * (zxp - z) * inv_hx
            Fy = psi_ay[None] * (zyp - z) * inv_hy
            # F_{i-1}: plain roll +1; each env's row 0 wraps to its own
            # row H-1 (= packed roll by -(H-1) at the seam rows).
            Fxm = nb(Fx, 1, mrf, 1, -(H - 1), HP)
            Fym = nb(Fy, 2, mcf, 1, -(W - 1), WP)
            div = (Fx - Fxm) * inv_hx + (Fy - Fym) * inv_hy
            m = mu_fn(z) - kop[None] * div
            j = j0_fn(z)
            em = jnp.exp(0.5 * m)
            inv_em = 1.0 / em
            ip = quadrant_sums(j * em * psic[None])
            im = quadrant_sums(j * inv_em * psic[None])
            y = (-CQ + jnp.sqrt(CQ * CQ + 4.0 * ip * im)) / (2.0 * ip)
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
        return u

    def kernel(u_ref, crate_ref, psi_ax_ref, psi_ay_ref, kop_ref, psic_ref,
               mrl_ref, mrf_ref, mcl_ref, mcf_ref, out_ref):
        u = _evolve_packed(u_ref, crate_ref, psi_ax_ref, psi_ay_ref,
                           kop_ref, psic_ref, mrl_ref, mrf_ref, mcl_ref,
                           mcf_ref)
        out_ref[:] = _unpack_field(u, ph, pw, H, W).astype(out_ref.dtype)

    # Env-epilogue variant: psi-weighted centered-moment stats
    # [sum(psi_cell*(u-c)), sum(psi_cell*(u-c)^2), n_finite] and the
    # psi-masked uint8 obs clip(u*psi*obs_scale), all from the same
    # kernel (the preset divides by sum(psi_cell) for the psi-mean/var
    # charging reward).
    if epilogue is not None:
        ep_scale = float(epilogue.get("obs_scale", 255.0))
        ep_center = float(epilogue.get("stats_center", 0.0))

    def kernel_ep(u_ref, crate_ref, psi_ax_ref, psi_ay_ref, kop_ref,
                  psic_ref, mrl_ref, mrf_ref, mcl_ref, mcf_ref, psiu_ref,
                  out_ref, stats_ref, obs_ref):
        u = _evolve_packed(u_ref, crate_ref, psi_ax_ref, psi_ay_ref,
                           kop_ref, psic_ref, mrl_ref, mrf_ref, mcl_ref,
                           mcf_ref)
        uu = _unpack_field(u, ph, pw, H, W)           # (bb, H, W) f32
        out_ref[:] = uu.astype(out_ref.dtype)
        w = psic_ref[:]                               # psi*cell, (HP, WP)
        fin = (u - u == 0.0).astype(jnp.float32)
        uz = jnp.where(fin > 0.5, u - ep_center, jnp.zeros_like(u))
        stats_ref[:] = jnp.concatenate(
            [_ep_qscal(w[None] * uz, ph, pw, H, W),
             _ep_qscal(w[None] * uz * uz, ph, pw, H, W),
             _ep_qscal(fin, ph, pw, H, W)], axis=1)
        finu = (uu - uu == 0.0)
        uzz = jnp.where(finu, uu, jnp.zeros_like(uu))
        ob = jnp.clip(uzz * psiu_ref[:][None] * ep_scale, 0.0, 255.0)
        obs_ref[:] = ob.astype(jnp.int32).astype(jnp.uint8)

    def _run(x, crate_b):
        B = x.shape[0]
        if block_envs is not None:
            if block_envs % pack:
                raise ValueError(
                    f"block_envs {block_envs} must be divisible by {pack}"
                )
            bb = block_envs
        else:
            # Cap the block at the next power of two >= B so a small/debug
            # fleet is not padded up to the full VMEM-derived block.
            need4 = -(-B // pack)
            pow2 = 1 << (need4 - 1).bit_length()
            bb = pack * min(
                _pick_block_packed(HP, WP, live_buffers=12), pow2
            )
        Bp = -(-B // bb) * bb
        if Bp != B:
            reps = Bp - B
            x = jnp.concatenate(
                [x, jnp.broadcast_to(x[-1:], (reps, H, W))], 0)
            crate_b = jnp.concatenate(
                [crate_b, jnp.broadcast_to(crate_b[-1:], (reps, 1, 1))], 0)

        consts = [
            jnp.asarray(_tile(psi_ax_np)), jnp.asarray(_tile(psi_ay_np)),
            jnp.asarray(_tile(kop_np)), jnp.asarray(_tile(psic_np)),
            jnp.asarray(row_last), jnp.asarray(row_first),
            jnp.asarray(col_last), jnp.asarray(col_first),
        ]
        const_specs = [
            pl.BlockSpec((HP, WP), lambda i: (0, 0), memory_space=pltpu.VMEM)
            for _ in consts
        ]
        field_spec = pl.BlockSpec((bb, H, W), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
        crate_spec = pl.BlockSpec((bb, 1, 1), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
        cost = pl.CostEstimate(
            flops=4 * n_steps * Bp * H * W * 40,
            bytes_accessed=2 * Bp * H * W * 4,
            transcendentals=4 * 3 * n_steps * Bp * H * W,
        )
        if epilogue is None:
            out = pl.pallas_call(
                kernel,
                grid=(Bp // bb,),
                in_specs=[field_spec, crate_spec, *const_specs],
                out_specs=field_spec,
                out_shape=jax.ShapeDtypeStruct((Bp, H, W), x.dtype),
                cost_estimate=cost,
                interpret=interpret,
            )(x, crate_b, *consts)
            if Bp != B:
                out = out[:B]
            return out
        psiu = jnp.asarray(psi_np)
        psiu_spec = pl.BlockSpec(psiu.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
        stats_spec = pl.BlockSpec((bb // pack, 3 * ph, pw),
                                  lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
        out, sb, obs = pl.pallas_call(
            kernel_ep,
            grid=(Bp // bb,),
            in_specs=[field_spec, crate_spec, *const_specs, psiu_spec],
            out_specs=(field_spec, stats_spec, field_spec),
            out_shape=(
                jax.ShapeDtypeStruct((Bp, H, W), x.dtype),
                jax.ShapeDtypeStruct((Bp // pack, 3 * ph, pw), jnp.float32),
                jax.ShapeDtypeStruct((Bp, H, W), jnp.uint8),
            ),
            cost_estimate=cost,
            interpret=interpret,
        )(x, crate_b, *consts, psiu)
        stats = _ep_stats_to_envs(sb, ph, pw)
        if Bp != B:
            out, stats, obs = out[:B], stats[:B], obs[:B]
        return out, stats, obs

    oracle = sbm_bv_reference(mu_fn, j0_fn, float(kappa), psi_np, hx, hy,
                              dt, n_steps)

    def _split(u, crate):
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
        return batch, x, crate_b

    if epilogue is None:

        @jax.custom_vjp
        def _core(u, crate):
            batch, x, crate_b = _split(u, crate)
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

    psi_w = jnp.asarray(psi_np * np.float32(hx * hy))   # psi*cell (H, W)

    @jax.custom_vjp
    def _core_ep(u, crate):
        batch, x, crate_b = _split(u, crate)
        out, stats, obs = _run(x, crate_b)
        return (out.reshape(*batch, H, W), stats.reshape(*batch, 3),
                obs.reshape(*batch, H, W))

    def _core_ep_fwd(u, crate):
        out = _core_ep(u, crate)
        return out, (u, crate, out[0])

    def _core_ep_bwd(res, cots):
        # psi-weighted stats: s1 = sum(w*(u1-c)), s2 = sum(w*(u1-c)^2)
        # with w = psi*cell -> d/du1 = w*(gs1 + 2*(u1-c)*gs2) on finite
        # pixels; obs (uint8) is stop-gradient.
        u, crate, u1 = res
        gu, gstats, _gobs = cots
        fin = jnp.isfinite(u1)
        uz = jnp.where(fin, u1 - ep_center, jnp.zeros_like(u1))
        # ``[..., i]`` (not ``[:, i]``): the forward accepts multi-dim
        # leading batch axes, so gstats is (*batch, 3).
        g = gu + jnp.where(
            fin,
            psi_w * (gstats[..., 0][..., None, None]
                     + 2.0 * uz * gstats[..., 1][..., None, None]),
            jnp.zeros_like(u1),
        ).astype(gu.dtype)
        _, vjp = jax.vjp(oracle, u, crate)
        return vjp(g)

    _core_ep.defvjp(_core_ep_fwd, _core_ep_bwd)
    return _core_ep
