"""Fused galvanostatic Butler-Volmer macro-step kernel (Pallas, cas/MXU).

One kernel advances ``n_steps`` classical RK4 substeps of the
constant-current Butler-Volmer Allen-Cahn
(`/root/reference/pde_opt/numerics/equations/allen_cahn.py:213-281`) with
the field VMEM-resident throughout:

* **Laplacian on the MXU.**  The FD Laplacian is a circular convolution
  with the axis-even symbol ``lam``, so — exactly as in the CH/AC cas
  kernels — it evaluates as ``inv(lam * fwd(u))``: 4 full-depth bf16
  matmuls per RK stage on the env-packed ``(bb4, ph*H, pw*W)`` layout.
* **Galvanostatic closure on the VPU.**  Per stage: ``m = mu(u) - kappa
  lap``, ``em = exp(m/2)``, the two per-env global integrals as
  per-quadrant keepdims sums broadcast back over their quadrant, the
  closed-form overpotential solve ``y = (-C + sqrt(C^2 + 4 I+ I-))/(2 I+)``
  (alpha = 1/2), and the reaction ``j0(u) * (1/(em*y) - em*y)``.
* The per-env applied C-rate enters as a traced argument packed per
  quadrant — the RL control.

Versus the XLA RK4 path the win is VMEM residency across all
``4*n_steps`` stages (the XLA scan round-trips the field through HBM
every substep) and MXU Laplacians; the closure's transcendentals
(log/exp/sqrt) stay — they are the physics.

Differentiable: custom VJP recomputing through the checkpointed
roll-stencil oracle (the equation class's own ``rhs`` + ``evolve``), which
is the exact-arithmetic equal of the spectral Laplacian for periodic
fields.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cas_spectral import (
    _block_diag,
    _cas_mat,
    _fd_lap_symbols,
    _pack_factors,
    _pack_field,
    _pack_kappa,
    _pick_block,
    _unpack_field,
    _ep_fold_stats_cotangent,
    _ep_parse,
    _ep_qscal,
    _ep_stats_to_envs,
)

__all__ = ["make_bv_cc_fused_macro", "bv_cc_reference"]


def bv_cc_reference(mu_fn, j0_fn, kappa, hx, hy, dt, n_steps, remat=True):
    """Roll-stencil RK4 oracle: ``macro(u, crate) -> u1`` (jnp, batched)."""
    from . import stencils as st

    cell = hx * hy

    def rhs(u, crate):
        lap = st.lap_2nd_2d(u, hx, hy)
        m = mu_fn(u) - kappa * lap
        j = j0_fn(u)
        ip = jnp.sum(j * jnp.exp(0.5 * m), axis=(-2, -1), keepdims=True) * cell
        im = jnp.sum(j * jnp.exp(-0.5 * m), axis=(-2, -1), keepdims=True) * cell
        y = (-crate + jnp.sqrt(crate**2 + 4.0 * ip * im)) / (2.0 * ip)
        em = jnp.exp(0.5 * m)
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
            return u1.astype(u.dtype), None   # crate may promote (x64 mode)

        body = jax.checkpoint(substep) if remat else substep
        u, _ = jax.lax.scan(body, u, None, length=n_steps)
        return u

    return macro


def make_bv_cc_fused_macro(
    mu_fn: Callable,
    j0_fn: Callable,
    kappa: float,
    H: int,
    W: int,
    hx: float,
    hy: float,
    dt: float,
    n_steps: int,
    *,
    block_envs: Optional[int] = None,
    interpret: Optional[bool] = None,
    mats_dtype=jnp.bfloat16,
    epilogue: Optional[dict] = None,
):
    """Build ``macro(u, crate) -> u1``: the fused BV charging macro-step.

    ``u``: (..., H, W) concentration field; ``crate``: per-env applied
    C-rate broadcastable to the batch.  ``alpha`` is fixed at 1/2 (the
    closed-form closure case, as in the reference).  H, W multiples of 8;
    grids < 128 env-pack toward a 128-wide tile (divisors of 128 pack
    fully, e.g. 64 -> 4 envs/tile; 48 packs 2x2 at 96-deep contractions).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ph, pw = _pack_factors(H, W)
    HP, WP = ph * H, pw * W
    pack = ph * pw

    lam_h, lam_w = _fd_lap_symbols(H, W, hx, hy)
    lamQ_np = np.tile(lam_h[:, None] + lam_w[None, :], (ph, pw))
    CH_np = _block_diag(_cas_mat(H), ph)
    CW_np = _block_diag(_cas_mat(W), pw)

    kap_f = float(kappa)
    dt_f = float(dt)
    cell = float(hx) * float(hy)
    mats = mats_dtype
    prec = jax.lax.Precision.HIGHEST if mats == jnp.float32 else None

    def mid_contract(x3, m2):
        return jax.lax.dot_general(
            x3, m2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    def _evolve_packed(u_ref, crate_ref, ch_ref, cw_ref, ich_ref, icw_ref,
                       lamQ_ref):
        """Whole-macro-step body on the PACKED field; returns packed u so
        the epilogue variant can emit stats without re-packing the state
        it just unpacked."""
        lamQ = lamQ_ref[:]
        u = _pack_field(u_ref[:].astype(jnp.float32), ph, pw)
        CQ = _pack_kappa(crate_ref[:].astype(jnp.float32), ph, pw, H, W)
        ch, cw, ich, icw = ch_ref[:], cw_ref[:], ich_ref[:], icw_ref[:]

        def fwd(z):
            t1 = mid_contract(z.astype(mats), ch).astype(mats)
            return mid_contract(t1, cw)

        def inv(zt):
            t1 = mid_contract(zt.astype(mats), ich).astype(mats)
            return mid_contract(t1, icw)

        def quadrant_sums(z):
            bb4 = z.shape[0]
            rows = []
            for i in range(ph):
                s = jnp.sum(z[:, i * H:(i + 1) * H, :], axis=1, keepdims=True)
                rows.append(jnp.broadcast_to(s, (bb4, H, WP)))
            z2 = jnp.concatenate(rows, axis=1) if ph > 1 else rows[0]
            cols = []
            for j in range(pw):
                s = jnp.sum(z2[:, :, j * W:(j + 1) * W], axis=2, keepdims=True)
                cols.append(jnp.broadcast_to(s, (bb4, HP, W)))
            return jnp.concatenate(cols, axis=2) if pw > 1 else cols[0]

        def rhs(z):
            lap = inv(lamQ[None] * fwd(z))
            m = mu_fn(z) - kap_f * lap
            j = j0_fn(z)
            em = jnp.exp(0.5 * m)
            inv_em = 1.0 / em
            ip = quadrant_sums(j * em) * cell
            im = quadrant_sums(j * inv_em) * cell
            y = (-CQ + jnp.sqrt(CQ * CQ + 4.0 * ip * im)) / (2.0 * ip)
            return j * (inv_em / y - em * y)

        for _ in range(n_steps):
            k1 = rhs(u)
            k2 = rhs(u + (0.5 * dt_f) * k1)
            k3 = rhs(u + (0.5 * dt_f) * k2)
            k4 = rhs(u + dt_f * k3)
            u = u + (dt_f / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
        return u

    def kernel(u_ref, crate_ref, ch_ref, cw_ref, ich_ref, icw_ref,
               lamQ_ref, out_ref):
        u = _evolve_packed(u_ref, crate_ref, ch_ref, cw_ref, ich_ref,
                           icw_ref, lamQ_ref)
        out_ref[:] = _unpack_field(u, ph, pw, H, W).astype(out_ref.dtype)

    # Env-epilogue variant: the same kernel also emits the per-env
    # centered-moment stats and the uint8 obs (same contract as the CH
    # kernel's epilogue — see ops/cas_spectral._ep_emit).
    if epilogue is not None:
        ep = _ep_parse(epilogue, H, W, ph, pw)
        if ep[3] != 1:
            raise NotImplementedError("BV epilogue supports ds=1 only")
        ep_scale, ep_offset, ep_center = ep[0], ep[1], ep[2]

    def kernel_ep(u_ref, crate_ref, ch_ref, cw_ref, ich_ref, icw_ref,
                  lamQ_ref, out_ref, stats_ref, obs_ref):
        u = _evolve_packed(u_ref, crate_ref, ch_ref, cw_ref, ich_ref,
                           icw_ref, lamQ_ref)
        uu = _unpack_field(u, ph, pw, H, W)           # (bb, H, W) f32
        out_ref[:] = uu.astype(out_ref.dtype)
        fin = (u - u == 0.0).astype(jnp.float32)
        uz = jnp.where(fin > 0.5, u - ep_center, jnp.zeros_like(u))
        stats_ref[:] = jnp.concatenate(
            [_ep_qscal(uz, ph, pw, H, W),
             _ep_qscal(uz * uz, ph, pw, H, W),
             _ep_qscal(fin, ph, pw, H, W)], axis=1)
        finu = (uu - uu == 0.0)
        uzz = jnp.where(finu, uu, jnp.zeros_like(uu))
        ob = jnp.clip(uzz * ep_scale + ep_offset, 0.0, 255.0)
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
            need4 = -(-B // pack)
            pow2 = 1 << (need4 - 1).bit_length()
            bb = pack * min(_pick_block(HP, WP, live_buffers=14), pow2)
        Bp = -(-B // bb) * bb
        if Bp != B:
            reps = Bp - B
            x = jnp.concatenate(
                [x, jnp.broadcast_to(x[-1:], (reps, H, W))], 0)
            crate_b = jnp.concatenate(
                [crate_b, jnp.broadcast_to(crate_b[-1:], (reps, 1, 1))], 0)

        consts = [
            jnp.asarray(CH_np, mats), jnp.asarray(CW_np, mats),
            jnp.asarray(CH_np / H, mats), jnp.asarray(CW_np / W, mats),
            jnp.asarray(lamQ_np, jnp.float32),
        ]
        const_specs = [
            pl.BlockSpec(c.shape, lambda i, _nd=c.ndim: (0,) * _nd,
                         memory_space=pltpu.VMEM)
            for c in consts
        ]
        field_spec = pl.BlockSpec((bb, H, W), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
        crate_spec = pl.BlockSpec((bb, 1, 1), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
        cost = pl.CostEstimate(
            flops=4 * 4 * n_steps * Bp * H * W * (2 * HP + 2 * WP),
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
        stats_spec = pl.BlockSpec((bb // pack, 3 * ph, pw),
                                  lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
        out, sb, obs = pl.pallas_call(
            kernel_ep,
            grid=(Bp // bb,),
            in_specs=[field_spec, crate_spec, *const_specs],
            out_specs=(field_spec, stats_spec, field_spec),
            out_shape=(
                jax.ShapeDtypeStruct((Bp, H, W), x.dtype),
                jax.ShapeDtypeStruct((Bp // pack, 3 * ph, pw), jnp.float32),
                jax.ShapeDtypeStruct((Bp, H, W), jnp.uint8),
            ),
            cost_estimate=cost,
            interpret=interpret,
        )(x, crate_b, *consts)
        stats = _ep_stats_to_envs(sb, ph, pw)
        if Bp != B:
            out, stats, obs = out[:B], stats[:B], obs[:B]
        return out, stats, obs

    oracle = bv_cc_reference(mu_fn, j0_fn, kap_f, hx, hy, dt, n_steps)

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
        u, crate, u1 = res
        gu, gstats, _gobs = cots
        g = _ep_fold_stats_cotangent(u1, gu, gstats, ep_center)
        _, vjp = jax.vjp(oracle, u, crate)
        return vjp(g)

    _core_ep.defvjp(_core_ep_fwd, _core_ep_bwd)
    return _core_ep
