"""Per-stage slope profile of the fused SBM-BV kernel (VERDICT r4 item 4).

Same dispatch-cancelling two-point method as ``profile_cas_stages.py``:
the macro runs under a runtime-trip-count ``fori_loop``; per-macro cost is
the slope between two trip counts, so dispatch/fetch/first-run anomalies
cancel.  Ablation variants name where the SBM kernel's time goes (the 2.6x
per-env-step gap vs the periodic fused BV, VERDICT r4 weak-3):

  full         the shipped kernel (ops/sbm_bv.py, env-packed)
  unroll2      fori_loop over 5 iterations of a 2x-unrolled RK4 body
  no_seam      plain rolls (no seam-mask blend)      -> seam-correction cost
  no_trans     exp -> 1+x/2 poly, mu log -> rational -> transcendental cost
  no_integrals ip, im := 1                           -> reduction+bcast cost
  no_mu        mu := z, j0 := z                      -> closure algebra cost
  stencil_only rhs = div only                        -> stencil floor

Usage (TPU): PYTHONPATH=/root/repo python scripts/profile_sbm_stages.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pde_opt_tpu.ops.cas_spectral import (
    _pack_factors, _pack_field, _pack_kappa, _pick_block, _unpack_field,
)

SUBSTEPS = 10
CLIP = lambda c: jnp.clip(c, 1e-4, 1 - 1e-4)  # noqa: E731
MU = lambda c: jnp.log(CLIP(c) / (1 - CLIP(c))) + 3.0 * (1.0 - 2.0 * c)  # noqa: E731
J0 = lambda c: jnp.sqrt(jnp.clip(c * (1 - c), 1e-6, None))  # noqa: E731


def build_variant(variant, psi_np, hx, hy, dt, kappa, n_steps=SUBSTEPS):
    H, W = psi_np.shape
    ph, pw = _pack_factors(H, W)
    HP, WP = ph * H, pw * W
    pack = ph * pw
    psi_ax_np = 0.5 * (psi_np + np.roll(psi_np, -1, 0))
    psi_ay_np = 0.5 * (psi_np + np.roll(psi_np, -1, 1))
    kop_np = np.float32(kappa) / psi_np
    psic_np = psi_np * np.float32(hx * hy)

    def _tile(a):
        return np.tile(a, (ph, pw))

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

    def kernel(u_ref, crate_ref, psi_ax_ref, psi_ay_ref, kop_ref, psic_ref,
               mrl_ref, mrf_ref, mcl_ref, mcf_ref, out_ref):
        u = _pack_field(u_ref[:].astype(jnp.float32), ph, pw)
        CQ = _pack_kappa(crate_ref[:].astype(jnp.float32), ph, pw, H, W)
        psi_ax = psi_ax_ref[:]
        psi_ay = psi_ay_ref[:]
        kop = kop_ref[:]
        psic = psic_ref[:]
        mrl, mrf = mrl_ref[:], mrf_ref[:]
        mcl, mcf = mcl_ref[:], mcf_ref[:]
        bb4 = u.shape[0]

        def nb(z, axis, seam_mask, plain_s, seam_s, n_packed):
            plain = pltpu.roll(z, plain_s % n_packed, axis)
            if variant == "no_seam" or pack == 1:
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

        def mu_f(z):
            if variant == "no_mu":
                return z
            if variant == "no_trans":
                # rational stand-in with the log's cost removed
                c = CLIP(z)
                return c / (1.0 + c) + 3.0 * (1.0 - 2.0 * z)
            return MU(z)

        def j0_f(z):
            if variant == "no_mu":
                return z
            return J0(z)

        def rhs(z):
            zxp = nb(z, 1, mrl, -1, H - 1, HP)
            zyp = nb(z, 2, mcl, -1, W - 1, WP)
            Fx = psi_ax[None] * (zxp - z) * inv_hx
            Fy = psi_ay[None] * (zyp - z) * inv_hy
            Fxm = nb(Fx, 1, mrf, 1, -(H - 1), HP)
            Fym = nb(Fy, 2, mcf, 1, -(W - 1), WP)
            div = (Fx - Fxm) * inv_hx + (Fy - Fym) * inv_hy
            if variant == "stencil_only":
                return div
            m = mu_f(z) - kop[None] * div
            j = j0_f(z)
            if variant == "no_trans":
                em = 1.0 + 0.5 * m
            else:
                em = jnp.exp(0.5 * m)
            inv_em = 1.0 / em
            if variant == "no_integrals":
                ip = jnp.ones_like(z)
                im = jnp.ones_like(z)
            else:
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

        if variant == "unroll2":
            u = jax.lax.fori_loop(0, n_steps // 2,
                                  lambda _i, z: rk4(rk4(z)), u)
            for _ in range(n_steps % 2):
                u = rk4(u)
        else:
            u = jax.lax.fori_loop(0, n_steps, lambda _i, z: rk4(z), u)
        out_ref[:] = _unpack_field(u, ph, pw, H, W).astype(out_ref.dtype)

    def macro(x, crate_b):
        B = x.shape[0]
        need4 = -(-B // pack)
        pow2 = 1 << (need4 - 1).bit_length()
        bb = pack * min(_pick_block(HP, WP, live_buffers=12), pow2)
        Bp = -(-B // bb) * bb
        assert Bp == B, "use a power-of-two env count"
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
        return pl.pallas_call(
            kernel,
            grid=(B // bb,),
            in_specs=[field_spec, crate_spec, *const_specs],
            out_specs=field_spec,
            out_shape=jax.ShapeDtypeStruct((B, H, W), x.dtype),
            interpret=jax.default_backend() != "tpu",
        )(x, crate_b, *consts)

    return macro


def slope_time(macro, u, crate_b, n_lo=10, n_hi=40, reps=3):
    def run(u0, n):
        return jax.lax.fori_loop(0, n, lambda i, c: macro(c, crate_b), u0)

    runj = jax.jit(run)
    out = runj(u, 2)
    _ = float(out[0, 0, 0])
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        o = runj(u, n_lo)
        _ = float(o[0, 0, 0])
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        o = runj(u, n_hi)
        _ = float(o[0, 0, 0])
        t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (n_hi - n_lo))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=1024)
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--variants", default="full,unroll2,no_seam,no_trans,"
                    "no_integrals,no_mu,stencil_only")
    args = ap.parse_args()
    E, G = args.envs, args.grid
    print("device:", jax.devices()[0], flush=True)

    # The preset's tanh disk level set.
    x = (np.arange(G) + 0.5) / G - 0.5
    X, Y = np.meshgrid(x, x, indexing="ij")
    r = np.sqrt(X**2 + Y**2)
    psi = 0.5 * (1.0 + np.tanh((0.35 - r) / 0.04))
    psi = np.where(psi < 0.001, 0.001, psi)
    psi = np.where(psi > 0.99, 1.0, psi).astype(np.float32)

    u = jnp.asarray(
        np.clip(0.05 + 0.005 * np.random.default_rng(0)
                .standard_normal((E, G, G)), 0.01, 0.99), jnp.float32)
    crate_b = jnp.full((E, 1, 1), 1.0, jnp.float32)
    h = 1.0 / G

    ref = None
    rows = []
    for name in args.variants.split(","):
        macro = build_variant(name, psi, h, h, 5e-4, 5e-4)
        out = jax.jit(macro)(u, crate_b)
        if name == "full":
            ref = out
        err = (float(jnp.max(jnp.abs(out - ref)))
               if ref is not None and name == "unroll2" else None)
        t = slope_time(macro, u, crate_b)
        rate = E / t
        rows.append((name, t))
        print(f"RESULT {name:13s} {t*1e3:7.3f} ms/macro "
              f"{rate:12,.0f} env-steps/s"
              + (f"  max|d|={err:.2e}" if err is not None else ""),
              flush=True)
    base = dict(rows)
    if "full" in base:
        print("Deltas vs full (ms/macro):", flush=True)
        for name, t in rows:
            print(f"  {name:13s} {(t - base['full'])*1e3:+7.3f}", flush=True)


if __name__ == "__main__":
    main()
