"""Per-stage roofline of the flagship CH cas macro kernel (VERDICT r2 #7).

Builds ablated/restructured variants of the fused Cahn-Hilliard cas kernel
(`ops/cas_spectral.py`) and times each on the real TPU with a
dispatch/fetch-cancelling two-point method: the macro body runs under a
`lax.fori_loop` whose trip count is a *runtime* scalar, so one executable
serves two trip counts and the per-substep cost is the slope
``(t_hi - t_lo) / (n_hi - n_lo)`` — host dispatch, the trailing scalar
fetch, and any first-execution anomaly cancel exactly.

Variants:
  full         baseline substep (what ships in ops/cas_spectral.py)
  klam         coefficient algebra factored: incr = cm*(m~ - klam*u~)
               (cu = cm*k*lam, so one fused-multiply-sub + one mul on VPU)
  bf16mu       mu evaluated in bf16 straight from a bf16 cast of u
               (saves one f32 VPU pass + the pre-matmul cast)
  interleave2  block split in two independent halves, substep chains
               interleaved so Mosaic can overlap VPU work of one half
               with MXU work of the other
  samemat      1/(H*W) inverse scale folded into the carried spectrum so
               all four matmuls/substep contract against the SAME weight
               matrix when H == W (maximum MXU weight-stationarity)
  no_mu        mu := identity            -> mu cost by delta
  no_coeff     multipliers := 1          -> coefficient-apply cost by delta
  mm_only      substep = inv(fwd(u))     -> transform-chain floor
               (4 matmuls + the 4 casts, zero other VPU work)

Usage: python scripts/profile_cas_stages.py [--envs 4096] [--grid 64]
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
    _block_diag, _cas_mat, _pack_factors, _pack_field, _pack_kappa,
    _pick_block, _unpack_field,
)
from pde_opt_tpu.ops.fused_spectral import _fd_lap_symbols

SUBSTEPS = 10


def build_variant(variant, H, W, n_steps=SUBSTEPS, hx=0.01, hy=0.01,
                  A=1.0, dt=1e-3):
    """Return macro(u, kap) -> u1 for one kernel variant."""
    ph, pw = _pack_factors(H, W)
    HP, WP = ph * H, pw * W
    pack = ph * pw
    mats = jnp.bfloat16

    lam_h, lam_w = _fd_lap_symbols(H, W, hx, hy)
    lam = lam_h[:, None] + lam_w[None, :]
    lamQ_np = np.tile(lam, (ph, pw))
    lam2Q_np = lamQ_np ** 2
    CH_np = _block_diag(_cas_mat(H), ph)
    CW_np = _block_diag(_cas_mat(W), pw)

    A_dt, dt_f = float(A) * float(dt), float(dt)
    interp = jax.default_backend() != "tpu"

    def mid(x3, m2):
        return jax.lax.dot_general(
            x3, m2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def kernel(u_ref, kap_ref, ch_ref, cw_ref, ich_ref, icw_ref,
               lamQ_ref, lam2Q_ref, out_ref):
        lamQ, lam2Q = lamQ_ref[:], lam2Q_ref[:]
        u = _pack_field(u_ref[:].astype(jnp.float32), ph, pw)
        kQ = _pack_kappa(kap_ref[:].astype(jnp.float32), ph, pw, H, W)
        denom = 1.0 / (1.0 + A_dt * (kQ * lam2Q[None]))
        cm = (dt_f * lamQ)[None] * denom
        cu = (dt_f * kQ) * lam2Q[None] * denom
        klam = kQ * lamQ[None]
        ch, cw, ich, icw = ch_ref[:], cw_ref[:], ich_ref[:], icw_ref[:]

        def fwd(z):
            return mid(mid(z.astype(mats), ch).astype(mats), cw)

        def inv(zt):
            return mid(mid(zt.astype(mats), ich).astype(mats), icw)

        def mu(c):
            return c * c * c - c

        if variant == "full":
            u_t = fwd(u)
            for _ in range(n_steps):
                incr = cm * fwd(mu(u)) - cu * u_t
                u_t = u_t + incr
                u = u + inv(incr)
        elif variant == "klam":
            u_t = fwd(u)
            for _ in range(n_steps):
                incr = cm * (fwd(mu(u)) - klam * u_t)
                u_t = u_t + incr
                u = u + inv(incr)
        elif variant == "bf16mu":
            u_t = fwd(u)
            for _ in range(n_steps):
                ub = u.astype(mats)
                m = ub * ub * ub - ub               # bf16 VPU, no extra cast
                incr = cm * mid(mid(m, ch).astype(mats), cw) - cu * u_t
                u_t = u_t + incr
                u = u + inv(incr)
        elif variant == "interleave2":
            half = u.shape[0] // 2
            u0, u1 = u[:half], u[half:]
            cm0, cm1 = cm[:half], cm[half:]
            cu0, cu1 = cu[:half], cu[half:]
            t0, t1 = fwd(u0), fwd(u1)
            for _ in range(n_steps):
                m0, m1 = mu(u0), mu(u1)
                f0, f1 = fwd(m0), fwd(m1)
                i0 = cm0 * f0 - cu0 * t0
                i1 = cm1 * f1 - cu1 * t1
                t0, t1 = t0 + i0, t1 + i1
                u0, u1 = u0 + inv(i0), u1 + inv(i1)
            u = jnp.concatenate([u0, u1], axis=0)
        elif variant == "samemat":
            # Fold the 1/(H*W) inverse scale out of ICH/ICW and into the
            # carried spectrum (u_s = u~/(H*W)) so ALL FOUR matmuls per
            # substep contract against the SAME weight matrix (CH == CW
            # when H == W) — maximum MXU weight-stationarity.
            s = 1.0 / float(H * W)
            cms = cm * s
            u_s = fwd(u)
            u_s = u_s * s
            for _ in range(n_steps):
                incr_s = cms * fwd(mu(u)) - cu * u_s
                u_s = u_s + incr_s
                u = u + mid(mid(incr_s.astype(mats), ch).astype(mats), cw)
        elif variant == "no_mu":
            u_t = fwd(u)
            for _ in range(n_steps):
                incr = cm * fwd(u) - cu * u_t
                u_t = u_t + incr
                u = u + inv(incr)
        elif variant == "no_coeff":
            u_t = fwd(u)
            for _ in range(n_steps):
                incr = fwd(mu(u)) - u_t
                u_t = u_t + incr
                u = u + inv(incr)
        elif variant == "mm_only":
            for _ in range(n_steps):
                u = inv(fwd(u))
        else:
            raise ValueError(variant)
        out_ref[:] = _unpack_field(u, ph, pw, H, W).astype(out_ref.dtype)

    consts_np = [CH_np, CW_np, CH_np / H, CW_np / W]

    def macro(u, kap):
        B = u.shape[0]
        need4 = -(-B // pack)
        pow2 = 1 << (need4 - 1).bit_length()
        bb = pack * min(_pick_block(HP, WP, live_buffers=9), pow2)
        assert B % bb == 0, (B, bb)
        consts = [jnp.asarray(c, mats) for c in consts_np] + [
            jnp.asarray(lamQ_np, jnp.float32),
            jnp.asarray(lam2Q_np, jnp.float32),
        ]
        const_specs = [
            pl.BlockSpec(c.shape, lambda i, _nd=c.ndim: (0,) * _nd,
                         memory_space=pltpu.VMEM)
            for c in consts
        ]
        fs = pl.BlockSpec((bb, H, W), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
        ks = pl.BlockSpec((bb, 1, 1), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=(B // bb,),
            in_specs=[fs, ks, *const_specs], out_specs=fs,
            out_shape=jax.ShapeDtypeStruct((B, H, W), u.dtype),
            interpret=interp,
        )(u, kap.reshape(B, 1, 1), *consts)

    return macro


def slope_time(macro, u, kap, n_lo=30, n_hi=130, reps=3):
    """Per-macro seconds via the two-point runtime-trip-count method."""

    def run(u0, n):
        return jax.lax.fori_loop(0, n, lambda i, c: macro(c, kap), u0)

    runj = jax.jit(run)
    out = runj(u, 3)
    _ = float(out[0, 0, 0])  # compile + first-execution anomaly
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
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--variants", default="full,klam,bf16mu,interleave2,"
                    "no_mu,no_coeff,mm_only")
    args = ap.parse_args()
    E, G = args.envs, args.grid
    print("device:", jax.devices()[0], flush=True)

    key = jax.random.PRNGKey(0)
    u = 0.5 + 0.01 * jax.random.normal(key, (E, G, G), jnp.float32)
    kap = jnp.full((E,), 0.004, jnp.float32)

    # Correctness gate: every restructured (non-ablation) variant must match
    # the baseline to bf16-roundoff before its timing counts.
    ref = None
    rows = []
    for name in args.variants.split(","):
        macro = build_variant(name, G, G)
        out = jax.jit(macro)(u, kap)
        if name == "full":
            ref = out
        err = (float(jnp.max(jnp.abs(out - ref))) if ref is not None
               and name in ("klam", "bf16mu", "interleave2", "samemat")
               else None)
        t = slope_time(macro, u, kap)
        rate = E / t
        rows.append((name, t * 1e3, rate, err))
        print(f"RESULT {name:12s} {t*1e3:7.3f} ms/macro "
              f"{rate:12,.0f} env-steps/s"
              + (f"  max|d|={err:.2e}" if err is not None else ""),
              flush=True)

    base = dict((r[0], r[1]) for r in rows)
    if "full" in base:
        print("\nDeltas vs full (ms/macro):")
        for name, t, _, _ in rows:
            print(f"  {name:12s} {t - base['full']:+7.3f}")


if __name__ == "__main__":
    main()
