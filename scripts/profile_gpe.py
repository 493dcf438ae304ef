"""Ablation profile of the fused GPE Strang macro kernel (TPU).

Times the full kernel against variants with individual stages disabled
(kinetic cas matmuls / B phase transcendentals / renorm) to locate the
bottleneck.  Ablated variants are numerically meaningless — timing only.

Run on TPU: python scripts/profile_gpe.py [--envs 1024] [--grid 64]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from pde_opt_tpu.ops.cas_spectral import (  # noqa: E402
    _block_diag,
    _cas_mat,
    _pack_field,
    _pick_block,
    _unpack_field,
)
from pde_opt_tpu.ops.gpe_cas import _phi_symbol  # noqa: E402


def make_ablated_macro(H, W, dx, dt, n_steps, *, do_prop=True, do_bphase=True,
                       do_renorm=True, mats_dtype=jnp.bfloat16):
    ph = 128 // H if H < 128 else 1
    pw = 128 // W if W < 128 else 1
    HP, WP = ph * H, pw * W
    pack = ph * pw

    phi = _phi_symbol(H, dx)[:, None] + _phi_symbol(W, dx)[None, :]
    phiQ = np.tile(phi, (ph, pw))
    cosF = jnp.asarray(np.cos(phiQ * dt), jnp.float32)
    sinF = jnp.asarray(np.sin(phiQ * dt), jnp.float32)
    CH = jnp.asarray(_block_diag(_cas_mat(H), ph), mats_dtype)
    CW = jnp.asarray(_block_diag(_cas_mat(W), pw), mats_dtype)
    ICH = jnp.asarray(_block_diag(_cas_mat(H), ph) / H, mats_dtype)
    ICW = jnp.asarray(_block_diag(_cas_mat(W), pw) / W, mats_dtype)
    g_f, dt_f, dx2 = 100.0, float(dt), float(dx) ** 2
    mats = mats_dtype

    def mid_contract(x3, m2):
        return jax.lax.dot_general(
            x3, m2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def kernel(yr_ref, yi_ref, ch_ref, cw_ref, ich_ref, icw_ref,
               cosf_ref, sinf_ref, outr_ref, outi_ref):
        ch, cw, ich, icw = ch_ref[:], cw_ref[:], ich_ref[:], icw_ref[:]
        cF, sF = cosf_ref[:], sinf_ref[:]
        pr = _pack_field(yr_ref[:].astype(jnp.float32), ph, pw)
        pi = _pack_field(yi_ref[:].astype(jnp.float32), ph, pw)

        def fwd(z):
            return mid_contract(mid_contract(z.astype(mats), ch).astype(mats), cw)

        def inv(z):
            return mid_contract(mid_contract(z.astype(mats), ich).astype(mats), icw)

        def prop(r, i):
            rh, ih = fwd(r), fwd(i)
            return inv(cF[None] * rh + sF[None] * ih), inv(
                cF[None] * ih - sF[None] * rh)

        def quadrant_sums(z):
            bb4 = z.shape[0]
            rows = []
            for k in range(ph):
                s = jnp.sum(z[:, k * H:(k + 1) * H, :], axis=1, keepdims=True)
                rows.append(jnp.broadcast_to(s, (bb4, H, WP)))
            z2 = jnp.concatenate(rows, axis=1) if ph > 1 else rows[0]
            cols = []
            for k in range(pw):
                s = jnp.sum(z2[:, :, k * W:(k + 1) * W], axis=2, keepdims=True)
                cols.append(jnp.broadcast_to(s, (bb4, HP, W)))
            return jnp.concatenate(cols, axis=2) if pw > 1 else cols[0]

        def b_phase(r, i):
            th = dt_f * (g_f * (r * r + i * i))
            c, s = jnp.cos(th), jnp.sin(th)
            return c * r + s * i, c * i - s * r

        def renorm(r, i):
            scale = jax.lax.rsqrt(quadrant_sums(r * r + i * i) * dx2)
            return r * scale, i * scale

        for _ in range(n_steps):
            if do_bphase:
                pr, pi = b_phase(pr, pi)
            if do_prop:
                pr, pi = prop(pr, pi)
            if do_renorm:
                pr, pi = renorm(pr, pi)

        outr_ref[:] = _unpack_field(pr, ph, pw, H, W).astype(outr_ref.dtype)
        outi_ref[:] = _unpack_field(pi, ph, pw, H, W).astype(outi_ref.dtype)

    def run(yr, yi):
        B = yr.shape[0]
        need4 = -(-B // pack)
        pow2 = 1 << (need4 - 1).bit_length()
        bb = pack * min(_pick_block(HP, WP, live_buffers=12), pow2)
        assert B % bb == 0, (B, bb)
        field_spec = pl.BlockSpec((bb, H, W), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
        consts = [CH, CW, ICH, ICW, cosF, sinF]
        const_specs = [
            pl.BlockSpec(c.shape, lambda i, _nd=c.ndim: (0,) * _nd,
                         memory_space=pltpu.VMEM)
            for c in consts
        ]
        return pl.pallas_call(
            kernel,
            grid=(B // bb,),
            in_specs=[field_spec, field_spec, *const_specs],
            out_specs=(field_spec, field_spec),
            out_shape=(jax.ShapeDtypeStruct((B, H, W), yr.dtype),) * 2,
        )(yr, yi, *consts)

    return jax.jit(run)


def timeit(fn, yr, yi, runs=20):
    outr, outi = fn(yr, yi)
    _ = float(jnp.sum(outr))
    t0 = time.perf_counter()
    for _k in range(runs):
        outr, outi = fn(yr, yi)
    _ = float(jnp.sum(outr))
    return (time.perf_counter() - t0) / runs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=1024)
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--substeps", type=int, default=10)
    args = ap.parse_args()

    B, N, S = args.envs, args.grid, args.substeps
    key = jax.random.PRNGKey(0)
    yr = 0.1 * jax.random.normal(key, (B, N, N), jnp.float32)
    yi = jnp.zeros_like(yr)

    variants = {
        "full": dict(),
        "no_bphase": dict(do_bphase=False),
        "no_renorm": dict(do_renorm=False),
        "no_prop": dict(do_prop=False),
        "prop_only": dict(do_bphase=False, do_renorm=False),
        "full_f32mats": dict(mats_dtype=jnp.float32),
    }
    base = None
    for name, kw in variants.items():
        fn = make_ablated_macro(N, N, 0.25, 1e-3, S, **kw)
        t = timeit(fn, yr, yi)
        rate = B * S / t
        if name == "full":
            base = t
        print(f"{name:>14}: {t*1e3:7.3f} ms/macro  "
              f"{rate/1e6:7.2f} M env-substeps/s"
              + (f"  ({t/base*100:5.1f}% of full)" if base else ""))


if __name__ == "__main__":
    main()
