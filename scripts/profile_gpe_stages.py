"""Epoch-independent slope anchor for the fused GPE Strang kernel
(VERDICT r4 item 7).

The GPE bench capture swung 737k -> 398k env-steps/s between relay health
epochs with no code change (r3-package A/B confirmed); this pins the
kernel's own per-substep cost with the dispatch-cancelling two-point
method (runtime-trip-count fori_loop; dispatch/fetch/first-run anomalies
cancel), so any future regression is attributable to code, not the relay.

Variants:
  full      shipped kernel (phase_poly=True)
  hw_trig   phase_poly=False (hardware sin/cos) — the ~40% VPU ablation
  rot_full  rotating-frame ADI macro (ops/gpe_rot_fast.py), poly B-phase
  rot_hw    rotating-frame ADI macro, hardware exp/cos/sin B-phase

Usage (TPU): PYTHONPATH=/root/repo python scripts/profile_gpe_stages.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SUBSTEPS = 10


def slope_time(step_fn, y0, n_lo=20, n_hi=80, reps=3, fetch=None):
    """Per-macro seconds; ``step_fn(y) -> y`` is one macro call."""

    def run(y, n):
        return jax.lax.fori_loop(0, n, lambda i, c: step_fn(c), y)

    runj = jax.jit(run)
    fetch = fetch or (lambda o: float(jnp.sum(jnp.abs(o.reshape(-1)[:8]))))
    out = runj(y0, 2)
    _ = fetch(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        o = runj(y0, n_lo)
        _ = fetch(o)
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        o = runj(y0, n_hi)
        _ = fetch(o)
        t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (n_hi - n_lo))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=1024)
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--rot-batch", type=int, default=512)
    args = ap.parse_args()
    E, G = args.envs, args.grid
    print("device:", jax.devices()[0], flush=True)

    from pde_opt_tpu.grid import Domain
    from pde_opt_tpu.ops.gpe_cas import make_gpe_strang_cas_macro

    L = 16.0
    domain = Domain((G, G), ((-L / 2, L / 2), (-L / 2, L / 2)),
                    "dimensionless")
    dx = float(domain.dx[0])

    # Strang fleet state: real-stacked (E, H, W, 2) Gaussian.
    @jax.jit
    def build_strang():
        X, Y = (jnp.asarray(m, jnp.float32) for m in domain.mesh())
        psi = jnp.exp(-(X**2 + Y**2) / 4.0)
        psi = psi / jnp.sqrt(jnp.sum(psi**2) * dx * dx)
        y = jnp.stack([psi, jnp.zeros_like(psi)], axis=-1)
        V = 0.5 * (X**2 + Y**2)
        return jnp.broadcast_to(y, (E, G, G, 2)), V

    y0, V = build_strang()
    ctrl = jnp.zeros((E, G, G), jnp.float32)

    rows = []
    for name, poly in (("full", True), ("hw_trig", False)):
        macro = make_gpe_strang_cas_macro(V, 100.0, G, G, dx, 2e-3,
                                          SUBSTEPS, phase_poly=poly)
        t = slope_time(lambda y, m=macro: m(y, ctrl), y0)
        rate = E * SUBSTEPS / t
        rows.append((name, t))
        print(f"RESULT {name:8s} {t*1e3:7.3f} ms/macro "
              f"{t*1e6/SUBSTEPS/E*1e3:6.1f} ns/env-substep "
              f"{rate:12,.0f} env-substeps/s", flush=True)

    # Rotating-frame ADI macro (complex state — all setup under jit).
    from pde_opt_tpu.models.gross_pitaevskii import GPE2DTSRot
    from pde_opt_tpu.ops.gpe_rot_fast import make_rot_adi_macro

    B = args.rot_batch
    Lr = 20.0
    rdomain = Domain((G, G), ((-Lr / 2, Lr / 2), (-Lr / 2, Lr / 2)),
                     "dimensionless")
    eq = GPE2DTSRot(rdomain, 500.0, 0.0, 0.9)

    @jax.jit
    def build_rot():
        X, Y = (jnp.asarray(m, jnp.float32) for m in rdomain.mesh())
        psi = jnp.exp(-(X**2 + Y**2) / 16.0).astype(jnp.complex64)
        psi = psi / jnp.sqrt(jnp.sum(jnp.abs(psi) ** 2)
                             * rdomain.dx[0] ** 2)
        return jnp.broadcast_to(psi, (B, G, G))

    psi0 = build_rot()
    _fetch_jit = jax.jit(lambda z: jnp.sum(jnp.abs(z.reshape(-1)[:8])))
    fetch_c = lambda o: float(_fetch_jit(o))  # noqa: E731
    for name, poly in (("rot_full", True), ("rot_hw", False)):
        macro = make_rot_adi_macro(
            eq.A_terms, eq.B_terms, float(rdomain.dx[0]), G, G, 2e-4,
            SUBSTEPS, time_scale=-1j, phase_poly=poly,
        )
        t = slope_time(lambda y, m=macro: m(y), psi0, fetch=fetch_c)
        rate = B * SUBSTEPS / t
        rows.append((name, t))
        print(f"RESULT {name:8s} {t*1e3:7.3f} ms/macro "
              f"{rate:12,.0f} field-substeps/s", flush=True)


if __name__ == "__main__":
    main()
