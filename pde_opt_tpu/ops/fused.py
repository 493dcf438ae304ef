"""Fused Pallas kernels for hot RHS evaluations.

The finite-difference Cahn-Hilliard RHS is ~20 roll-stencil passes; as plain
XLA ops each costs an HBM round trip (measured ~2.3 ms/substep for 4096×64²
f32 on v5e — ~20 passes at ~180 GB/s).  The fused kernel below reads the
field block into VMEM once, evaluates the *entire* RHS (chemical potential,
face gradients/averages, fluxes, divergence) in registers/VMEM, and writes
the result once: ~2 HBM passes instead of ~20.

The kernel is generated per (mu, D) coefficient pair — the callables trace
into the kernel body, so learnable modules work as long as they are
elementwise (Legendre expansions, rational priors; CNN coefficients need the
XLA path).  Periodic wrap is `pltpu.roll` on the trailing axes, a cheap lane
rotation.

Non-TPU backends run the same kernel in Pallas interpret mode (tests), or
callers can fall back to :meth:`CahnHilliard2DPeriodic.rhs_fd`.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["make_ch_rhs_fd_fused", "make_ch3d_rhs_fd_fused"]


def _hoist_coeff_consts(mu_fn, D_fn, block_shape):
    """Split (mu, D) into a pure function + captured array constants.

    Learnable coefficient modules (Legendre expansions etc.) close over
    parameter ARRAYS; a Pallas kernel may not capture non-scalar constants
    ("You should pass them as inputs").  Tracing the pair to a jaxpr and
    hoisting every constvar turns them into real VMEM operands.  The
    conversion specializes to the argument shape, so ``block_shape`` must
    be the kernel's block shape.  Returns ``(eval_fn, consts)`` with
    ``eval_fn(u, *consts) -> (mu(u), D(u))``; ``consts`` are reshaped to
    rank-2 for TPU vector memory.
    """
    probe = jax.ShapeDtypeStruct(block_shape, jnp.float32)
    closed = jax.make_jaxpr(
        lambda z, _mu=mu_fn, _D=D_fn: (_mu(z), _D(z))
    )(probe)
    # NOTE: jax.closure_convert would NOT work here — it hoists only
    # *perturbed* (traced) consts and leaves concrete parameter arrays
    # inside the converted function, which the kernel then re-captures.
    # Hoist every jaxpr constvar instead.  A TRACED parameter (training
    # learnable mu/D through the Pallas path) shows up as a Tracer const
    # and fails the asarray below — loud, as documented in cas_mobility.
    consts = [jnp.asarray(c) for c in closed.consts]
    meta = [(c.shape, c.dtype) for c in consts]

    def eval_fn(u, *flat_consts):
        orig = [f.reshape(s).astype(d)
                for f, (s, d) in zip(flat_consts, meta)]
        mu_u, d_u = jax.core.eval_jaxpr(closed.jaxpr, orig, u)
        return mu_u, d_u

    consts2d = [c.reshape(1, -1) if c.ndim < 2 else c for c in consts]
    return eval_fn, consts2d


def _pick_block(B: int, H: int, W: int, vmem_budget_bytes: int = 8 * 2**20) -> int:
    """Largest power-of-two env block whose working set fits the VMEM budget.

    ~8 live (bb, H, W) f32 intermediates at peak.
    """
    per_env = H * W * 4 * 8
    bb = max(1, vmem_budget_bytes // per_env)
    bb = 1 << (bb.bit_length() - 1)
    while B % bb != 0:
        bb //= 2
    return max(1, bb)


def make_ch_rhs_fd_fused(
    mu_fn: Callable,
    D_fn: Callable,
    hx: float,
    hy: float,
    *,
    block_envs: Optional[int] = None,
    interpret: Optional[bool] = None,
):
    """Build a fused CH FD RHS: ``rhs(state, kappa) -> dstate``.

    Args:
        mu_fn, D_fn: elementwise chemical potential / mobility callables.
        hx, hy: grid spacings (static).
        block_envs: envs per kernel invocation (default: auto from VMEM).
        interpret: force Pallas interpret mode (default: on for non-TPU
            backends so tests run on CPU).

    The returned function takes ``state`` of shape ``(..., H, W)`` (leading
    axes are batch; they are flattened into the kernel grid) and ``kappa``
    — a scalar or an array broadcastable to the batch (per-env control).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    inv_hx2 = 1.0 / (hx * hx)
    inv_hy2 = 1.0 / (hy * hy)
    inv_hx = 1.0 / hx
    inv_hy = 1.0 / hy

    def rhs(state, kappa):
        *batch, H, W = state.shape
        B = math.prod(batch) if batch else 1
        x = state.reshape(B, H, W)
        kap = jnp.broadcast_to(jnp.asarray(kappa, state.dtype), (B,)).reshape(
            B, 1, 1
        ) if jnp.ndim(kappa) <= 1 else jnp.asarray(kappa, state.dtype).reshape(B, 1, 1)

        bb = block_envs or _pick_block(B, H, W)
        coeff_eval, coeff_consts = _hoist_coeff_consts(
            mu_fn, D_fn, (bb, H, W))

        def kernel(u_ref, kappa_ref, *rest):
            *c_refs, out_ref = rest
            u = u_ref[:]  # (bb, H, W)
            kap = kappa_ref[:]  # (bb, 1, 1)
            mu_h, Du = coeff_eval(u, *[r[:] for r in c_refs])

            # pltpu.roll == jnp.roll but requires a non-negative shift;
            # rx(a, -1)[i] = a[i+1] (periodic), matching the stencils.
            def rx(a, s):
                return pltpu.roll(a, s % a.shape[1], 1)

            def ry(a, s):
                return pltpu.roll(a, s % a.shape[2], 2)

            lap = (rx(u, -1) - 2.0 * u + rx(u, 1)) * inv_hx2 + (
                ry(u, -1) - 2.0 * u + ry(u, 1)
            ) * inv_hy2
            mu = mu_h - kap * lap

            mux_f = (rx(mu, -1) - mu) * inv_hx
            muy_f = (ry(mu, -1) - mu) * inv_hy
            Fx = 0.5 * (Du + rx(Du, -1)) * mux_f
            Fy = 0.5 * (Du + ry(Du, -1)) * muy_f
            out_ref[:] = ((Fx - rx(Fx, 1)) * inv_hx
                          + (Fy - ry(Fy, 1)) * inv_hy)

        const_specs = [
            pl.BlockSpec(c.shape, lambda i, _nd=c.ndim: (0,) * _nd,
                         memory_space=pltpu.VMEM)
            for c in coeff_consts
        ]
        out = pl.pallas_call(
            kernel,
            grid=(B // bb,),
            in_specs=[
                pl.BlockSpec((bb, H, W), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, 1, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                *const_specs,
            ],
            out_specs=pl.BlockSpec((bb, H, W), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W), state.dtype),
            interpret=interpret,
        )(x, kap, *coeff_consts)
        return out.reshape(*batch, H, W)

    return rhs


def make_ch3d_rhs_fd_fused(
    mu_fn: Callable,
    D_fn: Callable,
    h1: float,
    h2: float,
    h3: float,
    *,
    block_envs: Optional[int] = None,
    interpret: Optional[bool] = None,
):
    """Fused 3D CH FD RHS: ``rhs(state, kappa) -> dstate`` (one HBM pass).

    The 3D analog of :func:`make_ch_rhs_fd_fused` — the ~20 roll passes of
    the XLA flux-form rhs over a (B, N1, N2, N3) batch collapse to one
    VMEM-resident kernel.  Lane layout: the trailing (N2, N3) axes fold
    into one lane axis of width N2·N3 (a 32³ grid gives 1024 = 8 full
    lane tiles, vs 32 lanes = 25% occupancy unfolded).  Rolls along N2
    are plain lane rotations by N3; rolls along N3 are within-group
    rotations expressed as two global rotations + a compile-time seam
    mask (same trick as the packed-tile env rolls).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    inv = [1.0 / h1, 1.0 / h2, 1.0 / h3]
    inv2 = [v * v for v in inv]

    def rhs(state, kappa):
        *batch, N1, N2, N3 = state.shape
        B = math.prod(batch) if batch else 1
        L = N2 * N3
        x = state.reshape(B, N1, L)
        kap = jnp.broadcast_to(jnp.asarray(kappa, state.dtype), (B,)).reshape(
            B, 1, 1
        ) if jnp.ndim(kappa) <= 1 else jnp.asarray(
            kappa, state.dtype).reshape(B, 1, 1)
        bb = block_envs or _pick_block(B, N1, L)
        coeff_eval, coeff_consts = _hoist_coeff_consts(
            mu_fn, D_fn, (bb, N1, L))
        # Seam masks for within-group z rolls, as compile-time constant
        # OPERANDS: an in-kernel iota + integer remainder lowers through a
        # closed_call that Mosaic cannot compile.
        import numpy as _np

        lane_np = _np.arange(L) % N3
        hi_np = (lane_np == N3 - 1).astype(_np.float32).reshape(1, L)
        lo_np = (lane_np == 0).astype(_np.float32).reshape(1, L)
        seam_consts = [jnp.asarray(hi_np), jnp.asarray(lo_np)]

        def kernel(u_ref, kappa_ref, hi_ref, lo_ref, *rest):
            *c_refs, out_ref = rest
            u = u_ref[:]                       # (bb, N1, N2*N3)
            kap = kappa_ref[:]                 # (bb, 1, 1)
            mu_h, Du = coeff_eval(u, *[r[:] for r in c_refs])
            # Arithmetic selects (mask*a + (1-mask)*b): a broadcasting
            # jnp.where also lowers through a closed_call Mosaic rejects.
            hi = hi_ref[:].reshape(1, 1, L)
            lo = lo_ref[:].reshape(1, 1, L)

            def r1(a, s):                      # roll along N1 (sublanes)
                return pltpu.roll(a, s % N1, 1)

            def r2(a, s):                      # roll along N2: lanes by N3
                return pltpu.roll(a, (s * N3) % L, 2)

            def r3(a, s):                      # roll along N3 (within-group)
                if s == -1:
                    return (hi * pltpu.roll(a, (N3 - 1) % L, 2)
                            + (1.0 - hi) * pltpu.roll(a, (L - 1) % L, 2))
                if s == 1:
                    return (lo * pltpu.roll(a, (L - N3 + 1) % L, 2)
                            + (1.0 - lo) * pltpu.roll(a, 1, 2))
                raise ValueError(s)

            rolls = (r1, r2, r3)
            lap = 0.0
            for r, iv2 in zip(rolls, inv2):
                lap = lap + (r(u, -1) - 2.0 * u + r(u, 1)) * iv2
            mu = mu_h - kap * lap
            out = 0.0
            for r, iv in zip(rolls, inv):
                F = 0.5 * (Du + r(Du, -1)) * (r(mu, -1) - mu) * iv
                out = out + (F - r(F, 1)) * iv
            out_ref[:] = out

        const_specs = [
            pl.BlockSpec(c.shape, lambda i, _nd=c.ndim: (0,) * _nd,
                         memory_space=pltpu.VMEM)
            for c in (*seam_consts, *coeff_consts)
        ]
        out = pl.pallas_call(
            kernel,
            grid=(B // bb,),
            in_specs=[
                pl.BlockSpec((bb, N1, L), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, 1, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                *const_specs,
            ],
            out_specs=pl.BlockSpec((bb, N1, L), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, N1, L), state.dtype),
            interpret=interpret,
        )(x, kap, *seam_consts, *coeff_consts)
        return out.reshape(*batch, N1, N2, N3)

    return rhs
