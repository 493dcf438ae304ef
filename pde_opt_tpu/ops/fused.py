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

__all__ = ["make_ch_rhs_fd_fused"]


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

    def kernel(u_ref, kappa_ref, out_ref):
        u = u_ref[:]  # (bb, H, W)
        kap = kappa_ref[:]  # (bb, 1, 1)

        # pltpu.roll == jnp.roll but requires a non-negative shift;
        # rx(a, -1)[i] = a[i+1] (periodic), matching the stencil library.
        def rx(a, s):
            return pltpu.roll(a, s % a.shape[1], 1)

        def ry(a, s):
            return pltpu.roll(a, s % a.shape[2], 2)

        lap = (rx(u, -1) - 2.0 * u + rx(u, 1)) * inv_hx2 + (
            ry(u, -1) - 2.0 * u + ry(u, 1)
        ) * inv_hy2
        mu = mu_fn(u) - kap * lap

        mux_f = (rx(mu, -1) - mu) * inv_hx
        muy_f = (ry(mu, -1) - mu) * inv_hy
        Du = D_fn(u)
        Fx = 0.5 * (Du + rx(Du, -1)) * mux_f
        Fy = 0.5 * (Du + ry(Du, -1)) * muy_f
        out_ref[:] = (Fx - rx(Fx, 1)) * inv_hx + (Fy - ry(Fy, 1)) * inv_hy

    def rhs(state, kappa):
        *batch, H, W = state.shape
        B = math.prod(batch) if batch else 1
        x = state.reshape(B, H, W)
        kap = jnp.broadcast_to(jnp.asarray(kappa, state.dtype), (B,)).reshape(
            B, 1, 1
        ) if jnp.ndim(kappa) <= 1 else jnp.asarray(kappa, state.dtype).reshape(B, 1, 1)

        bb = block_envs or _pick_block(B, H, W)
        out = pl.pallas_call(
            kernel,
            grid=(B // bb,),
            in_specs=[
                pl.BlockSpec((bb, H, W), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, 1, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bb, H, W), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W), state.dtype),
            interpret=interpret,
        )(x, kap)
        return out.reshape(*batch, H, W)

    return rhs
