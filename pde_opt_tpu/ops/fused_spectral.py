"""Fully-fused semi-implicit spectral macro-step kernel (Pallas, MXU).

The flagship env hot loop — ``substeps`` semi-implicit Fourier-spectral
Cahn-Hilliard substeps per RL step — previously ran as one XLA region per
substep: a fused Pallas FD-RHS kernel (2 HBM passes) plus a dense
(HW, HW) bf16 spectral-solve matmul streaming a 33 MB matrix from HBM
every substep (see :mod:`pde_opt_tpu.ops.dft`).  Measured on v5e at
4096x64^2: ~3.4 ms/substep, HBM/MXU-flop bound — 118k env-steps/s
through the full env.

This kernel instead keeps the field (and its spectrum) resident in VMEM
across *all* substeps of a macro-step and evaluates each substep with
separable DFT matmuls on the MXU (measured ~0.85 ms/substep-equivalent,
~4x, at 4096x64^2 on v5e):

    per substep (per env, kappa_b is the per-env control):
        m        = mu(u)                                   (VPU)
        m_hat    = F2(m)                                   (2 packed matmuls)
        incr_hat = (lam * m_hat - kappa_b * lam^2 * u_hat)
                   / (1 + A*dt*kappa_b*lam^2)              (VPU)
        u_hat   += dt * incr_hat                           (VPU)
        u       += dt * F2^{-1}(incr_hat)                  (2 packed matmuls)

where ``lam`` is the *finite-difference* Laplacian symbol
``(2 cos(2 pi k/N) - 2)/h^2`` summed over axes, so in exact arithmetic a
substep equals ``rhs_fd`` (D==1) + the reference semi-implicit update
``y1 = y0 + dt*ifft(fft(rhs)/(1+A*dt*symbol))``
(``/root/reference/pde_opt/numerics/solvers.py:56-70``) with the
FD-consistent symbol ``kappa*lam^2`` — evaluated *per env* with the env's
own traced kappa (the dense-matmul path had to upper-bound a shared
kappa_max symbol instead).

Layout: spectra are carried real/imag-packed along the lane axis —
(bb, W, 2H) "mid-layout" with kw as sublanes — so each complex
axis-transform is ONE bf16 matmul with f32 accumulation at full
128-lane width for N >= 64.  The h-axis contractions use
``dot_general`` over the *middle* axis of the 3D operand, which Mosaic
lowers without materializing a transpose.  Since the update is linear in
the spectrum, ``u_hat`` is carried across substeps (recomputed from ``u``
once per macro-step, so auto-reset between macro-steps stays consistent):
only ONE forward and ONE inverse transform per substep.

Noise robustness: bf16 matmul rounding injects high-k noise into the
increment; the per-env implicit denominator gives that noise a one-step
feedback gain of ``|1 - 1/A|`` at high k (kappa-independent).  ``A = 1``
makes the high-k response deadbeat — with per-env denominators there is no
reason to pick the marginally-stable A=0.5/kappa_max-bound combination the
dense path needed its sqrt-factoring trick for.

Differentiable: both macros register a custom VJP.  The primal runs the
Pallas kernel; the backward pass recomputes through the mathematically
identical XLA/FFT oracle (``ch_sif_macro_reference`` /
``ac_sif_macro_reference``) with a ``jax.checkpoint``-wrapped scan body,
so memory stays O(n_steps) fields while gradients are exact for the
macro's semantics.  (The Hartley-transform kernel in
:mod:`pde_opt_tpu.ops.cas_spectral` additionally ships a hand-written
Pallas backward kernel — that is the fast training path.)  Non-TPU
backends run in Pallas interpret mode.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "make_ch_sif_fused_macro",
    "ch_sif_macro_reference",
    "make_ac_sif_fused_macro",
    "ac_sif_macro_reference",
]


def _fd_lap_symbols(H: int, W: int, hx: float, hy: float):
    """FD Laplacian eigenvalues per axis (roll-stencil spectrum)."""
    lam_h = (2.0 * np.cos(2.0 * np.pi * np.arange(H) / H) - 2.0) / (hx * hx)
    lam_w = (2.0 * np.cos(2.0 * np.pi * np.arange(W) / W) - 2.0) / (hy * hy)
    return lam_h, lam_w


def _dft_mats(N: int):
    """Forward/inverse DFT matrices as (cos, sin) real pairs.

    Forward: X[k] = sum_x u[x] e^{-2 pi i x k / N}  ->  (Wr, Wi) with
    Wr = cos, Wi = -sin, both (N, N) indexed [x, k].
    Inverse: u[x] = (1/N) sum_k X[k] e^{+2 pi i k x / N} -> (Vr, Vi),
    Vr = cos/N, Vi = sin/N, indexed [k, x].
    """
    x = np.arange(N)
    ang = 2.0 * np.pi * np.outer(x, x) / N
    Wr, Wi = np.cos(ang), -np.sin(ang)
    Vr, Vi = np.cos(ang) / N, np.sin(ang) / N
    return (Wr, Wi), (Vr, Vi)


def _attach_oracle_vjp(pallas_macro, oracle_macro):
    """Register a custom VJP on a Pallas macro using the XLA oracle.

    Primal = the fast Pallas kernel; backward = ``jax.vjp`` through the
    mathematically identical (exact-arithmetic-equal) XLA/FFT oracle, which
    recomputes the forward under ``jax.checkpoint`` scan semantics.
    Cotangent shapes/dtypes match the user's ``(state, kappa)`` since the
    oracle broadcasts kappa the same way the kernel does.
    """

    @jax.custom_vjp
    def dmacro(state, kappa):
        return pallas_macro(state, kappa)

    def dmacro_fwd(state, kappa):
        return pallas_macro(state, kappa), (state, kappa)

    def dmacro_bwd(res, g):
        state, kappa = res
        _, vjp = jax.vjp(oracle_macro, state, kappa)
        return vjp(g)

    dmacro.defvjp(dmacro_fwd, dmacro_bwd)
    return dmacro


def _pick_block(H: int, W: int, vmem_budget_bytes: int = 10 * 2**20) -> int:
    """Largest power-of-two env block with ~10 live (bb, H, 2W) f32 buffers
    (a cap — callers pad the batch up to a block multiple, never shrink the
    block to fit a ragged batch)."""
    per_env = H * W * 4 * 20
    bb = max(1, vmem_budget_bytes // per_env)
    return 1 << (bb.bit_length() - 1)


def _block_and_pad(B, x, kap, block_envs, pack, block_cap, H, W):
    """Choose the env block first, then pad ``x``/``kap`` (leading axis B) up
    to a multiple of it by replicating the last env.  Returns
    ``(bb, Bp, x, kap)``; callers slice the kernel output back to B rows.
    Choosing the block before padding keeps the grid covering the whole
    (padded) batch and keeps ragged batches off the tiny-block perf cliff."""
    if block_envs is not None:
        if block_envs % pack:
            raise ValueError(
                f"block_envs {block_envs} must be divisible by {pack}"
            )
        bb = block_envs
    else:
        need = -(-B // pack)
        pow2 = 1 << (need - 1).bit_length()
        bb = pack * min(block_cap, pow2)
    Bp = -(-B // bb) * bb
    if Bp != B:
        reps = Bp - B
        x = jnp.concatenate([x, jnp.broadcast_to(x[-1:], (reps, H, W))], 0)
        kap = jnp.concatenate(
            [kap, jnp.broadcast_to(kap[-1:], (reps, 1, 1))], 0
        )
    return bb, Bp, x, kap


def make_ch_sif_fused_macro(
    mu_fn: Callable,
    H: int,
    W: int,
    hx: float,
    hy: float,
    A: float,
    dt: float,
    n_steps: int,
    *,
    block_envs: Optional[int] = None,
    interpret: Optional[bool] = None,
    mats_dtype=jnp.bfloat16,
    half_spectrum: Optional[bool] = None,
):
    """Build ``macro(u, kappa) -> u1`` advancing ``n_steps`` fused substeps.

    Args:
        mu_fn: elementwise homogeneous chemical potential (e.g. ``c**3 - c``).
        H, W: grid shape (trailing axes of ``u``).
        hx, hy: grid spacings for axes -2/-1 (stencil-library convention).
        A: implicit splitting constant; the denominator is
            ``1 + A*dt*kappa*lam^2`` with the env's own kappa.  Use 1.0 for
            deadbeat high-k noise damping (see module docstring).
        dt: substep size (static).
        n_steps: substeps per macro-step (static; unrolled in-kernel).
        block_envs: envs per kernel block (default: auto from VMEM budget;
            measured optimum 16-32 at 64x64 on v5e).
        interpret: force interpret mode (default: on for non-TPU backends).
        mats_dtype: matmul operand dtype (bf16 default; f32 for testing).
        half_spectrum: exploit the conjugate symmetry of real fields by
            keeping only kw in [0, W/2] (rfft semantics; exact in exact
            arithmetic).  Shrinks the spectral arrays' kw axis from W rows
            to ceil8(W/2+1), cutting stages B/C/D and the combine VPU work
            ~0.6x.  Default: on when W is even.

    Returns a function taking ``u`` of shape (..., H, W) (leading axes are
    env batch) and ``kappa`` broadcastable to the batch, returning the
    advanced field (same shape/dtype as ``u``).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    if half_spectrum is None:
        half_spectrum = W % 2 == 0

    lam_h, lam_w = _fd_lap_symbols(H, W, hx, hy)
    lam_mid = lam_w[:, None] + lam_h[None, :]                       # (W, H)

    (Wr_w, Wi_w), (Vr_w, Vi_w) = _dft_mats(W)
    (Wr_h, Wi_h), (Vr_h, Vi_h) = _dft_mats(H)

    if half_spectrum:
        # Real input: keep kw in [0, W/2]; rows beyond W2 are zero padding
        # to an 8-aligned sublane count Wp.  The inverse along kw doubles
        # the weight of the interior (conjugate-paired) frequencies.
        W2 = W // 2 + 1
        Wp = -(-W2 // 8) * 8
        c_k = np.full((W2,), 2.0)
        c_k[0] = 1.0
        c_k[-1] = 1.0
        pad = Wp - W2

        def pad_rows(m):
            return np.pad(m, ((0, pad), (0, 0)))

        def pad_cols(m):
            return np.pad(m, ((0, 0), (0, pad)))

        FW_np = np.concatenate(
            [pad_cols(Wr_w[:, :W2]), pad_cols(Wi_w[:, :W2])], axis=1
        )                                                           # (W, 2Wp)
        IW_np = pad_rows(np.concatenate(
            [c_k[:, None] * Vr_w[:W2, :], c_k[:, None] * Vi_w[:W2, :]], axis=1
        ))                                                          # (Wp, 2W)
        lam_k = np.pad(lam_mid[:W2], ((0, pad), (0, 0)))            # (Wp, H)
    else:
        Wp = W
        FW_np = np.concatenate([Wr_w, Wi_w], axis=1)                # (W, 2W)
        IW_np = np.concatenate([Vr_w, Vi_w], axis=1)                # (W, 2W)
        lam_k = lam_mid

    # mid-layout (kw-block, kh), tiled twice along lanes for packed arrays
    lamP_np = np.concatenate([lam_k, lam_k], axis=-1)               # (Wp, 2H)
    lam2P_np = np.concatenate([lam_k**2, lam_k**2], axis=-1)
    # Stage B (complex fwd along h): mid-contraction over h of the
    # (bb, H, 2Wp) stage-A output with (H, 2H); parts recombined by slices.
    FH_np = np.concatenate([Wr_h, Wi_h], axis=1)                    # (H, 2H)
    # Stage C (complex inv along kh, packed K=2H):
    # [R | I] @ [[Vr, Vi], [-Vi, Vr]] -> [C_R | C_I]
    IH_np = np.block([[Vr_h, Vi_h], [-Vi_h, Vr_h]])                 # (2H, 2H)

    A_dt = float(A) * float(dt)
    dt_f = float(dt)
    mats = mats_dtype
    # TPU "default" f32 matmul precision decomposes to single-pass bf16;
    # when f32 operands are requested (testing), force true f32 arithmetic.
    prec = jax.lax.Precision.HIGHEST if mats == jnp.float32 else None
    dot = partial(jnp.dot, preferred_element_type=jnp.float32, precision=prec)

    def mid_contract(x3, m2):
        """(bb, K, L) x (K, N) -> (bb, L, N): contraction over the middle
        axis, lowered by Mosaic without a materialized transpose."""
        return jax.lax.dot_general(
            x3, m2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    def kernel(u_ref, kap_ref, fw_ref, fh_ref, ih_ref, iw_ref,
               lamP_ref, lam2P_ref, out_ref):
        bb = u_ref.shape[0]
        u = u_ref[:].astype(jnp.float32)                # (bb, H, W)
        kap = kap_ref[:].astype(jnp.float32)            # (bb, 1, 1)
        fw = fw_ref[:]
        fh = fh_ref[:]
        ih = ih_ref[:]
        iw = iw_ref[:]
        lamP = lamP_ref[:]                              # (Wp, 2H) f32
        lam2P = lam2P_ref[:]

        # Per-macro-step precomputes: the increment (with dt folded in) is
        #   incr_dt = cm * m_hat - cu * u_hat
        # with cm = dt*lam/(1+A*dt*kappa*lam^2), cu = dt*kappa*lam^2*(same).
        # (Zero lam rows in half-spectrum padding keep pad rows zero.)
        denomP = 1.0 / (1.0 + A_dt * (kap * lam2P[None]))  # (bb, Wp, 2H)
        cm = (dt_f * lamP)[None] * denomP
        cu = (dt_f * kap) * lam2P[None] * denomP

        def fwd2(x):
            """Real (bb, H, W) -> packed spectrum (bb, Wp, 2H) mid-layout."""
            a = dot(x.reshape(bb * H, W).astype(mats), fw)   # (bb*H, 2Wp)
            a = a.reshape(bb, H, 2 * Wp).astype(mats)
            z = mid_contract(a, fh)                          # (bb, 2Wp, 2H)
            hat_r = z[:, 0:Wp, 0:H] - z[:, Wp:2 * Wp, H:2 * H]
            hat_i = z[:, 0:Wp, H:2 * H] + z[:, Wp:2 * Wp, 0:H]
            return jnp.concatenate([hat_r, hat_i], axis=-1)  # (bb, Wp, 2H)

        def inv2_real(hatP):
            """Packed spectrum (bb, Wp, 2H) -> real field (bb, H, W)."""
            c = dot(hatP.reshape(bb * Wp, 2 * H).astype(mats), ih)
            c = c.reshape(bb, Wp, 2 * H).astype(mats)
            y = mid_contract(c, iw)                          # (bb, 2H, 2W)
            return y[:, 0:H, 0:W] - y[:, H:2 * H, W:2 * W]   # (bb, H, W)

        u_hatP = fwd2(u)
        for _ in range(n_steps):
            incr_dt = cm * fwd2(mu_fn(u)) - cu * u_hatP
            u_hatP = u_hatP + incr_dt
            u = u + inv2_real(incr_dt)
        out_ref[:] = u.astype(out_ref.dtype)

    def macro(state, kappa):
        *batch, h, w = state.shape
        if (h, w) != (H, W):
            raise ValueError(f"state trailing shape {(h, w)} != {(H, W)}")
        B = math.prod(batch) if batch else 1
        x = state.reshape(B, H, W)
        kap = jnp.asarray(kappa, jnp.float32)
        kap = (jnp.broadcast_to(kap, (B,)).reshape(B, 1, 1)
               if kap.ndim <= 1 else kap.reshape(B, 1, 1))

        bb, Bp, x, kap = _block_and_pad(
            B, x, kap, block_envs, 1, _pick_block(H, W), H, W
        )
        B_in, B = B, Bp
        consts = [
            jnp.asarray(FW_np, mats), jnp.asarray(FH_np, mats),
            jnp.asarray(IH_np, mats), jnp.asarray(IW_np, mats),
            jnp.asarray(lamP_np, jnp.float32),
            jnp.asarray(lam2P_np, jnp.float32),
        ]
        const_specs = [
            pl.BlockSpec(c.shape, lambda i, _nd=c.ndim: (0,) * _nd,
                         memory_space=pltpu.VMEM)
            for c in consts
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
            cost_estimate=pl.CostEstimate(
                flops=2 * n_steps * B * (H * W) * (2 * W + 4 * H + 4 * H + 4 * W),
                bytes_accessed=2 * B * H * W * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(x, kap, *consts)
        if B_in != B:
            out = out[:B_in]
        return out.reshape(*batch, H, W)

    return _attach_oracle_vjp(
        macro, ch_sif_macro_reference(mu_fn, hx, hy, A, dt, n_steps,
                                      remat=True)
    )


def ch_sif_macro_reference(mu_fn, hx, hy, A, dt, n_steps, remat=False):
    """XLA/FFT reference of the fused kernel's exact semantics (for tests).

    Same per-env FD-symbol semi-implicit update, evaluated with
    ``jnp.fft`` in the working dtype — the correctness oracle the Pallas
    kernel is compared against.  With ``remat=True`` the scan body is
    ``jax.checkpoint``-wrapped so reverse-mode AD stores only the carried
    field per substep (this is the backward pass of the fused DFT macro).
    """

    def macro(u, kappa):
        H, W = u.shape[-2:]
        lam_h, lam_w = _fd_lap_symbols(H, W, hx, hy)
        lam = jnp.asarray(lam_h[:, None] + lam_w[None, :])       # (H, W)
        kap = jnp.asarray(kappa)
        if kap.ndim <= 1:
            kap = jnp.broadcast_to(kap, u.shape[:-2]).reshape(
                u.shape[:-2] + (1, 1)
            )
        denom = 1.0 / (1.0 + A * dt * kap * lam**2)

        def body(carry, _):
            uu = carry
            m_hat = jnp.fft.fftn(mu_fn(uu), axes=(-2, -1))
            u_hat = jnp.fft.fftn(uu, axes=(-2, -1))
            incr = denom * (lam * m_hat - kap * lam**2 * u_hat)
            uu = uu + dt * jnp.fft.ifftn(incr, axes=(-2, -1)).real.astype(uu.dtype)
            return uu, None

        out, _ = jax.lax.scan(
            jax.checkpoint(body) if remat else body, u, None, length=n_steps
        )
        return out

    return macro


def make_ac_sif_fused_macro(
    mu_fn: Callable,
    R_fn: Callable,
    H: int,
    W: int,
    hx: float,
    hy: float,
    A: float,
    dt: float,
    n_steps: int,
    *,
    block_envs: Optional[int] = None,
    interpret: Optional[bool] = None,
    mats_dtype=jnp.bfloat16,
    half_spectrum: Optional[bool] = None,
):
    """Fused Allen-Cahn semi-implicit macro-step: ``macro(u, kappa) -> u1``.

    Per substep (matching ``AllenCahn2DPeriodic.rhs_fd`` + the semi-implicit
    update with the FD-consistent symbol ``kappa*(-lam)``):

        lap  = roll-stencil Laplacian of u                     (VPU)
        g    = -R(u) * (mu(u) - kappa * lap)                   (VPU)
        u   += dt * F2^{-1}( F2(g) / (1 + A*dt*kappa*(-lam)) ) (4 matmuls)

    The reaction factor makes the update nonlinear in ``u_hat``, so (unlike
    the Cahn-Hilliard kernel) no spectrum is carried — the Laplacian is
    evaluated with in-VMEM periodic rolls instead.  Same packed-DFT layout,
    half-spectrum option, and per-env traced kappa as the CH kernel.
    """
    from jax.experimental.pallas import tpu as _pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if half_spectrum is None:
        half_spectrum = W % 2 == 0

    lam_h, lam_w = _fd_lap_symbols(H, W, hx, hy)
    lam_mid = lam_w[:, None] + lam_h[None, :]                   # (W, H)
    (Wr_w, Wi_w), (Vr_w, Vi_w) = _dft_mats(W)
    (Wr_h, Wi_h), (Vr_h, Vi_h) = _dft_mats(H)

    if half_spectrum:
        W2 = W // 2 + 1
        Wp = -(-W2 // 8) * 8
        c_k = np.full((W2,), 2.0)
        c_k[0] = 1.0
        c_k[-1] = 1.0
        pad = Wp - W2
        FW_np = np.concatenate(
            [np.pad(Wr_w[:, :W2], ((0, 0), (0, pad))),
             np.pad(Wi_w[:, :W2], ((0, 0), (0, pad)))], axis=1)  # (W, 2Wp)
        IW_np = np.pad(np.concatenate(
            [c_k[:, None] * Vr_w[:W2, :], c_k[:, None] * Vi_w[:W2, :]],
            axis=1), ((0, pad), (0, 0)))                         # (Wp, 2W)
        lam_k = np.pad(lam_mid[:W2], ((0, pad), (0, 0)))         # (Wp, H)
    else:
        Wp = W
        FW_np = np.concatenate([Wr_w, Wi_w], axis=1)
        IW_np = np.concatenate([Vr_w, Vi_w], axis=1)
        lam_k = lam_mid
    negP_np = np.concatenate([-lam_k, -lam_k], axis=-1)          # (Wp, 2H) >= 0
    FH_np = np.concatenate([Wr_h, Wi_h], axis=1)
    IH_np = np.block([[Vr_h, Vi_h], [-Vi_h, Vr_h]])

    A_dt = float(A) * float(dt)
    dt_f = float(dt)
    inv_hx2 = 1.0 / (hx * hx)
    inv_hy2 = 1.0 / (hy * hy)
    mats = mats_dtype
    prec = jax.lax.Precision.HIGHEST if mats == jnp.float32 else None
    dot = partial(jnp.dot, preferred_element_type=jnp.float32, precision=prec)

    def mid_contract(x3, m2):
        return jax.lax.dot_general(
            x3, m2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    def kernel(u_ref, kap_ref, fw_ref, fh_ref, ih_ref, iw_ref, negP_ref,
               out_ref):
        bb = u_ref.shape[0]
        u = u_ref[:].astype(jnp.float32)
        kap = kap_ref[:].astype(jnp.float32)                 # (bb, 1, 1)
        fw, fh, ih, iw = fw_ref[:], fh_ref[:], ih_ref[:], iw_ref[:]
        negP = negP_ref[:]                                   # (Wp, 2H)
        denom_dt = dt_f / (1.0 + A_dt * (kap * negP[None]))  # (bb, Wp, 2H)

        def rx(a, s):
            return _pltpu.roll(a, s % a.shape[1], 1)

        def ry(a, s):
            return _pltpu.roll(a, s % a.shape[2], 2)

        def fwd2(x):
            a = dot(x.reshape(bb * H, W).astype(mats), fw)
            a = a.reshape(bb, H, 2 * Wp).astype(mats)
            z = mid_contract(a, fh)                          # (bb, 2Wp, 2H)
            hat_r = z[:, 0:Wp, 0:H] - z[:, Wp:2 * Wp, H:2 * H]
            hat_i = z[:, 0:Wp, H:2 * H] + z[:, Wp:2 * Wp, 0:H]
            return jnp.concatenate([hat_r, hat_i], axis=-1)

        def inv2_real(hatP):
            c = dot(hatP.reshape(bb * Wp, 2 * H).astype(mats), ih)
            c = c.reshape(bb, Wp, 2 * H).astype(mats)
            y = mid_contract(c, iw)                          # (bb, 2H, 2W)
            return y[:, 0:H, 0:W] - y[:, H:2 * H, W:2 * W]

        for _ in range(n_steps):
            lap = (rx(u, -1) - 2.0 * u + rx(u, 1)) * inv_hx2 + (
                ry(u, -1) - 2.0 * u + ry(u, 1)
            ) * inv_hy2
            g = -R_fn(u) * (mu_fn(u) - kap * lap)
            u = u + inv2_real(denom_dt * fwd2(g))
        out_ref[:] = u.astype(out_ref.dtype)

    def macro(state, kappa):
        *batch, h, w = state.shape
        if (h, w) != (H, W):
            raise ValueError(f"state trailing shape {(h, w)} != {(H, W)}")
        B = math.prod(batch) if batch else 1
        x = state.reshape(B, H, W)
        kap = jnp.asarray(kappa, jnp.float32)
        kap = (jnp.broadcast_to(kap, (B,)).reshape(B, 1, 1)
               if kap.ndim <= 1 else kap.reshape(B, 1, 1))
        bb, Bp, x, kap = _block_and_pad(
            B, x, kap, block_envs, 1, _pick_block(H, W), H, W
        )
        B_in, B = B, Bp
        consts = [
            jnp.asarray(FW_np, mats), jnp.asarray(FH_np, mats),
            jnp.asarray(IH_np, mats), jnp.asarray(IW_np, mats),
            jnp.asarray(negP_np, jnp.float32),
        ]
        const_specs = [
            pl.BlockSpec(c.shape, lambda i, _nd=c.ndim: (0,) * _nd,
                         memory_space=pltpu.VMEM)
            for c in consts
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
        )(x, kap, *consts)
        if B_in != B:
            out = out[:B_in]
        return out.reshape(*batch, H, W)

    return _attach_oracle_vjp(
        macro, ac_sif_macro_reference(mu_fn, R_fn, hx, hy, A, dt, n_steps,
                                      remat=True)
    )


def ac_sif_macro_reference(mu_fn, R_fn, hx, hy, A, dt, n_steps, remat=False):
    """XLA/FFT oracle for :func:`make_ac_sif_fused_macro` (tests).

    ``remat=True`` checkpoint-wraps the scan body (backward pass of the
    fused AC macro's custom VJP).
    """

    def macro(u, kappa):
        H, W = u.shape[-2:]
        lam_h, lam_w = _fd_lap_symbols(H, W, hx, hy)
        lam = jnp.asarray(lam_h[:, None] + lam_w[None, :])
        kap = jnp.asarray(kappa)
        if kap.ndim <= 1:
            kap = jnp.broadcast_to(kap, u.shape[:-2]).reshape(
                u.shape[:-2] + (1, 1)
            )
        denom = 1.0 / (1.0 + A * dt * kap * (-lam))

        def body(uu, _):
            lap = jnp.fft.ifftn(
                lam * jnp.fft.fftn(uu, axes=(-2, -1)), axes=(-2, -1)
            ).real.astype(uu.dtype)
            g = -R_fn(uu) * (mu_fn(uu) - kap * lap)
            incr = denom * jnp.fft.fftn(g, axes=(-2, -1))
            uu = uu + dt * jnp.fft.ifftn(incr, axes=(-2, -1)).real.astype(uu.dtype)
            return uu, None

        out, _ = jax.lax.scan(
            jax.checkpoint(body) if remat else body, u, None, length=n_steps
        )
        return out

    return macro
