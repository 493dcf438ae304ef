"""Benchmark: env-steps/s + MFU on the flagship fleet, plus a config matrix.

Primary metric (driver north star, BASELINE.json): aggregate env-steps/s at
64×64 Cahn-Hilliard, 4096 envs.  One env step = one RL macro-step =
``SUBSTEPS`` fused semi-implicit spectral substeps (control update, physics,
reward, observation, auto-reset) — all inside one on-device scan with zero
host round-trips.

Also measured (TPU only; recorded under ``"configs"``):
  * model FLOPs utilization (MFU) and HBM bandwidth of the flagship kernel,
    from an analytic FLOPs/bytes model of the cas macro (4 bf16 matmuls of
    depth 128 per substep per env — see ops/cas_spectral.py);
  * 128×128 Cahn-Hilliard fleet (unpacked cas kernel path);
  * Allen-Cahn fused fleet;
  * Gross-Pitaevskii Strang fleet (XLA FFT path);
  * 32³ 3D Cahn-Hilliard batched spectral rollout;
  * the differentiable training path: value+grad of a fused cas macro vs
    the same gradient through the per-substep XLA stepper (the round-1
    fused kernels were forward-only; the measured ratio is the training
    speedup unlocked by the custom VJPs).

Prints exactly ONE JSON line; the leading keys keep the driver contract
(metric/value/unit/vs_baseline), extra keys carry the matrix.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

NUM_ENVS = 4096
GRID = 64
SUBSTEPS = 10
STEPS_PER_RUN = 100
TIMED_RUNS = 3

# Public per-chip peak numbers: (dense bf16 FLOP/s, HBM bytes/s).
PEAKS = {
    "v5e": (394e12, 819e9),
    "v5 lite": (394e12, 819e9),
    "v5p": (459e12, 2765e9),
    "v4": (275e12, 1228e9),
    "v6e": (918e12, 1640e9),
    "v6 lite": (918e12, 1640e9),
}


def _device_peaks():
    kind = jax.devices()[0].device_kind.lower()
    for key, peaks in PEAKS.items():
        if key in kind:
            return peaks, jax.devices()[0].device_kind
    return (None, None), jax.devices()[0].device_kind


def _rollout_rate(env, num_envs, steps_per_run, timed_runs=TIMED_RUNS, key0=0):
    """env-steps/s of a random-policy on-device rollout (donated state)."""

    def policy(obs, key):
        return jax.random.uniform(
            key, (num_envs, 1), minval=-1.0, maxval=1.0, dtype=jnp.float32
        )

    run = env.make_rollout(policy, steps_per_run)
    state, _ = env.reset(jax.random.PRNGKey(key0))
    state, rewards, terms = run(state, jax.random.PRNGKey(key0 + 1))
    jax.block_until_ready(rewards)

    t0 = time.perf_counter()
    for i in range(timed_runs):
        state, rewards, terms = run(state, jax.random.PRNGKey(key0 + 2 + i))
    # NOTE: block_until_ready does not reliably block on remote-relay TPU
    # runtimes; force completion with a scalar fetch inside the timed region.
    _ = float(jnp.sum(rewards))
    elapsed = time.perf_counter() - t0
    if not bool(jnp.isfinite(rewards).all()):
        return None, elapsed
    return num_envs * steps_per_run * timed_runs / elapsed, elapsed


def _cas_substep_flops(H, W):
    """FLOPs per env per cas substep: 2 separable transforms (fwd of mu(u),
    inverse of the increment), each two matmuls contracting depth ph*H /
    pw*W over the packed layout -> 2 * 2*H*W*(HP+WP)."""
    HP = max(H, 128) if H <= 128 else H
    WP = max(W, 128) if W <= 128 else W
    if H < 128:
        HP = (128 // H) * H
    if W < 128:
        WP = (128 // W) * W
    return 2 * (2 * H * W * (HP + WP))


def bench_flagship(platform):
    from pde_opt_tpu.envs.presets import make_cahn_hilliard_control_env

    num_envs = NUM_ENVS if platform != "cpu" else 512
    steps = STEPS_PER_RUN if platform != "cpu" else 20
    derivs = "pallas" if platform != "cpu" else "fd"
    spectral = "fused" if platform != "cpu" else "fft"
    env = make_cahn_hilliard_control_env(
        num_envs=num_envs, grid_size=GRID, substeps=SUBSTEPS, derivs=derivs,
        vectorized_control=True, spectral_solve=spectral,
    )
    rate, _ = _rollout_rate(env, num_envs, steps)
    return rate, num_envs


def bench_ch128(platform):
    if platform == "cpu":
        return None
    from pde_opt_tpu.envs.presets import make_cahn_hilliard_control_env

    env = make_cahn_hilliard_control_env(
        num_envs=1024, grid_size=128, substeps=SUBSTEPS, derivs="pallas",
        vectorized_control=True, spectral_solve="fused",
    )
    rate, _ = _rollout_rate(env, 1024, 50, key0=10)
    return rate


def bench_ch256(platform):
    """256² (the reference's largest exercised rollout) on the fused kernel:
    depth-256 cas matmuls, no env packing."""
    if platform == "cpu":
        return None
    import time as _time

    from pde_opt_tpu.ops.cas_spectral import make_ch_cas_fused_macro

    B, N, S = 256, 256, SUBSTEPS
    u = (0.5 + 0.01 * jax.random.normal(jax.random.PRNGKey(60), (B, N, N))
         ).astype(jnp.float32)
    kap = jnp.full((B,), 4e-3, jnp.float32)
    macro = jax.jit(make_ch_cas_fused_macro(
        lambda c: c**3 - c, N, N, 0.01, 0.01, 1.0, 1e-4, S))
    out = macro(u, kap)
    _ = float(jnp.sum(out))
    t0 = _time.perf_counter()
    runs = 20
    for _i in range(runs):
        out = macro(out, kap)
    _ = float(jnp.sum(out))
    dt = _time.perf_counter() - t0
    if not bool(jnp.isfinite(out).all()):
        return None
    return B * S * runs / dt


def bench_ac64(platform):
    if platform == "cpu":
        return None
    from pde_opt_tpu.envs.presets import make_allen_cahn_control_env

    env = make_allen_cahn_control_env(
        num_envs=NUM_ENVS, grid_size=GRID, substeps=SUBSTEPS,
        spectral_solve="fused",
    )
    rate, _ = _rollout_rate(env, NUM_ENVS, 50, key0=20)
    return rate


def bench_bv48(platform):
    """Butler-Volmer charging fleet: fused Pallas RK4 kernel vs the XLA RK4
    path at the SAME 64² grid (the preset default), plus the XLA path at its
    best-case 48² grid for context (at 64² XLA falls off an in-scan fusion
    cliff, see docs/performance.md)."""
    if platform == "cpu":
        return None
    from pde_opt_tpu.envs import make_butler_volmer_control_env

    out = {}
    for key, method, grid in (("fused_64", "fused", 64),
                              ("xla_64", "rk4", 64),
                              ("xla_48", "rk4", 48)):
        env = make_butler_volmer_control_env(num_envs=2048, grid_size=grid,
                                             substeps=SUBSTEPS, method=method)
        rate, _ = _rollout_rate(env, 2048, 40, key0=80)
        if rate:
            out[key] = rate
    return out or None


def bench_sbm_bv(platform):
    """Smoothed-boundary galvanostatic BV charging fleet (XLA RK4 path —
    psi-dependent stencils are not circular convolutions, so no cas
    kernel applies)."""
    if platform == "cpu":
        return None
    from pde_opt_tpu.envs import make_sbm_butler_volmer_control_env

    env = make_sbm_butler_volmer_control_env(num_envs=1024, grid_size=64,
                                             substeps=SUBSTEPS)
    rate, _ = _rollout_rate(env, 1024, 40, key0=90)
    return rate


def bench_gpe64(platform):
    """GPE Strang fleet: fused cas kernel vs merged-FFT path."""
    if platform == "cpu":
        return None
    from pde_opt_tpu.envs.presets import make_gpe_control_env

    out = {}
    for mode in ("fused", "fft"):
        env = make_gpe_control_env(
            num_envs=1024, grid_size=GRID, substeps=SUBSTEPS,
            spectral_solve=mode,
        )
        rate, _ = _rollout_rate(env, 1024, 50, key0=30)
        out[mode] = rate
    return out


def bench_gpe_rot(platform):
    """Rotating-frame GPE via DirectionalSplitting: batched imaginary-time
    field-substeps/s at 64², plus a vortex census of the rotating ground
    state (the capability the reference defines but ships no solver for)."""
    if platform == "cpu":
        return None
    from pde_opt_tpu.grid import Domain
    from pde_opt_tpu.models.gross_pitaevskii import GPE2DTSRot
    from pde_opt_tpu.ops.integrate import evolve
    from pde_opt_tpu.ops.steppers import DirectionalSplitting
    from pde_opt_tpu.utils import density, initialize_Psi
    from pde_opt_tpu.utils.rl import vortex_winding

    B, N, L, dt, n_sub = 512, GRID, 20.0, 2e-4, 50
    domain = Domain((N, N), ((-L / 2, L / 2), (-L / 2, L / 2)))
    eq = GPE2DTSRot(domain, 500.0, 0.0, 0.9)
    stepper = DirectionalSplitting(eq.A_terms, eq.B_terms, domain.dx[0],
                                   time_scale=-1j)

    # Everything complex-valued must run under jit: the axon relay's eager
    # path is UNIMPLEMENTED for complex ops (incl. iota/abs at setup time).
    @jax.jit
    def build():
        psi0 = initialize_Psi(N, width=14, vortexnumber=1)
        psi0 = psi0 / jnp.sqrt(jnp.sum(density(psi0)) * domain.dx[0] ** 2)
        return jnp.broadcast_to(psi0, (B, N, N))

    fetch_abs_sum = jax.jit(lambda y: jnp.sum(jnp.abs(y)))

    run = jax.jit(lambda y: evolve(stepper, lambda s, t: s, y, 0.0, dt, n_sub))
    y = run(build())
    _ = float(fetch_abs_sum(y))
    t0 = time.perf_counter()
    runs = 10
    for _i in range(runs):
        y = run(y)
    _ = float(fetch_abs_sum(y))
    dtime = time.perf_counter() - t0
    if not bool(jax.jit(lambda y: jnp.isfinite(y.real).all())(y)):
        return None
    thresh = 0.05 * float(jax.jit(lambda y: jnp.max(jnp.abs(y[0])))(y))
    n_int = np.asarray(jax.device_get(
        jax.jit(lambda y: vortex_winding(y[0], amp_thresh=thresh))(y)))
    return {"field_substeps_per_s": round(B * n_sub * runs / dtime, 1),
            "num_vortices": int((n_int != 0).sum())}


def bench_ch3d(platform):
    """Batched 32³ rollouts: XLA-rfft SIF vs the cas-matmul 3D macro."""
    if platform == "cpu":
        return None
    from pde_opt_tpu.grid import Domain
    from pde_opt_tpu.models.cahn_hilliard import CahnHilliard3DPeriodic
    from pde_opt_tpu.ops.cas3d import make_ch3d_cas_macro
    from pde_opt_tpu.ops.integrate import evolve
    from pde_opt_tpu.ops.steppers import SemiImplicitFourierSpectral
    from pde_opt_tpu.utils.compat import prepare_solver_params

    B, N = 256, 32
    L = 0.01 * N
    domain = Domain((N, N, N), ((-L / 2, L / 2),) * 3, "dimensionless")
    eq = CahnHilliard3DPeriodic(
        domain, 0.002, lambda c: c**3 - c, lambda c: jnp.ones_like(c),
        derivs="fourier",
    )
    solver = SemiImplicitFourierSpectral(
        **prepare_solver_params(SemiImplicitFourierSpectral, {"A": 0.5}, eq)
    )
    n_sub = 50
    h = L / N
    macro = make_ch3d_cas_macro(lambda c: c**3 - c, N, N, N, h, h, h,
                                1.0, 5e-7, n_sub)

    fft_run = jax.jit(lambda y: evolve(solver, eq.rhs, y, 0.0, 5e-7, n_sub))
    cas_run = jax.jit(lambda y: macro(y, 0.002))

    def rate(run, runs):
        y = 0.5 + 0.05 * jax.random.normal(
            jax.random.PRNGKey(40), (B, N, N, N), jnp.float32
        )
        y = run(y)
        _ = float(jnp.sum(y))
        t0 = time.perf_counter()
        for _i in range(runs):
            y = run(y)
        _ = float(jnp.sum(y))
        dt = time.perf_counter() - t0
        if not bool(jnp.isfinite(y).all()):
            return None
        return B * n_sub * runs / dt

    return {"fft": rate(fft_run, 3), "cas": rate(cas_run, 10)}


def bench_ppo(platform):
    """End-to-end PPO training rate: one jitted update = 64-step rollout
    over the fused 4096-env fleet + GAE + 2 epochs x 4 minibatches of
    clipped-surrogate conv-policy updates.

    Learner pipeline (round-3 rework of the round-2 434.8 ms update, which
    spent 93% of the chip on the conv policy over full-resolution 64²
    observations): 4x average-pooled 16² observations (the env owns
    ``state_to_observation_func``; reward/physics unchanged at 64²) and a
    bf16-compute policy.  Rollout length 64 (measured sweep
    ``scripts/sweep_ppo_T.py``: T=16 792k, T=32 785k, T=64 878k trained
    env-steps/s — longer rollouts amortize the per-update fixed cost; GAE
    quality improves with T, and T=64 is still short of SB3's n_steps=2048
    default).  Also reports the physics:learner time split — the
    random-policy rollout of the SAME env/obs config is the physics+obs
    floor; everything above it is the learner."""
    if platform == "cpu":
        return None
    import time as _time

    from pde_opt_tpu.envs import make_cahn_hilliard_control_env
    from pde_opt_tpu.rl import ActorCriticConv, PPOConfig, ppo_train

    B = NUM_ENVS
    T = 64
    env = make_cahn_hilliard_control_env(
        num_envs=B, grid_size=GRID, substeps=SUBSTEPS, derivs="pallas",
        vectorized_control=True, spectral_solve="fused", obs_downsample=4,
    )
    net = ActorCriticConv(action_dim=1, channels=(16, 32), features=64,
                          compute_dtype=jnp.bfloat16,
                          key=jax.random.PRNGKey(70))
    cfg = PPOConfig(rollout_steps=T, epochs=2, minibatches=4, lr=3e-4)
    times = []
    ppo_train(env, net, cfg, num_updates=8, key=jax.random.PRNGKey(71),
              log_fn=lambda u, m: times.append(_time.perf_counter()))
    if len(times) < 4:
        return None
    dt = (times[-1] - times[1]) / (len(times) - 2)   # steady-state

    # Physics+obs floor: random-policy rollout of the same env, same T.
    phys_rate, _ = _rollout_rate(env, B, T, timed_runs=6, key0=72)
    out = {"trained_env_steps_per_s": round(T * B / dt, 1),
           "update_ms": round(1e3 * dt, 1)}
    if phys_rate:
        phys_ms = 1e3 * T * B / phys_rate
        out["physics_ms"] = round(phys_ms, 1)
        out["learner_ms"] = round(1e3 * dt - phys_ms, 1)
        out["physics_share"] = round(phys_ms / (1e3 * dt), 3)
    return out


def bench_train_grad(platform):
    """Training-path throughput: value+grad of a 10-substep macro, fused cas
    custom-VJP vs per-substep XLA rfft stepper.  Returns (fused, xla) in
    grad-env-substeps/s."""
    if platform == "cpu":
        return None, None
    from pde_opt_tpu.grid import Domain
    from pde_opt_tpu.ops.cas_spectral import make_ch_cas_fused_macro
    from pde_opt_tpu.ops.integrate import evolve
    from pde_opt_tpu.ops.steppers import SemiImplicitFourierSpectral
    from pde_opt_tpu.utils.compat import prepare_solver_params
    from pde_opt_tpu.models.cahn_hilliard import CahnHilliard2DPeriodic

    B, N, n_sub = 1024, GRID, SUBSTEPS
    mu = lambda c: c**3 - c
    u = 0.5 + 0.01 * jax.random.normal(jax.random.PRNGKey(50), (B, N, N),
                                       jnp.float32)
    kap = jnp.full((B,), 0.004, jnp.float32)
    macro = make_ch_cas_fused_macro(mu, N, N, 0.01, 0.01, 1.0, 1e-3, n_sub)

    # Scalar-only outputs: value + summed grad in ONE jitted function, so
    # the timed loop moves no per-call arrays and a single trailing fetch
    # forces the whole sequence.
    def _scalarize(loss):
        vg = jax.value_and_grad(loss)

        @jax.jit
        def f(kk):
            v, g = vg(kk)
            return v + jnp.sum(g)

        return f

    fused_grad = _scalarize(lambda kk: jnp.sum(macro(u, kk) ** 2))

    L = 0.01 * N
    domain = Domain((N, N), ((-L / 2, L / 2), (-L / 2, L / 2)),
                    "dimensionless")

    def xla_loss(kk):
        eq = CahnHilliard2DPeriodic(
            domain, kk[:, None, None], mu, lambda c: jnp.ones_like(c),
            derivs="fd",
        )
        solver = SemiImplicitFourierSpectral(
            **prepare_solver_params(SemiImplicitFourierSpectral, {"A": 1.0}, eq)
        )
        y1 = evolve(solver, eq.rhs, u, 0.0, 1e-3, n_sub)
        return jnp.sum(y1**2)

    xla_grad = _scalarize(xla_loss)

    def rate(fn):
        out = fn(kap)
        _ = float(out)                     # sync once after warmup
        t0 = time.perf_counter()
        runs = 10
        out = None
        for _i in range(runs):
            out = fn(kap)
        # ONE scalar fetch forces the whole timed sequence (per-iteration
        # fetches would measure relay round-trip latency, ~25 ms each).
        _ = float(out)
        dt = time.perf_counter() - t0
        return B * n_sub * runs / dt

    return rate(fused_grad), rate(xla_grad)


def main():
    platform = jax.devices()[0].platform
    (peak_flops, peak_bw), device_kind = _device_peaks()

    rate, num_envs = bench_flagship(platform)
    if rate is None:
        print(json.dumps({"metric": "BENCH INVALID: non-finite rewards",
                          "value": 0.0, "unit": "env-steps/s",
                          "vs_baseline": 0.0}))
        sys.exit(1)

    out = {
        "metric": (
            f"env-steps/s, {GRID}x{GRID} Cahn-Hilliard control env "
            f"({num_envs} envs, {SUBSTEPS} SIF substeps/step, {platform})"
        ),
        "value": round(rate, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(rate / 1e6, 4),
        "device": device_kind,
    }

    if platform != "cpu":
        # Roofline accounting for the flagship kernel.
        f_sub = _cas_substep_flops(GRID, GRID)
        achieved_flops = rate * SUBSTEPS * f_sub
        # HBM: the macro reads+writes the field once per macro-step; obs /
        # reward / reset add ~2 more field passes.
        bytes_per_step = 4 * GRID * GRID * 4
        achieved_bw = rate * bytes_per_step
        out["flops_model"] = {
            "flops_per_env_substep": f_sub,
            "achieved_tflops": round(achieved_flops / 1e12, 1),
            "mfu": (round(achieved_flops / peak_flops, 3)
                    if peak_flops else None),
            "achieved_hbm_gbps": round(achieved_bw / 1e9, 1),
            "hbm_util": (round(achieved_bw / peak_bw, 4)
                         if peak_bw else None),
        }
        configs = {}
        r = bench_ch128(platform)
        if r:
            f128 = _cas_substep_flops(128, 128)
            configs["ch_128x128_1024envs"] = {
                "env_steps_per_s": round(r, 1),
                "mfu": (round(r * SUBSTEPS * f128 / peak_flops, 3)
                        if peak_flops else None),
            }
        r = bench_ch256(platform)
        if r:
            configs["ch_256x256_256batch_substeps"] = {
                "env_substeps_per_s": round(r, 1)}
        r = bench_ac64(platform)
        if r:
            configs["ac_64x64_4096envs_fused"] = {
                "env_steps_per_s": round(r, 1)}
        r = bench_bv48(platform)
        if r:
            configs["bv_2048envs"] = {
                f"{k}_env_steps_per_s": round(v, 1) for k, v in r.items()
            }
        r = bench_sbm_bv(platform)
        if r:
            configs["sbm_bv_64x64_1024envs"] = {
                "env_steps_per_s": round(r, 1)}
        r = bench_gpe64(platform)
        if r:
            configs["gpe_strang_64x64_1024envs"] = {
                f"{k}_env_steps_per_s": round(v, 1)
                for k, v in r.items() if v
            }
        r = bench_gpe_rot(platform)
        if r:
            configs["gpe_rot_64x64_512batch"] = r
        r = bench_ch3d(platform)
        if r:
            configs["ch3d_32cubed_256batch_substeps"] = {
                f"{k}_field_substeps_per_s": round(v, 1)
                for k, v in r.items() if v
            }
        r = bench_ppo(platform)
        if r:
            configs["ppo_64x64_4096envs"] = r
        fused_g, xla_g = bench_train_grad(platform)
        if fused_g and xla_g:
            configs["train_grad_64x64_1024envs"] = {
                "fused_grad_env_substeps_per_s": round(fused_g, 1),
                "xla_grad_env_substeps_per_s": round(xla_g, 1),
                "fused_vs_xla_speedup": round(fused_g / xla_g, 2),
            }
        out["configs"] = configs

    print(json.dumps(out))


if __name__ == "__main__":
    main()
