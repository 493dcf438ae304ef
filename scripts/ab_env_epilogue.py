"""Same-window A/B of the fused env epilogue for any preset fleet.

Usage (TPU):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_env_epilogue.py ac
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_env_epilogue.py gpe
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_env_epilogue.py ch
"""

import sys
import time

import jax
import jax.numpy as jnp

PRESETS = {
    "ch": ("make_cahn_hilliard_control_env",
           dict(num_envs=4096, grid_size=64, substeps=10, derivs="pallas",
                vectorized_control=True, spectral_solve="fused"), 100),
    "ac": ("make_allen_cahn_control_env",
           dict(num_envs=4096, grid_size=64, substeps=10,
                vectorized_control=True, spectral_solve="fused"), 50),
    "gpe": ("make_gpe_control_env",
            dict(num_envs=1024, grid_size=64, substeps=10,
                 spectral_solve="fused"), 50),
}


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "ac"
    fn_name, kw, steps = PRESETS[name]
    import pde_opt_tpu.envs.presets as P

    make = getattr(P, fn_name)
    B = kw["num_envs"]

    def rate_for(ep, key0):
        env = make(**kw, fused_epilogue=ep)

        def policy(obs, key):
            return jax.random.uniform(key, (B, 1), minval=-1.0, maxval=1.0,
                                      dtype=jnp.float32)

        run = env.make_rollout(policy, steps)
        state, _ = env.reset(jax.random.PRNGKey(key0))
        state, rewards, _ = run(state, jax.random.PRNGKey(key0 + 1))
        _ = float(jnp.sum(rewards))
        t0 = time.perf_counter()
        for i in range(3):
            state, rewards, _ = run(state, jax.random.PRNGKey(key0 + 2 + i))
        _ = float(jnp.sum(rewards))
        dt = time.perf_counter() - t0
        ok = bool(jnp.isfinite(rewards).all())
        return B * steps * 3 / dt, ok

    res = {}
    for tag, ep, key0 in (("off", False, 3), ("on", True, 11),
                          ("off2", False, 23), ("on2", True, 31)):
        r, ok = rate_for(ep, key0)
        res[tag] = r
        print(f"RESULT {name} {tag}: {r:,.0f} env-steps/s finite={ok}",
              flush=True)
    on = max(res["on"], res["on2"])
    off = max(res["off"], res["off2"])
    print(f"RESULT {name} speedup: {on / off:.3f}x", flush=True)


if __name__ == "__main__":
    main()
