"""Block-size sweep of the shipped CH cas macro (see profile_cas_stages.py
for the dispatch-cancelling slope method).  Larger env blocks raise the
matmul M dimension (M = bb4 * 128), amortizing MXU weight loads across the
four distinct transform matrices; too large starves the Pallas grid of
double-buffering overlap and eventually VMEM.

Usage: python scripts/profile_cas_block.py [--blocks 64,128,256,512,1024]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pde_opt_tpu.ops.cas_spectral import make_ch_cas_fused_macro
from scripts.profile_cas_stages import slope_time

E, G, SUB = 4096, 64, 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", default="64,128,256,512,1024")
    args = ap.parse_args()
    print("device:", jax.devices()[0], flush=True)
    key = jax.random.PRNGKey(0)
    u = 0.5 + 0.01 * jax.random.normal(key, (E, G, G), jnp.float32)
    kap = jnp.full((E,), 0.004, jnp.float32)

    for bb in [int(b) for b in args.blocks.split(",")]:
        try:
            macro = make_ch_cas_fused_macro(
                lambda c: c ** 3 - c, G, G, 0.01, 0.01, 1.0, 1e-3, SUB,
                block_envs=bb)
            t = slope_time(macro, u, kap)
            print(f"RESULT bb={bb:5d}  {t*1e3:7.3f} ms/macro  "
                  f"{E/t:12,.0f} env-steps/s", flush=True)
        except Exception as e:
            print(f"RESULT bb={bb:5d}  FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
