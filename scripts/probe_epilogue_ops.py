"""TPU probe: Mosaic support for the env-epilogue ops.

Validates, before the flagship epilogue kernel is built on them:
  * elementwise comparison -> f32 mask (finite detection via u-u==0)
  * per-env-quadrant reductions to a small (bb4, ph, pw) stats block
  * f32 -> int32 -> uint8 convert + uint8 output block

Findings (TPU relay, 2026-08-21):
  * direct f32->uint8 cast: REJECTED by Mosaic ("unsupported cast");
    f32->int32->uint8 works.
  * broadcast (bb4,1,1)->(bb4,H,W) (sublanes AND lanes at once): REJECTED
    ("Broadcast in both sublanes and lanes"), and two chained
    single-axis broadcast_to calls get re-fused into one by lowering.
    => the epilogue kernel must NOT scrub in-kernel; emit stats + obs and
    leave the (rare) reset `where` outside.

Run on the TPU relay: python scripts/probe_epilogue_ops.py
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    H = W = 64
    ph = pw = 2
    HP, WP = ph * H, pw * W
    bb = 16
    bb4 = bb // (ph * pw)

    def kernel(u_ref, out_u8_ref, out_stats_ref):
        u = u_ref[:]                                  # (bb4, HP, WP) f32
        fin = (u - u == 0.0).astype(jnp.float32)      # 1.0 where finite

        def qscal(z):
            rows = [jnp.sum(z[:, i * H:(i + 1) * H, :], axis=1,
                            keepdims=True) for i in range(ph)]
            z2 = jnp.concatenate(rows, axis=1)
            cols = [jnp.sum(z2[:, :, j * W:(j + 1) * W], axis=2,
                            keepdims=True) for j in range(pw)]
            return jnp.concatenate(cols, axis=2)      # (bb4, ph, pw)

        uz = jnp.where(fin > 0.5, u, jnp.zeros_like(u))   # same-shape where
        s1 = qscal(uz)
        s2 = qscal(uz * uz)
        cnt = qscal(fin)
        out_stats_ref[:] = jnp.concatenate(
            [s1, s2, cnt], axis=1)                    # (bb4, 3*ph, pw)

        ob = jnp.clip(uz * 255.0, 0.0, 255.0)
        # Direct f32->uint8 is rejected by Mosaic; go through int32.
        out_u8_ref[:] = ob.astype(jnp.int32).astype(jnp.uint8)

    x = np.full((bb4, HP, WP), 0.25, np.float32)
    x[1, 3, 5] = np.nan                               # poisons env quadrant (0,0) of row 1
    x = jnp.asarray(x)

    out_u8, out_stats = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bb4, HP, WP), jnp.uint8),
            jax.ShapeDtypeStruct((bb4, 3 * ph, pw), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=jax.default_backend() != "tpu",
    )(x)

    got = jax.jit(lambda a, b: (a[0, 0, 0], a[1, 3, 5],
                                b[1, 0, 0], b[0, 0, 0],
                                b[1, 2, 0], b[1, 4, 0]))(out_u8, out_stats)
    got = [np.asarray(v) for v in jax.device_get(got)]
    print("u8 healthy (want 63):", got[0])
    print("u8 NaN->0 (want 0):", got[1])
    print("sum poisoned quadrant (want 0.25*4095 = 1023.75):", got[2])
    print("sum healthy (want 0.25*4096 = 1024):", got[3])
    print("sumsq poisoned (want 0.0625*4095 = 255.9375):", got[4])
    print("cnt poisoned (want 4095):", got[5])
    ok = (int(got[0]) == 63 and int(got[1]) == 0
          and abs(float(got[2]) - 1023.75) < 1e-2
          and abs(float(got[3]) - 1024.0) < 1e-2
          and abs(float(got[4]) - 255.9375) < 1e-2
          and abs(float(got[5]) - 4095.0) < 1e-2)
    print("PROBE_RESULT:", "OK" if ok else "MISMATCH")


if __name__ == "__main__":
    main()
