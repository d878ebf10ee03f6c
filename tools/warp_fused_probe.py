"""Measure the fused Pallas warp on real TPU at the flagship block shapes.

Baseline (banded XLA scan, measured round 1, DESIGN.md): fwd / fwd+bwd
31/108 ms @256²c128b8, 106/990 @512²c64b8, 367/2939 @1024²c32b4 (bf16).
Banded-grad jits are too large for the axon remote-compile tunnel at probe
scale, so this probe times the fused kernel and cross-checks values against
the banded forward only.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from lcgan_tpu.ops.grid_sample import (
    grid_sample_bicubic_banded,
    identity_like_coordinates,
    max_warp_displacement,
)
from lcgan_tpu.ops.warp_pallas import grid_sample_bicubic_pallas


def timeit(fn, *args, n=6):
    out = fn(*args)
    # axon: materialize a scalar to be sure execution finished
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1000


def main():
    import jax as _jax
    try:
        _jax.config.update("jax_compilation_cache_dir", "/root/.cache/lcgan_jax")
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except RuntimeError:
        pass
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    for b, hw, c in [(8, 256, 128), (8, 512, 64), (4, 1024, 32)]:
        m = max_warp_displacement(hw, 0.1)
        x = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.bfloat16)
        flow = jnp.asarray(rng.uniform(-1, 1, (b, hw, hw, 2)), jnp.float32)
        grid = identity_like_coordinates(b, hw, hw) + flow * 0.1
        cot = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.bfloat16)

        banded = jax.jit(lambda x_, g_: grid_sample_bicubic_banded(x_, g_, m))
        fused = jax.jit(lambda x_, g_: grid_sample_bicubic_pallas(x_, g_, m))

        def loss(x_, g_, cot_):
            return jnp.sum((grid_sample_bicubic_pallas(x_, g_, m) * cot_).astype(jnp.float32))

        fused_g = jax.jit(jax.grad(loss, argnums=(0, 1)))

        ob = banded(x, grid).astype(jnp.float32)
        of = fused(x, grid).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(ob - of))) / (float(jnp.max(jnp.abs(ob))) + 1e-6)
        t_bf = timeit(banded, x, grid)
        t_ff = timeit(fused, x, grid)
        print(
            f"{hw:5d}² c{c:3d} b{b} M={m:3d} | fwd banded {t_bf:8.1f} fused {t_ff:8.1f} ms"
            f" | rel err {err:.2e}",
            flush=True,
        )
        t_fg = timeit(fused_g, x, grid, cot, n=3)
        print(f"        fused fwd+bwd {t_fg:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
