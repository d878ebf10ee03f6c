"""Per-block warp cost, fused vs banded, across the 256² generator's blocks.

The flagship 256² generator warps at 8/16/32/64 (c512), 128 (c256), and
256 (c128). The fused kernel wins big at the top block; this probe checks
whether the small maps pay more in kernel/transpose overhead than the
banded scan costs outright.
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

SHAPES = [
    (8, 8, 512),
    (8, 16, 512),
    (8, 32, 512),
    (8, 64, 512),
    (8, 128, 256),
    (8, 256, 128),
]


def timeit(fn, *args, n=20):
    out = fn(*args)
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
    rng = np.random.default_rng(0)
    for b, hw, c in SHAPES:
        m = max_warp_displacement(hw, 0.1)
        x = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.bfloat16)
        flow = jnp.asarray(rng.uniform(-1, 1, (b, hw, hw, 2)), jnp.float32)
        grid = identity_like_coordinates(b, hw, hw) + flow * 0.1
        cot = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.bfloat16)

        fns = {}
        for name, f in (("banded", grid_sample_bicubic_banded), ("fused", grid_sample_bicubic_pallas)):
            fwd = jax.jit(lambda x_, g_, f=f: f(x_, g_, m))

            def loss(x_, g_, cot_, f=f):
                return jnp.sum((f(x_, g_, m) * cot_).astype(jnp.float32))

            fns[name] = (fwd, jax.jit(jax.grad(loss, argnums=(0, 1))))

        tb = timeit(fns["banded"][0], x, grid)
        tf = timeit(fns["fused"][0], x, grid)
        tbg = timeit(fns["banded"][1], x, grid, cot, n=8)
        tfg = timeit(fns["fused"][1], x, grid, cot, n=8)
        print(
            f"{hw:5d}² c{c:3d} M={m:3d} | fwd banded {tb:7.2f} fused {tf:7.2f}"
            f" | fwd+bwd banded {tbg:7.2f} fused {tfg:7.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
