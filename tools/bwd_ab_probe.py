"""A/B the warp op fwd+bwd: dynamic band vs static, at the general-kernel shapes.

Usage: python -m tools.bwd_ab_probe [--chain 12] [--reps 4] [--scale 0.3]
"""
import argparse, time
import jax, jax.numpy as jnp, numpy as np
from lcgan_tpu.ops.grid_sample import identity_like_coordinates, max_warp_displacement
from lcgan_tpu.ops.warp_pallas import grid_sample_bicubic_pallas

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/lcgan_jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except RuntimeError:
    pass

ap = argparse.ArgumentParser()
ap.add_argument("--chain", type=int, default=12)
ap.add_argument("--reps", type=int, default=4)
ap.add_argument("--scale", type=float, default=0.3)
args = ap.parse_args()
print(f"backend={jax.default_backend()} scale={args.scale}", flush=True)

for b, hw, c in [(8, 128, 256), (8, 256, 128)]:
    m = max_warp_displacement(hw, 0.1)
    rng = np.random.default_rng(hw + c)
    x = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.bfloat16)
    grid = identity_like_coordinates(b, hw, hw) + jnp.asarray(
        rng.uniform(-1, 1, (b, hw, hw, 2)), jnp.float32) * 0.1 * args.scale

    def timeit(fn, *a):
        out = fn(*a)
        _ = float(jnp.sum(jax.tree.leaves(out)[0][..., :1].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(*a)
        _ = float(jnp.sum(jax.tree.leaves(out)[0][..., :1].astype(jnp.float32)))
        return (time.perf_counter() - t0) / args.reps / args.chain * 1000

    # m_h emulates round 3's cond fast branch: a statically compiled
    # reduced-bound kernel (valid only while the flow fits, as here)
    m_h = max(4, m // 2 + 1)
    res = {}
    for name, mm, dyn in (("static", m, False), ("st-mh", m_h, False), ("dyn", m, True)):
        @jax.jit
        def bwd_chain(x, grid, mm=mm, dyn=dyn):
            def loss(x_, g_):
                y, gg = x_, g_
                for _ in range(args.chain):
                    y = grid_sample_bicubic_pallas(y, gg, mm, False, True, dyn)
                return jnp.sum(y.astype(jnp.float32))
            dx, dg = jax.grad(loss, argnums=(0, 1))(x, grid)
            return dx
        res[name] = timeit(bwd_chain, x, grid)
    print(f"{hw:5d}^2 c{c} b{b} M={m} fwd+bwd/app: static {res['static']:7.3f} | "
          f"st-mh({m_h}) {res['st-mh']:7.3f} | dyn {res['dyn']:7.3f} ms "
          f"({res['dyn']/res['static']:.2f}x vs static, {res['dyn']/res['st-mh']:.2f}x vs mh)", flush=True)
