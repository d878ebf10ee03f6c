"""Per-block D-trunk attribution: which block sinks the 512²/1024² TF/s.

step_breakdown_probe shows the whole D grad at ~32 TF/s (512²) / ~12 TF/s
(1024²) vs ~98 TF/s at 256² — this probe times each DiscriminatorBlock
(and from_rgb) fwd and fwd+bwd in isolation at the flagship recipe
geometries so the sink is a named block, not a vibe. Follows the bench's
axon-safe timing (pipeline N, block on a materialized scalar).

Usage: python -m tools.dblock_probe [--res 512] [--batch 4] [--reps 20]
"""

from __future__ import annotations

import argparse
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from lcgan_tpu.models.discriminator import DiscriminatorBlock
from lcgan_tpu.ops.equalized import EqualizedConv2d
from lcgan_tpu.ops.filters import leaky_relu


def timeit(fn, *args, n=20):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1000


def block_flops(b, res, cin, cout):
    """Analytic fwd FLOPs of one DiscriminatorBlock (conv0 k3 cin->cin @res,
    conv1 k3 s2 cin->cout @res, skip 1x1 cin->cout @res/2)."""
    f = 0
    f += b * res * res * 9 * cin * cin * 2            # conv0
    f += b * (res // 2) * (res // 2) * 9 * cin * cout * 2  # conv1 (s2)
    f += b * (res // 2) * (res // 2) * cin * cout * 2      # skip 1x1
    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--dtype", type=str, default="bfloat16")
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/lcgan_jax")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except RuntimeError:
        pass

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    base_nf = 32 if args.res == 1024 else 64 if args.res == 512 else 128
    nb = int(math.log2(args.res)) - 2
    rng = np.random.default_rng(0)

    # from_rgb
    frgb = EqualizedConv2d(features=base_nf, kernel_size=1, dtype=dtype)
    x0 = jnp.asarray(rng.uniform(-1, 1, (args.batch, args.res, args.res, 3)), dtype)
    v = frgb.init(jax.random.PRNGKey(0), x0)
    f_fwd = jax.jit(lambda v, x: leaky_relu(frgb.apply(v, x), 0.2))
    t = timeit(f_fwd, v, x0, n=args.reps)
    fl = args.batch * args.res * args.res * 3 * base_nf * 2
    print(f"from_rgb ({args.res}² 3->{base_nf})      fwd {t:7.2f} ms  {fl/t/1e9:6.1f} TF/s")

    cin = base_nf
    res = args.res
    for i in range(nb):
        cout = min(base_nf * 2 ** (i + 1), 512)
        blk = DiscriminatorBlock(features=cout, dtype=dtype)
        x = jnp.asarray(rng.uniform(-1, 1, (args.batch, res, res, cin)), dtype)
        v = blk.init(jax.random.PRNGKey(i), x)

        fwd = jax.jit(lambda v, x, blk=blk: blk.apply(v, x))

        def loss(v, x, blk=blk):
            return jnp.sum(blk.apply(v, x).astype(jnp.float32) ** 2)

        grad = jax.jit(jax.grad(loss, argnums=(0, 1)))
        t_f = timeit(fwd, v, x, n=args.reps)
        t_g = timeit(grad, v, x, n=args.reps)
        fl = block_flops(args.batch, res, cin, cout)
        print(
            f"block_{i} ({res}² c{cin}->c{cout})  fwd {t_f:7.2f} ms {fl/t_f/1e9:6.1f} TF/s"
            f" | fwd+bwd {t_g:7.2f} ms {3*fl/t_g/1e9:6.1f} TF/s"
        )
        cin = cout
        res //= 2


if __name__ == "__main__":
    main()
