"""In-jit probes v2: time(scan 64 steps) - time(scan 32 steps) / 32."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")


def force(x):
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf)[:1] if hasattr(leaf, "shape") and leaf.ndim else np.asarray(leaf)
    return x


def injit_time(step, x, r1=16, r2=48, outer=3):
    def many(reps):
        @jax.jit
        def f(x):
            def body(c, _):
                return step(c), None
            y, _ = jax.lax.scan(body, x, None, length=reps)
            return y
        return f

    f1, f2 = many(r1), many(r2)
    force(f1(x)); force(f2(x))
    ts = []
    for f in (f1, f2):
        t0 = time.perf_counter()
        for _ in range(outer):
            force(f(x))
        ts.append((time.perf_counter() - t0) / outer)
    return (ts[1] - ts[0]) / (r2 - r1)


def triv_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1.0


def pallas_triv(x):
    return pl.pallas_call(
        triv_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def pallas_grid(nsteps, block=(8, 128)):
    def f(x):
        rows = x.shape[0] // block[0]
        return pl.pallas_call(
            triv_kernel,
            grid=(nsteps,),
            in_specs=[pl.BlockSpec(block, lambda i: (i % rows, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(block, lambda i: (i % rows, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x)
    return f


x_small = jnp.zeros((8, 128), jnp.float32)
x_mid = jnp.zeros((2048, 128), jnp.float32)
x_big = jnp.zeros((32768, 128), jnp.float32)  # 16MB

print(f"xla add (8,128):          {injit_time(lambda x: x + 1.0, x_small)*1e6:9.1f} us")
print(f"xla add (32768,128):      {injit_time(lambda x: x + 1.0, x_big)*1e6:9.1f} us")
print(f"pallas triv (8,128):      {injit_time(pallas_triv, x_small)*1e6:9.1f} us")
print(f"pallas triv (2048,128):   {injit_time(pallas_triv, x_mid)*1e6:9.1f} us")
print(f"pallas  256-grid:         {injit_time(pallas_grid(256), x_mid)*1e6:9.1f} us")
print(f"pallas 4096-grid:         {injit_time(pallas_grid(4096), x_mid)*1e6:9.1f} us")
print(f"pallas 4096-grid big-blk: {injit_time(pallas_grid(4096, (64, 128)), x_big)*1e6:9.1f} us")
