"""In-jit cost probes: K dependency-chained reps inside ONE jit, divide by K."""
import sys, time, functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

REPS = 32


def force(x):
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf)[:1] if hasattr(leaf, "shape") and leaf.ndim else np.asarray(leaf)
    return x


def injit_time(step, x, reps=REPS, outer=3):
    """time of one `step` application, measured as K chained inside one jit."""
    @jax.jit
    def many(x):
        def body(c, _):
            return step(c), None
        y, _ = jax.lax.scan(body, x, None, length=reps)
        return y

    @jax.jit
    def one(x):
        return step(x)

    force(many(x)); force(one(x))
    t0 = time.perf_counter()
    for _ in range(outer):
        force(many(x))
    t_many = (time.perf_counter() - t0) / outer
    t0 = time.perf_counter()
    for _ in range(outer):
        force(one(x))
    t_one = (time.perf_counter() - t0) / outer
    return (t_many - t_one) / (reps - 1)


def triv_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1.0


def pallas_triv(x):
    return pl.pallas_call(
        triv_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def pallas_grid(nsteps):
    def f(x):
        return pl.pallas_call(
            triv_kernel,
            grid=(nsteps,),
            in_specs=[pl.BlockSpec((8, 128), lambda i: (i % (x.shape[0] // 8), 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i: (i % (x.shape[0] // 8), 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x)
    return f


x_small = jnp.zeros((8, 128), jnp.float32)
x_mid = jnp.zeros((2048, 128), jnp.float32)

print(f"in-jit xla add (8,128):        {injit_time(lambda x: x + 1.0, x_small)*1e6:9.1f} us")
print(f"in-jit pallas triv (8,128):    {injit_time(pallas_triv, x_small)*1e6:9.1f} us")
print(f"in-jit pallas triv (2048,128): {injit_time(pallas_triv, x_mid)*1e6:9.1f} us")
print(f"in-jit pallas 256-grid:        {injit_time(pallas_grid(256), x_mid)*1e6:9.1f} us")
print(f"in-jit pallas 4096-grid:       {injit_time(pallas_grid(4096), x_mid)*1e6:9.1f} us")

# sort cost at pair scale
for n, ops in ((1 << 21, 9), (1 << 21, 2), (1 << 20, 9)):
    key = jnp.zeros(n, jnp.int32)
    payload = [jnp.zeros(n, jnp.float32) for _ in range(ops - 1)]

    def sort_step(args):
        k = args[0]
        s = jax.lax.sort(list(args), num_keys=1)
        return tuple(jax.lax.optimization_barrier(s))

    t = injit_time(sort_step, tuple([key] + payload))
    print(f"in-jit sort {ops}-op n={n}:    {t*1e3:9.2f} ms")

# cumsum / searchsorted at pair scale
n = 1 << 21
xc = jnp.zeros(n, jnp.int32)
print(f"in-jit cumsum n=2M:            {injit_time(lambda x: jax.lax.optimization_barrier(jnp.cumsum(x)), xc)*1e3:9.2f} ms")
print(f"in-jit cummax n=2M:            {injit_time(lambda x: jax.lax.optimization_barrier(jax.lax.cummax(x)), xc)*1e3:9.2f} ms")
q = jnp.zeros(4096, jnp.int32)
print(f"in-jit searchsorted 4k/2M:     {injit_time(lambda x: jax.lax.optimization_barrier(jnp.searchsorted(xc, x)), q)*1e6:9.1f} us")
