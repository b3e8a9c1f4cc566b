"""Round-4 design probes: pallas dispatch fixed cost, overlap stats, phase splits."""
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


def chain_time(fn, x, reps=20):
    """Dependency-chained timing: y = fn(y) reps times, force final."""
    y = force(fn(x))
    t0 = time.perf_counter()
    for _ in range(reps):
        y = fn(y)
    force(y)
    return (time.perf_counter() - t0) / reps


# --- 1. trivial pallas dispatch cost ---------------------------------------
def triv_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1.0


@jax.jit
def triv(x):
    return pl.pallas_call(
        triv_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


@jax.jit
def triv_grid(x):
    # 256-step grid version
    n = x.shape[0]
    return pl.pallas_call(
        triv_kernel,
        grid=(n // 8,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


@jax.jit
def xla_add(x):
    return x + 1.0


x = jnp.zeros((2048, 128), jnp.float32)
print(f"xla elementwise (2048,128): {chain_time(xla_add, x)*1e6:8.1f} us")
print(f"pallas trivial  (2048,128): {chain_time(triv, x)*1e6:8.1f} us")
print(f"pallas 256-grid (2048,128): {chain_time(triv_grid, x)*1e6:8.1f} us")

# --- 2. overlap distribution on the bench scene ----------------------------
from raytracer_tpu.scene.clusters import build_clusters
sys.path.insert(0, "tools")
from traversal_bench import make_mesh, coherent_rays, incoherent_rays

rng = np.random.default_rng(7)
v0, e1, e2 = make_mesh(200_000, rng)
cs = build_clusters(v0, e1, e2)
print(f"clusters={cs.num_clusters} supers={cs.num_supers}")


@jax.jit
def overlap_counts(sb, ox, oy, oz, dx, dy, dz):
    tiny = 1e-12
    inv = lambda d: 1.0 / jnp.where(jnp.abs(d) > tiny, d, jnp.where(d >= 0, tiny, -tiny))
    ix, iy, iz = inv(dx)[:, None], inv(dy)[:, None], inv(dz)[:, None]
    o = (ox[:, None], oy[:, None], oz[:, None])
    t1x = (sb[None, :, 0] - o[0]) * ix
    t2x = (sb[None, :, 3] - o[0]) * ix
    t1y = (sb[None, :, 1] - o[1]) * iy
    t2y = (sb[None, :, 4] - o[1]) * iy
    t1z = (sb[None, :, 2] - o[2]) * iz
    t2z = (sb[None, :, 5] - o[2]) * iz
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)), jnp.minimum(t1z, t2z))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)), jnp.maximum(t1z, t2z))
    hit = tmax >= jnp.maximum(tmin, 0.0)
    return jnp.sum(hit, axis=1)

for label, mk in (("coherent", coherent_rays), ("incoherent", incoherent_rays)):
    o, d = mk(262144, rng)
    cnt = np.asarray(overlap_counts(cs.super_box, o.x, o.y, o.z, d.x, d.y, d.z))
    print(f"[{label}] super-overlaps/ray: mean={cnt.mean():.2f} p50={np.percentile(cnt,50):.0f} "
          f"p90={np.percentile(cnt,90):.0f} p99={np.percentile(cnt,99):.0f} max={cnt.max()}  "
          f"frac>16={np.mean(cnt>16):.3f} frac>8={np.mean(cnt>8):.3f} frac>4={np.mean(cnt>4):.3f}")
