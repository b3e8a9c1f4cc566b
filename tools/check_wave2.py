"""Correctness check: wave2 (new vectorized kernel) vs jnp-cluster oracle."""
import sys
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from raytracer_tpu.scene.clusters import build_clusters
from raytracer_tpu.ops.cluster_traverse import cluster_closest_hit, cluster_any_hit
from raytracer_tpu.ops.wave2_traverse import wave2_closest_hit, wave2_any_hit
from traversal_bench import make_mesh, coherent_rays, incoherent_rays

n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 8192

rng = np.random.default_rng(7)
v0, e1, e2 = make_mesh(n_tris, rng)
cs = build_clusters(v0, e1, e2)
print(f"tris={v0.shape[0]} clusters={cs.num_clusters} supers={cs.num_supers}")

ok = True
for label, mk in (("coherent", coherent_rays), ("incoherent", incoherent_rays)):
    o, d = mk(n_rays, rng)
    tm = jnp.full(n_rays, 3.0e38)
    ct, ctri, cu, cv, covf = jax.jit(lambda o, d, t: cluster_closest_hit(cs, o, d, t))(o, d, tm)
    wt, wtri, wu, wv, wovf = jax.jit(lambda o, d, t: wave2_closest_hit(cs, o, d, t))(o, d, tm)
    # the oracle itself truncates at kmax=32 clusters and flags it; exclude
    # its honestly-reported overflow rays from the strict comparison
    cmp = (wtri == ctri) | covf
    agree = float(jnp.mean(cmp))
    t_close = float(jnp.mean(jnp.abs(jnp.where(ctri >= 0, wt - ct, 0.0)) < 1e-3))
    hits = float(jnp.mean(ctri >= 0))
    print(f"[{label}] closest: tri-agree={agree:.5f} t-agree={t_close:.5f} "
          f"hits={hits:.3f} ovf={float(jnp.mean(wovf)):.4f}")
    if agree < 1.0:
        bad = np.nonzero(np.asarray(~cmp))[0][:5]
        for i in bad:
            print(f"  ray {i}: oracle tri={int(ctri[i])} t={float(ct[i]):.5f} "
                  f"wave2 tri={int(wtri[i])} t={float(wt[i]):.5f}")
        ok = False

    t_sh = jnp.full(n_rays, 4.0)
    cocc, cao = jax.jit(lambda o, d, t: cluster_any_hit(cs, o, d, t))(o, d, t_sh)
    wocc, wsho = jax.jit(lambda o, d, t: wave2_any_hit(cs, o, d, t))(o, d, t_sh)
    aagree = float(jnp.mean((wocc == cocc) | cao))
    print(f"[{label}] any-hit: agree={aagree:.5f} occl={float(jnp.mean(cocc)):.3f}")
    if aagree < 1.0:
        ok = False

print("PASS" if ok else "FAIL")
