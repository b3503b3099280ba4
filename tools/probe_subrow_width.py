"""Offline measurement of the 32-lane sub-row escape (VERDICT r4 item 1's
booked per-ray-granularity route, "count tiles offline first").

The binned kernel's measured bottleneck is the per-live-(sub-row x
cluster)-pair VPU post-pass; at 128-lane sub-rows the pair count is the
UNION of 128 rays' cluster sets (r4: 5.6x the per-ray ideal on 2^17
incoherent rays). Narrower sub-rows shrink the union — but each pair
still occupies a full 128-lane vector op unless 128/w sub-rows pack per
op (block-diagonal cluster operands), so the honest cost model at width
w is

    work(w) = pairs(w) * max(w, 128/pack) ~ pairs(w) * w   (ideal pack)

normalized by sum(cnt) (= per-ray ideal, pairs at w=1). This probe
counts pairs(w) for w in {128, 64, 32, 16, 8} under the PRODUCTION sort
(binned_intersect.ray_sort_perm) in pure numpy — deterministic, no TPU.

Usage: python tools/probe_subrow_width.py [n_log2=17]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from probe_bigmesh import make_mesh, rays  # noqa: E402

from mitsuba_tpu.ops import binned_intersect as bi  # noqa: E402


def cluster_enters(scene, o, d, tmax):
    """(C, N) bool: ray enters cluster bbox (the post-pass gate)."""
    cl = scene.clusters
    cmin = np.asarray(cl.cmin)
    cmax = np.asarray(cl.cmax)
    live = cmin[:, 0] <= cmax[:, 0]
    inv = 1.0 / np.where(np.abs(d) < 1e-12,
                         np.where(d >= 0, 1e-12, -1e-12), d)
    t0 = (cmin[:, None] - o[None]) * inv[None]
    t1 = (cmax[:, None] - o[None]) * inv[None]
    tn = np.minimum(t0, t1).max(-1)
    tf = np.maximum(t0, t1).min(-1)
    return ((tn <= tf) & (tf > 1e-4) & (tn < tmax[None, :])
            & live[:, None])


def main():
    nl = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    n = 1 << nl
    scene = make_mesh()
    cl = scene.clusters
    print(f"mesh {scene.num_triangles} tris, {cl.n_clusters} clusters, "
          f"{cl.n_groups} groups")
    for label, coh in (("inc", False), ("coh", True)):
        o64, d64 = (np.asarray(x, np.float64)
                    for x in rays(n, coherent=coh))
        tmax = np.full(n, 1e30)
        perm = np.asarray(bi.ray_sort_perm(
            cl, jnp.asarray(o64, jnp.float32), jnp.asarray(d64, jnp.float32),
            jnp.asarray(tmax, jnp.float32)))
        e = cluster_enters(scene, o64, d64, tmax)[:, perm]   # (C, N)
        C, _ = e.shape
        ideal = int(e.sum())          # lane-cluster slots (= pairs at w=1)
        print(f"[{label}] n=2^{nl} mean clusters/ray={ideal / n:.2f}")
        print(f"{'width':>6} {'pairs':>9} {'waste=pairs*w/ideal':>20}")
        for w in (128, 64, 32, 16, 8):
            pr = int(e.reshape(C, n // w, w).any(-1).sum())
            print(f"{w:>6} {pr:>9} {pr * w / ideal:>20.2f}")


if __name__ == "__main__":
    main()
