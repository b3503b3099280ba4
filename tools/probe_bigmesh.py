"""Probe: binned intersector rays/s on the bench 70k-tri mesh, varying
ray count and coherence, to diagnose the bench bigmesh number."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def make_mesh():
    from mitsuba_tpu.scene import bvh as bvhlib, ir
    nu, nv = 235, 150
    uu = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    vv = np.linspace(1e-3, np.pi - 1e-3, nv)
    U, V = np.meshgrid(uu, vv, indexing="ij")
    r = 1.0 + 0.15 * np.sin(5 * U) * np.sin(4 * V)
    verts = np.stack([np.sin(V) * np.cos(U) * r, np.sin(V) * np.sin(U) * r,
                      np.cos(V) * r], -1).reshape(-1, 3).astype(np.float32)
    idx = lambda i, j: (i % nu) * nv + j  # noqa: E731
    tris = []
    for i in range(nu):
        for j in range(nv - 1):
            tris.append([idx(i, j), idx(i + 1, j), idx(i, j + 1)])
            tris.append([idx(i + 1, j), idx(i + 1, j + 1), idx(i, j + 1)])
    tris = np.asarray(tris, np.int32)
    scene = ir.build_scene(verts, tris, np.zeros(len(tris), np.int32),
                           [{"type": ir.BSDF_DIFFUSE}])
    return bvhlib.attach(scene)


def rays(n, coherent=False):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    if coherent:
        # camera-like: one origin, directions in a cone
        o = jnp.tile(jnp.array([[0.0, 0.0, 4.0]]), (n, 1))
        xy = jax.random.uniform(k1, (n, 2), minval=-0.5, maxval=0.5)
        d = jnp.concatenate([xy, -jnp.ones((n, 1))], -1)
    else:
        a = jax.random.normal(k1, (n, 3))
        a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
        b = jax.random.normal(k2, (n, 3))
        b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
        u = jax.random.uniform(k3, (n, 1)) ** (1 / 3)
        o = a * 2.0
        d = b * u * 0.9 - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def main():
    scene = make_mesh()
    print(f"tris={scene.num_triangles} clusters={scene.clusters.n_clusters}")
    float(jnp.zeros(()).sum())
    from mitsuba_tpu.ops import binned_intersect

    f = jax.jit(lambda s, c, o, d: binned_intersect.closest_hit(s, c, o, d).t)
    for coherent in (False, True):
        for lg in (16, 17, 18, 20):
            n = 1 << lg
            o, d = rays(n, coherent)
            r = f(scene, scene.clusters, o, d)
            np.asarray(r[:4])  # value fetch — block_until_ready can lie
            reps = 3
            t0 = time.perf_counter()
            for _ in range(reps):
                r = f(scene, scene.clusters, o, d)
                np.asarray(r[:4])
            dt = (time.perf_counter() - t0) / reps
            tag = "coh" if coherent else "inc"
            print(f"{tag} n=2^{lg}: {n/dt/1e6:6.2f} M rays/s ({dt*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
