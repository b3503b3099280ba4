"""Mesh-scale boundary-gradient probe (VERDICT r4 item 2).

Times and validates the blocker-translation vertex gradient on the
10k-tri `builtin.sphere_shadow` fixture with the BINNED intersector in
the trace loop (interpret-mode Pallas on CPU), and measures the
variance-vs-edge-count curve (with/without silhouette importance) that
BASELINE.md records.

Usage:
    python tools/probe_boundary_meshscale.py             # FD validation
    python tools/probe_boundary_meshscale.py --curve     # FD + curve
    python tools/probe_boundary_meshscale.py --curve-only  # curve alone
"""
import sys
import time
from unittest import mock

import jax
import jax.experimental.pallas as plmod
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from mitsuba_tpu.integrators import boundary, common, path  # noqa: E402
from mitsuba_tpu.ops import binned_intersect as bi  # noqa: E402
from mitsuba_tpu.ops import trace  # noqa: E402
from mitsuba_tpu.scene import builtin  # noqa: E402

_orig_call = plmod.pallas_call


def _interp_call(*a, **k):
    k["interpret"] = True
    return _orig_call(*a, **k)


def _binned_closest(scene, o, d, tmax=None):
    return bi.closest_hit(scene, scene.clusters, o, d, tmax)


def _binned_any(scene, o, d, tmax):
    return bi.any_hit(scene, scene.clusters, o, d, tmax)


def binned_cpu_patches():
    """Force the binned (cluster) intersector + interpret-mode Pallas on
    the CPU backend — the trace policy would otherwise pick the BVH."""
    return [
        mock.patch.object(plmod, "pallas_call", _interp_call),
        mock.patch.object(trace, "closest_hit", _binned_closest),
        mock.patch.object(trace, "any_hit", _binned_any),
    ]


def main(curve=False):
    from mitsuba_tpu.scene import bvh as bvhlib
    scene0, cam, rows = builtin.sphere_shadow(attach_bvh=False)
    theta0, eps = 0.2, 0.04
    cfg_ad = common.RenderConfig(spp=16, max_depth=2, seed=3)
    cfg_fd = common.RenderConfig(spp=64, max_depth=2, seed=7)

    def scene_at(theta):
        """Cluster/BVH tables are HOST-built from the vertices — rebuild
        them at each FD evaluation point (they do not track a traced
        vertex update)."""
        s = scene0.replace(
            vertices=scene0.vertices.at[rows[0]:rows[1], 0].add(theta))
        return bvhlib.attach(s)

    base = scene_at(theta0)   # AD base: tables built at theta0
    print("tris", base.num_triangles, "clusters",
          base.clusters is not None)

    def shifted(theta):
        """Perturb vertices ON TOP of the theta0 tables (theta is a
        tracer; the search is detached, interior+boundary terms flow
        through the vertices)."""
        return base.replace(
            vertices=base.vertices.at[rows[0]:rows[1], 0]
            .add(theta - theta0))

    patches = binned_cpu_patches()
    for p in patches:
        p.start()
    try:
        t0 = time.time()

        def primal(theta):
            return float(jnp.mean(common.render(
                scene_at(theta), cam, path.li, cfg_fd)))

        pa = primal(theta0 + eps)
        print("primal render (compile+run)", time.time() - t0)
        t0 = time.time()
        pb = primal(theta0 - eps)
        print("primal render (cached)", time.time() - t0)
        fd = (pa - pb) / (2 * eps)
        print("fd", fd)

        bc = boundary.BoundaryConfig(n_edge=4, primary=False)

        def loss(theta, seed):
            cfg = common.RenderConfig(spp=cfg_ad.spp, max_depth=2,
                                      seed=seed)
            return jnp.mean(common.render(
                shifted(theta), cam,
                lambda s_, c_, o, d, st, cf:
                boundary.li_grad(s_, c_, o, d, st, cf, bc), cfg))

        gl = jax.value_and_grad(loss)
        t0 = time.time()
        _, g = gl(theta0, 3)
        g = float(g)
        print("grad (compile+run)", time.time() - t0, "g", g)
        t0 = time.time()
        gs = [g] + [float(gl(theta0, s)[1]) for s in (11, 19)]
        print("grad (2 cached)", time.time() - t0)
        gm = float(np.mean(gs))
        print("g_mean", gm, "fd", fd, "rel", abs(gm - fd) / abs(fd))

    finally:
        for p in patches:
            p.stop()

    if curve:
        curve_main(base, cam, rows, theta0)


def curve_main(base, cam, rows, theta0, n_pts=2304, n_seeds=16):
    """Variance-vs-edge-count curve of the NEE boundary estimator at
    mesh scale (VERDICT r4 item 2's BASELINE.md deliverable), with and
    without the silhouette-importance CDF.

    Measures the ESTIMATOR directly (a fixed batch of floor shading
    points, d/d(theta) of the mean boundary term) on the CPU BVH path —
    the curve is a property of the edge sampler, not the intersector
    (the binned FD validation above covers that axis)."""
    from mitsuba_tpu.core import math as m
    from mitsuba_tpu.models import bsdf as bsdflib

    g = int(np.sqrt(n_pts))
    xs, zs = np.meshgrid(np.linspace(-0.9, 0.9, g),
                         np.linspace(-0.9, 0.9, g))
    o = jnp.asarray(np.stack([xs, np.full_like(xs, 0.5), zs], -1)
                    .reshape(-1, 3), jnp.float32)
    d = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), o.shape)

    def gfun(theta, key, ne, imp):
        s = base.replace(
            vertices=base.vertices.at[rows[0]:rows[1], 0]
            .add(theta - theta0))
        its = trace.closest_hit(s, o, d)
        si = trace.surface_interaction(s, o, d, its)
        ns = si["ns"]
        wi_l = m.to_local(ns, si["wi_world"])
        sp = bsdflib.gather_shade_point(
            s, si["mat"], si["uv"],
            u_blend=jnp.zeros(o.shape[0]), aux=si)
        u_edge = jax.random.uniform(key, (o.shape[0], ne, 2))
        ew = (boundary.edge_importance(s, boundary.emitter_anchor(s))
              if imp else None)
        bt = boundary.nee_boundary(s, si["p"], ns, sp, wi_l,
                                   s.bsdf_families, u_edge, edge_w=ew)
        return jnp.mean(jnp.sum(bt, -1))

    grad_f = jax.jit(jax.grad(gfun), static_argnums=(2, 3))
    print(f"== boundary-estimator d/dtheta, {o.shape[0]} floor points, "
          f"{n_seeds} seeds (mesh {base.num_triangles} tris)")
    print(f"{'imp':>5} {'n_edge':>6} {'mean':>9} {'std':>9}")
    for imp in (False, True):
        for ne in (1, 2, 4, 8, 16):
            vs = [float(grad_f(theta0, jax.random.PRNGKey(7 * s + 1),
                               ne, imp)) for s in range(n_seeds)]
            print(f"{str(imp):>5} {ne:>6} {np.mean(vs):>9.4f} "
                  f"{np.std(vs):>9.4f}")


if __name__ == "__main__":
    if "--curve-only" in sys.argv:
        from mitsuba_tpu.scene import bvh as bvhlib
        scene0, cam, rows = builtin.sphere_shadow(attach_bvh=False)
        theta0 = 0.2
        base = bvhlib.attach(scene0.replace(
            vertices=scene0.vertices.at[rows[0]:rows[1], 0].add(theta0)))
        curve_main(base, cam, rows, theta0)
    else:
        main(curve="--curve" in sys.argv)
