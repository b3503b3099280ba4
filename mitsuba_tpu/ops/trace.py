"""Trace dispatch: pick the right intersection backend for a scene.

The analog of Scene::rayIntersect (scene.h:187) as a single entry point,
with a hardware-aware policy:

  * CPU backend: stackless BVH traversal when a BVH is attached (pointer
    chasing is fine on a scalar core), VPU brute otherwise.
  * TPU backend: the fused MXU brute kernel up to PALLAS_BRUTE_MAX_TRIS
    (tiny scenes: zero orchestration, Cornell runs 149M rays/s), then
    the block-coherent binned intersector (ops/binned_intersect.py).
    Value-fetch-synced numbers are kept in BASELINE.md's round tables
    (do not quote block_until_ready timings on the tunneled backend);
    the BVH walk measures ~0.01M rays/s here — random per-lane gathers
    inside while_loop bodies are the TPU's weakest operation, dense MXU
    passes its strongest — so it is kept only for the CPU backend.

This is the round-2 measured answer to SURVEY §2.2's ShapeKDTree: on this
hardware the systolic array beats tree pointer-chasing for any scene whose
GEMM tables fit comfortably in HBM bandwidth per bounce.

Crossover (re-measured r4, VERDICT r3 item 1): at 70k tris the binned
path now wins BOTH regimes — 0.70M rays/s incoherent vs the fused VPU
brute's 0.64M (r2 table), 2.7M coherent — so the policy boundary at
PALLAS_BRUTE_MAX_TRIS picks the faster backend on each side of it.
"""
from __future__ import annotations

import jax

from . import intersect as _isect

# beyond this the O(N*T) MXU brute loses to the binned two-phase kernel
PALLAS_BRUTE_MAX_TRIS = 4096


def _prefer_brute(scene) -> bool:
    return (jax.default_backend() != "cpu"
            and scene.num_triangles <= PALLAS_BRUTE_MAX_TRIS)


def closest_hit(scene, o: jax.Array, d: jax.Array, tmax=None) -> _isect.Intersection:
    if scene.bvh is not None and not _prefer_brute(scene):
        if jax.default_backend() != "cpu" and scene.clusters is not None:
            # large meshes on TPU: two-phase binned MXU
            from . import binned_intersect
            return binned_intersect.closest_hit(
                scene, scene.clusters, o, d, tmax)
        from . import bvh_traverse
        return bvh_traverse.closest_hit(scene, scene.bvh, o, d, tmax)
    return _isect.intersect_brute(scene, o, d, tmax)


def any_hit(scene, o: jax.Array, d: jax.Array, tmax) -> jax.Array:
    if scene.bvh is not None and not _prefer_brute(scene):
        if jax.default_backend() != "cpu" and scene.clusters is not None:
            from . import binned_intersect
            return binned_intersect.any_hit(
                scene, scene.clusters, o, d, tmax)
        from . import bvh_traverse
        return bvh_traverse.any_hit(scene, scene.bvh, o, d, tmax)
    return _isect.occluded_brute(scene, o, d, tmax)


def closest_and_any(scene, o_c, d_c, tmax_c, o_s, d_s, tmax_s,
                    use_occupancy: bool = False):
    """Fused closest-hit (o_c, d_c) + shadow any-hit (o_s, d_s) —
    ONE binned dispatch on the TPU big-mesh path (halves the
    per-dispatch fixed cost the regenerative wavefront pays per step);
    everywhere else it decomposes into the two standard calls."""
    if (scene.bvh is not None and not _prefer_brute(scene)
            and jax.default_backend() != "cpu"
            and scene.clusters is not None
            and not (use_occupancy and scene.occupancy is not None)):
        from . import binned_intersect
        return binned_intersect.closest_and_any(
            scene, scene.clusters, o_c, d_c, tmax_c, o_s, d_s, tmax_s)
    its = closest_hit(scene, o_c, d_c, tmax_c)
    blocked = shadow_blocked(scene, o_s, d_s, tmax_s, use_occupancy)
    return its, blocked


def shadow_blocked(scene, o, d, tmax, use_occupancy: bool = False) -> jax.Array:
    """Shadow query with the optional occupancy-map approximation (the
    fork's _OM integrator variants; biased, cheaper on huge scenes)."""
    if use_occupancy and scene.occupancy is not None:
        from . import occupancy as occlib
        return occlib.occluded(scene.occupancy, o, d, tmax)
    return any_hit(scene, o, d, tmax)


surface_interaction = _isect.surface_interaction
Intersection = _isect.Intersection
