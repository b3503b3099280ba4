"""Trace dispatch: pick the right intersection backend for a scene.

Small scenes (Cornell-class) brute-force on the VPU; scenes with a built
BVH (scene.aux["bvh"] is set by scene.bvh.build_bvh) use batched stackless
traversal. The analog of Scene::rayIntersect (scene.h:187) as a single
entry point.
"""
from __future__ import annotations

import jax

from . import intersect as _isect


def closest_hit(scene, o: jax.Array, d: jax.Array, tmax=None) -> _isect.Intersection:
    if scene.bvh is not None:
        from . import bvh_traverse
        return bvh_traverse.closest_hit(scene, scene.bvh, o, d, tmax)
    return _isect.intersect_brute(scene, o, d, tmax)


def any_hit(scene, o: jax.Array, d: jax.Array, tmax) -> jax.Array:
    if scene.bvh is not None:
        from . import bvh_traverse
        return bvh_traverse.any_hit(scene, scene.bvh, o, d, tmax)
    return _isect.occluded_brute(scene, o, d, tmax)


def shadow_blocked(scene, o, d, tmax, use_occupancy: bool = False) -> jax.Array:
    """Shadow query with the optional occupancy-map approximation (the
    fork's _OM integrator variants; biased, cheaper on huge scenes)."""
    if use_occupancy and scene.occupancy is not None:
        from . import occupancy as occlib
        return occlib.occluded(scene.occupancy, o, d, tmax)
    return any_hit(scene, o, d, tmax)


surface_interaction = _isect.surface_interaction
Intersection = _isect.Intersection
