"""Regression: NEE shadow rays must not self-block on the target emitter
(bug found by adjoint/forward cross-validation — the light-tracer was right
and the path tracer's penumbras were dark)."""
import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.models import emitter as emitterlib
from mitsuba_tpu.ops import trace
from mitsuba_tpu.scene import builtin


def blocked_frac(scene, pt, seed=0, n=4096):
    p = jnp.tile(jnp.asarray([pt]), (n, 1))
    u = jax.random.uniform(jax.random.PRNGKey(seed), (n, 3))
    ds = emitterlib.sample_direct(scene, p, u)
    return float(trace.any_hit(scene, p, ds.d, ds.dist).mean())


def test_clear_view_not_self_blocked():
    """A point with a totally clear view of the light must see ~100% of
    emitter samples (this was ~0% with the old normal-offset shadow origin
    that made rays terminate on the light quad itself)."""
    scene, _ = builtin.cornell_box()
    assert blocked_frac(scene, [0.5, 0.8, 0.5]) < 0.01


def test_umbra_fully_blocked():
    scene, _ = builtin.cornell_box()
    # directly underneath the tall box: the light is completely hidden
    assert blocked_frac(scene, [0.32, 0.0, 0.66]) > 0.99


def test_penumbra_partial():
    scene, _ = builtin.cornell_box()
    f = blocked_frac(scene, [0.25, 0.0, 0.45])
    assert 0.05 < f < 0.95, f
