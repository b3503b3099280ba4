"""Path-space MLT cross-validation (the reference's mlt.cpp over the
libbidir mutators) — Cornell + a near-specular caustic scene must match
the unidirectional path tracer, with sane acceptance rates."""
import numpy as np

from mitsuba_tpu.integrators import common, mlt, path
from mitsuba_tpu.scene import builtin


def test_mlt_matches_path_cornell():
    scene, cam = builtin.cornell_box(width=16, height=16)
    ref = np.asarray(common.render_jit(
        scene, cam, path.li, common.RenderConfig(spp=256, max_depth=4, seed=0)))
    img, stats = mlt.render_jit(
        scene, cam, common.RenderConfig(spp=1, max_depth=4, seed=3),
        n_chains=1 << 13, n_mutations=192, n_bootstrap=1 << 15,
        return_stats=True)
    img = np.asarray(img)
    assert np.isfinite(img).all() and img.min() >= 0
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.06, (img.mean(), ref.mean(), rel)
    acc = np.asarray(stats["acceptance"])
    # mutation-kernel health: every kernel accepts sometimes (B's target —
    # hitting the light by BSDF tracing — is intrinsically rare); the
    # perturbations C/D/E should mix well on diffuse Cornell
    assert acc[0] > 0.1 and acc[1] > 0.0, acc
    assert acc[2] > 0.2 and acc[3] > 0.2 and acc[4] > 0.1, acc
    assert float(stats["b"]) > 0


def test_mlt_caustic_scene():
    """Near-specular mirror caustics — the transport regime the MLT tier
    exists for (mut_caustic.h); must stay unbiased vs path."""
    scene, cam = builtin.caustic_box(width=12, height=12, rough=True)
    ref = np.asarray(common.render_jit(
        scene, cam, path.li, common.RenderConfig(spp=512, max_depth=4, seed=0)))
    img = np.asarray(mlt.render_jit(
        scene, cam, common.RenderConfig(spp=1, max_depth=4, seed=5),
        n_chains=1 << 13, n_mutations=256, n_bootstrap=1 << 16))
    assert np.isfinite(img).all() and img.min() >= 0
    rel = abs(img.mean() - ref.mean()) / max(ref.mean(), 1e-6)
    assert rel < 0.12, (img.mean(), ref.mean(), rel)
