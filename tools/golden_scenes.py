"""The five BASELINE validation configurations as deterministic,
CPU-backend render cases used for golden-image regression tests
(tests/test_golden.py) and regenerated via tools/regen_golden.py.

Small resolutions keep the goldens a few KB while still exercising the
full estimator (MIS, media, textures, envmap)."""
from __future__ import annotations

import numpy as np


def _cases():
    from mitsuba_tpu.integrators import common, direct, path, volpath
    from mitsuba_tpu.models import medium as medlib
    from mitsuba_tpu.scene import builtin

    def cornell_direct():
        scene, cam = builtin.cornell_box(width=32, height=32)
        cfg = common.RenderConfig(spp=64, max_depth=2, seed=7)
        return scene, cam, direct.li, cfg

    def cornell_path():
        scene, cam = builtin.cornell_box(width=32, height=32)
        cfg = common.RenderConfig(spp=64, max_depth=8, rr_depth=5, seed=7)
        return scene, cam, path.li, cfg

    def veach_mis():
        scene, cam = builtin.veach_mis(width=48, height=36)
        cfg = common.RenderConfig(spp=64, max_depth=3, seed=7)
        return scene, cam, path.li, cfg

    def volpath_homogeneous():
        scene, cam = builtin.cornell_box(width=24, height=24)
        scene = scene.replace(
            medium=medlib.make_homogeneous([0.2] * 3, [0.05] * 3, g=0.3))
        cfg = common.RenderConfig(spp=64, max_depth=6, seed=7)
        return scene, cam, volpath.li, cfg

    def envmap_textured():
        from mitsuba_tpu.models import sensor as sensorlib
        from mitsuba_tpu.scene import envmap as envlib, ir

        verts = np.asarray([[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]],
                           np.float32)
        tris = np.asarray([[0, 2, 1], [0, 3, 2]], np.int32)
        uvs = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        rng = np.random.RandomState(0)
        tex = rng.uniform(0.2, 0.9, (8, 8, 3)).astype(np.float32)
        env = rng.uniform(0.0, 2.0, (8, 16, 3)).astype(np.float32)
        scene = ir.build_scene(
            verts, tris, np.zeros(2, np.int32),
            [{"type": ir.BSDF_DIFFUSE, "tex_reflectance": 0}],
            uvs=uvs, textures=[{"data": tex}])
        scene = envlib.attach_envmap(scene, env)
        cam = sensorlib.make_camera([0, 2, -3], [0, 0, 0], fov_x=40,
                                    width=24, height=24)
        cfg = common.RenderConfig(spp=64, max_depth=3, seed=7)
        return scene, cam, path.li, cfg

    return {
        "cornell_direct": cornell_direct,
        "cornell_path": cornell_path,
        "veach_mis": veach_mis,
        "volpath_homogeneous": volpath_homogeneous,
        "envmap_textured": envmap_textured,
    }


CASES = ("cornell_direct", "cornell_path", "veach_mis",
         "volpath_homogeneous", "envmap_textured")


def render_case(name: str) -> np.ndarray:
    from mitsuba_tpu.integrators import common

    scene, cam, li, cfg = _cases()[name]()
    return np.asarray(common.render_jit(scene, cam, li, cfg))
