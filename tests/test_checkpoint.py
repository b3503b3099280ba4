"""Checkpoint/resume: a progressive render interrupted and resumed must be
bit-identical to an uninterrupted render of the same sample set (exceeds
the reference, which has no true resume — SURVEY.md §5)."""
import numpy as np

from mitsuba_tpu.integrators import common, path
from mitsuba_tpu.scene import builtin
from mitsuba_tpu.utils import checkpoint as ckpt


def test_progressive_matches_oneshot(tmp_path):
    scene, cam = builtin.cornell_box(width=16, height=16)
    cfg = common.RenderConfig(spp=16, max_depth=3, seed=5)
    oneshot = np.asarray(common.render_jit(scene, cam, path.li, cfg))

    state = ckpt.render_progressive(
        scene, cam, path.li, cfg, total_spp=16, pass_spp=4,
        checkpoint_path=tmp_path / "ck.npz",
    )
    assert state.spp_done == 16
    assert np.allclose(state.image, oneshot, atol=1e-6)


def test_resume_after_interrupt(tmp_path):
    scene, cam = builtin.cornell_box(width=16, height=16)
    cfg = common.RenderConfig(spp=16, max_depth=3, seed=5)
    p = tmp_path / "ck.npz"
    # "interrupted" run: only 8 spp completed
    ckpt.render_progressive(scene, cam, path.li, cfg, total_spp=8,
                            pass_spp=4, checkpoint_path=p)
    # resumed run continues from the checkpoint to 16
    state = ckpt.render_progressive(scene, cam, path.li, cfg, total_spp=16,
                                    pass_spp=4, checkpoint_path=p)
    oneshot = np.asarray(common.render_jit(scene, cam, path.li, cfg))
    assert state.spp_done == 16
    assert np.allclose(state.image, oneshot, atol=1e-6)


def test_config_change_invalidates(tmp_path):
    scene, cam = builtin.cornell_box(width=16, height=16)
    p = tmp_path / "ck.npz"
    cfg = common.RenderConfig(spp=8, max_depth=2, seed=5)
    ckpt.render_progressive(scene, cam, path.li, cfg, total_spp=8,
                            pass_spp=4, checkpoint_path=p)
    cfg2 = common.RenderConfig(spp=8, max_depth=3, seed=5)
    state = ckpt.render_progressive(scene, cam, path.li, cfg2, total_spp=8,
                                    pass_spp=4, checkpoint_path=p)
    assert state.cfg_key == ckpt.cfg_key(cfg2, cam)


def test_timelog_written(tmp_path):
    scene, cam = builtin.cornell_box(width=8, height=8)
    cfg = common.RenderConfig(spp=8, max_depth=2, seed=1)
    tl = tmp_path / "timelog.txt"
    ckpt.render_progressive(scene, cam, path.li, cfg, total_spp=8,
                            pass_spp=2, timelog_path=tl)
    lines = tl.read_text().strip().splitlines()
    assert len(lines) == 4
    times = [float(x) for x in lines]
    assert times == sorted(times)  # cumulative
