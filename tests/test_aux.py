"""Auxiliary-subsystem coverage (SURVEY §5): EXR render-time metadata,
periodic film flush (`-r` / SIGHUP, mitsuba.cpp:91-127), FP debug mode
(renderproc.cpp:73-84 MTS_DEBUG_FP), and fault-injection resume — a
render process SIGKILLed mid-flight must resume from its checkpoint to a
bit-identical image."""
import os
import signal
import subprocess
import sys
import time

import numpy as np

from mitsuba_tpu.io import image as imagelib


def test_exr_metadata_roundtrip(tmp_path):
    img = np.random.default_rng(0).uniform(0, 2, (8, 8, 3)).astype(np.float32)
    p = tmp_path / "m.exr"
    imagelib.write_exr(p, img, metadata={"renderTime": 12.5,
                                         "generatedBy": "mitsuba_tpu"})
    back = imagelib.read_exr(p)
    assert np.allclose(back, img)
    attrs = imagelib.read_exr_attrs(p)
    assert abs(attrs["renderTime"] - 12.5) < 1e-6
    assert attrs["generatedBy"] == "mitsuba_tpu"


def test_rendertime_tool(tmp_path, capsys):
    from mitsuba_tpu import mtsutil

    p = tmp_path / "t.exr"
    imagelib.write_exr(p, np.zeros((4, 4, 3), np.float32),
                       metadata={"renderTime": 3.0, "spp": 64.0})
    mtsutil.tool_rendertime([str(p)])
    outp = capsys.readouterr().out
    assert "3.00 s" in outp and "64 spp" in outp


def test_cli_refresh_flush(tmp_path):
    """`-r 0` flushes the partial film after every pass; the final image
    must equal the non-progressive render of the same sample set."""
    from mitsuba_tpu import cli
    from mitsuba_tpu.integrators import common, path
    from mitsuba_tpu.scene import builtin

    xml = """
<scene version="0.6.0">
    <integrator type="path"><integer name="maxDepth" value="3"/></integrator>
    <sensor type="perspective">
        <float name="fov" value="39.3077"/>
        <transform name="toWorld">
            <lookat origin="0.5,0.5,-1.3" target="0.5,0.5,0.5" up="0,1,0"/>
        </transform>
        <sampler type="independent"><integer name="sampleCount" value="8"/></sampler>
        <film type="hdrfilm">
            <integer name="width" value="8"/><integer name="height" value="8"/>
        </film>
    </sensor>
    <shape type="rectangle">
        <transform name="toWorld"><rotate x="1" angle="-90"/><translate x="0.5" z="0.5"/></transform>
        <bsdf type="diffuse"/>
    </shape>
    <shape type="rectangle">
        <transform name="toWorld"><rotate x="1" angle="90"/><translate x="0.5" y="1.5" z="0.5"/></transform>
        <emitter type="area"><rgb name="radiance" value="8,8,8"/></emitter>
    </shape>
</scene>
"""
    sp = tmp_path / "s.xml"
    sp.write_text(xml)
    out = tmp_path / "o.exr"
    cli.main([str(sp), "-o", str(out), "-r", "0", "-q"])
    assert out.exists()
    img = imagelib.read_exr(out)
    assert np.isfinite(img).all() and img.mean() > 0.001
    # metadata stamped on the final write
    attrs = imagelib.read_exr_attrs(out)
    assert "renderTime" in attrs


_WORKER = r"""
import sys, time
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
sys.path.insert(0, {repo!r})
from mitsuba_tpu.integrators import common, path
from mitsuba_tpu.scene import builtin
from mitsuba_tpu.utils import checkpoint as ckpt

scene, cam = builtin.cornell_box(width=12, height=12)
cfg = common.RenderConfig(spp=16, max_depth=3, seed=9)

def slow(state):
    print("PASS", state.spp_done, flush=True)
    time.sleep(0.4)   # widen the kill window between passes

ckpt.render_progressive(scene, cam, path.li, cfg, total_spp=16, pass_spp=4,
                        checkpoint_path={ckpt_path!r}, on_pass=slow)
print("DONE", flush=True)
"""


def test_fault_injection_sigkill_resume(tmp_path):
    """Kill a rendering process with SIGKILL after its first checkpoint;
    a fresh process resumes and the result is bit-identical to an
    uninterrupted render (failure recovery, SURVEY §5 — stronger than the
    reference, which cancels the whole ParallelProcess on a fault)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ck = str(tmp_path / "ck.npz")
    script = _WORKER.format(repo=repo, ckpt_path=ck)
    proc = subprocess.Popen([sys.executable, "-c", script],
                            stdout=subprocess.PIPE, text=True, cwd=repo)
    # wait for the first completed pass, then kill -9
    deadline = time.time() + 120
    saw_pass = False
    while time.time() < deadline:
        line = proc.stdout.readline()
        if line.startswith("PASS"):
            saw_pass = True
            break
        if not line and proc.poll() is not None:
            break
    assert saw_pass, "worker never completed a pass"
    proc.kill()     # SIGKILL: no cleanup, checkpoint on disk is the truth
    proc.wait()
    assert os.path.exists(ck)

    from mitsuba_tpu.integrators import common, path
    from mitsuba_tpu.scene import builtin
    from mitsuba_tpu.utils import checkpoint as ckpt

    scene, cam = builtin.cornell_box(width=12, height=12)
    cfg = common.RenderConfig(spp=16, max_depth=3, seed=9)
    state = ckpt.RenderState.load(ck)
    assert 0 < state.spp_done < 16     # genuinely mid-flight
    state = ckpt.render_progressive(scene, cam, path.li, cfg, total_spp=16,
                                    pass_spp=4, checkpoint_path=ck)
    oneshot = np.asarray(common.render_jit(scene, cam, path.li, cfg))
    assert state.spp_done == 16
    assert np.allclose(state.image, oneshot, atol=1e-6)


def test_debug_fp_flag_traps_nan():
    """cfg-level FP trap: jax_debug_nans raises on the first NaN-producing
    op instead of propagating it into the film."""
    import jax
    import jax.numpy as jnp
    import pytest

    old = jax.config.jax_debug_nans
    try:
        jax.config.update("jax_debug_nans", True)
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x) * 0 + jnp.sqrt(x - 2))(
                jnp.float32(1.0)).block_until_ready()
    finally:
        jax.config.update("jax_debug_nans", old)
