"""Logging tier (logger.h/appender.h/formatter.h) and statistics
registry + progress reporter (statistics.h, mitsuba.cpp:408)."""
import io

import pytest

from mitsuba_tpu.core import logger as loglib
from mitsuba_tpu.utils import stats as statslib


def make_logger(level):
    lg = loglib.Logger(level)
    buf = io.StringIO()
    lg.clear_appenders()
    lg.add_appender(loglib.StreamAppender(buf))
    return lg, buf


def test_level_gate():
    lg, buf = make_logger(loglib.EInfo)
    lg.log(loglib.EDebug, "hidden")
    lg.log(loglib.EInfo, "shown")
    out = buf.getvalue()
    assert "hidden" not in out and "shown" in out
    assert "INFO" in out


def test_error_raises_after_logging():
    lg, buf = make_logger(loglib.EInfo)
    with pytest.raises(RuntimeError, match="boom"):
        lg.log(loglib.EError, "boom")
    assert "boom" in buf.getvalue()


def test_warning_counter():
    lg, _ = make_logger(loglib.EWarn)
    lg.log(loglib.EWarn, "w1")
    lg.log(loglib.EWarn, "w2")
    lg.log(loglib.EInfo, "i")
    assert lg.warning_count == 2


def test_file_appender(tmp_path):
    p = tmp_path / "log.txt"
    lg = loglib.Logger(loglib.EInfo)
    lg.clear_appenders()
    app = loglib.FileAppender(str(p))
    lg.add_appender(app)
    lg.log(loglib.EInfo, "to-file")
    app.close()
    assert "to-file" in p.read_text()


def test_log_format_args():
    lg, buf = make_logger(loglib.EInfo)
    old = loglib._logger
    loglib._logger = lg
    try:
        loglib.Log(loglib.EInfo, "%d triangles in %s", 42, "scene")
    finally:
        loglib._logger = old
    assert "42 triangles in scene" in buf.getvalue()


def test_stats_grouping_and_ratio():
    st = statslib.Statistics()
    st.add("Intersections.rays", 2.5e9, unit="rays")
    st.add("MLT.accepted", 30, base=100)
    st.add("MLT.accepted", 20, base=100)
    txt = st.format_stats()
    assert "* Intersections:" in txt and "* MLT:" in txt
    assert "2.5G rays" in txt
    assert "(25.00%)" in txt          # 50 of 200


def test_stats_record_gauge():
    st = statslib.Statistics()
    st.record("Perf.rays_per_s", 1.49e8, unit="rays/s")
    st.record("Perf.rays_per_s", 1.51e8, unit="rays/s")
    assert "151M" in st.format_stats().replace(".", "")


def test_progress_reporter():
    buf = io.StringIO()
    pr = statslib.ProgressReporter("Rendering", 64, stream=buf)
    pr.update(16)
    pr.update(48)
    pr.finish()
    out = buf.getvalue()
    assert "Rendering" in out and "(64/64" in out and "ETA" in out


def test_progressive_render_progress_line(tmp_path):
    """render_progressive drives the reporter without disturbing output."""
    import numpy as np
    from mitsuba_tpu.integrators import common, path
    from mitsuba_tpu.scene import builtin
    from mitsuba_tpu.utils import checkpoint

    scene, cam = builtin.cornell_box(width=8, height=8)
    cfg = common.RenderConfig(spp=4, max_depth=2, seed=0)
    st = checkpoint.render_progressive(scene, cam, path.li, cfg,
                                       total_spp=8, pass_spp=4,
                                       progress=True)
    assert st.spp_done == 8
    assert np.isfinite(st.image).all()
