"""Preetham sun/sky emitters (src/emitters/{sky,sun,sunsky}.cpp analogs)."""
import numpy as np

from mitsuba_tpu.models import sunsky

SUN = np.asarray([0.3, 0.8, 0.52])
SUN = SUN / np.linalg.norm(SUN)


def test_sky_map_basic_properties():
    img = sunsky.bake("sky", sun_dir=SUN, resolution=128)
    assert img.shape == (64, 128, 3)
    assert np.isfinite(img).all() and (img >= 0).all()
    # below-horizon rows (theta > pi/2) are black
    assert img[40:].sum() == 0.0
    assert img[:30].sum() > 0.0


def test_sky_peaks_near_sun():
    img = sunsky.bake("sky", sun_dir=SUN, resolution=256)
    lum = img @ np.asarray([0.2126, 0.7152, 0.0722])
    iy, ix = np.unravel_index(np.argmax(lum), lum.shape)
    d, _ = sunsky._latlong_dirs(*lum.shape)
    assert float(d[iy, ix] @ SUN) > 0.95  # brightest pixel looks at the sun


def test_sun_irradiance_conserved_across_resolutions():
    def irr(res):
        img = sunsky.bake("sun", sun_dir=SUN, resolution=res).astype(np.float64)
        d, omega = sunsky._latlong_dirs(*img.shape[:2])
        return (img * omega[..., None]).sum(axis=(0, 1))

    e_coarse, e_fine = irr(64), irr(1024)
    assert np.all(e_fine > 0)
    # power is spread over whichever pixels the disk covers, total conserved
    assert np.allclose(e_coarse, e_fine, rtol=0.05)
    # direct-normal illuminance of a clear sky is ~1e2 kcd-units
    assert 20 < float(e_fine[1]) < 500


def test_turbidity_dims_the_sun():
    t_clear = sunsky.sun_transmittance_rgb(np.radians(40.0), 2.0)
    t_hazy = sunsky.sun_transmittance_rgb(np.radians(40.0), 8.0)
    assert np.all(t_hazy < t_clear)
    # and reddens it: blue attenuated more than red
    assert t_hazy[0] / t_clear[0] > t_hazy[2] / t_clear[2]


def test_sunsky_is_sum_of_parts():
    a = sunsky.bake("sky", sun_dir=SUN, resolution=128).astype(np.float64)
    b = sunsky.bake("sun", sun_dir=SUN, resolution=128).astype(np.float64)
    c = sunsky.bake("sunsky", sun_dir=SUN, resolution=128).astype(np.float64)
    assert np.allclose(a + b, c, rtol=1e-5, atol=1e-4)


def test_xml_sunsky_scene_renders(tmp_path):
    from mitsuba_tpu.scene import xml as xmllib
    from mitsuba_tpu.integrators import common, direct

    s = """<scene version="0.6.0">
      <integrator type="direct"/>
      <sensor type="perspective">
        <transform name="toWorld"><lookat origin="0,1,4" target="0,0,0" up="0,1,0"/></transform>
        <sampler type="independent"><integer name="sampleCount" value="4"/></sampler>
        <film type="hdrfilm">
          <integer name="width" value="8"/><integer name="height" value="8"/>
        </film>
      </sensor>
      <emitter type="sunsky">
        <vector name="sunDirection" x="0.3" y="0.8" z="0.52"/>
        <float name="turbidity" value="3"/>
        <integer name="resolution" value="128"/>
      </emitter>
      <shape type="rectangle">
        <transform name="toWorld"><rotate x="1" angle="-90"/><scale value="3"/></transform>
        <bsdf type="diffuse"/>
      </shape>
    </scene>"""
    f = tmp_path / "s.xml"
    f.write_text(s)
    scene, cam, cfg, integ = xmllib.load_xml(str(f))
    assert scene.has_env and scene.envmap is not None
    img = common.render_jit(scene, cam, direct.li, cfg)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert img.mean() > 0.1  # daylight-lit plane is clearly bright


def test_solar_position_psa():
    """PSA solar-position algorithm (sunmodel.h:120): plausible Tokyo
    summer afternoon, below horizon at midnight, noon above 8am."""
    from mitsuba_tpu.models import sunsky

    d = sunsky.sun_direction()                  # Tokyo defaults, 3pm July
    assert abs(np.linalg.norm(d) - 1) < 1e-5
    assert d[1] > 0.3                           # well above horizon
    assert d[0] < 0                             # afternoon: sun in the west
    assert sunsky.sun_direction(hour=0.0)[1] < 0
    assert sunsky.sun_direction(hour=12.0)[1] > sunsky.sun_direction(hour=8.0)[1]
    # southern hemisphere midday sun sits toward the north
    d_sydney = sunsky.sun_direction(latitude=-33.87, longitude=151.21,
                                    timezone=10.0, month=1, hour=12.0)
    assert d_sydney[1] > 0.5


def test_sunsky_xml_location(tmp_path):
    xml = """
<scene version="0.6.0">
    <integrator type="path"/>
    <sensor type="perspective">
        <sampler type="independent"><integer name="sampleCount" value="4"/></sampler>
        <film type="hdrfilm">
            <integer name="width" value="4"/><integer name="height" value="4"/>
        </film>
    </sensor>
    <emitter type="sky">
        <float name="latitude" value="48.2"/>
        <float name="longitude" value="16.37"/>
        <float name="timezone" value="2"/>
        <integer name="month" value="6"/>
        <float name="hour" value="12.0"/>
        <integer name="resolution" value="32"/>
    </emitter>
    <shape type="rectangle"><bsdf type="diffuse"/></shape>
</scene>
"""
    p = tmp_path / "sky.xml"
    p.write_text(xml)
    from mitsuba_tpu.scene import xml as xmllib
    scene, cam, cfg, _ = xmllib.load_xml(p)
    assert scene.envmap is not None

    import pytest
    bad = xml.replace('<float name="latitude" value="48.2"/>',
                      '<float name="latitude" value="48.2"/>'
                      '<vector name="sunDirection" x="0" y="1" z="0"/>')
    p2 = tmp_path / "bad.xml"
    p2.write_text(bad)
    with pytest.raises(ValueError, match="not both"):
        xmllib.load_xml(p2)
