"""Hierarchical grid volumes (hgridvolume.cpp) + the volume cache analog
(volcache.cpp -> load-time dense bake)."""
import numpy as np
import jax.numpy as jnp

from mitsuba_tpu.io import vol as vollib
from mitsuba_tpu.models import medium as medlib


def make_blocks(B=2, b=9, seed=0):
    """B^3 cell grid, each occupied cell a (b,b,b) block; one cell empty.
    Blocks share boundary voxels with neighbors (the seamless layout
    hgrid datasets use), derived from one global analytic field."""
    rng = np.random.default_rng(seed)
    # global field sampled at block voxel positions so neighboring blocks
    # agree on their shared faces
    def field(x, y, z):
        return (0.5 + 0.45 * np.sin(3 * x) * np.cos(2 * y)
                * np.sin(4 * z)).astype(np.float32)

    table = np.full((B, B, B), -1, np.int32)
    blocks = []
    for cz in range(B):
        for cy in range(B):
            for cx in range(B):
                if (cx, cy, cz) == (1, 0, 1):
                    continue        # leave one cell empty
                lin = np.linspace(0.0, 1.0, b)
                gx = (cx + lin) / B
                gy = (cy + lin) / B
                gz = (cz + lin) / B
                Z, Y, X = np.meshgrid(gz, gy, gx, indexing="ij")
                table[cz, cy, cx] = len(blocks)
                blocks.append(field(X, Y, Z))
    return table, np.stack(blocks), field


def test_hgrid_lookup_matches_field():
    table, blocks, field = make_blocks()
    med = medlib.make_hgrid(table, blocks, 1.0, 0.8)
    rng = np.random.default_rng(1)
    p = rng.uniform(0.02, 0.98, (256, 3)).astype(np.float32)
    got = np.asarray(medlib.density_at(med, jnp.asarray(p)))
    want = field(p[:, 0], p[:, 1], p[:, 2])
    # mask points inside the empty cell (expected zero there)
    in_empty = ((p[:, 0] >= 0.5) & (p[:, 1] < 0.5) & (p[:, 2] >= 0.5))
    assert np.allclose(got[in_empty], 0.0)
    ok = ~in_empty
    assert np.allclose(got[ok], want[ok], atol=0.02), \
        np.abs(got[ok] - want[ok]).max()
    # outside the box: zero
    outside = np.asarray([[1.5, 0.5, 0.5], [-0.1, 0.2, 0.2]], np.float32)
    assert np.allclose(
        np.asarray(medlib.density_at(med, jnp.asarray(outside))), 0.0)


def test_hgrid_roundtrip_io(tmp_path):
    table, blocks, _ = make_blocks(seed=3)
    d = tmp_path / "vol"
    d.mkdir()
    vollib.write_hgrid(str(d / "dict.hvol"), "smoke_", table, blocks,
                       box_min=(-1, 0, 2), box_max=(1, 3, 5))
    t2, b2, bmin, bmax = vollib.read_hgrid(str(d / "dict.hvol"), "smoke_")
    assert np.array_equal(np.asarray(t2 >= 0), np.asarray(table >= 0))
    # block ids may be renumbered by read order; compare gathered data
    for cz in range(2):
        for cy in range(2):
            for cx in range(2):
                if table[cz, cy, cx] < 0:
                    continue
                assert np.allclose(b2[t2[cz, cy, cx]],
                                   blocks[table[cz, cy, cx]])
    assert np.allclose(bmin, [-1, 0, 2]) and np.allclose(bmax, [1, 3, 5])


def test_volcache_bake_dense():
    """bake_dense (volcache.cpp analog) reproduces the hgrid field."""
    table, blocks, field = make_blocks()
    med = medlib.make_hgrid(table, blocks, 1.0, 0.8)
    dense = medlib.bake_dense(med, (32, 32, 32))
    assert dense.kind == medlib.MEDIUM_GRID
    rng = np.random.default_rng(5)
    p = rng.uniform(0.1, 0.45, (128, 3)).astype(np.float32)  # occupied oct
    a = np.asarray(medlib.density_at(med, jnp.asarray(p)))
    b = np.asarray(medlib.density_at(dense, jnp.asarray(p)))
    assert np.allclose(a, b, atol=0.03), np.abs(a - b).max()


def test_hgrid_volpath_render(tmp_path):
    """End-to-end: an hgridvolume medium through XML + volpath matches the
    equivalent dense-grid medium render."""
    from mitsuba_tpu.integrators import common, volpath
    from mitsuba_tpu.scene import builtin

    table, blocks, _ = make_blocks(B=2, b=9)
    med_h = medlib.make_hgrid(table, blocks, 6.0, 0.8,
                              box_min=(0, 0, 0), box_max=(1, 1, 1))
    med_d = medlib.bake_dense(med_h, (33, 33, 33))
    med_d = medlib.Medium(
        sigma_t=med_h.sigma_t, albedo=med_h.albedo, g=med_h.g,
        density=med_d.density, box_min=med_d.box_min,
        box_max=med_d.box_max, kind=medlib.MEDIUM_GRID,
        phase=med_h.phase, phase_params=med_h.phase_params)

    scene, cam = builtin.cornell_box(width=8, height=8)
    cfg = common.RenderConfig(spp=48, max_depth=3, seed=0)
    img_h = np.asarray(common.render_jit(
        scene.replace(medium=med_h), cam, volpath.li, cfg))
    img_d = np.asarray(common.render_jit(
        scene.replace(medium=med_d), cam, volpath.li, cfg))
    assert np.isfinite(img_h).all() and img_h.min() >= 0
    assert img_h.mean() > 0.01, img_h.mean()  # not trivially black
    rel = abs(img_h.mean() - img_d.mean()) / max(img_d.mean(), 1e-6)
    assert rel < 0.05, (img_h.mean(), img_d.mean())


def test_hgrid_xml(tmp_path):
    table, blocks, _ = make_blocks()
    d = tmp_path
    vollib.write_hgrid(str(d / "smoke.hvol"), "blk_", table, blocks)
    xml = f"""
<scene version="0.6.0">
    <integrator type="volpath"><integer name="maxDepth" value="3"/></integrator>
    <sensor type="perspective">
        <float name="fov" value="40"/>
        <sampler type="independent"><integer name="sampleCount" value="4"/></sampler>
        <film type="hdrfilm">
            <integer name="width" value="6"/><integer name="height" value="6"/>
        </film>
    </sensor>
    <medium type="heterogeneous">
        <volume name="density" type="hgridvolume">
            <string name="filename" value="smoke.hvol"/>
            <string name="prefix" value="blk_"/>
        </volume>
        <float name="scale" value="5"/>
    </medium>
    <shape type="rectangle">
        <transform name="toWorld"><rotate x="1" angle="-90"/></transform>
        <bsdf type="diffuse"/>
    </shape>
    <shape type="rectangle">
        <transform name="toWorld"><rotate x="1" angle="90"/><translate y="3"/></transform>
        <emitter type="area"><rgb name="radiance" value="5,5,5"/></emitter>
    </shape>
</scene>
"""
    p = d / "scene.xml"
    p.write_text(xml)
    from mitsuba_tpu.scene import xml as xmllib
    scene, cam, cfg, integ = xmllib.load_xml(p)
    assert integ == "volpath"
    assert scene.medium is not None
    assert scene.medium.kind == medlib.MEDIUM_HGRID
    assert scene.medium.block_table is not None
