"""Run the reference's OWN chi-square phase fixtures
(data/tests/test_phase.xml, consumed there by mtsutil -t test_chisquare)
through our GOF harness: every declared phase function's sample() must
match its pdf()."""
import glob

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_tpu.models import phase as phaselib
from mitsuba_tpu.utils.chi2 import spherical_chi2

FIXTURE = "/root/reference/data/tests/test_phase.xml"


def _load_phases():
    if not glob.glob(FIXTURE):
        return []
    import xml.etree.ElementTree as ET

    from mitsuba_tpu.scene import xml as xmllib

    root = ET.parse(FIXTURE).getroot()
    ld = xmllib._Loader(__import__("pathlib").Path("/tmp"), {})
    out = []
    for child in root:
        if child.tag == "phase":
            try:
                out.append((child.attrib["type"],
                            ld._convert_phase(child)))
            except ValueError:
                pass        # kinds the fixture has but we don't (none today)
    return out


PHASES = _load_phases()


@pytest.mark.skipif(not PHASES, reason="reference fixtures unavailable")
@pytest.mark.parametrize("idx", range(len(PHASES)))
def test_fixture_phase_chi2(idx):
    name, (kind, g, params) = PHASES[idx]
    wi = jnp.broadcast_to(
        jnp.asarray([0.48666426339228763, 0.8111071056538127, -0.3244428422615251]),
        (3,))

    def sf(u2):
        wo, pdf = phaselib.sample(kind, jnp.float32(g),
                                  jnp.broadcast_to(wi, u2.shape[:-1] + (3,)),
                                  u2, params)
        sf.pdf = pdf
        return wo

    def pf(v):
        _, pdf = phaselib.eval_pdf(kind, jnp.float32(g),
                                   jnp.broadcast_to(wi, v.shape[:-1] + (3,)),
                                   v, params)
        return pdf

    passed, p, stats = spherical_chi2(sf, pf, n_samples=1 << 18,
                                      significance=0.001, seed=idx)
    assert passed, f"{name}: p={p} {stats}"
