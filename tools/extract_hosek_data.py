"""Transcribe the published Hosek-Wilkie 2012 RGB sky-model dataset into
mitsuba_tpu/models/data/hosek_rgb.npz.

Provenance: the coefficient data is the PUBLIC dataset released with
"An Analytic Model for Full Spectral Sky-Dome Radiance" (Hosek &
Wilkie, SIGGRAPH 2012), distributed by the authors at
http://cgg.mff.cuni.cz/projects/SkylightModelling/ and vendored
verbatim by Mitsuba 0.6 as src/emitters/sunsky/skymodeldata.h. This
script parses the numeric literals of the RGB tables (datasetRGB1..3,
datasetRGBRad1..3) from that header — transcription of published
constants, not code.

Layout (per channel): params[albedo(2), turbidity(10), bezier(6),
coeff(9)] and rad[albedo(2), turbidity(10), bezier(6)].

Usage: python tools/extract_hosek_data.py [path-to-skymodeldata.h]
"""
import os
import re
import sys

import numpy as np

DEFAULT = "/root/reference/src/emitters/sunsky/skymodeldata.h"


def parse_array(text, name):
    m = re.search(r"double\s+%s\[\]\s*=\s*\{(.*?)\};" % name, text, re.S)
    if not m:
        raise SystemExit(f"array {name} not found")
    body = re.sub(r"//[^\n]*", "", m.group(1))
    vals = [float(t) for t in re.findall(r"[-+0-9.eE]+", body)]
    return np.asarray(vals, np.float64)


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else DEFAULT
    text = open(src).read()
    params = np.stack([
        parse_array(text, f"datasetRGB{c}").reshape(2, 10, 6, 9)
        for c in (1, 2, 3)
    ])
    rad = np.stack([
        parse_array(text, f"datasetRGBRad{c}").reshape(2, 10, 6)
        for c in (1, 2, 3)
    ])
    # spectral datasets: 11 bands at 320..720 nm step 40 (the
    # SPECTRUM_SAMPLES != 3 path of the published model)
    bands = list(range(320, 721, 40))
    spec_params = np.stack([
        parse_array(text, f"dataset{b}").reshape(2, 10, 6, 9)
        for b in bands
    ])
    spec_rad = np.stack([
        parse_array(text, f"datasetRad{b}").reshape(2, 10, 6)
        for b in bands
    ])
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "mitsuba_tpu", "models", "data",
        "hosek_rgb.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, params=params, rad=rad,
                        spec_params=spec_params, spec_rad=spec_rad,
                        spec_bands=np.asarray(bands, np.float64))
    print(f"wrote {out}: params {params.shape}, rad {rad.shape}, "
          f"spectral {spec_params.shape}")
    print("spot checks:", params[0, 0, 0, 0, :3], rad[0, 0, 0, :3])


if __name__ == "__main__":
    main()
