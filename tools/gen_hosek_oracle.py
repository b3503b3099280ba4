#!/usr/bin/env python
"""Regenerate the Hosek-Wilkie oracle tables in tests/test_sunsky.py.

The oracle constants (_HOSEK_ORACLE, _HOSEK_SPEC_ORACLE) are outputs of
the authors' published SIGGRAPH 2012 reference implementation
(ArHosekSkyModel, (c) Lukas Hosek & Alexander Wilkie, released alongside
"An Analytic Model for Full Spectral Sky-Dome Radiance"), which the
reference vendors verbatim at src/emitters/sunsky/skymodel.{h,cpp} +
skymodeldata.h (see skymodel.cpp:1-70 provenance header).

This script compiles that implementation STANDALONE (the only
mitsuba-specific line in skymodel.cpp is an unused #include, satisfied
here with an empty shim header), evaluates the exact grid pinned in
tests/test_sunsky.py, and prints the two Python tables. Run:

    python tools/gen_hosek_oracle.py

Requires g++ and a readable reference checkout (path override via
MITSUBA_REF=...). Exits 0 with a message if either is unavailable —
the pinned constants in the test remain the record.

NOTE: no reference source is copied into this repository; the compiled
artifacts live in a temp dir and only numeric outputs are emitted
(same policy as tools/extract_hosek_data.py).
"""
import os
import shutil
import subprocess
import sys
import tempfile

REF = os.environ.get("MITSUBA_REF", "/root/reference")
SUNSKY = os.path.join(REF, "src", "emitters", "sunsky")

# The exact grids pinned in tests/test_sunsky.py.
RGB_GRID = [
    (2.0, 0.1, 0.2, 0.05), (2.0, 0.5, 0.2, 0.05), (2.0, 1.2, 0.2, 0.05),
    (4.5, 0.1, 0.2, 0.05), (4.5, 0.5, 0.2, 0.05), (4.5, 1.2, 0.2, 0.05),
    (8.0, 0.1, 0.2, 0.05), (8.0, 0.5, 0.2, 0.05), (8.0, 1.2, 0.2, 0.05),
    (2.0, 0.1, 0.9, 0.7), (4.5, 0.5, 0.9, 0.7), (8.0, 1.2, 0.9, 0.7),
]
RGB_ALBEDO = 0.3
SPEC_GRID = [
    (2.5, 0.15, 0.3, 0.1), (2.5, 0.15, 0.3, 1.5),
    (2.5, 0.15, 1.2, 0.1), (2.5, 0.15, 1.2, 1.5),
    (2.5, 0.9, 0.3, 0.1), (2.5, 0.9, 0.3, 1.5),
]
SPEC_ALBEDO = 0.25
SPEC_LAMBDAS = [400.0, 541.3, 680.0]

DRIVER = r"""
#include <cstdio>
#include "skymodel.h"

int main() {
    double rgb_grid[][4] = { %(rgb_rows)s };
    for (auto &row : rgb_grid) {
        ArHosekTristimSkyModelState *st =
            arhosek_rgb_skymodelstate_alloc_init(row[0], %(rgb_albedo)s, row[1]);
        printf("RGB %%g %%g %%g %%g", row[0], row[1], row[2], row[3]);
        for (int c = 0; c < 3; ++c)
            printf(" %%.9e",
                   arhosek_tristim_skymodel_radiance(st, row[2], row[3], c));
        printf("\n");
        arhosek_tristim_skymodelstate_free(st);
    }
    double spec_grid[][4] = { %(spec_rows)s };
    double lambdas[] = { %(lambdas)s };
    for (auto &row : spec_grid) {
        ArHosekSkyModelState *st =
            arhosekskymodelstate_alloc_init(row[0], %(spec_albedo)s, row[1]);
        printf("SPEC %%g %%g %%g %%g", row[0], row[1], row[2], row[3]);
        for (double lam : lambdas)
            printf(" %%.9e",
                   arhosekskymodel_radiance(st, row[2], row[3], lam));
        printf("\n");
        arhosekskymodelstate_free(st);
    }
    return 0;
}
"""


def main():
    gxx = shutil.which("g++")
    if gxx is None:
        print("gen_hosek_oracle: g++ unavailable; pinned constants stand.")
        return 0
    if not os.path.exists(os.path.join(SUNSKY, "skymodel.cpp")):
        print(f"gen_hosek_oracle: reference not found at {SUNSKY}; "
              "set MITSUBA_REF. Pinned constants stand.")
        return 0

    rows = lambda g: ", ".join("{%g, %g, %g, %g}" % r for r in g)
    driver = DRIVER % {
        "rgb_rows": rows(RGB_GRID), "rgb_albedo": repr(RGB_ALBEDO),
        "spec_rows": rows(SPEC_GRID), "spec_albedo": repr(SPEC_ALBEDO),
        "lambdas": ", ".join(repr(l) for l in SPEC_LAMBDAS),
    }
    with tempfile.TemporaryDirectory() as td:
        # skymodel.cpp's sole mitsuba dependency is an unused include.
        os.makedirs(os.path.join(td, "mitsuba"))
        open(os.path.join(td, "mitsuba", "mitsuba.h"), "w").write(
            "// shim: skymodel.cpp uses no mitsuba symbols, but relies on\n"
            "// the real header pulling in <cmath>/<cassert>/malloc\n"
            "#include <cmath>\n#include <cassert>\n#include <cstdlib>\n"
            "#include <cstring>\nusing namespace std;\n")
        open(os.path.join(td, "driver.cpp"), "w").write(driver)
        exe = os.path.join(td, "oracle")
        subprocess.check_call(
            [gxx, "-O2", "-std=c++14", "-I", td, "-I", SUNSKY,
             os.path.join(td, "driver.cpp"),
             os.path.join(SUNSKY, "skymodel.cpp"), "-o", exe, "-lm"])
        out = subprocess.check_output([exe], text=True)

    rgb_lines, spec_lines = [], []
    for line in out.splitlines():
        parts = line.split()
        kind, (t, e, th, g), vals = parts[0], parts[1:5], parts[5:8]
        row = (f"    ({t}, {e}, {th}, {g}, "
               f"({vals[0]}, {vals[1]}, {vals[2]})),")
        (rgb_lines if kind == "RGB" else spec_lines).append(row)
    print("_HOSEK_ORACLE = [")
    print("\n".join(rgb_lines))
    print("]\n")
    print("_HOSEK_SPEC_ORACLE = [")
    print("\n".join(spec_lines))
    print("]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
