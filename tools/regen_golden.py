"""Regenerate the golden images in tests/golden/ (CPU backend, fixed
seed). Run after an INTENTIONAL estimator change; commit the new goldens
together with the change that motivated them.

    python tools/regen_golden.py [case ...]
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from tools.golden_scenes import CASES, render_case  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden")


def main():
    names = sys.argv[1:] or CASES
    os.makedirs(OUT, exist_ok=True)
    for name in names:
        img = render_case(name)
        path = os.path.join(OUT, f"{name}.npy")
        np.save(path, img.astype(np.float32))
        print(f"{name}: {img.shape} mean={img.mean():.5f} -> {path}")


if __name__ == "__main__":
    main()
