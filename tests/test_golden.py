"""Golden-image regression tests (the ImageComparer workflow as pytest,
SURVEY.md §4): renders must match stored references within MSE/SMAPE
thresholds. Regenerate with tests/update_goldens.py on intentional change."""

from pathlib import Path

import numpy as np
import pytest

from stratum_tpu.utils import compare
from tests.update_goldens import GOLDEN, configs, render


@pytest.mark.parametrize(
    "name",
    ["cornell_path", "cornell_disney", "spheres_disney",
     "colonnade_textured", "cornell_smoke"],
)
def test_golden(name):
    path = GOLDEN / f"{name}.npy"
    if not path.exists():
        pytest.skip("goldens not generated (run tests/update_goldens.py)")
    scene, view, cfg, spp = configs()[name]
    img = render(scene, view, cfg, spp)
    ref = np.load(path)
    # identical RNG => near-bitwise match (float reassociation tolerance)
    assert float(compare.rmse(img, ref)) < 1e-4, float(compare.rmse(img, ref))
    assert float(compare.smape(img, ref)) < 1e-4
