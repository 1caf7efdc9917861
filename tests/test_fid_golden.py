"""sinFID absolute-value anchoring (BASELINE "within 5% of reference").

Two layers:
  1. A pinned regression value computed with the deterministic seeded-random
     Inception features on the checked-in image pair — always runs, catches
     any numerical drift in the feature extractor / stats / Frechet pipeline.
  2. The REAL-weights golden test: when HPVAEGAN_INCEPTION_WEIGHTS points at
     converted pytorch-fid weights AND benchdata/sifid_golden.json exists
     (recorded via scripts/make_sifid_golden.py on a machine with the weight
     file — see that script's docstring for the download + convert
     procedure), assert the JAX pipeline reproduces the recorded FID within
     the stored tolerance (5%). Reference: src/sinFID/inception.py:60-62
     hub-loads the pretrained net; fid_score.py:105-159 is the same Frechet
     routine.
"""

import json
import os

import numpy as np
import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")
REAL = os.path.join(ROOT, "data", "imgs", "air_balloons.jpg")
FAKE = os.path.join(ROOT, "data", "imgs", "golden_fake.png")
GOLDEN = os.path.join(ROOT, "benchdata", "sifid_golden.json")

# computed once with the seeded random init (metrics/inception.py seed=0) on
# the test platform (virtual 8-device XLA:CPU); ~0.1% float variation exists
# across platforms, so the tolerance is 1% — any real pipeline change
# (features / per-position stats / Frechet) moves this by far more
PINNED_RANDOM_SIFID = 0.24730593410738866


def _pair():
    import imageio.v2 as imageio

    real = np.asarray(imageio.imread(REAL)).astype(np.float32)[None, :, :, :3]
    fake = np.asarray(imageio.imread(FAKE)).astype(np.float32)[None, :, :, :3]
    real, fake = real / 255.0, fake / 255.0
    h = min(real.shape[1], fake.shape[1])
    w = min(real.shape[2], fake.shape[2])
    return real[:, :h, :w], fake[:, :h, :w]


def test_sifid_pinned_random_features():
    from hpvaegan_tpu.metrics.fid import sifid_arrays

    real, fake = _pair()
    got = float(np.mean(sifid_arrays(real, fake)))
    assert got == pytest.approx(PINNED_RANDOM_SIFID, rel=1e-2), got


@pytest.mark.skipif(
    not (os.environ.get("HPVAEGAN_INCEPTION_WEIGHTS", "")
         and os.path.exists(os.environ.get("HPVAEGAN_INCEPTION_WEIGHTS", ""))
         and os.path.exists(GOLDEN)),
    reason="real Inception weights / golden fixture absent (see "
           "scripts/make_sifid_golden.py for where to get them)")
def test_sifid_golden_real_weights():
    from hpvaegan_tpu.metrics.fid import sifid_arrays

    with open(GOLDEN) as f:
        golden = json.load(f)
    real, fake = _pair()
    got = float(np.mean(sifid_arrays(real, fake)))
    want = golden["sifid_block64"]
    tol = golden.get("tolerance_rel", 0.05)
    assert abs(got - want) <= tol * abs(want), (got, want)
