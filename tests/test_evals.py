"""FID harness tests (hermetic feature extractor)."""

import numpy as np
import pytest

from sd3_tpu.evals import fid


def _write_images(d, seed, n=12, bright=0.0):
    from PIL import Image
    rng = np.random.default_rng(seed)
    d.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        arr = np.clip(rng.random((24, 24, 3)) * 255 * (1 - bright) +
                      bright * 255, 0, 255).astype(np.uint8)
        Image.fromarray(arr).save(str(d / f"{i}.png"))
    return str(d)


def test_frechet_identity_is_zero():
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((64, 8))
    mu, s = fid.activation_stats(feats)
    assert abs(fid.frechet_distance(mu, s, mu, s)) < 1e-6


def test_frechet_known_gaussians():
    # FID between N(0, I) and N(m, I) is |m|^2
    d = 4
    mu1, mu2 = np.zeros(d), np.full(d, 2.0)
    s = np.eye(d)
    assert abs(fid.frechet_distance(mu1, s, mu2, s) - 16.0) < 1e-6


def test_fid_between_dirs(tmp_path):
    d1 = _write_images(tmp_path / "a", seed=0)
    d2 = _write_images(tmp_path / "b", seed=1)
    d3 = _write_images(tmp_path / "c", seed=2, bright=0.9)
    f = fid.ReducedPixelFeatures()
    same = fid.fid_between_dirs(d1, d2, f)
    diff = fid.fid_between_dirs(d1, d3, f)
    assert diff > same >= 0.0


def test_stats_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    mu, s = fid.activation_stats(rng.standard_normal((32, 6)))
    p = str(tmp_path / "stats.npz")
    fid.save_stats(p, mu, s)
    mu2, s2 = fid.load_stats(p)
    np.testing.assert_array_equal(mu, mu2)
    np.testing.assert_array_equal(s, s2)
