"""DLNR evaluation harness tests (EPE/D1 math + the folder driver),
mirroring the reference's validate_* semantics (evaluate_stereo.py)."""

import os

import numpy as np
import pytest

from gs2mesh_tpu.cli.dlnr_eval import (epe_d1, evaluate_folder, read_pfm)


def test_epe_d1_semantics():
    gt = np.array([[1.0, 2.0, 4.0, np.inf],
                   [0.0, 3.0, 3.0, 5.0]], np.float32)
    pred = np.array([[1.5, 2.0, 1.0, 9.0],
                     [7.0, 3.0, 5.5, 5.0]], np.float32)
    valid = np.isfinite(gt) & (gt > 0)
    m = epe_d1(pred, gt, valid, bad_px=2.0)
    # valid errors: |.5|, 0, 3, 0, 2.5, 0 -> epe 1.0, >2px: 2/6
    assert m["valid_px"] == 6
    assert m["epe"] == pytest.approx(1.0)
    assert m["d1"] == pytest.approx(2 / 6)


def test_pfm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    d = rng.normal(size=(7, 5)).astype(np.float32)
    p = str(tmp_path / "disp0GT.pfm")
    with open(p, "wb") as f:
        f.write(b"Pf\n5 7\n-1.0\n")
        np.flipud(d).astype("<f4").tofile(f)
    got = read_pfm(p)
    np.testing.assert_array_equal(got, d)


@pytest.mark.slow
def test_evaluate_folder_runs_end_to_end(tmp_path):
    """Folder driver: tiny synthetic pair set through the real DLNR forward
    (random weights — validates the harness plumbing, not network quality,
    matching the repo's random-weight port-validation strategy)."""
    from PIL import Image

    from gs2mesh_tpu.stereo import init_dlnr_params

    rng = np.random.default_rng(1)
    for name in ("pair_a", "pair_b"):
        d = tmp_path / name
        os.makedirs(d)
        img = rng.uniform(0, 255, (48, 64, 3)).astype(np.uint8)
        Image.fromarray(img).save(d / "im0.png")
        Image.fromarray(np.roll(img, 3, axis=1)).save(d / "im1.png")
        gt = np.full((48, 64), 3.0, np.float32)
        with open(d / "disp0GT.pfm", "wb") as f:
            f.write(b"Pf\n64 48\n-1.0\n")
            np.flipud(gt).astype("<f4").tofile(f)

    params = init_dlnr_params(seed=0)
    s = evaluate_folder(params, str(tmp_path), iters=2, bad_px=2.0,
                        verbose=False)
    assert s["pairs"] == 2
    assert np.isfinite(s["epe"]) and np.isfinite(s["d1_pct"])
    assert all(m["valid_px"] == 48 * 64 for m in s["per_pair"])
