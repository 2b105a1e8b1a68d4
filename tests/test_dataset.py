"""Dataset parity tests against the reference's own pose math.

The yaw/pitch pose filter of MaskLabeledDataset (ref PanoHead/training/
dataset.py:329-352) keys on get_poseangle (training/utils.py:66-80); we
import the REFERENCE implementation (pure numpy, no torch) as the oracle.
"""
import json
import sys
import zipfile

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/PanoHead")

from gaussian_gan_decoder_tpu.data.dataset import (  # noqa: E402
    ImageFolderDataset,
    MaskLabeledDataset,
    get_poseangle,
)


def _cam_label(yaw_deg: float, pitch_deg: float = 0.0) -> np.ndarray:
    """25-dim EG3D label with the camera orbiting the origin at radius
    2.7: yaw 0 = frontal (camera on +z looking back at the head)."""
    yaw = np.deg2rad(yaw_deg)
    pitch = np.deg2rad(pitch_deg)
    cam_pos = 2.7 * np.array([
        np.sin(yaw) * np.cos(pitch), np.sin(pitch), np.cos(yaw) * np.cos(pitch)
    ])
    fwd = -cam_pos / np.linalg.norm(cam_pos)          # look at origin
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    c2w = np.eye(4)
    # OpenCV-style camera axes (x right, y down, z forward) like EG3D labels
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, down, fwd, cam_pos
    intr = np.array([4.26, 0, 0.5, 0, 4.26, 0.5, 0, 0, 1])
    return np.concatenate([c2w.reshape(-1), intr]).astype(np.float32)


def test_get_poseangle_matches_reference():
    from training.utils import get_poseangle as ref_get_poseangle

    rng = np.random.RandomState(0)
    for yaw in [0.0, 30.0, 85.0, 91.0, 120.0, 179.0, -30.0, -95.0, -170.0]:
        for pitch in [0.0, 15.0, -20.0]:
            lab = _cam_label(yaw, pitch)
            ours = np.asarray(get_poseangle(lab))
            ref = np.asarray(ref_get_poseangle([float(v) for v in lab]))
            np.testing.assert_allclose(ours, ref, atol=1e-4)
    # random non-orbit matrices too (arbitrary rotations)
    for _ in range(20):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        c2w = np.eye(4)
        c2w[:3, :3] = R
        c2w[:3, 3] = rng.randn(3)
        lab = np.concatenate([c2w.reshape(-1), np.zeros(9)]).astype(np.float32)
        ours = np.asarray(get_poseangle(lab))
        ref = np.asarray(ref_get_poseangle([float(v) for v in lab]))
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def _write_pair_zips(tmp_path, yaws):
    from PIL import Image

    img_zip = tmp_path / "img.zip"
    seg_zip = tmp_path / "seg.zip"
    labels = []
    with zipfile.ZipFile(img_zip, "w") as zi, zipfile.ZipFile(seg_zip, "w") as zs:
        for i, yaw in enumerate(yaws):
            name = f"im{i:03d}.png"
            for zf, val in ((zi, 60 + i), (zs, 255)):
                import io

                buf = io.BytesIO()
                Image.fromarray(
                    np.full((8, 8, 3), val, np.uint8)
                ).save(buf, format="png")
                zf.writestr(name, buf.getvalue())
            labels.append([name, [float(v) for v in _cam_label(yaw)]])
        zi.writestr("dataset.json", json.dumps({"labels": labels}))
    return str(img_zip), str(seg_zip)


def test_mask_dataset_back_repeat_boundary(tmp_path):
    """Views with |yaw| >= 90 (reference back cut) are oversampled
    back_repeat times; frontal views appear once; pose filters apply."""
    # NOTE: the reference decomposition clamps |yaw| within ~3.6 deg of 90
    # to exactly 90 (matrix2angle gimbal branch, R[2,0] > 0.998) — a view
    # at yaw 89 counts as BACK. Yaws here stay clear of the clamp band.
    yaws = [0.0, 45.0, 85.0, 95.0, 135.0, -120.0]
    img_zip, seg_zip = _write_pair_zips(tmp_path, yaws)
    ds = MaskLabeledDataset(img_zip, seg_zip, back_repeat=3)
    # 3 frontal (|yaw| < 90) once + 3 back views x3
    assert len(ds) == 3 + 3 * 3
    img, seg, lab = ds[0]
    assert img.shape == (3, 8, 8) and seg.shape == (1, 8, 8) and lab.shape == (25,)

    # yaw window filter: only |yaw| in [40, 100] survives (45, 85, 95)
    ds2 = MaskLabeledDataset(img_zip, seg_zip, back_repeat=2,
                             min_yaw=40.0, max_yaw=100.0)
    assert len(ds2) == 2 + 1 * 2  # 45, 85 once each + 95 twice


def test_image_folder_xflip_label(tmp_path):
    yaws = [30.0]
    img_zip, _ = _write_pair_zips(tmp_path, yaws)
    ds = ImageFolderDataset(img_zip, use_labels=True, xflip=True)
    assert len(ds) == 2
    base_yaw = get_poseangle(ds.get_label(0))[0]
    flip_yaw = get_poseangle(ds.get_label(1))[0]
    np.testing.assert_allclose(flip_yaw, -base_yaw, atol=1e-4)


def test_infinite_sampler_matches_reference():
    """Index-exact vs the ACTUAL reference InfiniteSampler
    (/root/reference/PanoHead/torch_utils/misc.py:113-136), including the
    sliding-window re-shuffle, sharding, and shuffle=False."""
    import os
    import sys

    import pytest as _pytest

    REF = "/root/reference/PanoHead"
    if not os.path.isdir(REF):
        _pytest.skip("no reference checkout")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    torch = _pytest.importorskip("torch")
    from torch_utils.misc import InfiniteSampler as RefSampler

    # torch >= 2.2 removed Sampler.__init__(data_source); the reference
    # calls super().__init__(dataset). Neutralize for the comparison.
    orig_init = torch.utils.data.Sampler.__init__
    torch.utils.data.Sampler.__init__ = lambda self, *a, **k: None

    from gaussian_gan_decoder_tpu.data.dataset import InfiniteSampler

    class _FakeDataset:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

    try:
        for kwargs in (
            dict(rank=0, num_replicas=1, seed=0),
            dict(rank=1, num_replicas=3, seed=7, window_size=0.25),
            dict(rank=0, num_replicas=2, seed=3, shuffle=False),
        ):
            ours = iter(InfiniteSampler(37, **kwargs))
            ref = iter(RefSampler(_FakeDataset(37), **kwargs))
            got = [next(ours) for _ in range(200)]
            want = [int(next(ref)) for _ in range(200)]
            assert got == want, kwargs
    finally:
        torch.utils.data.Sampler.__init__ = orig_init
