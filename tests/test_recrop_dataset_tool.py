"""Recrop geometry + seg-pair dataset tool (ref dataset_tool_seg.py,
3DDFA_V2_cropping/recrop_images.py)."""
import json
import os
import pickle
import zipfile

import numpy as np
import pytest

from gaussian_gan_decoder_tpu.data.recrop import (
    angle2matrix, crop_bound_from_landmarks, crop_final, eg3d_cam_params,
    find_center_bbox, matrix2angle, p2srt, refine_quad_with_pose)


def test_p2srt_angle_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(20):
        yaw, pitch, roll = rng.uniform(-1.2, 1.2, 3)
        R = angle2matrix(yaw, pitch, roll)
        s_true = rng.uniform(0.5, 2.0)
        t = rng.randn(3)
        P = np.concatenate([s_true * R, t[:, None]], axis=1)
        s, R2, t2 = p2srt(P)
        assert abs(s - s_true) < 1e-5
        np.testing.assert_allclose(R2, R, atol=1e-5)
        np.testing.assert_allclose(t2, t, atol=1e-5)
        y2, p2, r2 = matrix2angle(R2)
        np.testing.assert_allclose([y2, p2, r2], [yaw, pitch, roll], atol=1e-4)


def test_eg3d_cam_params_structure():
    """Identity head pose -> camera on the +z axis at radius 2.7 looking
    at the origin, canonical intrinsics (ref eg3dcamparams)."""
    label = eg3d_cam_params(np.eye(4))
    assert label.shape == (25,)
    cam2world = label[:16].reshape(4, 4)
    intr = label[16:].reshape(3, 3)
    np.testing.assert_allclose(intr[0, 0], 4.2647, atol=1e-6)
    # camera position: distance 2.7 from origin
    pos = cam2world[:3, 3]
    np.testing.assert_allclose(np.linalg.norm(pos), 2.7, atol=1e-5)
    np.testing.assert_allclose(pos, [0, 0, 2.7], atol=1e-5)
    # rotating the head by yaw moves the camera the opposite way, same radius
    label2 = eg3d_cam_params(
        np.block([[angle2matrix(0.5, 0, 0), np.zeros((3, 1))],
                  [np.zeros((1, 3)), np.ones((1, 1))]]))
    pos2 = label2[:16].reshape(4, 4)[:3, 3]
    np.testing.assert_allclose(np.linalg.norm(pos2), 2.7, atol=1e-5)
    assert abs(pos2[0]) > 0.5  # moved off-axis


def test_crop_bound_shapes_and_orientation():
    # synthetic frontal 68-pt face around (100, 100)
    rng = np.random.RandomState(1)
    lm = rng.uniform(80, 120, (68, 2))
    lm[36:42] = [90, 90] + rng.randn(6, 2) * 0.5   # left eye
    lm[42:48] = [110, 90] + rng.randn(6, 2) * 0.5  # right eye
    lm[48] = [92, 112]
    lm[54] = [108, 112]
    lm[33] = [100, 103]
    for method in ("ffhq", "default"):
        quad, c, x, y = crop_bound_from_landmarks(lm, method=method)
        assert quad.shape == (4, 2)
        # quad is a square: |x| == |y|, x dot y == 0
        np.testing.assert_allclose(np.hypot(*x), np.hypot(*y), rtol=1e-6)
        assert abs(np.dot(x, y)) < 1e-6
        # center inside the quad bbox
        assert quad[:, 0].min() < c[0] < quad[:, 0].max()
        assert quad[:, 1].min() < c[1] < quad[:, 1].max()


def test_refine_quad_gates():
    c = np.array([100.0, 100.0])
    x = np.array([50.0, 0.0])
    y = np.array([0.0, 50.0])
    R = angle2matrix(0.2, 0.1, 0.05)
    # P scaled so s_abs = s_rel*2000 with roi covering most of the crop
    # gives s in the acceptance window
    s_rel = 1.0 / 2000.0
    P = np.concatenate([s_rel * R, np.array([[60.0], [60.0], [66.0]])], axis=1)
    roi = (0, 0, 511, 511)
    res = refine_quad_with_pose(c, x, y, P, roi, crop_size=512)
    assert res.accepted, res.reject_reason
    assert res.cam_label.shape == (25,)
    assert 0.7 <= res.s <= 1.3
    # extreme roll is rejected
    R_bad = angle2matrix(0.0, 0.0, 1.2)   # 69 deg roll > 50 gate
    P_bad = np.concatenate([s_rel * R_bad, np.array([[60.0], [60.0], [66.0]])],
                           axis=1)
    res_bad = refine_quad_with_pose(c, x, y, P_bad, roi, crop_size=512)
    assert not res_bad.accepted and "pose" in res_bad.reject_reason


def test_find_center_bbox():
    boxes = [(0, 0, 10, 10), (250, 250, 262, 262), (400, 0, 420, 30)]
    assert find_center_bbox(boxes, 512, 512) == 1


def test_crop_final_feathering():
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    img = np.full((300, 300, 3), 200, np.uint8)
    img[100:200, 100:200] = 40
    quad = np.array([[-20, -20], [-20, 280], [280, 280], [280, -20]],
                    np.float32)  # reads outside -> feathered border path
    out = crop_final(img, quad, size=128, min_size=64)
    assert out is not None and out.shape == (128 + 12, 128 + 12, 3)
    # too-small quads rejected
    tiny = np.array([[0, 0], [0, 10], [10, 10], [10, 0]], np.float32)
    assert crop_final(img, tiny, size=128, min_size=64) is None


def test_dataset_tool_seg_pairs(tmp_path):
    """Build paired img+seg zips and load them through MaskLabeledDataset."""
    from PIL import Image

    from gaussian_gan_decoder_tpu.apps.dataset_tool import main as tool_main
    from gaussian_gan_decoder_tpu.data.dataset import MaskLabeledDataset

    src = tmp_path / "img"
    seg = tmp_path / "seg"
    src.mkdir()
    seg.mkdir()
    rng = np.random.RandomState(0)
    labels = {}
    for i in range(4):
        name = f"face_{i}.png"
        Image.fromarray(rng.randint(0, 255, (48, 48, 3), np.uint8)).save(src / name)
        Image.fromarray((rng.rand(48, 48) > 0.5).astype(np.uint8) * 255).save(
            seg / f"face_{i}.png")
        # frontal-ish camera label
        lab = list(np.eye(4, dtype=np.float32).reshape(-1)) + list(
            np.array([[4.26, 0, 0.5], [0, 4.26, 0.5], [0, 0, 1]], np.float32).reshape(-1))
        lab[11] = 2.7
        labels[name] = [float(v) for v in lab]
    with open(tmp_path / "labels.json", "w") as f:
        json.dump(labels, f)

    img_zip = str(tmp_path / "img.zip")
    seg_zip = str(tmp_path / "seg.zip")
    tool_main([
        "--source", str(src), "--dest", img_zip,
        "--seg_source", str(seg), "--seg_dest", seg_zip,
        "--labels", str(tmp_path / "labels.json"),
        "--resolution", "32", "--use_basename",
    ])

    with zipfile.ZipFile(img_zip) as z:
        meta = json.loads(z.read("dataset.json"))
        names = sorted(n for n in z.namelist() if n.endswith(".png"))
    with zipfile.ZipFile(seg_zip) as z:
        seg_names = sorted(n for n in z.namelist() if n.endswith(".png"))
    assert names == seg_names == [f"00000/img0000000{i}.png" for i in range(4)]
    assert meta["labels"] is not None and len(meta["labels"]) == 4
    assert len(meta["fnames"]) == 4

    ds = MaskLabeledDataset(img_zip, seg_zip)
    img, seg_m, label = ds[0]
    assert img.shape == (3, 32, 32)
    assert seg_m.shape[-2:] == (32, 32)
    assert label.shape == (25,)
