"""COLMAP binary parser + Blender reader + shape/MRC export round trips."""
import json
import os
import struct

import numpy as np
import pytest

from gaussian_gan_decoder_tpu.data.scene_io import (
    qvec2rotmat,
    read_blender_scene,
    read_cameras_binary,
    read_colmap_scene,
    read_images_binary,
    read_points3d_binary,
)
from gaussian_gan_decoder_tpu.gaussians.shape_export import save_mesh_ply, save_mrc


def _write_colmap(tmp_path):
    sparse = tmp_path / "sparse" / "0"
    os.makedirs(sparse)
    with open(sparse / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 640, 480))       # PINHOLE
        f.write(struct.pack("<4d", 500.0, 500.0, 320.0, 240.0))
    q = np.array([0.9238795, 0.0, 0.3826834, 0.0])          # 45 deg about y
    t = np.array([0.1, 0.2, 2.0])
    with open(sparse / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<i", 1))
        f.write(struct.pack("<4d", *q))
        f.write(struct.pack("<3d", *t))
        f.write(struct.pack("<i", 1))
        f.write(b"img0.png\x00")
        f.write(struct.pack("<Q", 2))                        # two 2D points
        f.write(struct.pack("<2d q", 1.0, 2.0, -1))
        f.write(struct.pack("<2d q", 3.0, 4.0, 7))
    with open(sparse / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", 2))
        for i in range(2):
            f.write(struct.pack("<q", i))
            f.write(struct.pack("<3d", i, i + 1.0, i + 2.0))
            f.write(struct.pack("<3B", 10, 20, 30))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 1, 0))
    return tmp_path


def test_colmap_binary_roundtrip(tmp_path):
    root = _write_colmap(tmp_path)
    cams = read_cameras_binary(str(root / "sparse/0/cameras.bin"))
    assert cams[1]["model"] == "PINHOLE" and cams[1]["width"] == 640
    imgs = read_images_binary(str(root / "sparse/0/images.bin"))
    assert imgs[1]["name"] == "img0.png"
    xyz, rgb = read_points3d_binary(str(root / "sparse/0/points3D.bin"))
    np.testing.assert_allclose(xyz[1], [1, 2, 3])
    np.testing.assert_allclose(rgb[0], [10 / 255, 20 / 255, 30 / 255])

    info = read_colmap_scene(str(root))
    assert len(info.cameras) == 1
    cam = info.cameras[0]
    # rotation matches quaternion, orthonormal
    np.testing.assert_allclose(cam.R, qvec2rotmat(imgs[1]["qvec"]), atol=1e-6)
    np.testing.assert_allclose(cam.R @ cam.R.T, np.eye(3), atol=1e-6)
    assert 0.5 < cam.fovx < 1.2


def test_blender_reader(tmp_path):
    frames = []
    for i in range(2):
        c2w = np.eye(4)
        c2w[2, 3] = 3.0
        frames.append({"file_path": f"train/r_{i}", "transform_matrix": c2w.tolist()})
    with open(tmp_path / "transforms_train.json", "w") as f:
        json.dump({"camera_angle_x": 0.7, "frames": frames}, f)
    info = read_blender_scene(str(tmp_path), n_random_points=64)
    assert len(info.cameras) == 2
    assert info.points.shape == (64, 3)
    np.testing.assert_allclose(info.cameras[0].fovx, 0.7)


def test_mrc_and_mesh_export(tmp_path):
    vol = np.random.RandomState(0).rand(8, 8, 8).astype(np.float32)
    p = str(tmp_path / "v.mrc")
    save_mrc(p, vol)
    blob = open(p, "rb").read()
    nx, ny, nz = struct.unpack("<3i", blob[:12])
    assert (nx, ny, nz) == (8, 8, 8)
    assert blob[208:212] == b"MAP "
    data = np.frombuffer(blob[1024:], "<f4").reshape(8, 8, 8)
    np.testing.assert_allclose(data, vol)

    verts = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]],
                      [[1, 0, 0], [0, 1, 0], [1, 1, 0]]], np.float32)
    mp = str(tmp_path / "m.ply")
    save_mesh_ply(mp, verts, 2)
    head = open(mp, "rb").read(200).decode("ascii", "ignore")
    assert "element vertex 4" in head      # shared verts welded
    assert "element face 2" in head
