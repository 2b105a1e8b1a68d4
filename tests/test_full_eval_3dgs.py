"""full_eval_3dgs orchestrator: train -> render -> metrics over scenes
(ref gaussian_splatting/full_eval.py) on a tiny synthetic Blender scene."""
import json
import os

import numpy as np


def _make_blender_scene(root):
    from PIL import Image

    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    rng = np.random.RandomState(0)
    frames = []
    for i in range(2):
        c2w = np.eye(4)
        c2w[2, 3] = 3.0
        c2w[0, 3] = 0.2 * i
        name = f"train/r_{i}"
        Image.fromarray(
            rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
                os.path.join(root, name + ".png"))
        frames.append({"file_path": name, "transform_matrix": c2w.tolist()})
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump({"camera_angle_x": 0.7, "frames": frames}, f)


def test_full_eval_pipeline(tmp_path):
    from gaussian_gan_decoder_tpu.apps.full_eval_3dgs import main as fe_main

    scene = str(tmp_path / "toy")
    _make_blender_scene(scene)
    out = str(tmp_path / "eval")
    summary = fe_main([
        "--scenes", scene, "--output_path", out,
        "--iterations", "10", "--capacity", "256",
        "--image_size", "32", "--force_cpu",
    ])
    assert os.path.exists(os.path.join(out, "full_eval.json"))
    assert "toy" in summary
    assert "PSNR" in summary["toy"]["mean"]
    # renders on disk
    renders = os.listdir(os.path.join(out, "toy", "renders"))
    assert any(n.endswith(".png") for n in renders)
