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
    # LPIPS column (ref gaussian_splatting/metrics.py:36-55 layout):
    # per-view rows + mean, finite values
    assert "LPIPS" in summary["toy"]["mean"]
    assert all("LPIPS" in r for r in summary["toy"]["per_view"])
    assert np.isfinite(summary["toy"]["mean"]["LPIPS"])
    # renders on disk
    renders = os.listdir(os.path.join(out, "toy", "renders"))
    assert any(n.endswith(".png") for n in renders)


def test_train_3dgs_gui_hook(tmp_path):
    """--gui_port serves a SIBR-protocol viewer during training (ref
    gaussian_splatting/train.py:52-65)."""
    import socket
    import threading

    from gaussian_gan_decoder_tpu.apps.train_3dgs import main as train_main

    scene = str(tmp_path / "toy")
    _make_blender_scene(scene)

    # reserve a port
    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()

    got = {}

    def client():
        import time

        for _ in range(200):
            try:
                cli = socket.create_connection(("127.0.0.1", port), timeout=0.2)
                break
            except OSError:
                time.sleep(0.05)
        else:
            return
        msg = {
            "resolution_x": 32, "resolution_y": 32, "train": True,
            "fov_x": 0.7, "fov_y": 0.7, "z_near": 0.01, "z_far": 10.0,
            "shs_python": False, "rot_scale_python": False,
            "keep_alive": True, "scaling_modifier": 1.0,
            "view_matrix": list(np.eye(4).reshape(-1)),
            "view_projection_matrix": list(np.eye(4).reshape(-1)),
        }
        blob = json.dumps(msg).encode()
        cli.sendall(len(blob).to_bytes(4, "little") + blob)
        img = b""
        want = 32 * 32 * 3
        cli.settimeout(60)
        while len(img) < want:
            chunk = cli.recv(want - len(img))
            if not chunk:
                return
            img += chunk
        n = int.from_bytes(cli.recv(4), "little")
        got["verify"] = cli.recv(n).decode()
        got["img"] = img

    # Up to 3 training runs: the client thread can be GIL-starved for the
    # WHOLE run when the host is loaded (XLA compiles hold the GIL;
    # observed as a full-suite-only flake even at 150 iterations,
    # 2026-08-20) — the protocol exchange itself is what's under test,
    # not the scheduler, so retry with a fresh port until the client
    # gets scheduled
    for attempt in range(3):
        t = threading.Thread(target=client, daemon=True)
        t.start()
        train_main(["-s", scene, "-m", str(tmp_path / "out"),
                    "--iterations", "150", "--capacity", "256",
                    "--image_size", "32", "--gui_port", str(port),
                    "--save_iterations", "--force_cpu"])
        t.join(timeout=30)
        if got.get("img") is not None:
            break
        probe = socket.socket()
        probe.bind(("127.0.0.1", 0))
        port = probe.getsockname()[1]
        probe.close()
    assert got.get("img") is not None and len(got["img"]) == 32 * 32 * 3
    assert got["verify"] == scene
