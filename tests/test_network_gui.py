"""Network-GUI wire protocol: loopback client speaks the SIBR format."""
import json
import socket
import threading

import numpy as np
import pytest

from gaussian_gan_decoder_tpu.gaussians.network_gui import NetworkGUI


def test_protocol_roundtrip():
    gui = NetworkGUI("127.0.0.1", 0)
    port = gui.listener.getsockname()[1]

    result = {}

    def server():
        while gui.conn is None:
            gui.try_connect()
        cam, train, keep, smod, (w, h) = gui.receive()
        result["cam"] = cam
        result["smod"] = smod
        img = np.full((h, w, 3), 7, np.uint8)
        gui.send(img.tobytes(), "ok")

    t = threading.Thread(target=server, daemon=True)
    t.start()

    cli = socket.create_connection(("127.0.0.1", port))
    msg = {
        "resolution_x": 32, "resolution_y": 16, "train": False,
        "fov_x": 0.5, "fov_y": 0.5, "z_near": 0.01, "z_far": 10.0,
        "shs_python": False, "rot_scale_python": False, "keep_alive": True,
        "scaling_modifier": 1.5,
        "view_matrix": list(np.eye(4).reshape(-1)),
        "view_projection_matrix": list(np.eye(4).reshape(-1)),
    }
    blob = json.dumps(msg).encode()
    cli.sendall(len(blob).to_bytes(4, "little") + blob)

    img = b""
    want = 16 * 32 * 3
    while len(img) < want:
        img += cli.recv(want - len(img))
    n = int.from_bytes(cli.recv(4), "little")
    verify = cli.recv(n).decode()
    t.join(timeout=5)

    assert verify == "ok"
    assert len(img) == want and img[0] == 7
    assert result["smod"] == 1.5
    cam = result["cam"]
    assert cam.image_width == 32 and cam.image_height == 16
    # y/z columns get negated (ref network_gui.py:80-83)
    wv = np.asarray(cam.world_view_transform)
    np.testing.assert_allclose(np.abs(wv), np.eye(4), atol=1e-6)
