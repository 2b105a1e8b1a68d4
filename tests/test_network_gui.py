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
        cam, train, keep, smod, (w, h), _msg = gui.receive()
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


def _smoke_renderer():
    """Tiny random-weight decoder + DecoderRenderer for protocol tests."""
    import jax
    from gaussian_gan_decoder_tpu.apps.visualizer import DecoderRenderer
    from gaussian_gan_decoder_tpu.decoder.heads import GaussianDecoder
    from gaussian_gan_decoder_tpu.decoder.target_pipeline import (
        TargetSamplerConfig)
    from gaussian_gan_decoder_tpu.models.triplane import TriPlaneGenerator
    from gaussian_gan_decoder_tpu.splat.rasterize import RasterizeConfig

    gen = TriPlaneGenerator(
        z_dim=32, c_dim=25, w_dim=32, img_resolution=32, variant="panohead",
        without_sr=True, channel_base=512, channel_max=32,
        rendering_kwargs=(
            ("triplane_size", 16), ("depth_resolution", 4),
            ("depth_resolution_importance", 4),
            ("c_gen_conditioning_zero", True),
        ),
    )
    gp = gen.init(jax.random.PRNGKey(0))
    dec = GaussianDecoder(generator=gen, decoder_type="sequential_reversed",
                          hidden_dim=16)
    params = dec.init(jax.random.PRNGKey(1), generator_params=gp)
    tcfg = TargetSamplerConfig(
        shape_res=16, num_points=256, face_capacity=2 ** 10,
        sigma_chunk=2 ** 10, neural_rendering_resolution=16, mc_level=0.5,
    )
    rcfg = RasterizeConfig(tile_size=16, max_pairs=2 ** 12, tile_capacity=64,
                           chunk=32)
    return DecoderRenderer(dec, params, gp, tcfg, raster_config=rcfg)


def test_visualizer_renderer_state():
    """Seed change, seed blending, stylemix, truncation and depth render
    all drive distinct frames through the DecoderRenderer (the reference
    viz/renderer.py:239-447 feature set on the decoder path)."""
    import jax.numpy as jnp
    import numpy as np

    from gaussian_gan_decoder_tpu.flagship import default_camera_params
    from gaussian_gan_decoder_tpu.gaussians.cameras import make_camera

    r = _smoke_renderer()
    _, c2w = default_camera_params()
    cam = make_camera(32, jnp.asarray(0.3), c2w)

    img_a = r.render(cam, {"seed": 0})
    assert img_a.shape == (32, 32, 3) and img_a.dtype == np.uint8
    # decode cache: identical state -> identical frame, no recompute
    img_a2 = r.render(cam, {"seed": 0})
    np.testing.assert_array_equal(img_a, img_a2)

    img_b = r.render(cam, {"seed": 5})                       # seed change
    assert (img_a != img_b).any()

    img_blend = r.render(
        cam, {"w0_seeds": [[0, 0.5], [5, 0.5]]})             # seed blending
    assert (img_blend != img_a).any() and (img_blend != img_b).any()

    img_mix = r.render(
        cam, {"seed": 0, "stylemix_seed": 5, "stylemix_idx": [0, 1]})
    assert (img_mix != img_a).any()                          # stylemix

    img_tr = r.render(cam, {"seed": 5, "trunc_psi": 0.2})
    assert (img_tr != img_b).any()                           # truncation

    depth = r.render(cam, {"seed": 0, "render_type": "depth"})
    assert depth.shape == (32, 32, 3)
    # depth frames are grayscale (r=g=b), unlike the color render
    assert (depth[..., 0] == depth[..., 1]).all()
    assert (depth[..., 1] == depth[..., 2]).all()

    alpha = r.render(cam, {"seed": 0, "render_type": "alpha"})
    assert (alpha[..., 0] == alpha[..., 2]).all()


def test_visualizer_protocol_extension_roundtrip():
    """A wire client that sends the extended renderer-state keys gets a
    frame back; a base-SIBR client (no extras) still works."""
    import jax.numpy as jnp

    from gaussian_gan_decoder_tpu.apps import visualizer as vizmod

    r = _smoke_renderer()
    gui = NetworkGUI("127.0.0.1", 0)
    port = gui.listener.getsockname()[1]
    frames = []

    def server():
        n_served = 0
        while n_served < 2:
            if gui.conn is None:
                gui.try_connect()
                continue
            cam, _t, _k, smod, (w, h), msg = gui.receive()
            img = r.render(cam, msg, smod)
            frames.append(msg.get("render_type", "image"))
            gui.send(img.tobytes(), "ok")
            n_served += 1

    t = threading.Thread(target=server, daemon=True)
    t.start()

    cli = socket.create_connection(("127.0.0.1", port))
    base = {
        "resolution_x": 32, "resolution_y": 32, "train": False,
        "fov_x": 0.5, "fov_y": 0.5, "z_near": 0.01, "z_far": 10.0,
        "shs_python": False, "rot_scale_python": False, "keep_alive": True,
        "scaling_modifier": 1.0,
        "view_matrix": list(np.eye(4).reshape(-1)),
        "view_projection_matrix": list(np.eye(4).reshape(-1)),
    }
    want = 32 * 32 * 3

    def ask(extra):
        blob = json.dumps({**base, **extra}).encode()
        cli.sendall(len(blob).to_bytes(4, "little") + blob)
        img = b""
        while len(img) < want:
            img += cli.recv(want - len(img))
        n = int.from_bytes(cli.recv(4), "little")
        assert cli.recv(n).decode() == "ok"
        return img

    img_plain = ask({})                                     # base SIBR client
    img_depth = ask({"seed": 3, "render_type": "depth"})    # extended client
    t.join(timeout=30)
    assert len(img_plain) == want and len(img_depth) == want
    assert frames == ["image", "depth"]


def test_visualizer_layer_capture():
    """layer_name renders a backbone activation visualization; layer_list
    enumerates capturable layers (ref viz/renderer.py:411-447)."""
    import numpy as np

    import jax.numpy as jnp

    from gaussian_gan_decoder_tpu.flagship import default_camera_params
    from gaussian_gan_decoder_tpu.gaussians.cameras import make_camera

    r = _smoke_renderer()
    layers = r.layer_list()
    names = [n for n, _shape, _dt in layers]
    assert any(n.startswith("b4") for n in names)
    assert any(n.endswith(".img") for n in names)

    _, c2w = default_camera_params()
    cam = make_camera(32, jnp.asarray(0.3), c2w)
    img = r.render(cam, {"seed": 0, "layer_name": names[0],
                         "sel_channels": 3, "img_normalize": True})
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    # single-channel select renders grayscale
    img1 = r.render(cam, {"seed": 0, "layer_name": names[0],
                          "sel_channels": 1})
    assert (img1[..., 0] == img1[..., 1]).all()


def test_visualizer_gan_render_modes():
    """render_type gan_image/gan_depth run the generator's own volume
    render from the viewer camera; depth_mult changes the sampling (ref
    eg3d/viz/render_depth_sample_widget.py), perf time is recorded."""
    import jax.numpy as jnp

    from gaussian_gan_decoder_tpu.flagship import default_camera_params
    from gaussian_gan_decoder_tpu.gaussians.cameras import make_camera

    r = _smoke_renderer()
    _, c2w = default_camera_params()
    cam = make_camera(32, jnp.asarray(0.3), c2w)

    gan = r.render(cam, {"seed": 0, "render_type": "gan_image"})
    assert gan.shape == (32, 32, 3) and gan.dtype == np.uint8
    assert r.last_render_ms > 0
    splat = r.render(cam, {"seed": 0})
    assert (gan != splat).any()                 # different render paths

    gdepth = r.render(cam, {"seed": 0, "render_type": "gan_depth"})
    assert (gdepth[..., 0] == gdepth[..., 1]).all()   # grayscale

    # depth_mult changes the sample positions -> different frame
    gan2 = r.render(cam, {"seed": 0, "render_type": "gan_image",
                          "depth_mult": 2.0})
    assert (gan2 != gan).any()
    # camera conversion roundtrip: the 25-dim c reproduces the viewer cam
    c = np.asarray(r._camera_params_from_cam(cam))[0]
    wv = np.asarray(cam.world_view_transform)
    np.testing.assert_allclose(
        np.linalg.inv(c[:16].reshape(4, 4).T), wv, atol=1e-5)
