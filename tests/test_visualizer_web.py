"""Browser GUI server (apps/visualizer_web): page, layer list, and frame
endpoints over HTTP against a tiny random-weight DecoderRenderer — the
headless-host replacement for the reference's imgui desktop app
(/root/reference/eg3d/visualizer.py:39-193)."""
import json
import threading
import urllib.request

from tests.test_network_gui import _smoke_renderer


def test_web_viewer_endpoints():
    import socket

    from gaussian_gan_decoder_tpu.apps.visualizer_web import (
        _Handler, serve_http)

    renderer = _smoke_renderer()

    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()

    t = threading.Thread(
        target=serve_http, args=(renderer, "127.0.0.1", port), daemon=True)
    t.start()

    base = f"http://127.0.0.1:{port}"
    for _ in range(100):
        try:
            page = urllib.request.urlopen(base + "/", timeout=2).read()
            break
        except OSError:
            import time

            time.sleep(0.05)
    else:
        raise AssertionError("server never came up")
    assert b"truncation psi" in page and b"/api/frame" in page

    layers = json.loads(
        urllib.request.urlopen(base + "/api/layers", timeout=30).read())
    assert layers and all(isinstance(n, str) for n, _ in layers)

    # plain decoder frame
    r = urllib.request.urlopen(
        base + "/api/frame?seed=3&size=32&render_type=image&yaw=0.3",
        timeout=120)
    jpg = r.read()
    assert jpg[:2] == b"\xff\xd8" and float(r.headers["X-Render-Ms"]) > 0

    from io import BytesIO

    from PIL import Image

    img = Image.open(BytesIO(jpg))
    assert img.size == (32, 32)

    # stylemix + truncation + depth render drive a DIFFERENT frame
    r2 = urllib.request.urlopen(
        base + "/api/frame?seed=3&size=32&render_type=depth"
               "&stylemix_seed=7&stylemix_idx=1,2&trunc_psi=0.6",
        timeout=120)
    assert r2.read() != jpg

    # layer capture endpoint
    name = layers[0][0]
    r3 = urllib.request.urlopen(
        base + f"/api/frame?seed=3&size=32&layer_name={name}"
               "&img_normalize=1", timeout=120)
    assert r3.read()[:2] == b"\xff\xd8"

    # malformed input surfaces a 500, not a hung connection
    try:
        urllib.request.urlopen(
            base + "/api/frame?seed=3&size=32&layer_name=bogus", timeout=60)
        raise AssertionError("expected HTTPError for unknown layer")
    except urllib.error.HTTPError as e:
        assert e.code == 500

    assert _Handler.renderer is renderer
