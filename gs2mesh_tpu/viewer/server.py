"""Browser viewer server: orbit camera -> jitted rasterize -> PNG stream.

Replaces the reference's offline SIBR gaussian viewer
(SIBR_viewers/src/projects/gaussianviewer) with a TPU-native design: the
framework's own rasterizer renders every requested pose on the accelerator;
the browser is a thin controller (vanilla JS, no dependencies). One jit
per resolution (Camera is a pytree with static width/height).
"""

from __future__ import annotations

import io
import json
import math
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from gs2mesh_tpu.core.camera import Camera, make_camera


def orbit_camera(target, radius: float, azimuth_deg: float,
                 elevation_deg: float, fov_deg: float,
                 width: int, height: int) -> Camera:
    """Look-at camera on an orbit around ``target`` (GS conventions)."""
    az = math.radians(azimuth_deg)
    el = math.radians(elevation_deg)
    target = np.asarray(target, np.float64)
    eye = target + radius * np.array([
        math.cos(el) * math.sin(az),
        math.sin(el),
        -math.cos(el) * math.cos(az)])
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    up_world = np.array([0.0, -1.0, 0.0])     # GS/COLMAP: y points down
    right = np.cross(up_world, fwd)
    nr = np.linalg.norm(right)
    if nr < 1e-8:                              # looking straight up/down
        right = np.array([1.0, 0.0, 0.0])
    else:
        right = right / nr
    down = np.cross(fwd, right)
    Rw2v = np.stack([right, down, fwd], axis=0)
    T = -Rw2v @ eye
    fovx = math.radians(fov_deg)
    fovy = 2.0 * math.atan(math.tan(fovx / 2.0) * height / width)
    return make_camera(Rw2v.T, T, fovx, fovy, width, height)


_PAGE = """<!doctype html>
<meta charset="utf-8"><title>gs2mesh_tpu viewer</title>
<style>
 body{margin:0;background:#111;color:#ccc;font:13px monospace;overflow:hidden}
 #hud{position:fixed;top:8px;left:8px;background:#000a;padding:6px 10px;
      border-radius:6px;user-select:none}
 img{display:block;width:100vw;height:100vh;object-fit:contain;
     image-rendering:auto;cursor:grab}
</style>
<div id="hud">gs2mesh_tpu viewer — drag: orbit · shift/right-drag: pan ·
wheel: dolly · <span id="st"></span></div>
<img id="v" draggable="false">
<script>
let az=INIT_AZ, el=INIT_EL, r=INIT_R, fov=INIT_FOV;
let t=[INIT_TX,INIT_TY,INIT_TZ];
let busy=false, dirty=true;
const img=document.getElementById('v'), st=document.getElementById('st');
function url(){return `/render?az=${az.toFixed(2)}&el=${el.toFixed(2)}`+
  `&r=${r.toFixed(4)}&tx=${t[0].toFixed(4)}&ty=${t[1].toFixed(4)}`+
  `&tz=${t[2].toFixed(4)}&fov=${fov.toFixed(1)}`;}
async function tick(){
  if(!dirty||busy){requestAnimationFrame(tick);return;}
  busy=true;dirty=false;const t0=performance.now();
  try{const rsp=await fetch(url());const b=await rsp.blob();
      img.src=URL.createObjectURL(b);
      st.textContent=`${(performance.now()-t0).toFixed(0)} ms`;}
  catch(e){st.textContent='error';}
  busy=false;requestAnimationFrame(tick);}
let drag=null;
img.addEventListener('pointerdown',e=>{drag=[e.clientX,e.clientY,e.buttons,
  e.shiftKey];img.setPointerCapture(e.pointerId);});
img.addEventListener('pointerup',()=>drag=null);
img.addEventListener('contextmenu',e=>e.preventDefault());
img.addEventListener('pointermove',e=>{
  if(!drag)return;const dx=e.clientX-drag[0],dy=e.clientY-drag[1];
  drag[0]=e.clientX;drag[1]=e.clientY;
  if(drag[2]&2||drag[3]){   // pan in view plane
    const s=r*0.002, a=az*Math.PI/180, elr=el*Math.PI/180;
    const right=[Math.cos(a),0,Math.sin(a)];
    const up=[-Math.sin(elr)*Math.sin(a),Math.cos(elr),
              Math.sin(elr)*Math.cos(a)];
    for(let i=0;i<3;i++)t[i]+=(-dx*right[i]+dy*up[i])*s;
  }else{az+=dx*0.4;el=Math.max(-89,Math.min(89,el+dy*0.4));}
  dirty=true;});
addEventListener('wheel',e=>{r*=Math.exp(e.deltaY*0.001);dirty=true;});
tick();
</script>
"""


class ViewerServer:
    """HTTP viewer over a loaded GaussianModel.

    Usage:
        ViewerServer(model).serve()            # blocks; open the URL
        srv = ViewerServer(model); srv.start() # background thread
    """

    def __init__(self, model, width: int = 960, height: int = 540,
                 pair_capacity: int = 1 << 21, port: int = 8090,
                 white_background: bool = False, host: str = "127.0.0.1"):
        import jax
        import jax.numpy as jnp

        from gs2mesh_tpu.ops.rasterizer import RasterizerConfig
        from gs2mesh_tpu.train.trainer import render_model

        self.width, self.height = int(width), int(height)
        self.port = port
        # Loopback by default: the render endpoint drives the accelerator,
        # so external exposure must be an explicit opt-in (host="0.0.0.0").
        self.host = host
        rcfg = RasterizerConfig(pair_capacity=pair_capacity)
        bg = jnp.ones(3, jnp.float32) if white_background \
            else jnp.zeros(3, jnp.float32)
        params, state = model.params, model.state
        sh_degree = model.max_sh_degree

        @jax.jit
        def _render(cam):
            out = render_model(params, state.alive, cam, sh_degree, bg, rcfg)
            return jnp.clip(out.image, 0.0, 1.0)

        self._render = _render
        self._lock = threading.Lock()
        self._httpd = None

        xyz = np.asarray(params.xyz)
        alive = np.asarray(state.alive)
        pts = xyz[alive] if alive.any() else xyz
        self.target = pts.mean(axis=0)
        self.radius = float(np.percentile(
            np.linalg.norm(pts - self.target, axis=1), 90) * 2.5) or 3.0

    # -- rendering -------------------------------------------------------
    def render_png(self, az: float, el: float, r: float, target,
                   fov: float) -> bytes:
        from PIL import Image

        cam = orbit_camera(target, r, az, el, fov, self.width, self.height)
        with self._lock:                       # one accelerator user at a time
            img = np.asarray(self._render(cam))
        arr = (img.transpose(1, 2, 0) * 255.0 + 0.5).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return buf.getvalue()

    # -- http ------------------------------------------------------------
    def _handler(self):
        viewer = self

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):          # quiet
                pass

            def _send(self, code, ctype, body: bytes):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                u = urlparse(self.path)
                if u.path == "/":
                    page = (_PAGE
                            .replace("INIT_AZ", "0")
                            .replace("INIT_EL", "15")
                            .replace("INIT_R", f"{viewer.radius:.4f}")
                            .replace("INIT_FOV", "60")
                            .replace("INIT_TX", f"{viewer.target[0]:.4f}")
                            .replace("INIT_TY", f"{viewer.target[1]:.4f}")
                            .replace("INIT_TZ", f"{viewer.target[2]:.4f}"))
                    self._send(200, "text/html", page.encode())
                elif u.path == "/info":
                    self._send(200, "application/json", json.dumps({
                        "width": viewer.width, "height": viewer.height,
                        "target": viewer.target.tolist(),
                        "radius": viewer.radius}).encode())
                elif u.path == "/render":
                    try:
                        q = {k: float(v[0])
                             for k, v in parse_qs(u.query).items()}
                    except (ValueError, TypeError):
                        self._send(400, "text/plain", b"bad query param")
                        return
                    png = viewer.render_png(
                        q.get("az", 0.0), q.get("el", 15.0),
                        q.get("r", viewer.radius),
                        (q.get("tx", viewer.target[0]),
                         q.get("ty", viewer.target[1]),
                         q.get("tz", viewer.target[2])),
                        q.get("fov", 60.0))
                    self._send(200, "image/png", png)
                else:
                    self._send(404, "text/plain", b"not found")

        return H

    def start(self):
        """Start serving on a background thread; returns the bound port."""
        self._httpd = ThreadingHTTPServer((self.host, self.port),
                                          self._handler())
        self.port = self._httpd.server_address[1]
        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()
        return self.port

    def stop(self):
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd = None

    def serve(self):
        port = self.start()
        print(f"gs2mesh_tpu viewer at http://localhost:{port}/  (Ctrl-C to stop)")
        try:
            threading.Event().wait()
        except KeyboardInterrupt:
            self.stop()
