"""State logging + host-side replay rendering — the viewer equivalent.

The reference's interactive Vulkan viewer / video capture
(`/root/reference/isaacgymenvs/tasks/base/vec_task.py:225-252,408-440`,
`train.py:114-121` RecordVideo) is GPU-display machinery with no TPU
analog; SURVEY.md §2.1 N7 specifies the replacement: headless-first, with
an optional host-side visualizer replaying logged states. This module is
that visualizer:

- :class:`StateLogger` — records `q` snapshots of chosen envs during any
  rollout (host side, zero impact on the jitted step), saves npz
- :func:`render_html` — renders a logged trajectory to a SELF-CONTAINED
  HTML file (vanilla-JS canvas, no network, no deps): every collision
  geom drawn in an orthographic three-view (xy / xz / yz) with a time
  scrubber; open in any browser

Usage:
    log = StateLogger(env.task.model)
    for ...: state = env.step(state, a); log.add(state.q[0])
    log.save("traj.npz"); render_html(log, "traj.html")
"""
from __future__ import annotations

import json

import numpy as np

from thormang_isaacgym_tpu.models.robot import (
    GEOM_BOX, GEOM_CAPSULE, GEOM_CYLINDER, GEOM_SPHERE, RobotModel,
)
from thormang_isaacgym_tpu.ops.kinematics import forward_kinematics


class StateLogger:
    def __init__(self, model: RobotModel, dt: float = 1 / 30):
        self.model = model
        self.dt = dt
        self.qs: list[np.ndarray] = []

    def add(self, q):
        self.qs.append(np.asarray(q, np.float32).copy())

    def __len__(self):
        return len(self.qs)

    def save(self, path: str):
        np.savez(path, qs=np.stack(self.qs), dt=np.float32(self.dt))

    @staticmethod
    def load(model: RobotModel, path: str) -> "StateLogger":
        with np.load(path) as z:
            log = StateLogger(model, float(z["dt"]))
            log.qs = list(z["qs"])
        return log


def _geom_frames(model: RobotModel, q: np.ndarray):
    """Per-geom world (pos, quat, type, size) for one q (host, jax CPU)."""
    import jax.numpy as jnp

    from thormang_isaacgym_tpu.core import quat as Q

    frames = forward_kinematics(model, jnp.asarray(q),
                                jnp.zeros(model.nv))
    out = []
    for g in model.geoms:
        bp = np.asarray(frames.pos[g.body])
        bq = np.asarray(frames.quat[g.body])
        gp = bp + np.asarray(Q.rotate(jnp.asarray(bq), jnp.asarray(g.pos)))
        gq = np.asarray(Q.mul(jnp.asarray(bq), jnp.asarray(g.quat)))
        out.append((gp, gq, g.gtype, g.size))
    return out


def render_html(log: StateLogger, path: str, every: int = 1,
                title: str | None = None):
    """Write a standalone HTML replay of the logged trajectory."""
    model = log.model
    frames = []
    for q in log.qs[::every]:
        geoms = []
        for gp, gq, gtype, size in _geom_frames(model, q):
            # encode each geom as center + a radius estimate + axis for
            # capsules/cylinders (the JS draws circles/lines — a readable
            # schematic, not a mesh render)
            if gtype == GEOM_SPHERE:
                geoms.append([0, *np.round(gp, 4).tolist(), size[0]])
            elif gtype in (GEOM_CAPSULE, GEOM_CYLINDER):
                import jax.numpy as jnp

                from thormang_isaacgym_tpu.core import quat as Q
                # both capsule and cylinder geoms use the local z axis
                # (the contact kernels' convention)
                axis = np.asarray(Q.rotate(
                    jnp.asarray(gq), jnp.asarray([0.0, 0.0, 1.0])))
                h = size[1]
                a = gp - axis * h
                b = gp + axis * h
                geoms.append([1, *np.round(a, 4).tolist(),
                              *np.round(b, 4).tolist(), size[0]])
            elif gtype == GEOM_BOX:
                r = float(np.linalg.norm(size))
                geoms.append([2, *np.round(gp, 4).tolist(), *size])
        frames.append(geoms)
    data = json.dumps(frames)
    name = title or model.name
    html = _TEMPLATE.replace("__DATA__", data).replace(
        "__TITLE__", name).replace("__DT__", str(log.dt * every))
    with open(path, "w") as f:
        f.write(html)
    return path


_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>__TITLE__ replay</title>
<style>body{font-family:monospace;background:#111;color:#ddd}
canvas{background:#1a1a1f;margin:4px}</style></head>
<body><h3>__TITLE__ replay</h3>
<div><canvas id="xy" width="420" height="420"></canvas>
<canvas id="xz" width="420" height="420"></canvas>
<canvas id="yz" width="420" height="420"></canvas></div>
<input id="t" type="range" min="0" max="0" value="0" style="width:800px">
<span id="lbl"></span>
<button id="play">play</button>
<script>
const F=__DATA__, dt=__DT__;
const sl=document.getElementById('t'); sl.max=F.length-1;
const lbl=document.getElementById('lbl');
// world bounds
let lo=[1e9,1e9,1e9], hi=[-1e9,-1e9,-1e9];
for(const fr of F) for(const g of fr){
  const c = g[0]==1 ? [(g[1]+g[4])/2,(g[2]+g[5])/2,(g[3]+g[6])/2] : [g[1],g[2],g[3]];
  for(let k=0;k<3;k++){lo[k]=Math.min(lo[k],c[k]-0.3);hi[k]=Math.max(hi[k],c[k]+0.3);}}
const span=Math.max(hi[0]-lo[0],hi[1]-lo[1],hi[2]-lo[2]);
function proj(p, ax, ay){ // world -> canvas
  return [ (p[ax]-lo[ax])/span*400+10, 410-(p[ay]-lo[ay])/span*400 ]; }
function draw(){
  const i=+sl.value; lbl.textContent=(i*dt).toFixed(2)+' s';
  for(const [id,ax,ay] of [['xy',0,1],['xz',0,2],['yz',1,2]]){
    const ctx=document.getElementById(id).getContext('2d');
    ctx.clearRect(0,0,420,420);
    ctx.fillStyle='#666'; ctx.fillText(id,5,12);
    if(id!=='xy'){ // ground line at z=0
      const y0=410-(0-lo[2])/span*400;
      ctx.strokeStyle='#333'; ctx.beginPath();
      ctx.moveTo(0,y0); ctx.lineTo(420,y0); ctx.stroke(); }
    ctx.strokeStyle='#7ec8e3'; ctx.fillStyle='rgba(126,200,227,0.25)';
    for(const g of F[i]){
      const s=400/span;
      if(g[0]==0){ const [x,y]=proj([g[1],g[2],g[3]],ax,ay);
        ctx.beginPath(); ctx.arc(x,y,Math.max(g[4]*s,1.5),0,7); ctx.fill(); ctx.stroke();
      } else if(g[0]==1){ const a=proj([g[1],g[2],g[3]],ax,ay), b=proj([g[4],g[5],g[6]],ax,ay);
        ctx.lineWidth=Math.max(g[7]*2*s,2); ctx.beginPath();
        ctx.moveTo(a[0],a[1]); ctx.lineTo(b[0],b[1]); ctx.stroke(); ctx.lineWidth=1;
      } else { const [x,y]=proj([g[1],g[2],g[3]],ax,ay);
        const hx=g[4+ax]*s, hy=g[4+ay]*s;
        ctx.fillRect(x-hx,y-hy,2*hx,2*hy); ctx.strokeRect(x-hx,y-hy,2*hx,2*hy); }
    }
  }
}
sl.oninput=draw; draw();
let timer=null;
document.getElementById('play').onclick=()=>{
  if(timer){clearInterval(timer);timer=null;return;}
  timer=setInterval(()=>{sl.value=(+sl.value+1)%F.length;draw();},dt*1000);};
</script></body></html>
"""


def render_video(log: StateLogger, path: str, every: int = 1,
                 view: str = "xz", figsize=(4.8, 3.6), dpi: int = 75,
                 lim: float | None = None, title: str | None = None):
    """Write an animated GIF of the logged trajectory — the video-capture
    equivalent of the reference's `gym.wrappers.RecordVideo` path
    (`train.py:114-121`): an orthographic schematic render (matplotlib +
    PIL; spheres/capsule endpoints as circles, capsules/cylinders as
    thick segments, boxes as bounding squares) with the ground line.

    view: projection plane, one of "xy", "xz", "yz".
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from PIL import Image

    ix, iy = {"xy": (0, 1), "xz": (0, 2), "yz": (1, 2)}[view]
    model = log.model

    # fixed view bounds from the whole trajectory (stable camera)
    pts = []
    frames_geoms = []
    for q in log.qs[::every]:
        geoms = _geom_frames(model, q)
        frames_geoms.append(geoms)
        for gp, _, _, size in geoms:
            pts.append(gp)
    pts = np.asarray(pts)
    c = pts.mean(axis=0)
    if lim is None:
        lim = max(float(np.abs(pts - c).max()) * 1.3, 0.5)

    import jax.numpy as jnp

    from thormang_isaacgym_tpu.core import quat as Q

    images = []
    for geoms in frames_geoms:
        fig, ax = plt.subplots(figsize=figsize, dpi=dpi)
        if view in ("xz", "yz"):
            ax.axhline(0.0, color="#888", lw=1)
        for gp, gq, gtype, size in geoms:
            x, y = gp[ix], gp[iy]
            if gtype == GEOM_SPHERE:
                ax.add_patch(plt.Circle((x, y), size[0], fc="#4a90d9",
                                        ec="#1b4f8a", alpha=0.8))
            elif gtype in (GEOM_CAPSULE, GEOM_CYLINDER):
                axis = np.asarray(Q.rotate(jnp.asarray(gq),
                                           jnp.asarray([0.0, 0.0, 1.0])))
                a = gp - axis * size[1]
                b = gp + axis * size[1]
                ax.plot([a[ix], b[ix]], [a[iy], b[iy]],
                        lw=max(size[0] * 2 * dpi * figsize[0] / (2 * lim)
                               * 0.5, 2),
                        color="#4a90d9", solid_capstyle="round", alpha=0.8)
            else:  # box: axis-aligned bounding square of the half-extents
                r = float(np.linalg.norm(size))
                hx = hy = r * 0.8
                ax.add_patch(plt.Rectangle((x - hx, y - hy), 2 * hx, 2 * hy,
                                           fc="#e0a84a", ec="#8a5f1b",
                                           alpha=0.7))
        ax.set_xlim(c[ix] - lim, c[ix] + lim)
        ax.set_ylim(c[iy] - lim, c[iy] + lim)
        ax.set_aspect("equal")
        ax.set_title(title or model.name, fontsize=9)
        ax.tick_params(labelsize=6)
        fig.tight_layout(pad=0.3)
        fig.canvas.draw()
        w, h = fig.canvas.get_width_height()
        buf = np.frombuffer(fig.canvas.buffer_rgba(), np.uint8)
        images.append(Image.fromarray(
            buf.reshape(h, w, 4)[..., :3].copy()))
        plt.close(fig)
    ms = max(int(1000 * log.dt * every), 20)
    images[0].save(path, save_all=True, append_images=images[1:],
                   duration=ms, loop=0)
    return path
