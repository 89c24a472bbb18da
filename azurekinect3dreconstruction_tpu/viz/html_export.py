"""Self-contained HTML/WebGL viewer export — interactive inspection of
reconstructions with zero dependencies (no Open3D, no network, no display).

The reference ships three offline Open3D window viewers
(/root/reference/LastReconstructionVisualizer.py:12-43,
/root/reference/ChooseReconstruction.py:6-105,
/root/reference/MeshReconstructionVisualizer.py:12-35) that need a desktop
GL stack. This module writes ONE portable .html file with the geometry
embedded (base64 little-endian buffers) and a hand-written WebGL renderer +
orbit controls, so a scan can be inspected on any machine with a browser —
including headless CI via a browser driver. Key map follows the reference
viewers: R resets the view, C toggles color/normal shading, P toggles
point rendering.
"""

from __future__ import annotations

import base64
import json
import os
from typing import Optional, Union

import numpy as np

from azurekinect3dreconstruction_tpu.core.types import (
    PointCloudHost,
    TriangleMeshHost,
)

_PAGE = """<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8">
<title>__TITLE__</title>
<style>
  html, body { margin: 0; height: 100%; overflow: hidden; background: #101418; }
  canvas { width: 100%; height: 100%; display: block; }
  #hud { position: fixed; left: 10px; top: 8px; color: #9fb3c8;
         font: 12px/1.5 monospace; user-select: none; pointer-events: none;
         white-space: pre; text-shadow: 0 1px 2px #000; }
</style>
</head>
<body>
<canvas id="c"></canvas>
<div id="hud"></div>
<script>
"use strict";
const META = __META__;
const B64 = {
  pos: "__POS__",
  col: "__COL__",
  nrm: "__NRM__",
  idx: "__IDX__",
};
function decode(b64, Type) {
  if (!b64) return null;
  const bin = atob(b64);
  const bytes = new Uint8Array(bin.length);
  for (let i = 0; i < bin.length; i++) bytes[i] = bin.charCodeAt(i);
  return new Type(bytes.buffer);   // little-endian on every WebGL platform
}
const pos = decode(B64.pos, Float32Array);
const col = decode(B64.col, Uint8Array);
const nrm = decode(B64.nrm, Float32Array);
const idx = decode(B64.idx, Uint32Array);

const canvas = document.getElementById("c");
const gl = canvas.getContext("webgl");
if (!gl) document.getElementById("hud").textContent = "WebGL unavailable";
if (!pos || META.n_vertices === 0) {
  // empty reconstruction: report it instead of dying on pos.length, and
  // keep the __frames liveness hook ticking for CI drivers
  document.getElementById("hud").textContent = META.title + "\\n(empty geometry)";
  setInterval(() => { window.__frames = (window.__frames || 0) + 1; }, 100);
  throw new Error("empty geometry");
}
const extIdx = gl && gl.getExtension("OES_element_index_uint");

const VS = `
attribute vec3 aPos; attribute vec3 aCol; attribute vec3 aNrm;
uniform mat4 uMVP; uniform mat3 uRot; uniform float uPointSize;
varying vec3 vCol; varying vec3 vNrm;
void main() {
  gl_Position = uMVP * vec4(aPos, 1.0);
  gl_PointSize = uPointSize;
  vCol = aCol; vNrm = uRot * aNrm;
}`;
const FS = `
precision mediump float;
varying vec3 vCol; varying vec3 vNrm;
uniform float uShaded; uniform float uNormalViz;
void main() {
  // zero-filled normals (clouds without normals) must not normalize():
  // NaN would poison the mix() chain even at weight 0 under IEEE rules
  vec3 n = dot(vNrm, vNrm) > 0.0 ? normalize(vNrm) : vec3(0.0, 0.0, 1.0);
  float lam = 0.35 + 0.65 * abs(n.z);           // headlight Lambert
  vec3 shaded = mix(vCol, vCol * lam, uShaded);
  vec3 nviz = 0.5 * n + 0.5;
  gl_FragColor = vec4(mix(shaded, nviz, uNormalViz), 1.0);
}`;

function shader(type, src) {
  const s = gl.createShader(type);
  gl.shaderSource(s, src); gl.compileShader(s);
  if (!gl.getShaderParameter(s, gl.COMPILE_STATUS))
    throw gl.getShaderInfoLog(s);
  return s;
}
const prog = gl.createProgram();
gl.attachShader(prog, shader(gl.VERTEX_SHADER, VS));
gl.attachShader(prog, shader(gl.FRAGMENT_SHADER, FS));
gl.linkProgram(prog); gl.useProgram(prog);

function buffer(target, data) {
  const b = gl.createBuffer();
  gl.bindBuffer(target, b); gl.bufferData(target, data, gl.STATIC_DRAW);
  return b;
}
function attrib(name, buf, ncomp, type, normalize) {
  const loc = gl.getAttribLocation(prog, name);
  gl.bindBuffer(gl.ARRAY_BUFFER, buf);
  gl.enableVertexAttribArray(loc);
  gl.vertexAttribPointer(loc, ncomp, type, normalize, 0, 0);
}
attrib("aPos", buffer(gl.ARRAY_BUFFER, pos), 3, gl.FLOAT, false);
attrib("aCol", buffer(gl.ARRAY_BUFFER, col ||
  new Uint8Array(pos.length).fill(180)), 3, gl.UNSIGNED_BYTE, true);
attrib("aNrm", buffer(gl.ARRAY_BUFFER, nrm ||
  new Float32Array(pos.length).fill(0)), 3, gl.FLOAT, false);
let idxBuf = null;
if (idx && extIdx) idxBuf = buffer(gl.ELEMENT_ARRAY_BUFFER, idx);

const uMVP = gl.getUniformLocation(prog, "uMVP");
const uRot = gl.getUniformLocation(prog, "uRot");
const uShaded = gl.getUniformLocation(prog, "uShaded");
const uNormalViz = gl.getUniformLocation(prog, "uNormalViz");
const uPointSize = gl.getUniformLocation(prog, "uPointSize");

// ---- camera: orbit / zoom / pan around the bounds center -----------------
const C = META.center, R = Math.max(META.radius, 1e-6);
let theta = 0.5, phi = 0.9, dist = 2.5 * R, panX = 0, panY = 0;
let points = !idxBuf, shaded = !!nrm, normalViz = false;
function resetView() { theta = 0.5; phi = 0.9; dist = 2.5 * R; panX = panY = 0; }

function mat4mul(a, b) {
  const o = new Float32Array(16);
  for (let r = 0; r < 4; r++) for (let c = 0; c < 4; c++) {
    let s = 0;
    for (let k = 0; k < 4; k++) s += a[k * 4 + r] * b[c * 4 + k];
    o[c * 4 + r] = s;
  }
  return o;
}
function draw() {
  const w = canvas.clientWidth, h = canvas.clientHeight;
  if (canvas.width !== w || canvas.height !== h) {
    canvas.width = w; canvas.height = h; gl.viewport(0, 0, w, h);
  }
  const ct = Math.cos(theta), st = Math.sin(theta);
  const cp = Math.cos(phi), sp = Math.sin(phi);
  // column-major view rotation (world -> eye)
  const rot = [ct, st * cp, st * sp, 0,
               -st, ct * cp, ct * sp, 0,
               0, -sp, cp, 0,
               0, 0, 0, 1];
  const trans = [1,0,0,0, 0,1,0,0, 0,0,1,0,
                 -C[0], -C[1], -C[2], 1];
  let mv = mat4mul(rot, trans);
  mv[12] += panX; mv[13] += panY; mv[14] -= dist;
  const f = 1.0 / Math.tan(0.4), aspect = w / h;
  const zn = 0.01 * R, zf = 100 * R;
  const proj = [f / aspect, 0, 0, 0,  0, f, 0, 0,
                0, 0, (zf + zn) / (zn - zf), -1,
                0, 0, 2 * zf * zn / (zn - zf), 0];
  gl.uniformMatrix4fv(uMVP, false, mat4mul(proj, mv));
  gl.uniformMatrix3fv(uRot, false,
    [rot[0], rot[1], rot[2], rot[4], rot[5], rot[6], rot[8], rot[9], rot[10]]);
  gl.uniform1f(uShaded, shaded && !points ? 1.0 : 0.0);
  gl.uniform1f(uNormalViz, normalViz ? 1.0 : 0.0);
  gl.uniform1f(uPointSize, 2.0);
  gl.enable(gl.DEPTH_TEST);
  gl.clearColor(0.063, 0.078, 0.094, 1);
  gl.clear(gl.COLOR_BUFFER_BIT | gl.DEPTH_BUFFER_BIT);
  if (!points && idxBuf) {
    gl.bindBuffer(gl.ELEMENT_ARRAY_BUFFER, idxBuf);
    gl.drawElements(gl.TRIANGLES, META.n_indices, gl.UNSIGNED_INT, 0);
  } else {
    gl.drawArrays(gl.POINTS, 0, META.n_vertices);
  }
  document.getElementById("hud").textContent =
    META.title + "\\n" + META.n_vertices.toLocaleString() + " vertices" +
    (idx ? ", " + (META.n_indices / 3).toLocaleString() + " triangles" : "") +
    "\\ndrag rotate | wheel zoom | shift-drag pan | R reset | " +
    "C colors | N normals | P points";
  window.__frames = (window.__frames || 0) + 1;   // test hook
}
function loop() { draw(); requestAnimationFrame(loop); }

// ---- input (reference key map: R reset — ChooseReconstruction.py) --------
let drag = null;
canvas.addEventListener("mousedown", e => { drag = [e.clientX, e.clientY, e.shiftKey || e.button === 2]; });
window.addEventListener("mouseup", () => { drag = null; });
window.addEventListener("mousemove", e => {
  if (!drag) return;
  const dx = e.clientX - drag[0], dy = e.clientY - drag[1];
  if (drag[2]) { panX += dx * 0.002 * dist; panY -= dy * 0.002 * dist; }
  else {
    theta -= dx * 0.006;
    phi = Math.min(3.1, Math.max(0.05, phi - dy * 0.006));
  }
  drag[0] = e.clientX; drag[1] = e.clientY;
});
canvas.addEventListener("wheel", e => {
  dist *= Math.exp(e.deltaY * 0.001);
  dist = Math.min(50 * R, Math.max(0.05 * R, dist));
  e.preventDefault();
}, { passive: false });
canvas.addEventListener("contextmenu", e => e.preventDefault());
window.addEventListener("keydown", e => {
  const k = e.key.toLowerCase();
  if (k === "r") resetView();
  else if (k === "p") points = !points;
  else if (k === "c") shaded = !shaded;
  else if (k === "n") normalViz = !normalViz;
});
if (gl) loop();
</script>
</body>
</html>
"""


def _b64(arr: Optional[np.ndarray]) -> str:
    if arr is None:
        return ""
    return base64.b64encode(np.ascontiguousarray(arr).tobytes()).decode()


def save_html_viewer(path: str,
                     geometry: Union[TriangleMeshHost, PointCloudHost],
                     title: str = "Reconstruction",
                     max_vertices: int = 2_000_000) -> str:
    """Write a single self-contained interactive .html viewer for a mesh or
    point cloud. Returns the path written.

    Geometry above ``max_vertices`` is uniformly strided down so the file
    stays loadable (base64 is ~4/3 of the raw buffer size).
    """
    is_mesh = isinstance(geometry, TriangleMeshHost)
    if is_mesh:
        verts = np.asarray(geometry.vertices, np.float32)
        tris = np.asarray(geometry.triangles, np.uint32)
        colors = geometry.vertex_colors
        normals = geometry.vertex_normals
        if normals is None and len(verts) and len(tris):
            normals = geometry.compute_vertex_normals().vertex_normals
    else:
        verts = np.asarray(geometry.points, np.float32)
        tris = None
        colors = geometry.colors
        normals = geometry.normals

    if verts.shape[0] > max_vertices:
        if is_mesh:
            # keep whole triangles: stride the faces, then compact vertices
            stride = -(-tris.shape[0] * 3 // max_vertices)
            tris = tris[::stride]
            used, inv = np.unique(tris.reshape(-1), return_inverse=True)
            tris = inv.reshape(-1, 3).astype(np.uint32)
            verts = verts[used]
            colors = colors[used] if colors is not None else None
            normals = normals[used] if normals is not None else None
        else:
            stride = -(-verts.shape[0] // max_vertices)
            verts = verts[::stride]
            colors = colors[::stride] if colors is not None else None
            normals = normals[::stride] if normals is not None else None

    col_u8 = None
    if colors is not None:
        c = np.asarray(colors)
        col_u8 = (np.clip(c, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8) \
            if c.dtype != np.uint8 else c

    lo = verts.min(axis=0) if len(verts) else np.zeros(3, np.float32)
    hi = verts.max(axis=0) if len(verts) else np.zeros(3, np.float32)
    center = 0.5 * (lo + hi)
    radius = float(np.linalg.norm(hi - lo) * 0.5) or 1.0

    meta = {
        "title": title,
        "n_vertices": int(verts.shape[0]),
        "n_indices": int(tris.size) if tris is not None else 0,
        "center": [float(x) for x in center],
        "radius": radius,
    }
    html = (_PAGE
            .replace("__TITLE__", title)
            .replace("__META__", json.dumps(meta))
            .replace("__POS__", _b64(verts))
            .replace("__COL__", _b64(col_u8))
            .replace("__NRM__", _b64(np.asarray(normals, np.float32)
                                     if normals is not None else None))
            .replace("__IDX__", _b64(tris)))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        f.write(html)
    return path
