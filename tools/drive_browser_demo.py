"""Drive the browser demo end-to-end at the wire level.

This image has no Chrome, so the page's JS cannot be executed here; this
script performs exactly what the page does (runtime/wsbridge.py DEMO_PAGE),
with the same camera model and Moller-Trumbore ray pick implemented in
Python: connect the WebSocket, fetch the scene mesh, ray-pick screen-space
clicks into (face, barycentric) hits, orbit the listener, run a
mouse-velocity sustained drag, request mode shapes and transfer-ball
colors, and record buffer health.

Run from the repo root with a --web server up (or let it self-serve):

    python tools/drive_browser_demo.py [--port 9944] [--seconds 12]

Exit code 0 iff audio was produced by picked hits AND health >= 0.95.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

FOV = math.pi / 4
W, H = 520, 390


def camera(yaw, pitch, dist, center, radius):
    cp, sp = math.cos(pitch), math.sin(pitch)
    eye = center + np.array([cp * math.cos(yaw), sp, cp * math.sin(yaw)]) \
        * dist * radius
    fwd = center - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, [0.0, 1.0, 0.0])
    right = right / np.linalg.norm(right)
    up = np.cross(right, fwd)
    return eye, fwd, right, up


def pixel_ray(cam, x, y):
    eye, fwd, right, up = cam
    tf = math.tan(FOV / 2)
    nx, ny = 2 * x / W - 1, 1 - 2 * y / H
    d = fwd + nx * tf * (W / H) * right + ny * tf * up
    return eye, d / np.linalg.norm(d)


def pick(scene_v, scene_f, cam, x, y):
    """The page's Moller-Trumbore pick: (face, bary) or None."""
    o, d = pixel_ray(cam, x, y)
    best = None
    for f in range(scene_f.shape[0]):
        v0, v1, v2 = scene_v[scene_f[f]]
        e1, e2 = v1 - v0, v2 - v0
        pv = np.cross(d, e2)
        det = float(e1 @ pv)
        if abs(det) < 1e-12:
            continue
        inv = 1.0 / det
        tv = o - v0
        u = float(tv @ pv) * inv
        if not 0.0 <= u <= 1.0:
            continue
        qv = np.cross(tv, e1)
        v = float(d @ qv) * inv
        if v < 0.0 or u + v > 1.0:
            continue
        t = float(e2 @ qv) * inv
        if t > 1e-6 and (best is None or t < best[0]):
            best = (t, f, [1.0 - u - v, u, v])
    return None if best is None else (best[1], best[2])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--seconds", type=float, default=12.0)
    args = ap.parse_args()

    proc = None
    port = args.port
    if not port:
        port = 9944
        proc = subprocess.Popen(
            [sys.executable, "-m", "openpbso_tpu.apps.serve", "--demo-synth",
             "--web", "--platform", "cpu", "--one-shot", "--port", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        while "serving" not in (proc.stdout.readline() or "serving"):
            pass
        time.sleep(0.5)

    from test_wsbridge import _WSClient

    c = _WSClient("127.0.0.1", port)
    got: dict = {}
    peak = picked_peak = 0.0
    health = None

    def drain(seconds=0.0, until=None):
        nonlocal peak, health
        deadline = time.monotonic() + max(seconds, 0.05)
        while time.monotonic() < deadline:
            op, payload = c.read_frame()
            if op == 0x1:
                m = json.loads(payload)
                got.update(m)
                if "health" in m:
                    health = m["health"]
            elif op == 0x2:
                peak = max(peak,
                           float(np.abs(np.frombuffer(payload, "<f4")).max()))
            if until and until in got:
                return

    drain(until="hello")
    c.send_json(cmd="scene")
    drain(60, until="scene")
    sc = got["scene"]
    v = np.asarray(sc["vertices"], np.float64).reshape(-1, 3)
    f = np.asarray(sc["faces"], np.int64).reshape(-1, 3)
    lo, hi = v.min(0), v.max(0)
    center = (lo + hi) / 2
    radius = float(np.linalg.norm(hi - lo) / 2) or 1.0
    print(f"scene: {v.shape[0]} verts {f.shape[0]} faces")

    c.send_json(cmd="ball")
    drain(30, until="ball")
    c.send_json(cmd="mode_shape", mode=2)
    drain(30, until="mode_shape")
    print(f"mode 2: {got['mode_shape']['freq_hz']:.1f} Hz; "
          f"ball transfer: {got['ball']['has_transfer']}")

    # round-3 HUD surface: per-mode transfer histogram + the
    # compressed-Psi toggle (the page's checkbox sends the same commands)
    c.send_json(cmd="transfer_hist")
    drain(30, until="transfer_hist")
    hist_raw = np.asarray(got["transfer_hist"]["values"], np.float64)
    c.send_json(cmd="transfer", compressed=True)
    drain(60, until="compressed")
    comp_ok = bool(got.get("compressed"))
    c.send_json(cmd="transfer_hist")
    got.pop("transfer_hist", None)
    drain(30, until="transfer_hist")
    hist_comp = np.asarray(got["transfer_hist"]["values"], np.float64)
    got.pop("compressed", None)
    c.send_json(cmd="transfer", compressed=False)
    drain(30, until="compressed")
    hist_differs = bool(np.abs(hist_raw - hist_comp).max() > 0)
    print(f"transfer_hist: {hist_raw.size} modes; compressed toggle ok: "
          f"{comp_ok}; histogram tracks the toggle: {hist_differs}")

    t_end = time.monotonic() + args.seconds
    yaw, pitch, dist = 0.9, 0.4, 3.2
    n_hits = 0
    while time.monotonic() < t_end:
        cam = camera(yaw, pitch, dist, center, radius)
        # the page sends the orbit camera eye as the listener
        c.send_json(cmd="listener", pos=list(cam[0]))
        # shift-click somewhere near the middle of the viewport
        hit = None
        for (x, y) in ((W / 2, H / 2), (W / 2 + 40, H / 2 - 20),
                       (W / 2 - 30, H / 2 + 25)):
            hit = pick(v, f, cam, x, y)
            if hit:
                break
        if hit:
            face, bary = hit
            c.send_json(cmd="hit", obj=0, face=face, bary=bary,
                        kind="gaussian", width_us=300.0)
            n_hits += 1
        peak0 = peak
        drain(0.9)
        if hit and peak > peak0:
            picked_peak = max(picked_peak, peak)
        # sustained drag across the surface with mouse-velocity scaling
        if hit:
            c.send_json(cmd="sustain", obj=0, face=hit[0], bary=hit[1])
            for k in range(4):
                h2 = pick(v, f, cam, W / 2 + 8 * k, H / 2 + 5 * k)
                if h2:
                    c.send_json(cmd="drag", obj=0, face=h2[0], bary=h2[1],
                                vel=0.4 + 0.1 * k)
                drain(0.12)
            c.send_json(cmd="release", obj=0)
        yaw += 0.5
        c.send_json(cmd="stats")
        drain(0.3)

    c.send_json(cmd="stats")
    drain(2.0)
    c.send_json(cmd="quit")
    try:
        c.close()
    except OSError:
        pass
    if proc is not None:
        proc.wait(timeout=30)

    # the page's alt-drag THROW needs scene serving — drive it against a
    # second server on the committed demo scene (self-served runs only)
    fling_ok = True if args.port else fling_drive(port + 1)

    ok = picked_peak > 0 and health is not None and health >= 0.95 \
        and "ball_colors" in got and comp_ok and hist_differs \
        and fling_ok
    print(f"hits: {n_hits}, peak from picked hits: {picked_peak:.4g}, "
          f"health: {health}, ball_colors streamed: "
          f"{'ball_colors' in got}")
    print("DRIVE", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def fling_drive(port: int) -> bool:
    """Round-3 kinematics surface over the wire: what the page's alt-drag
    does — object_pos while held, object_vel on a fast release (THROW),
    vel 0 on alt-grab (CATCH) — against `--scene assets/demo/scene.json
    --live-doppler --web`."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(
        [sys.executable, "-m", "openpbso_tpu.apps.serve",
         "--scene", "assets/demo/scene.json", "--live-doppler", "--web",
         "--platform", "cpu", "--one-shot", "--port", str(port)],
        cwd=root, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    while "serving" not in (proc.stdout.readline() or "serving"):
        pass
    time.sleep(0.5)

    from test_wsbridge import _WSClient
    c = _WSClient("127.0.0.1", port)
    got: dict = {}

    def drain(seconds=0.0, until=None):
        deadline = time.monotonic() + max(seconds, 0.05)
        while time.monotonic() < deadline:
            op, payload = c.read_frame()
            if op == 0x1:
                got.update(json.loads(payload))
            if until and until in got:
                return

    def obj_x():
        got.pop("scene", None)
        c.send_json(cmd="scene", obj=1)
        drain(30, until="scene")
        return float(got["scene"]["position"][0])

    drain(until="hello")
    c.send_json(cmd="object_pos", obj=1, pos=[1.2, 0.0, 0.3])
    drain(30, until="object_pos")
    x0 = obj_x()
    c.send_json(cmd="object_vel", obj=1, vel=[1.5, 0.0, 0.0])
    drain(30, until="object_vel")
    t_fly = time.monotonic() + 15
    x = x0
    while time.monotonic() < t_fly and x < x0 + 0.4:
        drain(0.3)
        x = obj_x()
    got.pop("object_vel", None)
    c.send_json(cmd="object_vel", obj=1, vel=[0.0, 0.0, 0.0])
    drain(30, until="object_vel")
    x_stop = obj_x()
    drain(0.6)
    ok = x >= x0 + 0.4 and obj_x() == x_stop
    print(f"fling: flew {x - x0:.2f} m, caught at x={x_stop:.2f}, "
          f"ok: {ok}")
    c.send_json(cmd="quit")
    try:
        c.close()
    except OSError:
        pass
    proc.wait(timeout=30)
    return ok


if __name__ == "__main__":
    raise SystemExit(main())
