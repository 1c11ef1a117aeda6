"""CLI app smoke tests (headless, CPU)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from openpbso_tpu.apps.real_time_modal_sound import (build_argparser,
                                                     resolve_paths)
from openpbso_tpu.config import FILE_NOT_EXIST


def test_argparser_flag_surface():
    """The reference's flags -d/-name/-m/-s/-t/-p/-tex must all parse
    (real_time_modal_sound.cpp:42-64)."""
    p = build_argparser()
    args = p.parse_args(["-d", "/data", "-name", "wine", "-tex", "t.png"])
    assert args.data_dir == "/data" and args.obj_name == "wine"
    args = p.parse_args(["-m", "a.obj", "-s", "b.modes", "-t", "c.txt",
                         "-p", "d_ffat"])
    assert args.mesh == "a.obj" and args.ffat_map == "d_ffat"


def test_resolve_paths_requires_full_set():
    p = build_argparser()
    args = p.parse_args(["-m", "a.obj"])  # missing -s/-t
    with pytest.raises(SystemExit):
        resolve_paths(args)


def test_explicit_paths():
    p = build_argparser()
    args = p.parse_args(["-m", "a.obj", "-s", "b.modes", "-t", "c.txt",
                         "-p", "d"])
    paths = resolve_paths(args)
    assert paths.modes_file == "b.modes"


def test_render_offline_config1(tmp_path):
    from openpbso_tpu.apps.render_offline import run_config
    r = run_config(1, "blocked", str(tmp_path))
    assert r["peak"] > 0
    assert os.path.exists(r["wav"])
    assert r["audio_seconds"] >= 0.9


def test_render_fields_exports(tmp_path, synth_model_root):
    from openpbso_tpu.apps.render_fields import (export_ffat_images,
                                                 export_mode_shapes)
    from openpbso_tpu.io.meta import resolve_model_dir
    from openpbso_tpu.models.modal_model import load_model
    model = load_model(resolve_model_dir(synth_model_root, "synth"))
    frames = export_mode_shapes(model, str(tmp_path / "m"), frames=3)
    assert len(frames) == 3 and os.path.exists(frames[0])
    imgs = export_ffat_images(
        {0: model.ffat_maps[0]}, str(tmp_path / "f"))
    assert len(imgs) == 6
    with open(imgs[0], "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_field_slice_rendering(tmp_path):
    from openpbso_tpu.apps.render_fields import render_field_slices
    nx = ny = 8
    nz = 4
    field_dir = tmp_path / "fields"
    field_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        rng.standard_normal(nx * ny * nz).astype("<f4").tofile(
            str(field_dir / f"p_{i}.dat"))
    out = render_field_slices(str(field_dir), str(tmp_path / "png"),
                              nx=nx, ny=ny, nz=nz)
    assert len(out) == 2


def test_cli_demo_synth_end_to_end(tmp_path):
    """Full subprocess run of the main CLI on a synthetic model."""
    out = str(tmp_path / "demo.wav")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "openpbso_tpu.apps.real_time_modal_sound",
         "--demo-synth", "--seconds", "0.7", "--out", out,
         "--block", "256", "--platform", "cpu"],
        capture_output=True, text=True, timeout=240, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out)
    assert "wrote" in r.stdout


def test_softrender_matcap_stills(tmp_path, synth_model_root):
    from openpbso_tpu.apps.render_fields import render_mode_shape_frames
    from openpbso_tpu.io.meta import resolve_model_dir
    from openpbso_tpu.models.modal_model import load_model
    model = load_model(resolve_model_dir(synth_model_root, "synth"))
    frames = render_mode_shape_frames(model, str(tmp_path), frames=2,
                                      size=96)
    assert len(frames) == 2
    with open(frames[0], "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"
    # frames differ (the mesh moves)
    assert open(frames[0], "rb").read() != open(frames[1], "rb").read()


def test_transfer_ball_qnorm_weighting(tmp_path, synth_model_root):
    """qnorm-weighted transfer ball differs from the static sum (the
    reference's live qnorm.transfer coloring)."""
    import jax.numpy as jnp
    from openpbso_tpu.apps.render_fields import export_transfer_ball
    from openpbso_tpu.io.meta import resolve_model_dir
    from openpbso_tpu.models.modal_model import load_model
    from openpbso_tpu.ops.coeffs import bank_from_material
    from openpbso_tpu.ops.ffat import build_ffat
    from openpbso_tpu.runtime.session import ModalSession
    model = load_model(resolve_model_dir(synth_model_root, "synth"))
    bank = bank_from_material(
        model.material.density, model.modes.omega_squared,
        model.material.alpha, model.material.beta, block_size=128,
        dtype=jnp.float32)
    ffat = build_ffat(model.ffat_maps, bank.num_modes, dtype=jnp.float32)
    sess = ModalSession(bank, ffat=ffat)
    _, v_static = export_transfer_ball(sess, str(tmp_path / "a"),
                                       subdivisions=1)
    q = np.zeros(bank.num_modes)
    q[0] = 1.0  # only mode 0 ringing
    _, v_weighted = export_transfer_ball(sess, str(tmp_path / "b"),
                                         subdivisions=1, qnorm=q)
    a = np.load(v_static)
    b = np.load(v_weighted)
    assert a.shape == b.shape
    assert not np.allclose(a / a.max(), b / b.max())


def test_assemble_movie(tmp_path):
    """Frame selection (numeric sort, head trim) + GIF assembly — the
    remove_head_frames.py equivalent, driven end to end."""
    from PIL import Image

    from openpbso_tpu.apps.assemble_movie import (main, numeric_frame_sort,
                                                  select_frames)
    frames = tmp_path / "frames"
    frames.mkdir()
    for i in range(12):
        Image.new("RGB", (16, 16), (20 * i % 255, 0, 0)).save(
            frames / f"test-{i}.png")
    # numeric, not lexicographic: test-10 sorts after test-2
    order = numeric_frame_sort([str(frames / "test-10.png"),
                                str(frames / "test-2.png")])
    assert [os.path.basename(p) for p in order] == ["test-2.png",
                                                    "test-10.png"]
    sel = select_frames(str(frames), "test-*.png", start_from=3, count=5)
    assert [os.path.basename(p) for p in sel] == [
        f"test-{i}.png" for i in range(3, 8)]
    out = tmp_path / "movie.gif"
    rc = main(["--frames", str(frames), "--pattern", "test-*.png",
               "--start-from", "2", "--out", str(out)])
    assert rc == 0 and out.exists()
    with Image.open(out) as im:
        assert im.n_frames == 10   # 12 frames, 2 trimmed
    import pytest as _pytest
    with _pytest.raises(ValueError):
        select_frames(str(frames), "test-*.png", start_from=99)


def test_cli_interactive_again_preview_tex(tmp_path, synth_model_root):
    """Interactive commands 'again' (repeat-hit, the reference's key d /
    GetModalForceCopy) and 'preview' with a -tex matcap texture."""
    import numpy as np

    from openpbso_tpu.apps.render_fields import _write_png
    from openpbso_tpu.io.meta import resolve_model_dir, write_meta

    # a recognizable matcap texture file for -tex
    tex = str(tmp_path / "matcap.png")
    rng = np.random.default_rng(0)
    _write_png(tex, (rng.uniform(0, 255, (32, 32, 3))).astype(np.uint8))
    meta = str(tmp_path / "synth.meta")
    write_meta(meta, resolve_model_dir(synth_model_root, "synth"))
    png_out = str(tmp_path / "shot.png")
    feed = (f"hit 0 3 gaussian 400\nagain\npreview {png_out}\nquit\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    from openpbso_tpu.io.meta import read_meta
    paths = read_meta(meta)
    r = subprocess.run(
        [sys.executable, "-m", "openpbso_tpu.apps.real_time_modal_sound",
         "-m", paths.obj_file, "-s", paths.modes_file,
         "-t", paths.material_file, "-p", paths.ffat_dir,
         "-tex", tex, "--interactive", "--platform", "cpu",
         "--block", "256"],
        input=feed, capture_output=True, text=True, timeout=240, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(png_out)
    with open(png_out, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"
    assert f"wrote {png_out}" in r.stdout
    assert "no hit to repeat" not in r.stdout   # the cached hit replayed


def test_transfer_hist_payload():
    """Per-mode transfer histogram feed (the reference's ImGui
    PlotHistogram, real_time_modal_sound.cpp:832-853)."""
    import jax.numpy as jnp
    import numpy as np

    from openpbso_tpu.ops.coeffs import bank_from_material
    from openpbso_tpu.runtime.server import AudioServer
    from openpbso_tpu.runtime.session import ModalSession
    from openpbso_tpu.runtime.solver import SolverConfig
    from openpbso_tpu.utils.synth import CERAMIC, synth_mode_data

    md = synth_mode_data(6, 8, seed=1)
    bank = bank_from_material(CERAMIC.density, md.omega_squared,
                              CERAMIC.alpha, CERAMIC.beta,
                              num_objects=2, block_size=64)
    sess = ModalSession(bank, config=SolverConfig(block_size=64))

    class FakeEngine:
        session = sess

    srv = AudioServer.__new__(AudioServer)
    srv._model = None
    p = srv._transfer_hist_payload(FakeEngine(), {"obj": 1})
    h = p["transfer_hist"]
    assert h["obj"] == 1 and len(h["values"]) == bank.num_modes
    assert h["compressed"] is False
    # complex rows report per-mode magnitudes
    rng = np.random.default_rng(2)
    t = (rng.uniform(0.5, 2.0, (2, bank.num_modes))
         * np.exp(1j * rng.uniform(-np.pi, np.pi, (2, bank.num_modes))))
    sess.set_complex_transfer(t)
    h2 = srv._transfer_hist_payload(FakeEngine(), {"obj": 0})["transfer_hist"]
    np.testing.assert_allclose(np.asarray(h2["values"]), np.abs(t[0]),
                               rtol=1e-5)
    import pytest as _pytest
    with _pytest.raises(IndexError):
        srv._transfer_hist_payload(FakeEngine(), {"obj": 9})


def test_serve_scene_committed_assets_broadcast(tmp_path):
    """pbso-serve --scene assets/demo/scene.json --multi-client works out
    of the box (regression: BroadcastAudioServer must forward the
    scene/post_mix_factory kwargs; the committed scene must load)."""
    import socket
    import time

    import numpy as np

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = 0
    # pick a free port up front (serve has no --port 0 echo)
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "openpbso_tpu.apps.serve",
         "--scene", "assets/demo/scene.json", "--multi-client",
         "--platform", "cpu", "--port", str(port)],
        cwd=root, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    try:
        deadline = time.time() + 120
        line = ""
        while time.time() < deadline:
            line = proc.stdout.readline()
            if "serving" in line:
                break
            assert proc.poll() is None, "server died during startup"
        assert "serving" in line
        sys.path.insert(0, root)
        from openpbso_tpu.runtime.server import AudioClient
        c = AudioClient("127.0.0.1", port)
        c.send(cmd="hit", obj=1, vertex=3, kind="gaussian", width_us=800.0)
        peak = 0.0
        t0 = time.time()
        while peak == 0.0 and time.time() - t0 < 30:
            peak = float(np.abs(c.read_block()).max())
        assert peak > 0.0
        c.send(cmd="object_pos", obj=2, pos=[3.0, 0.0, 0.0])
        t0 = time.time()
        while not c.messages and time.time() - t0 < 20:
            c.read_block()
        assert c.messages and "object_pos" in c.messages[-1]
        c.send(cmd="quit")
        c.close()
    finally:
        proc.terminate()
        proc.wait(timeout=20)


def test_serve_scene_restart_carries_world_state(tmp_path):
    """An elastic engine restart on a --scene --live-doppler serve must
    come back with the LIVE world: positions moved by object_vel (not
    the JSON's initial layout), srv._scene rebound to the fresh scene,
    the fresh Doppler post-mix built at the moved positions, and the
    velocity re-pushed so the motion continues through the swap."""
    import json
    import threading
    import time

    import numpy as np

    from openpbso_tpu.apps import serve
    from openpbso_tpu.io.meta import resolve_model_dir, write_meta
    from openpbso_tpu.runtime.server import AudioClient
    from openpbso_tpu.utils.synth import synth_model_dir

    root = tmp_path / "m"
    synth_model_dir(str(root), "m", num_modes=8, subdivisions=1,
                    ffat_n=8, seed=32)
    meta = tmp_path / "m.meta"
    write_meta(str(meta), resolve_model_dir(str(root), "m"))
    sj = tmp_path / "scene.json"
    sj.write_text(json.dumps({"instances": [
        {"meta": str(meta), "position": [0.0, 0.0, 0.0]},
        {"meta": str(meta), "position": [1.0, 0.0, 0.0]},
    ]}))

    args = serve.parse_args(["--scene", str(sj), "--multi-client",
                             "--live-doppler", "--platform", "cpu",
                             "--port", "0", "--block", "256"])
    srv = serve.build_server(args)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        first_scene = srv._scene
        c = AudioClient(*srv.address)
        c.send(cmd="object_vel", obj=1, vel=[1.0, 0.0, 0.0])
        # let the motion integrate well past the JSON layout (x0 = 1.0)
        t0 = time.time()
        while srv._scene.object_position(1)[0] < 1.5 \
                and time.time() - t0 < 40:
            c.read_block()
        x_before = srv._scene.object_position(1)[0]
        assert x_before >= 1.5, x_before

        # kill the engine exactly as a synthesis failure does
        engine = srv._engine
        engine.error = RuntimeError("injected failure")
        engine._stop.set()
        deadline = time.time() + 60
        while time.time() < deadline and not any(
                "restarted" in m for m in c.messages):
            c.read_block()
        assert any("restarted" in m for m in c.messages), c.messages

        # the server rebound to a FRESH scene carrying the moved world
        assert srv._scene is not first_scene
        assert srv._scene.object_position(1)[0] >= x_before - 0.3
        pm = srv._engine._post_mix
        assert pm is not None
        assert pm.positions[1, 0] >= x_before - 0.3, pm.positions

        # and the motion continues through the swap (velocity re-pushed)
        t0 = time.time()
        while (srv._scene.object_position(1)[0] < x_before + 0.3
               and time.time() - t0 < 40):
            c.read_block()
        assert srv._scene.object_position(1)[0] >= x_before + 0.3
        np.testing.assert_allclose(pm.velocities[1], [1.0, 0.0, 0.0])
        c.send(cmd="quit")
        c.close()
    finally:
        srv.close()
        t.join(timeout=10)


def test_decode_field_plane_is_x_fastest():
    """The reference fills a column-major Eigen (nx, ny) matrix from the
    raw floats (render_fields.cpp:121-127), so raw index = x + y*nx —
    the plane decode must be C-order (ny, nx), not a Fortran reshape
    (which transposed every frame; round-5 review)."""
    import numpy as np

    from openpbso_tpu.apps.render_fields import decode_field_plane
    nx, ny, nz = 5, 3, 2
    data = np.arange(nx * ny, dtype=np.float32)
    plane = decode_field_plane(data, nx, ny, nz, 0)
    assert plane.shape == (ny, nx)
    assert plane[1, 2] == 2 + 1 * nx       # (x=2, y=1) -> x + y*nx
    # volume branch agrees with the plane branch on layout
    vol = np.concatenate([data, data + 100.0])
    vplane = decode_field_plane(vol, nx, ny, nz, 1)
    np.testing.assert_array_equal(vplane, plane + 100.0)
    assert decode_field_plane(data[:-1], nx, ny, nz, 0) is None
