"""Dataset-scale rehearsal (round-4 VERDICT item 6): ONE test drives a
16-model mirror through the whole production pipeline — vectorized FFAT
fitting (ops.ffat_fit.fit_ffat_map) -> reference-layout mirror ->
fetch_dataset staging + meta generation (scripts/download.py +
prepare_meta.sh parity) -> native bulk .fatcube decode
(ffat_map_serialize.h:267-279 LoadAllFFAT_Maps) -> load_model ->
a 16-instance Scene serving audio. Proves the "reference-scale dataset is
interactive" claim as a pipeline, not per-stage.

Slow-marked: ~200 map fits + a scene compile (run with ``-m slow``).
"""
import os

import numpy as np
import pytest

from openpbso_tpu.apps.fetch_dataset import main as fetch_main
from openpbso_tpu.io.fatcube import (load_all_fatcubes, maps_match_bits,
                                     save_fatcube)
from openpbso_tpu.io.material import write_material
from openpbso_tpu.io.meta import read_meta
from openpbso_tpu.io.mode_data import write_modes
from openpbso_tpu.io.objmesh import icosphere, write_obj
from openpbso_tpu.models.modal_model import load_model
from openpbso_tpu.models.scene import Scene, SceneInstance
from openpbso_tpu.native.bindings import load_all_fatcubes_native, load_native
from openpbso_tpu.ops.ffat_fit import cubemap_eval_points, fit_ffat_map
from openpbso_tpu.utils.synth import (CERAMIC, SOUND_SPEED,
                                      synth_cubemap_shell, synth_mode_data)

N_MODELS = 16
N_MODES = 12
FIT_DIM = 12            # outer-shell resolution (6*144 directions per map)


def _fit_model_maps(freqs_hz, center, seed):
    """Fit one model's runtime maps from synthetic 3-shell pressures
    (the wavesolver-output stand-in; fit path ffat_solver.h:1008-1052)."""
    rng = np.random.default_rng(seed)
    shells = [synth_cubemap_shell(center, he, FIT_DIM)
              for he in (0.2, 0.3, 0.45)]
    pts = [cubemap_eval_points(sh) for sh in shells]
    maps = {}
    for mode, f in enumerate(freqs_hz):
        k = 2.0 * np.pi * float(f) / SOUND_SPEED
        axes = rng.standard_normal((2, 3))

        def psi_fn(dirs):
            out = np.ones(dirs.shape[0])
            for ax in axes:
                out = out + 0.3 * np.tanh(dirs @ ax)
            return out * 1e6

        pressures = []
        for sh, p in zip(shells, pts):
            r = np.linalg.norm(p - center[None, :], axis=1)
            dirs = (p - center[None, :]) / r[:, None]
            kr = k * r
            pressures.append(-1j * np.exp(-1j * kr) / kr * psi_fn(dirs))
        maps[mode] = fit_ffat_map(mode, k, shells, pressures)
    return maps


@pytest.mark.slow
def test_sixteen_model_pipeline(tmp_path):
    center = np.zeros(3)
    mats = tmp_path / "materials"
    mats.mkdir()
    write_material(str(mats / "ceramic.txt"), CERAMIC, comment="synthetic")
    src = tmp_path / "mirror"
    manifest_lines = []
    v, f = icosphere(subdivisions=1, radius=0.05)

    # ---- 1. fit + publish: 16 models x 12 modes of fitted radiation maps
    for i in range(N_MODELS):
        mid = f"m{i:02d}"
        name = f"{mid}_tetmesh"
        base = src / "data" / mid
        (base / "modal_models" / "ceramic").mkdir(parents=True)
        ffat = base / "radiation_models" / "ceramic" / "ffat_map-fdtd"
        ffat.mkdir(parents=True)
        modes = synth_mode_data(N_MODES, v.shape[0], seed=100 + i,
                                f_low=130.0 + 3 * i, f_high=9000.0 + 50 * i)
        write_obj(str(base / f"{name}.tet.obj"), v, f)
        write_modes(str(base / "modal_models" / "ceramic"
                        / f"{name}_surf.modes"), modes)
        fitted = _fit_model_maps(modes.frequencies_hz(CERAMIC.density),
                                 center, seed=500 + i)
        for mode, m in fitted.items():
            save_fatcube(str(ffat / f"{mode:06d}.fatcube"), m)
        manifest_lines.append(f"data/{mid} ceramic")
    manifest = tmp_path / "ran_obj_mat.txt"
    manifest.write_text("\n".join(manifest_lines) + "\n")

    # ---- 2. stage the dataset + generate metas (download.py parity)
    out_root = str(tmp_path / "staged")
    meta_dir = str(tmp_path / "meta")
    rc = fetch_main(["--manifest", str(manifest), "--source", str(src),
                     "--materials-dir", str(mats), "--out-root", out_root,
                     "--meta-dir", meta_dir])
    assert rc == 0
    metas = sorted(os.listdir(meta_dir))
    assert len(metas) == N_MODELS

    # ---- 3. native bulk decode of the staged bytes, bit-parity vs the
    # Python codec (spot-check two models; load_model itself routes
    # through the native decoder)
    # the .so is BUILT ON DEMAND by load_native (gitignored, not
    # committed); without a g++ toolchain the production path falls back
    # to the Python codec — skip the native leg instead of failing
    if load_native() is None:
        import shutil
        if shutil.which("g++"):
            pytest.fail("native decoder failed to build with g++ present")
        pytest.skip("native decoder unavailable (no g++ toolchain)")
    for mid in ("m00", "m09"):
        d = os.path.join(out_root, f"{mid}_tetmesh", "ffat_map-fdtd")
        nat = load_all_fatcubes_native(d)
        py = load_all_fatcubes(d)
        assert sorted(nat) == sorted(py) == list(range(N_MODES))
        for mode in nat:
            assert maps_match_bits(nat[mode], py[mode])

    # ---- 4. load all 16 models through the meta flow
    models = [load_model(read_meta(os.path.join(meta_dir, mp)))
              for mp in metas]
    for m in models:
        assert m.num_modes_audible == N_MODES
        assert len(m.ffat_maps) == N_MODES

    # ---- 5. one Scene serves the whole staged dataset
    rng = np.random.default_rng(9)
    ring = rng.uniform(-1.0, 1.0, (N_MODELS, 3))
    scene = Scene([SceneInstance(m, pos) for m, pos in zip(models, ring)],
                  block_size=128, num_slots=4)
    scene.set_listener(np.array([0.4, 0.1, 0.0]))
    for idx in (0, 5, 11):
        scene.hit(idx, 0)
    mix = scene.render(6)
    assert mix.shape == (6 * 128, 2)
    assert np.isfinite(mix).all()
    assert np.abs(mix).max() > 0
    # the ring-down must actually decay (real modal dynamics end-to-end)
    e0 = float(np.square(mix[:128]).sum())
    scene.render(40)
    e1 = float(np.square(scene.render(1)).sum())
    assert e1 < e0
