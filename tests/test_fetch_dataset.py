"""Dataset staging tool (apps/fetch_dataset.py) — parity with the
reference's scripts/download.py manifest flow + prepare_meta.sh meta
generation, driven against a local mirror tree."""
import os
import shutil

import numpy as np
import pytest

from openpbso_tpu.apps.fetch_dataset import (main, parse_manifest,
                                             write_dataset_meta)
from openpbso_tpu.utils.synth import synth_model_dir


@pytest.fixture
def mirror(tmp_path):
    """A local source tree in the reference's remote layout:
    <path>/<ID>_tetmesh.tet.obj, modal_models/<mat>/..., radiation_models/
    <mat>/ffat_map-fdtd/, plus a materials dir."""
    src = tmp_path / "mirror"
    mats = tmp_path / "materials"
    mats.mkdir(parents=True)
    ids = ["cup", "bowl"]
    for i, mid in enumerate(ids):
        stage = tmp_path / f"synth_{mid}"
        synth_model_dir(str(stage), "m", num_modes=10, subdivisions=1,
                        ffat_n=8, seed=10 + i)
        base = src / "data" / mid
        (base / "modal_models" / "ceramic").mkdir(parents=True)
        (base / "radiation_models" / "ceramic").mkdir(parents=True)
        name = f"{mid}_tetmesh"
        shutil.copy(stage / "m.tet.obj", base / f"{name}.tet.obj")
        shutil.copy(stage / "m_surf.modes",
                    base / "modal_models" / "ceramic" / f"{name}_surf.modes")
        shutil.copytree(stage / "m_ffat_maps",
                        base / "radiation_models" / "ceramic"
                        / "ffat_map-fdtd")
        shutil.copy(stage / "m_material.txt", mats / "ceramic.txt")
    manifest = tmp_path / "ran_obj_mat.txt"
    manifest.write_text(
        "# comment line\n"
        "data/cup ceramic\n"
        "data/bowl ceramic\n")
    return tmp_path, str(manifest), str(src), str(mats), ids


def test_manifest_parsing(mirror):
    _, manifest, _, _, _ = mirror
    entries = parse_manifest(manifest)
    assert entries == [("cup", "data/cup", "ceramic"),
                       ("bowl", "data/bowl", "ceramic")]


def test_stage_and_meta_end_to_end(mirror):
    tmp_path, manifest, src, mats, ids = mirror
    out_root = str(tmp_path / "10k")
    meta_dir = str(tmp_path / "meta")
    rc = main(["--manifest", manifest, "--source", src,
               "--materials-dir", mats, "--out-root", out_root,
               "--meta-dir", meta_dir])
    assert rc == 0
    for mid in ids:
        d = os.path.join(out_root, f"{mid}_tetmesh")
        assert os.path.isfile(os.path.join(d, f"{mid}_tetmesh.tet.obj"))
        assert os.path.isfile(os.path.join(d, f"{mid}_tetmesh_surf.modes"))
        assert os.path.isfile(os.path.join(d, "ceramic.txt"))
        assert os.listdir(os.path.join(d, "ffat_map-fdtd"))
    metas = sorted(os.listdir(meta_dir))
    assert metas == ["bowl_tetmesh.meta", "cup_tetmesh.meta"]
    # the staged model must load through the normal meta flow
    from openpbso_tpu.io.meta import read_meta
    from openpbso_tpu.models.modal_model import load_model
    model = load_model(read_meta(os.path.join(meta_dir, metas[0])))
    assert model.num_modes_audible > 0
    assert len(model.ffat_maps) > 0
    space = model.modal_force_vertex(0)
    assert np.isfinite(space).all()


def test_meta_skips_empty_ffat(mirror):
    tmp_path, manifest, src, mats, ids = mirror
    out_root = str(tmp_path / "10k")
    main(["--manifest", manifest, "--source", src,
          "--materials-dir", mats, "--out-root", out_root])
    # empty one model's ffat dir: prepare_meta.sh's guard must skip it
    ffat = os.path.join(out_root, "cup_tetmesh", "ffat_map-fdtd")
    for f in os.listdir(ffat):
        os.remove(os.path.join(ffat, f))
    meta_dir = str(tmp_path / "meta2")
    written = write_dataset_meta(out_root, meta_dir)
    assert [os.path.basename(w) for w in written] == ["bowl_tetmesh.meta"]


def test_missing_source_reports_and_continues(mirror, capsys):
    tmp_path, _, src, mats, _ = mirror
    bad = tmp_path / "bad.txt"
    bad.write_text("data/cup ceramic\ndata/nope ceramic\n")
    out_root = str(tmp_path / "out2")
    rc = main(["--manifest", str(bad), "--source", src,
               "--materials-dir", mats, "--out-root", out_root])
    assert rc == 1  # one model failed
    assert os.path.isdir(os.path.join(out_root, "cup_tetmesh"))
    assert "SKIP nope" in capsys.readouterr().err


def test_interrupted_fetch_leaves_no_partial(mirror):
    """Atomic staging: leftover .part debris from an interrupted run is
    discarded and the final destination is only ever complete."""
    tmp_path, manifest, src, mats, ids = mirror
    out_root = str(tmp_path / "atomic")
    outdir = os.path.join(out_root, "cup_tetmesh")
    os.makedirs(os.path.join(outdir, "ffat_map-fdtd.part"))
    with open(os.path.join(outdir, "ffat_map-fdtd.part", "junk"), "w") as f:
        f.write("partial")
    rc = main(["--manifest", manifest, "--source", src,
               "--materials-dir", mats, "--out-root", out_root])
    assert rc == 0
    assert not os.path.exists(os.path.join(outdir, "ffat_map-fdtd.part"))
    ffat = os.path.join(outdir, "ffat_map-fdtd")
    assert os.path.isdir(ffat)
    assert "junk" not in os.listdir(ffat)
    assert any(f.endswith(".fatcube") for f in os.listdir(ffat))
