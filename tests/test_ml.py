"""ML sidecar: features, AR model fit, dataset formats, classification."""
import numpy as np
import pytest

from openpbso_tpu.ml.ar_model import ARParams, estimate, generate, spectrum
from openpbso_tpu.ml.dataset import read_bank, write_bank
from openpbso_tpu.ml.features import (FEATURE_NAMES, NUM_FEATURES,
                                      clip_features, short_term_features)


def test_feature_layout():
    assert NUM_FEATURES == 34  # matches the reference's 34-type features
    assert len(FEATURE_NAMES) == 34


def test_features_shapes_and_finiteness():
    rng = np.random.default_rng(0)
    sig = rng.standard_normal(44100 // 4)
    st = short_term_features(sig)
    assert st.shape[1] == 34
    assert np.isfinite(st).all()
    cf = clip_features(sig)
    assert cf.shape == (68,)
    assert np.isfinite(cf).all()


def test_features_discriminate_tones_from_noise():
    """Spectral centroid/entropy must separate a pure tone from noise."""
    rng = np.random.default_rng(1)
    t = np.arange(22050) / 44100
    tone = np.sin(2 * np.pi * 440.0 * t)
    noise = rng.standard_normal(22050)
    f_tone = clip_features(tone)
    f_noise = clip_features(noise)
    ent_idx = FEATURE_NAMES.index("spectral_entropy")
    assert f_tone[ent_idx] < f_noise[ent_idx]
    zcr_idx = FEATURE_NAMES.index("zcr")
    assert f_tone[zcr_idx] < f_noise[zcr_idx]


def test_ar_generate_estimate_roundtrip():
    p = ARParams(a=(0.7, 0.1), sigma=0.002, mu=0.3)
    trace = generate(p, 40000, seed=2)
    est = estimate(trace)
    assert est.mu == pytest.approx(0.3, abs=0.01)
    assert est.a[0] == pytest.approx(0.7, abs=0.05)
    assert est.a[1] == pytest.approx(0.1, abs=0.05)
    assert est.sigma == pytest.approx(0.002, rel=0.2)


def test_ar_spectrum_shape():
    f, s = spectrum(ARParams())
    assert f.shape == s.shape
    # AR(2) with positive coefficients is low-pass: DC >> Nyquist
    assert s[0] > 10 * s[-1]


def test_bank_roundtrip(tmp_path):
    rows = np.random.default_rng(0).standard_normal((5, 7))
    path = str(tmp_path / "bank.dat")
    write_bank(path, rows)
    back = read_bank(path, 7)
    np.testing.assert_array_equal(back, rows)


def test_classification_end_to_end():
    """Tiny engine-synthesized dataset must classify well above chance."""
    pytest.importorskip("sklearn")
    from openpbso_tpu.ml.dataset import features_matrix, synthesize_dataset
    from openpbso_tpu.ml.train import train_linear_svc
    clips = synthesize_dataset(
        materials={k: v for k, v in
                   list(__import__("openpbso_tpu.ml.dataset",
                                   fromlist=["MATERIALS"])
                        .MATERIALS.items())[:3]},
        objects_per_material=2, hits_per_object=2, num_modes=24,
        seconds=0.25, block=256)
    x, y, labels = features_matrix(clips)
    assert len(labels) == 3 and x.shape[0] >= 9
    grid = train_linear_svc(x, y, cv=3)
    assert grid.best_score_ > 0.5  # chance is 1/3


def test_embed_features_pca():
    from openpbso_tpu.ml.features import embed_features
    rng = np.random.default_rng(0)
    # two well-separated clusters must stay separated in PCA space
    a = rng.standard_normal((15, 10)) + 8.0
    b = rng.standard_normal((15, 10)) - 8.0
    e = embed_features(np.vstack([a, b]), "pca")
    assert e.shape == (30, 2)
    da = e[:15, 0].mean()
    db = e[15:, 0].mean()
    assert abs(da - db) > 3.0


def test_plot_results_png(tmp_path):
    from openpbso_tpu.ml.train import TrainResult, plot_results_png
    rs = [TrainResult("LinearSVC", "all", 0.9, 0.05, 1.0, 10),
          TrainResult("SGD", "mfcc", 0.6, 0.1, None, 10)]
    path = str(tmp_path / "bar.png")
    plot_results_png(rs, path)
    with open(path, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"
