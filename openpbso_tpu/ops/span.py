"""Span integrator — N samples (many blocks) in one MXU-shaped dispatch.

The round-1 heterogeneous-bank bottleneck: per-object lam-power tables are
[O, M, S]-sized HBM traffic in the blocked form (~1 GB/block at 256x1024x512),
and the chunked Pallas kernel that avoids the traffic is VPU-bound (~6 M*S
elementwise ops per object per block). Both hit the per-dispatch floor of the
hot loop they inherit from the reference (modal_integrator.h:104-113: one
serial IIR step per sample).

This module removes the serial dependency entirely with a *baby-step /
giant-step* factorization of the lam powers over a span of N = n_blocks * S
samples:

    lam^(x*R + r) = lam^(x*R) * lam^r        x in [0, X], r in [0, R]

with N = X * R. Host-precomputed float64 factor tables A[x] = lam^(xR)
("giant") and B[r] = lam^r ("baby") are O((X + R) * M) per object instead of
O(N * M), and every per-sample quantity becomes a matmul (per force slot k,
the per-slot decomposition of the reference's block-granular rank-1 force,
ops/forces.py::force_span):

    hom[x*R + r - 1] = Im( sum_m (A[x] t z)_m B[r]_m )    [O,X,M] @ [O,M,R]
    g_k[x*R + r]     = Im( sum_m (A[x] t b e_k)_m B[r]_m ) [O,KX,M] @ [O,M,R]
    F_k,m (state inject) = sum_x A[x]_m (sum_r f_k_rev[xR+r] B[r]_m)
                                                           [O,KX,R] @ [O,R,M]
    sound = hom + sum_k causal_conv(g_k, f_k)   (one FFT pair over 2N)
    z'    = lam^N z + sum_k b e_k F_k           (lam^N = A[X])

For shared banks the batched einsums collapse to single giant matmuls
([O*X, M] @ [M, R]). Because every sample's power is a product of two
f64-derived factors, there is *no* accumulated phase rounding within a span
(better than the chunk-serial Pallas kernel); across spans the state advances
by the f64-derived lam^N.

Semantics are identical to running step_block_blocked n_blocks times with the
same constant transfer and no sustained channel (the caller gates sustained
scenes to the per-block path; force slots are pure functions of the sample
clock, so hits scheduled anywhere inside the span fire at the right sample).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .coeffs import ModalBank, _power_table, round_up
from .integrator import PRECISION, _causal_conv


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SpanTables:
    """Factored lam-power tables for one span length.

    a_*: [Og, X+1, M] giant steps lam^(x*R); b_*: [Og, R+1, M] baby steps
    lam^r. Og == 1 for shared banks (every object one mode set).
    """
    a_re: jax.Array
    a_im: jax.Array
    b_re: jax.Array
    b_im: jax.Array

    @property
    def big_steps(self) -> int:
        return self.a_re.shape[1] - 1

    @property
    def radix(self) -> int:
        return self.b_re.shape[1] - 1

    @property
    def span(self) -> int:
        return self.big_steps * self.radix

    @property
    def shared(self) -> bool:
        return self.a_re.shape[0] == 1


def choose_radix(span: int, target: int = 256) -> int:
    """Largest divisor of ``span`` <= target (baby-table length R).

    R ~ sqrt(N) balances table HBM ([O,R,M]) against the W intermediates
    ([O,N/R,M]); 256 keeps the matmul minor dims MXU-tile aligned for the
    native block sizes (all powers of two).
    """
    for r in range(min(target, span), 0, -1):
        if span % r == 0:
            return r
    return 1


def build_span_tables(
    lam64: np.ndarray,
    span: int,
    *,
    radix: int | None = None,
    num_modes: int | None = None,
    pad_modes_to: int = 128,
    shared: bool | None = None,
    dtype=jnp.float32,
) -> SpanTables:
    """Factor tables from the float64 eigenvalues (NOT the bank's f32 cast:
    lam^N amplifies base rounding by N, so the f64 source is required —
    same reason the blocked tables are host-f64, ops/coeffs.py).

    ``lam64``: [M] or [O, M] complex128 (as returned by lambda_from_modes);
    modes are zero-padded to ``num_modes`` (or a lane multiple).
    """
    lam = np.atleast_2d(np.asarray(lam64, np.complex128))
    o, m = lam.shape
    mp = num_modes if num_modes is not None else round_up(m, pad_modes_to)
    if mp < m:
        raise ValueError(f"num_modes {mp} < actual modes {m}")
    lam = np.pad(lam, ((0, 0), (0, mp - m)))
    r = radix if radix is not None else choose_radix(span)
    if span % r:
        raise ValueError(f"radix {r} does not divide span {span}")
    x = span // r
    if shared is None:
        shared = o == 1 or all(np.array_equal(lam[0], lam[i])
                               for i in range(1, o))
    src = lam[:1] if shared else lam
    # _power_table puts the exponent axis last; tables are [Og, rows, M]
    a = np.moveaxis(_power_table(src, np.arange(x + 1, dtype=np.int64) * r),
                    -1, 1)
    b = np.moveaxis(_power_table(src, r), -1, 1)
    return SpanTables(
        a_re=jnp.asarray(a.real, dtype), a_im=jnp.asarray(a.imag, dtype),
        b_re=jnp.asarray(b.real, dtype), b_im=jnp.asarray(b.imag, dtype),
    )


def _contract_xr(w: jax.Array, tbl: jax.Array) -> jax.Array:
    """sum_m w[o,x,m] tbl[og,r,m] -> [o,x,r]; one giant matmul when shared."""
    if tbl.shape[0] == 1:
        o, x, m = w.shape
        out = jnp.matmul(w.reshape(o * x, m), tbl[0].T, precision=PRECISION)
        return out.reshape(o, x, -1)
    return jnp.einsum("oxm,orm->oxr", w, tbl, precision=PRECISION)


def _contract_xm(f: jax.Array, tbl: jax.Array) -> jax.Array:
    """sum_r f[o,x,r] tbl[og,r,m] -> [o,x,m]; one giant matmul when shared."""
    if tbl.shape[0] == 1:
        o, x, r = f.shape
        out = jnp.matmul(f.reshape(o * x, r), tbl[0], precision=PRECISION)
        return out.reshape(o, x, -1)
    return jnp.einsum("oxr,orm->oxm", f, tbl, precision=PRECISION)


@jax.jit
def integrate_span(
    z_re: jax.Array,            # [O, M]
    z_im: jax.Array,            # [O, M]
    bank: ModalBank,
    tables: SpanTables,
    space_k: jax.Array,         # [O, K, M] per-slot modal amplitudes
    f_k: jax.Array,             # [O, K, N] per-slot effective profiles
    transfer: jax.Array,        # [O, M]
):
    """Integrate one span. Returns (z_re', z_im', sound [O, N]).

    The excitation is the per-slot decomposition of the reference's
    block-granular rank-1 force (ops/forces.py::force_span): slot k
    contributes space_k x f_k; summing the per-slot responses reproduces
    n_blocks sequential step_block_blocked calls (constant transfer, no
    sustained channel) to f32 reduction-order noise.
    """
    o, m = z_re.shape
    k = space_k.shape[1]
    n = f_k.shape[-1]
    assert tables.span == n, (
        f"span tables built for {tables.span} samples, got {n}")
    x, r = tables.big_steps, tables.radix
    a_re, a_im = tables.a_re, tables.a_im
    b_re, b_im = tables.b_re, tables.b_im
    dtype = z_re.dtype

    tmask = transfer * bank.mask
    tz_re = (tmask * z_re)[:, None, :]
    tz_im = (tmask * z_im)[:, None, :]
    axr, axi = a_re[:, :x], a_im[:, :x]        # giant rows 0..X-1

    # hom[n = x*R + rr] = Im(A[x] B[rr+1] z) . t  for rr in [0, R)
    wh_re = axr * tz_re - axi * tz_im          # [O, X, M]
    wh_im = axi * tz_re + axr * tz_im
    hom = (_contract_xr(wh_re, b_im[:, 1:])
           + _contract_xr(wh_im, b_re[:, 1:])).reshape(o, n)

    # per-slot forced response: g_k[d = x*R + r] = Im(A[x] B[r] b e_k) . t
    be_re = bank.b_re[:, None, :] * space_k    # [O, K, M]
    be_im = bank.b_im[:, None, :] * space_k
    tb_re = tmask[:, None, None, :] * be_re[:, :, None, :]   # [O, K, 1, M]
    tb_im = tmask[:, None, None, :] * be_im[:, :, None, :]
    wg_re = (axr[:, None] * tb_re - axi[:, None] * tb_im).reshape(
        o, k * x, m)
    wg_im = (axi[:, None] * tb_re + axr[:, None] * tb_im).reshape(
        o, k * x, m)
    g = (_contract_xr(wg_re, b_im[:, :r])
         + _contract_xr(wg_im, b_re[:, :r])).reshape(o, k, n)

    # causal conv summed over slots in the frequency domain (linear)
    nf = 2 * n
    conv_f = jnp.sum(jnp.fft.rfft(g, n=nf, axis=-1)
                     * jnp.fft.rfft(f_k, n=nf, axis=-1), axis=1)
    sound = hom + jnp.fft.irfft(conv_f, n=nf, axis=-1)[..., :n].astype(dtype)

    # state injection per slot: F_k,m = sum_d lam^d f_k_rev[d], d = x*R + rr
    f_rev = f_k[:, :, ::-1].reshape(o, k * x, r)
    t_re = _contract_xm(f_rev, b_re[:, :r]).reshape(o, k, x, m)
    t_im = _contract_xm(f_rev, b_im[:, :r]).reshape(o, k, x, m)
    fk_re = jnp.sum(axr[:, None] * t_re - axi[:, None] * t_im, axis=2)
    fk_im = jnp.sum(axi[:, None] * t_re + axr[:, None] * t_im, axis=2)
    inj_re = jnp.sum(be_re * fk_re - be_im * fk_im, axis=1)   # [O, M]
    inj_im = jnp.sum(be_re * fk_im + be_im * fk_re, axis=1)

    pn_re, pn_im = a_re[:, x], a_im[:, x]      # lam^N
    z_re_out = pn_re * z_re - pn_im * z_im + inj_re
    z_im_out = pn_im * z_re + pn_re * z_im + inj_im
    return z_re_out, z_im_out, sound


@jax.jit
def decay_span(
    z_re: jax.Array,
    z_im: jax.Array,
    bank: ModalBank,
    tables: SpanTables,
    transfer: jax.Array,
):
    """Homogeneous-only span (scene ringing down, zero excitation).

    The G/conv/state-injection terms of integrate_span vanish exactly; what
    remains is the hom matmul pair and the lam^N state rotation — the span
    generalization of ops/integrator.decay_block_blocked.
    """
    o, m = z_re.shape
    n = tables.span
    x = tables.big_steps
    a_re, a_im = tables.a_re, tables.a_im
    b_re, b_im = tables.b_re, tables.b_im
    tmask = transfer * bank.mask
    tz_re = (tmask * z_re)[:, None, :]
    tz_im = (tmask * z_im)[:, None, :]
    axr, axi = a_re[:, :x], a_im[:, :x]
    wh_re = axr * tz_re - axi * tz_im
    wh_im = axi * tz_re + axr * tz_im
    sound = (_contract_xr(wh_re, b_im[:, 1:])
             + _contract_xr(wh_im, b_re[:, 1:])).reshape(o, n)
    pn_re, pn_im = a_re[:, x], a_im[:, x]
    z_re_out = pn_re * z_re - pn_im * z_im
    z_im_out = pn_im * z_re + pn_re * z_im
    return z_re_out, z_im_out, sound
