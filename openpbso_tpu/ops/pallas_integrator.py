"""Fused Pallas TPU kernel for the modal block integrator (V2).

The streaming hot path for *heterogeneous* scenes (each object its own mode
bank). The blocked XLA backend streams [O, M, S]-sized lam-power tables from
HBM every block (~1 GB at 256x1024x512); this kernel reuses only the
*chunk-sized* prefix of those tables (lam^0..lam^C), loaded to VMEM once per
object per block and reused across all S/C chunks — HBM traffic drops by
S/C (16x at the defaults).

Algorithm (chunked block form; math in ops/coeffs.py): per object, per chunk
of C samples starting at state z,

    G_d   = sum_m t_m Im(P_d beff_m)          d in [0, C)   (once per block)
    hom_c = sum_m t_m Im(P_{c+1} z_m)         c in [0, C)
    z    <- P_C z + beff sum_j P_{C-1-j} f_j

with P_d = lam^d sliced from the bank's host-f64 power tables. Tables are
laid out [Og, Cp, M] (powers in sublanes, modes in lanes; Cp = C+1 padded to
a sublane multiple), so every kernel op is a 2D [Cp, M] multiply plus a
sublane/lane reduction; the serial dependency is S/C chunk steps. Shared
banks keep one table and every grid program maps to it (index_map -> 0).
The within-chunk causal convolution ``sound = hom + G (*) f`` is a [C, C]
batched matmul in XLA.

Chunk-boundary state propagation uses the f64-derived lam^C, so f32 phase
rounding accrues per chunk, not per sample (same accuracy class as the
blocked XLA backend).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .coeffs import ModalBank
from .integrator import PRECISION

# V4 tuning sweep on a v5e (hetero 256x1024, block 512, pipelined):
# chunk=32 1.84 ms/block, 64 1.11 ms, 128 1.01 ms (obj_tile=16 variants
# slower: 1.16-1.23 ms). Larger chunks cut the serial chunk-step count and
# amortize the per-step reduce setup — but chunk=128 hetero tables
# (2 x [OT*(C+1), M] f32, double-buffered by the pallas pipeline) measure
# 17.1 MB against the 16 MB scoped-VMEM limit and can fail to compile, so
# 64 is the production default (1.66x over the old 32). Accuracy improves
# with chunk size (fewer chunk-boundary f32 roundings).
DEFAULT_CHUNK = 64


def _round8(x: int) -> int:
    return -(-x // 8) * 8


OBJ_TILE = 8  # sublane-aligned object tile per kernel program


def _fused_kernel(pr_ref, pi_ref, be_re_ref, be_im_ref, t_ref,
                  zr_ref, zi_ref, f_rev_ref,
                  hom_ref, g_ref, zr_out_ref, zi_out_ref,
                  *, chunk: int, block: int):
    """Grid: one program per OBJ_TILE objects.

    pr/pi: [OT*Cp, M] packed chunk tables (row o*Cp+d = lam_o^d);
    be/t/z: [OT, M]; f_rev: [OT, S] (reversed profile);
    hom: [OT, S]; g: [OT, C]; z out: [OT, M].
    """
    c = chunk
    ot, m = be_re_ref.shape
    cp = pr_ref.shape[0] // ot
    n_chunks = block // c
    pr = pr_ref[...].reshape(ot, cp, m)   # [OT, Cp, M] (row-major view)
    pi = pi_ref[...].reshape(ot, cp, m)
    be_re = be_re_ref[...]
    be_im = be_im_ref[...]
    t = t_ref[...]
    p1r = pr[:, 1:c + 1, :]   # lam^{1..C}   [OT, C, M]
    p1i = pi[:, 1:c + 1, :]
    p0r = pr[:, :c, :]        # lam^{0..C-1} [OT, C, M]
    p0i = pi[:, :c, :]
    pcr = pr[:, c, :]         # lam^C        [OT, M]
    pci = pi[:, c, :]

    # G[ot, d] = sum_m t (p0i be_re + p0r be_im): reduce lanes -> [OT, C]
    g_ref[...] = jnp.sum(p0i * (t * be_re)[:, None, :]
                         + p0r * (t * be_im)[:, None, :], axis=2)

    zr = zr_ref[...]          # [OT, M]
    zi = zi_ref[...]
    n = f_rev_ref.shape[-1]
    for k in range(n_chunks):
        hom = jnp.sum(p1r * (t * zi)[:, None, :]
                      + p1i * (t * zr)[:, None, :], axis=2)  # [OT, C]
        hom_ref[:, k * c:(k + 1) * c] = hom
        f_rev = f_rev_ref[:, n - (k + 1) * c: n - k * c]     # [OT, C]
        s_re = jnp.sum(p0r * f_rev[:, :, None], axis=1)      # [OT, M]
        s_im = jnp.sum(p0i * f_rev[:, :, None], axis=1)
        zr_n = pcr * zr - pci * zi + be_re * s_re - be_im * s_im
        zi_n = pci * zr + pcr * zi + be_re * s_im + be_im * s_re
        zr, zi = zr_n, zi_n
    zr_out_ref[...] = zr
    zi_out_ref[...] = zi


@partial(jax.jit, static_argnames=("compute_qnorm", "chunk", "interpret",
                                   "obj_tile"))
def step_block_pallas(
    z_re: jax.Array,            # [O, M]
    z_im: jax.Array,            # [O, M]
    bank: ModalBank,
    space: jax.Array,           # [O, M]
    time_profile: jax.Array,    # [O, S]
    transfer: jax.Array,        # [O, M]
    compute_qnorm: bool = False,
    chunk: int = DEFAULT_CHUNK,
    interpret: bool = False,
    obj_tile: int = OBJ_TILE,
    transfer_im=None,
):
    """Pallas backend; same contract as ops.integrator.step_block_*.

    Requires bank lam-power tables (block_size set) of length >= chunk.
    qnorm (telemetry, UI-rate) falls back to the blocked XLA path when
    requested.
    """
    assert transfer_im is None, (
        "complex transfer rows are not supported by the Pallas kernel "
        "(the solver routes them to the blocked form)")
    o, m = z_re.shape
    s = time_profile.shape[-1]
    chunk = min(chunk, s)   # small blocks: one chunk spans the block
    assert s % chunk == 0, f"block {s} must be a multiple of chunk {chunk}"
    assert bank.pow_re is not None and bank.pow_re.shape[-1] >= chunk + 1, (
        "bank tables missing or shorter than the pallas chunk")
    dtype = z_re.dtype
    cp = _round8(chunk + 1)
    sc = s // chunk
    o_pad = -(-o // obj_tile) * obj_tile
    pad = o_pad - o

    def padded(x):
        return (jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
                if pad else x)

    # packed 2D chunk tables [O_tiles_needed*OT*Cp, M]: row o*Cp+d = lam_o^d.
    # Shared banks materialize only ONE tile's worth (obj_tile copies) and
    # every grid program maps to block 0 — not O per-object copies.
    shared = bank.shared_tables

    def to_chunk_table(tbl):
        t3 = jnp.moveaxis(tbl[..., : chunk + 1], -1, 1)      # [Og, C+1, M]
        t3 = jnp.pad(t3, ((0, 0), (0, cp - chunk - 1), (0, 0)))
        if shared:
            t3 = jnp.broadcast_to(t3, (obj_tile, cp, m))
            return t3.reshape(obj_tile * cp, m)
        t3 = jnp.broadcast_to(t3, (o, cp, m))
        return padded(t3).reshape(o_pad * cp, m)

    pow_r = to_chunk_table(bank.pow_re)
    pow_i = to_chunk_table(bank.pow_im)

    be_re = padded(bank.b_re * space)
    be_im = padded(bank.b_im * space)
    tmask = padded(transfer * bank.mask)
    z_re_p = padded(z_re)
    z_im_p = padded(z_im)
    f_p = padded(time_profile)

    row = lambda i: (i, 0)
    tbl_map = (lambda i: (0, 0)) if shared else row
    spec_tbl = pl.BlockSpec((obj_tile * cp, m), tbl_map,
                            memory_space=pltpu.VMEM)
    spec_m = pl.BlockSpec((obj_tile, m), row, memory_space=pltpu.VMEM)
    spec_s = pl.BlockSpec((obj_tile, s), row, memory_space=pltpu.VMEM)
    spec_c = pl.BlockSpec((obj_tile, chunk), row, memory_space=pltpu.VMEM)

    hom, g, zr_out, zi_out = pl.pallas_call(
        partial(_fused_kernel, chunk=chunk, block=s),
        grid=(o_pad // obj_tile,),
        in_specs=[spec_tbl, spec_tbl] + [spec_m] * 5 + [spec_s],
        out_specs=(spec_s, spec_c, spec_m, spec_m),
        out_shape=(
            jax.ShapeDtypeStruct((o_pad, s), dtype),
            jax.ShapeDtypeStruct((o_pad, chunk), dtype),
            jax.ShapeDtypeStruct((o_pad, m), dtype),
            jax.ShapeDtypeStruct((o_pad, m), dtype),
        ),
        interpret=interpret,
    )(pow_r, pow_i, be_re, be_im, tmask, z_re_p, z_im_p, f_p[:, ::-1])

    # within-chunk causal convolution in XLA:
    # sound[k, cc] = hom[k, cc] + sum_{j<=cc} G[cc-j] f[k, j]
    # (gather, not a [C,C,C] one-hot contraction: the einsum form burned
    # O(O*C^3) MACs per dispatch on this latency-sensitive per-block path
    # just to place g on diagonals — the span path's idiom, span.py)
    idx = np.arange(chunk)
    delta = idx[:, None] - idx[None, :]
    toep = jnp.take(g, jnp.asarray(delta.clip(0)), axis=-1) \
        * jnp.asarray(delta >= 0, dtype)             # [O, C(out), C(in)]
    f_chunks = f_p.reshape(o_pad, sc, chunk)
    conv = jnp.einsum("ocj,okj->okc", toep, f_chunks,
                  precision=PRECISION)
    sound = (hom + conv.reshape(o_pad, s))[:o]

    qnorm = None
    if compute_qnorm:
        from .integrator import step_block_blocked
        _, _, _, qnorm = step_block_blocked(
            z_re, z_im, bank, space, time_profile, transfer, True)
    return zr_out[:o], zi_out[:o], sound, qnorm


def register_backend():
    from . import integrator
    integrator.BACKENDS["pallas"] = step_block_pallas


register_backend()
