"""Fused Pallas TPU kernel for the modal block integrator.

This is the streaming hot path for *heterogeneous* scenes (each object its
own mode bank). The shared-table matmul form of ops/integrator.py would need
[O, M, S]-sized lam-power tables streamed from HBM every block; here one
kernel invocation synthesizes a whole audio block for an 8-object tile with
every operand resident in VMEM — HBM traffic is O(M) per object per block
(state + coefficients + audio), never O(M*S).

Algorithm (chunked block form; math in ops/coeffs.py):

  per object tile, per chunk of C samples starting at state z:
    lam-power ladder  P_d = lam^d, d in [0, C]   (C vectorized complex mults)
    G_d   = sum_m t_m Im(P_d * beff_m)           (mode reduce, once per block)
    hom_c = sum_m t_m Im(P_{c+1} * z_m)          (mode reduce, per chunk)
    z    <- P_C * z + beff * sum_j P_{C-1-j} f_j (elementwise)

The kernel emits ``hom`` [O, S], the per-block convolution kernel ``G``
[O, C], and the carried state; the final within-chunk causal convolution
``sound = hom + G (*) f`` is a tiny [C, C] batched matmul done in XLA
(gather-built Toeplitz matrices lower poorly inside Mosaic).

The serial dependency is S/C chunk steps instead of S samples; chunk-boundary
state propagation uses lam^C built from the f64-derived lam, so f32 phase
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

# chunk=32 keeps the kernel's VMEM footprint (ladder scratch + [C, OT, M]
# reduce temporaries) comfortably inside the 16 MB scoped budget at M=1024;
# chunk=64 overflows by ~64 KB there (measured on v5e)
DEFAULT_CHUNK = 32
OBJ_TILE = 8  # sublane-aligned object tile per kernel program


def _fused_kernel(lam_re_ref, lam_im_ref, be_re_ref, be_im_ref, t_ref,
                  zr_ref, zi_ref, f_ref, f_rev_ref,
                  hom_ref, g_ref, zr_out_ref, zi_out_ref,
                  pow_re_ref, pow_im_ref,
                  *, chunk: int, block: int):
    """Grid: one program per OBJ_TILE objects; refs [OT, M] / [OT, S]."""
    ot, m = lam_re_ref.shape
    c = chunk
    n_chunks = block // c

    lam_re = lam_re_ref[...]
    lam_im = lam_im_ref[...]
    be_re = be_re_ref[...]
    be_im = be_im_ref[...]
    t = t_ref[...]

    # --- lam-power ladder P_d for d in [0, C] into VMEM scratch
    # [C+1, OT, M], built with C vectorized complex multiplies. (Mosaic has
    # no dynamic_slice on values — the ladder must go through refs.)
    pow_re_ref[0] = jnp.ones((ot, m), lam_re.dtype)
    pow_im_ref[0] = jnp.zeros((ot, m), lam_re.dtype)

    def ladder_step(d, _):
        prev_r = pow_re_ref[pl.ds(d - 1, 1)][0]
        prev_i = pow_im_ref[pl.ds(d - 1, 1)][0]
        pow_re_ref[pl.ds(d, 1)] = (prev_r * lam_re
                                   - prev_i * lam_im)[None]
        pow_im_ref[pl.ds(d, 1)] = (prev_r * lam_im
                                   + prev_i * lam_re)[None]
        return 0

    jax.lax.fori_loop(1, c + 1, ladder_step, 0)
    pow_re = pow_re_ref[...]
    pow_im = pow_im_ref[...]

    # G[ot, d] = sum_m t (P_d.im * be_re + P_d.re * be_im), d in [0, C)
    g = jnp.sum(pow_im[:c] * (t * be_re)[None]
                + pow_re[:c] * (t * be_im)[None], axis=2)   # [C, OT]
    g_ref[...] = g.T

    # the chunk loop is unrolled (n_chunks is small and static) so every
    # hom store / f_rev read uses static offsets — Mosaic requires
    # statically provable lane alignment for dynamic stores.
    n = f_ref.shape[-1]
    zr = zr_ref[...]
    zi = zi_ref[...]
    pc_re = pow_re[c]
    pc_im = pow_im[c]
    for k in range(n_chunks):
        # homogeneous sound: Im(sum_m t lam^{c+1} z) -> [C, OT]
        hom = jnp.sum(pow_re[1:] * (t * zi)[None]
                      + pow_im[1:] * (t * zr)[None], axis=2)
        hom_ref[:, k * c:(k + 1) * c] = hom.T
        # state at next chunk start: z = lam^C z + beff sum_j P_{C-1-j} f_j
        # (f_rev_ref holds the whole profile reversed; Mosaic lacks `rev`)
        f_rev = f_rev_ref[:, n - (k + 1) * c: n - k * c].T[:, :, None]
        s_re = jnp.sum(pow_re[:c] * f_rev, axis=0)          # [OT, M]
        s_im = jnp.sum(pow_im[:c] * f_rev, axis=0)
        zr_n = pc_re * zr - pc_im * zi + be_re * s_re - be_im * s_im
        zi_n = pc_im * zr + pc_re * zi + be_re * s_im + be_im * s_re
        zr, zi = zr_n, zi_n
    zr_out_ref[...] = zr
    zi_out_ref[...] = zi


@partial(jax.jit, static_argnames=("compute_qnorm", "chunk", "interpret"))
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
):
    """Pallas backend; same contract as ops.integrator.step_block_*.

    qnorm (telemetry, UI-rate) falls back to the blocked XLA path when
    requested. Objects are padded to a multiple of OBJ_TILE internally.
    """
    o, m = z_re.shape
    s = time_profile.shape[-1]
    assert s % chunk == 0, f"block {s} must be a multiple of chunk {chunk}"
    dtype = z_re.dtype

    o_pad = -(-o // OBJ_TILE) * OBJ_TILE
    pad = o_pad - o

    def padded(x):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)) if pad else x

    be_re = padded(bank.b_re * space)
    be_im = padded(bank.b_im * space)
    tmask = padded(transfer * bank.mask)
    lam_re = padded(jnp.broadcast_to(bank.lam_re, (o, m)))
    lam_im = padded(jnp.broadcast_to(bank.lam_im, (o, m)))
    z_re_p = padded(z_re)
    z_im_p = padded(z_im)
    f_p = padded(time_profile)

    row = lambda i: (i, 0)
    spec_m = pl.BlockSpec((OBJ_TILE, m), row, memory_space=pltpu.VMEM)
    spec_s = pl.BlockSpec((OBJ_TILE, s), row, memory_space=pltpu.VMEM)
    spec_c = pl.BlockSpec((OBJ_TILE, chunk), row, memory_space=pltpu.VMEM)
    hom, g, zr_out, zi_out = pl.pallas_call(
        partial(_fused_kernel, chunk=chunk, block=s),
        grid=(o_pad // OBJ_TILE,),
        in_specs=[spec_m] * 7 + [spec_s, spec_s],
        out_specs=(spec_s, spec_c, spec_m, spec_m),
        out_shape=(
            jax.ShapeDtypeStruct((o_pad, s), dtype),
            jax.ShapeDtypeStruct((o_pad, chunk), dtype),
            jax.ShapeDtypeStruct((o_pad, m), dtype),
            jax.ShapeDtypeStruct((o_pad, m), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((chunk + 1, OBJ_TILE, m), dtype),
            pltpu.VMEM((chunk + 1, OBJ_TILE, m), dtype),
        ],
        interpret=interpret,
    )(lam_re, lam_im, be_re, be_im, tmask, z_re_p, z_im_p, f_p,
      f_p[:, ::-1])

    # within-chunk causal convolution in XLA: per chunk k,
    # sound[k, cc] = hom[k, cc] + sum_{j<=cc} G[cc-j] f[k, j]
    idx = np.arange(chunk)
    delta = idx[:, None] - idx[None, :]                  # [C, C]
    toep = jnp.where(jnp.asarray(delta >= 0),
                     jnp.take(g, jnp.asarray(np.abs(delta)), axis=-1),
                     0.0)                                # [O_pad, C, C]
    f_chunks = f_p.reshape(o_pad, s // chunk, chunk)
    conv = jnp.einsum("ocj,okj->okc", toep, f_chunks)
    sound = (hom + conv.reshape(o_pad, s))[:o]

    qnorm = None
    if compute_qnorm:
        from .integrator import step_block_blocked
        _, _, _, qnorm = step_block_blocked(
            z_re, z_im, bank, space, time_profile, transfer, True)
    return zr_out[:o], zi_out[:o], sound, qnorm


def register_backend():
    from . import integrator
    integrator.BACKENDS.setdefault("pallas", step_block_pallas)


register_backend()
