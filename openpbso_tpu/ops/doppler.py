"""Physical Doppler for moving listeners — time-varying propagation delay.

Beyond-reference: the reference recomputes the acoustic transfer when the
listener moves but applies NO propagation delay — each block plays as if
sound reached the listener instantly (modal_solver.h:286-300,
ffat_solver.h:1180-1214 evaluate amplitude only). For a listener moving at
velocity v relative to a source, the physically received signal is

    y(t) = s(t - r(t)/c)

and the time-varying delay IS the Doppler effect: a radial approach speed v
compresses the received phase by the factor (1 + v/c). The amplitude-vs-
distance part is already handled per block by the FFAT transfer (|Psi/kr|
falls off with the listener radius), so the delay is the one missing
physical term.

Implementation: the session renders each object's raw signal s_o[n] over
the span (solver.step_multi_transfers_sound), the host builds per-sample
listener-object distances by linear interpolation of the per-block
positions, and ``delay_resample`` gathers s_o at the fractional sample
index n - r_o[n] * SR / c (linear interpolation between neighbors — first
order, like the per-sample transfer ramp). Samples whose emission time
precedes the render start are silence (the wavefront has not arrived).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import OUTPUT_SCALE, SAMPLE_RATE, SOUND_SPEED
from .integrator import PRECISION


@jax.jit
def delay_resample(
    sound: jax.Array,      # [O, N] raw per-object signal (emission time)
    i0: jax.Array,         # [O, N] int32 floor(n - delay_n) source index
    frac: jax.Array,       # [O, N] fractional part of (n - delay_n)
    gains: jax.Array,      # [O, C] channel gains
) -> jax.Array:
    """Fractional-delay gather + channel mixdown -> mix [N, C].

    y_o[n] = s_o[n - delay_o[n]] by linear interpolation; n - delay < 0
    reads silence (signal emitted before the render started). The mixdown
    applies the reference's 1/1E10 output scale like solver._mixdown.

    (i0, frac) come from :func:`delay_indices` — the absolute index
    n - delay MUST be split on the float64 host: an f32 index grid loses
    fractional resolution past ~2^23/8 samples (~24 s of audio) and
    collapses to whole-sample steps past ~3 minutes, turning a smooth
    Doppler shift into zipper artifacts.
    """
    o, n = sound.shape
    frac = frac.astype(sound.dtype)
    take = lambda i: jnp.take_along_axis(  # noqa: E731
        sound, jnp.clip(i, 0, n - 1), axis=-1)
    y = (take(i0) * (1.0 - frac) * (i0 >= 0)
         + take(i0 + 1) * frac * (i0 + 1 >= 0))
    mix = jnp.einsum("on,oc->nc", y, gains, precision=PRECISION)
    return (mix / OUTPUT_SCALE).astype(jnp.float32)


def delay_indices(dist, c: float = SOUND_SPEED,
                  sample_rate: int = SAMPLE_RATE):
    """Host-side (float64) split of the fractional source index.

    ``dist``: [O, N] float64 distances -> (i0 int32, frac float32) with
    i0 + frac == n - dist * SR / c computed at full double precision
    (see delay_resample's precision note).
    """
    import numpy as np
    dist = np.asarray(dist, np.float64)
    n = dist.shape[-1]
    idx = np.arange(n, dtype=np.float64)[None, :] - dist * (sample_rate / c)
    i0 = np.floor(idx)
    frac = (idx - i0).astype(np.float32)
    return i0.astype(np.int32), frac


def sample_distances(
    positions,             # [T, O, 3] per-block listener-relative positions
    block_size: int,
):
    """Per-sample listener-object distances [O, T*S] (host, float64).

    Block t's position row is the listener at that block's START sample;
    distances are linearly interpolated between consecutive block starts
    and held constant through the final block (matching the block-constant
    tail of the transfer schedule).
    """
    import numpy as np
    positions = np.asarray(positions, np.float64)
    t, o, _ = positions.shape
    r = np.linalg.norm(positions, axis=-1)        # [T, O]
    n = t * block_size
    starts = np.arange(t) * block_size
    grid = np.arange(n)
    out = np.empty((o, n))
    for i in range(o):
        out[i] = np.interp(grid, starts, r[:, i])  # holds past the last row
    return out

