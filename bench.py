"""Benchmark: audio samples/sec/chip at 256 objects x 1024 modes.

The reference's implicit real-time contract is 44 100 samples/s for ONE
object on one CPU core (BASELINE.md); the driver north-star is >= 256 objects
x 1k modes faster than real time on one TPU chip. This bench runs the full
block step (force synthesis + modal IIR + transfer dot + stereo mixdown) in
steady state and reports scene audio samples/sec and the real-time factor.

Two quantities matter and are both printed to stderr:
- throughput: multi-block scan dispatch (step_multi) — the true device rate,
  with per-dispatch host/tunnel overhead amortized. This is the headline.
- latency: single-block synced dispatch — what a real-time stream pays per
  11.6 ms deadline.

Prints exactly one JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
where vs_baseline is the real-time factor (1.0 == 44.1 kHz on the 256x1024
north-star workload).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def build(o, m, s, backend, dtype_name="float32", hetero=False):
    import dataclasses

    import jax.numpy as jnp
    from openpbso_tpu.ops.coeffs import bank_from_material
    from openpbso_tpu.runtime.state import make_solver_state
    from openpbso_tpu.utils.synth import CERAMIC, synth_mode_data

    if backend == "pallas":
        from openpbso_tpu.ops import pallas_integrator  # noqa: F401

    dtype = getattr(jnp, dtype_name)
    md = synth_mode_data(m, 8, seed=0)
    if hetero:
        # every object gets its own mode bank (no shared lam tables)
        from openpbso_tpu.ops.coeffs import (build_modal_bank,
                                             lambda_from_modes)
        rng0 = np.random.default_rng(7)
        lams, bs, valids = [], [], []
        for i in range(o):
            mdi = synth_mode_data(m, 8, seed=100 + i,
                                  f_low=100.0 + i, f_high=15000.0 + 3 * i)
            lam, b, valid = lambda_from_modes(
                CERAMIC.density, mdi.omega_squared, CERAMIC.alpha,
                CERAMIC.beta)
            lams.append(lam); bs.append(b); valids.append(valid)
        bank = build_modal_bank(np.stack(lams), np.stack(bs),
                                np.stack(valids), block_size=s,
                                shared=False, dtype=dtype)
    else:
        bank = bank_from_material(CERAMIC.density, md.omega_squared,
                                  CERAMIC.alpha, CERAMIC.beta,
                                  num_objects=o, block_size=s, dtype=dtype)
    state = make_solver_state(o, bank.num_modes, num_slots=8, dtype=dtype)
    # plant one gaussian hit per object so the force path does real work
    rng = np.random.default_rng(0)
    slots = state.slots
    slots = dataclasses.replace(
        slots,
        ftype=slots.ftype.at[:, 0].set(2),
        width=slots.width.at[:, 0].set(40.0),
        space=slots.space.at[:, 0, :].set(
            jnp.asarray(rng.standard_normal((o, bank.num_modes)), dtype)))
    state = dataclasses.replace(state, slots=slots)
    gains = jnp.ones((o, 2), dtype)
    return bank, state, gains


def time_multi(bank, state, gains, s, backend, n_blocks=32, iters=8):
    import jax
    from openpbso_tpu.runtime.solver import step_multi
    st = state
    for _ in range(2):
        st, mix = step_multi(st, bank, gains, n_blocks=n_blocks,
                             block_size=s, backend=backend)
    np.asarray(mix)  # full host sync: block_until_ready alone is not
    # trustworthy through the axon remote-execution tunnel
    t0 = time.perf_counter()
    for _ in range(iters):
        st, mix = step_multi(st, bank, gains, n_blocks=n_blocks,
                             block_size=s, backend=backend)
    np.asarray(mix)
    dt = time.perf_counter() - t0
    return (iters * n_blocks * s) / dt


def time_pipelined(bank, state, gains, s, backend, iters=64):
    """Async-pipelined single-block dispatches, one host sync at the end.

    Compiles exactly ONE executable (step_block) — important because the
    dev harness's remote compiles can take minutes per jit shape and the
    step_multi scan is a second, bigger compile. Throughput-equivalent to
    the scan dispatch once the pipeline fills.
    """
    from openpbso_tpu.runtime.solver import step_block
    st = state
    for _ in range(3):
        st, _, mix, _ = step_block(st, bank, gains, block_size=s,
                                   backend=backend)
    np.asarray(mix)  # full host sync: block_until_ready alone is not
    # trustworthy through the axon remote-execution tunnel
    t0 = time.perf_counter()
    for _ in range(iters):
        st, _, mix, _ = step_block(st, bank, gains, block_size=s,
                                   backend=backend)
    np.asarray(mix)
    dt = time.perf_counter() - t0
    return (iters * s) / dt


def time_single(bank, state, gains, s, backend, iters=20):
    import jax
    from openpbso_tpu.runtime.solver import step_block
    st = state
    for _ in range(3):
        st, _, mix, _ = step_block(st, bank, gains, block_size=s,
                                   backend=backend)
    np.asarray(mix)
    t0 = time.perf_counter()
    for _ in range(iters):
        st, _, mix, _ = step_block(st, bank, gains, block_size=s,
                                   backend=backend)
        np.asarray(mix)  # per-block host sync, like a real-time stream
    dt = time.perf_counter() - t0
    return (iters * s) / dt, dt / iters


def main():
    from openpbso_tpu.config import SAMPLE_RATE

    o, m, s = 256, 1024, 512
    backend = "blocked"
    hetero = False
    nblocks = 32
    for arg in sys.argv[1:]:
        if arg.startswith("--backend="):
            backend = arg.split("=", 1)[1]
        elif arg.startswith("--objects="):
            o = int(arg.split("=", 1)[1])
        elif arg.startswith("--modes="):
            m = int(arg.split("=", 1)[1])
        elif arg.startswith("--block="):
            s = int(arg.split("=", 1)[1])
        elif arg == "--hetero":
            hetero = True
        elif arg.startswith("--nblocks="):
            nblocks = int(arg.split("=", 1)[1])
    if "--multi" not in sys.argv and "--pipelined" not in sys.argv:
        # Default: try the scan-dispatch measurement (the best number, RTF
        # ~46-49 at the flagship scale with 128 blocks/dispatch) in a
        # guarded child process — its larger
        # compile can take unbounded time when the box is loaded (XLA
        # compiles on this shared single core). Fall back to the robust
        # single-compile pipelined measurement on timeout.
        import subprocess
        child_args = [a for a in sys.argv[1:]]
        try:
            if not any(a.startswith("--nblocks=") for a in child_args):
                child_args = child_args + ["--nblocks=128"]
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--multi",
                 "--skip-single"] + child_args,
                capture_output=True, text=True, timeout=420)
            for line in r.stdout.splitlines():
                if line.startswith("{"):
                    print(line, flush=True)
                    return
        except subprocess.TimeoutExpired:
            pass
        # fall through to in-process pipelined measurement

    bank, state, gains = build(o, m, s, backend, hetero=hetero)
    if "--multi" in sys.argv:
        sps = time_multi(bank, state, gains, s, backend, n_blocks=nblocks)
        how = "multi-block dispatch"
    else:
        sps = time_pipelined(bank, state, gains, s, backend)
        how = "pipelined dispatch"
    # print the headline line FIRST: remote-compile times for the secondary
    # (single-block synced) measurement are unpredictable on the tunneled
    # dev TPU and must not be able to starve the driver of the JSON line
    rtf = sps / SAMPLE_RATE
    print(json.dumps({
        "metric": f"audio samples/sec/chip at {o} obj x {m} modes "
                  f"({backend}{'/hetero' if hetero else ''} backend, "
                  f"{how}); real-time factor vs 44.1 kHz",
        "value": round(sps, 1),
        "unit": "samples/s",
        "vs_baseline": round(rtf, 3),
    }), flush=True)
    if "--skip-single" in sys.argv:
        return
    sps_single, block_latency = time_single(bank, state, gains, s, backend)
    print(f"single-block synced: {sps_single:,.0f} samples/s "
          f"(RTF {sps_single / SAMPLE_RATE:.2f}, "
          f"{block_latency * 1e3:.2f} ms/block vs "
          f"{s / SAMPLE_RATE * 1e3:.2f} ms deadline)", file=sys.stderr)


if __name__ == "__main__":
    main()
