"""Device-parity check: the chunked span on the REAL TPU vs the same f32
span on the in-process CPU backend.

Why this exists: the test suite runs CPU-only (tests/conftest.py forces
the CPU backend), so it ties the span to the float64 oracle at <= -100 dB
but can never see TPU MXU matmul precision. The package pins every
correctness-critical contraction (ops/integrator.PRECISION, default
HIGHEST) because XLA's TPU default f32 matmul is ONE bf16 pass
(-52.6 dB at [256,1024]x[1024,512], docs/PERF.md) — this tool validates
that pin END-TO-END on the device: device-vs-CPU <= ~-61 dB plus the
suite's CPU-vs-oracle <= -100 dB bounds device-vs-oracle within the
reference's -60 dB contract (/root/reference/modal_integrator.h:104-113
is the recurrence whose output error is bounded).

It is also the gate for any precision experiment: run once per rung at
the default HIGHEST, and again with OPENPBSO_MATMUL_PRECISION=high to
read the end-to-end error a cheaper contraction algorithm would cost.

Usage (TPU must be up — probe first per CLAUDE.md):
    python tools/tpu_parity.py [--rungs=shared,hetero,sustained]
                               [--nblocks=64]
nb=64 keeps the host-side reference cheap (~1e11 f32 FLOPs) while the
contraction shapes stay at full MXU scale (256 obj x 1024 modes), and it
happens to warm the driver bench ladder's nb=64 fallback executables.
Prints one line per rung:  parity <rung>: -NN.N dB (contract -60.0)
Exit code 1 if any rung misses the contract.
"""
import os
import sys

sys.path.insert(0,
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_rung(rung: str, nblocks: int, self_test: bool = False):
    import jax

    import bench
    from openpbso_tpu.ops.span import build_span_tables
    from openpbso_tpu.runtime.solver import step_span

    o, m, s = 256, 1024, 512
    hetero = rung == "hetero"
    sustained = rung == "sustained"
    cpu = jax.devices("cpu")[0]
    if self_test:  # mechanics check without a TPU: cpu-vs-cpu == -inf dB
        tpu = cpu
    else:
        tpu = [d for d in jax.devices() if d.platform != "cpu"][0]

    # Build once on host/CPU, then place the SAME bits on each backend.
    with jax.default_device(cpu):
        bank, state, gains, lam64 = bench.build(
            o, m, s, "blocked", hetero=hetero, need_tables=False)
        tables = build_span_tables(lam64, nblocks * s, num_modes=m)
        ar_g = None
        num_slots = 1
        if sustained:
            import dataclasses

            import jax.numpy as jnp
            from openpbso_tpu.ops.forces import ar_impulse_g, span_group
            rng = np.random.default_rng(1)
            sus = state.sustained
            sus = dataclasses.replace(
                sus,
                active=jnp.ones_like(sus.active),
                space=jnp.asarray(rng.standard_normal(sus.space.shape),
                                  sus.space.dtype))
            state = dataclasses.replace(state, sustained=sus)
            grp = span_group(nblocks, 512)
            ar_g = jnp.asarray(ar_impulse_g((0.783, 0.116), grp * s),
                               state.z_re.dtype)
            num_slots = 0

    def render(dev):
        args = jax.device_put((state, bank, tables, gains, ar_g), dev)
        st, bk, tb, gn, ag = args
        _, mix = step_span(st, bk, tb, gn, n_blocks=nblocks, block_size=s,
                           num_slots=num_slots, with_sustained=sustained,
                           ar_g=ag)
        return np.asarray(mix).astype(np.float64)

    y_cpu = render(cpu)
    y_tpu = render(tpu)
    num = float(np.linalg.norm(y_tpu - y_cpu))
    den = float(np.linalg.norm(y_cpu))
    return 20.0 * np.log10(num / den) if num > 0 else float("-inf")


def main():
    rungs = ["shared", "hetero", "sustained"]
    nblocks = 64
    self_test = "--self-test" in sys.argv
    if self_test:
        import jax
        jax.config.update("jax_platforms", "cpu")
    for arg in sys.argv[1:]:
        if arg.startswith("--rungs="):
            rungs = arg.split("=", 1)[1].split(",")
        elif arg.startswith("--nblocks="):
            nblocks = int(arg.split("=", 1)[1])
    prec = os.environ.get("OPENPBSO_MATMUL_PRECISION", "highest")
    print(f"precision={prec} nblocks={nblocks}", flush=True)
    failed = False
    for rung in rungs:
        db = run_rung(rung, nblocks, self_test=self_test)
        ok = db <= -60.0
        failed |= not ok
        print(f"parity {rung}: {db:.1f} dB (contract -60.0)"
              + ("" if ok else "  ** OUT OF CONTRACT **"), flush=True)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
