"""Round-4 live soak: retuned sustained drags riding the span.

Like tools/soak_round3.py (256 obj x 1024 modes + FFAT, hits + listener
orbit + qnorm through the tunneled TPU) but the sustained drag cycles
its AR tuning mid-drag (the arparam retune path): round 4 un-gated
retuned drags from the per-block fallback — the engine should keep span
dispatches (per-object AR tables, drag-only bucket) except while an
impact on another object is live. Expect health ~1.0 and low-ms p50
like the round-3 soak.
"""
import os
import sys
sys.path.insert(0,
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax.numpy as jnp
import numpy as np

from openpbso_tpu.ops.coeffs import bank_from_material, lambda_from_modes
from openpbso_tpu.ops.ffat import build_ffat
from openpbso_tpu.runtime.engine import StreamingEngine
from openpbso_tpu.runtime.session import ModalSession
from openpbso_tpu.runtime.solver import SolverConfig
from openpbso_tpu.utils.synth import CERAMIC, synth_fatcube, synth_mode_data

o, m, s = 256, 1024, 512
seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 90.0
md = synth_mode_data(m, 8, seed=0)
lam64, _, _ = lambda_from_modes(CERAMIC.density, md.omega_squared,
                                CERAMIC.alpha, CERAMIC.beta)
bank = bank_from_material(CERAMIC.density, md.omega_squared, CERAMIC.alpha,
                          CERAMIC.beta, num_objects=o, block_size=s,
                          dtype=jnp.float32)
maps = {i: synth_fatcube(i, 150.0 + 14.0 * i, n=10, seed=3)
        for i in range(0, min(m, 256))}
ffat = build_ffat(maps, bank.num_modes)
sess = ModalSession(bank, ffat=ffat,
                    config=SolverConfig(block_size=s, backend="blocked"),
                    num_slots=16, lam64=lam64)
sess.set_listener(np.asarray([1.2, 0.5, 0.4]))


class Sink:
    def __init__(self):
        self.n = 0
        self.peak = 0.0

    def write(self, mix):
        self.n += 1
        self.peak = max(self.peak, float(np.abs(mix).max()))
        time.sleep(s / 44100.0)   # real-time consumer pacing
        return True

    def close(self):
        pass


sink = Sink()
eng = StreamingEngine(sess, sink, lookahead=6, qnorm_every=8)
t0 = time.time()
eng.start()
print(f"warmup+start {time.time() - t0:.0f}s", flush=True)
rng = np.random.default_rng(0)
TUNINGS = [((0.783, 0.116), 0.00148, 0.142),
           ((0.9, 0.05), 0.0020, 0.120),
           ((0.85, 0.08), 0.0017, 0.130)]
t0 = time.time()
deadline = t0 + seconds
next_hit = next_orbit = next_retune = 0.0
sus_obj = None
sus_until = 0.0
retunes = 0
while time.time() < deadline and eng.healthy:
    now = time.time() - t0
    if now >= next_hit:
        eng.hit(int(rng.integers(o)), rng.standard_normal(m),
                kind="gaussian", width_us=400.0)
        next_hit = now + 2.0
    if now >= next_orbit:
        th = now * 0.4
        eng.set_listener(
            np.asarray([1.2 * np.cos(th), 0.5, 1.2 * np.sin(th)]))
        next_orbit = now + 3.0
    if sus_obj is None and now > 4:
        sus_obj = int(rng.integers(o))
        eng.sustained_start(sus_obj, rng.standard_normal(m))
        sus_until = now + 10.0
        next_retune = now + 2.0
    elif sus_obj is not None:
        if now >= next_retune:
            a, sg, mu = TUNINGS[retunes % len(TUNINGS)]
            eng.set_ar_params(sus_obj, a=a, sigma=sg, mu=mu)
            retunes += 1
            next_retune = now + 2.5
        if now > sus_until:
            eng.sustained_end(sus_obj)
            sus_obj = None
    time.sleep(0.05)
eng.stop()
st = eng.profiler.stats()
print(f"soak: {sink.n} blocks, peak {sink.peak:.3f}, "
      f"{retunes} live retunes, health {eng.health.health:.2f}, "
      f"p50 {st.p50_ms:.1f} ms p99 {st.p99_ms:.1f} ms "
      f"vs {st.deadline_ms:.1f} ms deadline, error={eng.error!r}",
      flush=True)
