"""Native C++ components: SPSC ring + fatcube decoder (ctypes)."""
import numpy as np
import pytest

from openpbso_tpu.io.fatcube import (decode_fatcube, encode_fatcube,
                                     maps_match_bits)
from openpbso_tpu.utils.synth import synth_fatcube

native = pytest.importorskip("openpbso_tpu.native.bindings")


@pytest.fixture(scope="module")
def lib():
    lib = native.load_native()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_spsc_push_pop_order(lib):
    ring = native.NativeSpscRing(4, (8,))
    for i in range(4):
        assert ring.try_push(np.full(8, float(i), np.float32))
    assert not ring.try_push(np.zeros(8, np.float32))  # full
    for i in range(4):
        out = ring.try_pop()
        assert out is not None and out[0] == float(i)
    assert ring.try_pop() is None  # empty


def test_spsc_pacing_semantics(lib):
    """Capacity-2 ring behaves like the reference sound queue: producer
    try_push fails when 2 ahead (modal_solver.h:130, 275)."""
    ring = native.NativeSpscRing(2, (4,))
    a = np.ones(4, np.float32)
    assert ring.try_push(a) and ring.try_push(a)
    assert not ring.try_push(a)
    ring.try_pop()
    assert ring.try_push(a)


def test_spsc_overwrite_drops_oldest(lib):
    # when full, the OLDEST block is retired (CAS tail skip) and the new
    # one published — the producer never writes a published slot, so a
    # consumer mid-copy can never see torn data (its pop CAS fails and
    # the copy is discarded). The consumer window is always the freshest.
    ring = native.NativeSpscRing(2, (2,))
    ring.push_overwrite(np.asarray([1.0, 1.0], np.float32))
    ring.push_overwrite(np.asarray([2.0, 2.0], np.float32))
    ring.push_overwrite(np.asarray([3.0, 3.0], np.float32))
    assert ring.dropped == 1
    assert ring.try_pop()[0] == 2.0
    assert ring.try_pop()[0] == 3.0


def test_spsc_threaded_stream(lib):
    """Producer/consumer threads stream 500 blocks without loss or
    reordering."""
    import threading
    ring = native.NativeSpscRing(8, (16,))
    n = 500
    received = []

    def produce():
        i = 0
        while i < n:
            if ring.try_push(np.full(16, float(i), np.float32)):
                i += 1

    def consume():
        while len(received) < n:
            out = ring.try_pop()
            if out is not None:
                received.append(float(out[0]))

    tp = threading.Thread(target=produce)
    tc = threading.Thread(target=consume)
    tp.start(); tc.start()
    tp.join(10); tc.join(10)
    assert received == [float(i) for i in range(n)]


def test_native_fatcube_decode_bit_parity(lib):
    for seed in range(3):
        m = synth_fatcube(seed, 440.0 * (seed + 1), n=7 + seed, seed=seed)
        data = encode_fatcube(m)
        nat = native.native_decode_fatcube(data)
        assert nat is not None
        assert maps_match_bits(m, nat)
        assert maps_match_bits(decode_fatcube(data), nat)


def test_native_fatcube_rejects_garbage(lib):
    assert native.native_decode_fatcube(b"\x99\x01garbage") is None
    assert native.native_decode_fatcube(b"") is None


def test_native_load_all(tmp_path, lib):
    from openpbso_tpu.io.fatcube import save_fatcube
    from openpbso_tpu.native.bindings import load_all_fatcubes_native
    for i in (1, 4):
        save_fatcube(str(tmp_path / f"{i}.fatcube"),
                     synth_fatcube(i, 100.0 * i, n=5))
    maps = load_all_fatcubes_native(str(tmp_path))
    assert sorted(maps) == [1, 4]


def test_native_fatcube_distinct_centers(lib):
    """Map-level center (ffat_map_t_3 field 2) and shell center (field 5)
    are distinct fields; the native decoder must keep them apart
    (round-1 advisor finding: both wrote one out->center)."""
    import dataclasses
    m = synth_fatcube(2, 550.0, n=6, seed=3)
    m = dataclasses.replace(m, center=m.center + np.array([0.5, -0.25, 2.0]))
    assert not np.array_equal(m.center, m.shell.center)
    data = encode_fatcube(m)
    nat = native.native_decode_fatcube(data)
    assert nat is not None
    assert np.array_equal(nat.center, m.center)
    assert np.array_equal(nat.shell.center, m.shell.center)
    assert maps_match_bits(m, nat)


def test_spsc_overwrite_concurrent_no_torn_blocks(lib):
    """Hammer push_overwrite against a concurrent consumer: every popped
    block must be internally consistent (all lanes equal) — the CAS
    tail-skip protocol discards copies the producer retired mid-read
    (the old overwrite-newest wrote published slots and could tear)."""
    import threading
    ring = native.NativeSpscRing(2, (64,))
    n = 4000
    bad = []
    done = threading.Event()

    def produce():
        for i in range(n):
            ring.push_overwrite(np.full(64, float(i), np.float32))
        done.set()

    def consume():
        last = -1.0
        while not done.is_set() or len(ring):
            out = ring.try_pop()
            if out is None:
                continue
            if not np.all(out == out[0]):
                bad.append(out.copy())
            # drop-oldest still preserves order among survivors
            if out[0] <= last:
                bad.append(("order", last, float(out[0])))
            last = float(out[0])

    t1 = threading.Thread(target=produce)
    t2 = threading.Thread(target=consume)
    t1.start(); t2.start()
    t1.join(); t2.join()
    assert not bad, bad[:3]
    assert ring.dropped + 0 <= n  # sanity: drops bounded by pushes
