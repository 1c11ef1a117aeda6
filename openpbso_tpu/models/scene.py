"""Scene — batched assembly of many sounding objects.

The reference runs exactly one object per process
(real_time_modal_sound.cpp:518-525). The TPU build's unit of execution is a
*scene*: O object instances (possibly of different models, materials, and
mode counts) packed into the [O, M] arrays the solver consumes. Instances of
the same model share lam-power tables and FFAT textures; heterogeneous
scenes get per-object rows.

Each instance carries a world position and stereo gain; listener updates
translate one world listener into per-object relative positions (the
reference's single object sits at the origin) with optional 1/r distance
attenuation on the gains.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..config import DEFAULT_BLOCK
from .modal_model import ModalSoundModel


@dataclasses.dataclass
class SceneInstance:
    model: ModalSoundModel
    position: np.ndarray                 # [3] world position
    gain: float = 1.0
    pan: float = 0.0                     # -1 (left) .. +1 (right)


class Scene:
    """Builds and owns the device session for a set of instances."""

    def __init__(self, instances: list[SceneInstance], *,
                 block_size: int = DEFAULT_BLOCK,
                 backend: str = "auto",
                 num_slots: int = 16,
                 use_ffat: bool = True,
                 binaural: bool = False,
                 ear_distance: float = 0.18,
                 listener_offsets: np.ndarray | None = None,
                 shared_state: bool = True,
                 mesh=None,
                 smooth_transfer: bool = False,
                 itd: bool = False,
                 dtype=None):
        """``binaural`` renders each logical object to two output channels
        (left/right ear) with independent FFAT lookups per ear — true
        interaural level differences from the transfer maps (the reference
        duplicates one mono signal to both channels,
        real_time_modal_sound.cpp:207-210).

        ``listener_offsets`` [L, 3] generalizes this to L listeners:
        listener l's transfer is looked up from ``listener + offsets[l]``
        and the mix has L output channels (one per listener). ``binaural``
        is the L=2 special case with offsets ±ear_distance/2 along the ear
        axis.

        ``shared_state`` (default): the L listeners share ONE [O, M]
        oscillator state with [L, O, M] transfer rows — sound is linear in
        the transfer, so each listener costs one extra mode-reduce.
        ``shared_state=False`` keeps the round-1 layout (each logical
        object replicated into L solver rows), which also replicates the
        state, force, and table work L-fold; identical output, kept for
        the SPMD object-axis sharding path which shards solver rows.

        ``itd``: multi-listener scenes derive per-mode interaural time
        differences from the ear geometry on every listener move
        (complex transfer rows; narrowband-exact — the FFAT magnitudes
        already give the level differences, this adds the timing cue the
        reference lacks entirely). Needs shared_state; composes with
        smooth_transfer since round 3 (the xfade ramps both complex
        channels, ops/integrator._xfade_rows).

        ``mesh``: a jax.sharding.Mesh ('obj', 'mode') makes the scene
        multi-chip — the session becomes a ShardedSession
        (parallel/session.py) with the same event/render API; the object
        count must divide the mesh's obj axis."""
        import jax.numpy as jnp

        from ..ops.coeffs import build_modal_bank, lambda_from_modes
        from ..ops.ffat import build_ffat_hetero
        from ..runtime.session import ModalSession
        from ..runtime.solver import SolverConfig

        if not instances:
            raise ValueError("scene needs at least one instance")
        dtype = dtype or jnp.float32
        self.binaural = binaural
        self.ear_distance = ear_distance
        self.logical_instances = instances
        if binaural and listener_offsets is not None:
            raise ValueError("pass either binaural or listener_offsets")
        self._offsets = (np.asarray(listener_offsets, np.float64)
                         if listener_offsets is not None else None)
        self.num_listeners = (2 if binaural
                              else (len(self._offsets)
                                    if self._offsets is not None else 1))
        self.shared_state = shared_state and self.num_listeners > 1
        if self.num_listeners > 1 and not self.shared_state:
            # row i*L + l = listener l's copy of logical object i
            instances = [inst for inst in instances
                         for _ in range(self.num_listeners)]
        self.instances = instances
        o = len(instances)
        n_modes = [inst.model.num_modes_audible for inst in instances]
        m_max = max(n_modes)

        lam = np.zeros((o, m_max), np.complex128)
        b = np.zeros((o, m_max), np.complex128)
        valid = np.zeros((o, m_max), bool)
        for i, inst in enumerate(instances):
            mdl = inst.model
            n = mdl.num_modes_audible
            li, bi, vi = lambda_from_modes(
                mdl.material.density, mdl.modes.omega_squared[:n],
                mdl.material.alpha, mdl.material.beta)
            lam[i, :n] = li
            b[i, :n] = bi
            valid[i, :n] = vi
        shared = all(inst.model is instances[0].model for inst in instances)
        self.bank = build_modal_bank(lam, b, valid, block_size=block_size,
                                     shared=shared, dtype=dtype)

        ffat = None
        if use_ffat and any(inst.model.ffat_maps for inst in instances):
            if shared:
                from ..ops.ffat import build_ffat
                ffat = build_ffat(instances[0].model.ffat_maps,
                                  self.bank.num_modes, dtype=dtype)
            else:
                ffat = build_ffat_hetero(
                    [inst.model.ffat_maps for inst in instances],
                    self.bank.num_modes, dtype=dtype)
        session_kw = dict(
            ffat=ffat,
            config=SolverConfig(block_size=block_size, backend=backend,
                                smooth_transfer=smooth_transfer),
            num_slots=num_slots, dtype=dtype,
            num_listeners=(self.num_listeners if self.shared_state else 1),
            # the per-instance f64 eigenvalues enable the span dispatches
            # (fastest offline + live path; shared banks are detected from
            # identical rows)
            lam64=lam)
        if mesh is not None:
            from ..parallel.session import ShardedSession
            self.session = ShardedSession(self.bank, mesh, **session_kw)
        else:
            self.session = ModalSession(self.bank, **session_kw)

        self.positions = np.stack([np.asarray(i.position, np.float64)
                                   for i in instances])
        n_ch = self.num_listeners if self.num_listeners > 1 else 2
        gains = np.zeros((o, n_ch))
        for i, inst in enumerate(instances):
            if self.shared_state:
                # one row per logical object; every listener channel hears
                # it at the instance gain
                gains[i, :] = inst.gain
            elif self.num_listeners > 1:
                # each replicated row feeds only its listener's channel
                gains[i, i % self.num_listeners] = inst.gain
            else:
                left = inst.gain * (1.0 - max(inst.pan, 0.0))
                right = inst.gain * (1.0 + min(inst.pan, 0.0))
                gains[i] = (left, right)
        self._base_gains = gains
        self.session.gains = jnp.asarray(gains, dtype)
        # default binaural ear offsets (set_listener's ear_axis updates)
        ear = np.asarray((1.0, 0.0, 0.0)) * (self.ear_distance / 2)
        self._ear_offsets = np.stack([-ear, ear])
        if itd:
            if not self.shared_state:
                raise ValueError("itd needs shared_state multi-listener "
                                 "rows (binaural or listener_offsets)")
            # smooth_transfer composes since round 3: the transfer ramp is
            # complex-valued (re and im rows ramp independently,
            # ops/integrator._xfade_rows)
            self.session.auto_itd = True
        # engine/server listener events go through the bare session; the
        # installed frame maps their world positions into the scene's
        # per-object relative coordinates (Scene's own set_listener calls
        # set_listener_relative and bypasses it)
        self.session.listener_frame = self._listener_frame
        # remembered world listener: move_object recomputes the relative
        # rows from it so live object motion takes effect immediately
        self._last_world_listener = None

    def _listener_frame(self, pos: np.ndarray) -> np.ndarray:
        """World listener(s) -> the session's relative frame.

        [3]: one world listener, expanded through the scene's offsets
        (binaural ears / listener_offsets). [L, 3] on a shared-state
        multi-listener scene: L INDEPENDENT world listeners (per-client
        serving) — each row maps to per-object relative positions
        directly, bypassing the single-head offsets. Anything else
        passes through unchanged (already-relative rows)."""
        pos = np.asarray(pos, np.float64)
        if pos.ndim == 1:
            # record the freshest WORLD listener here too: wire listener
            # moves reach the scene only through this frame (on the synth
            # thread), and object moves recompute rows from the remembered
            # value — without this, an object_pos after a streamed
            # listener move would snap the listener back to startup
            self._last_world_listener = pos.copy()
            return self._relative_rows(pos)
        if (pos.ndim == 2 and self.shared_state
                and pos.shape == (self.num_listeners, 3)):
            self._last_world_listener = pos.copy()
            return pos[:, None, :] - self.positions[None, :, :]
        return pos

    def _relative_rows(self, world_pos: np.ndarray) -> np.ndarray:
        """One world position -> per-object relative rows ([O, 3], or
        [L, O, 3] for shared-state multi-listener scenes)."""
        if self.num_listeners > 1:
            offsets = self._ear_offsets if self.binaural else self._offsets
            if self.shared_state:
                return ((world_pos[None, None, :] + offsets[:, None, :])
                        - self.positions[None, :, :])
            rows = np.arange(len(self.instances)) % self.num_listeners
            return (world_pos[None, :] + offsets[rows]) - self.positions
        return world_pos[None, :] - self.positions

    # ------------------------------------------------------------------ API

    @property
    def num_objects(self) -> int:
        return len(self.instances)

    def hit(self, index: int, vertex: int, **kw) -> None:
        """Strike logical instance ``index`` at mesh vertex ``vertex``."""
        ll = self.num_listeners
        if ll > 1 and not self.shared_state:
            space = self.logical_instances[index].model.modal_force_vertex(
                vertex)
            for l in range(ll):
                self.session.hit(ll * index + l, space, **kw)
        else:
            space = self.instances[index].model.modal_force_vertex(vertex)
            self.session.hit(index, space, **kw)

    def set_listener(self, world_pos: np.ndarray,
                     distance_attenuation: bool = False,
                     ear_axis=(1.0, 0.0, 0.0)) -> None:
        """One world listener -> per-object relative transfer lookups.

        In binaural mode the two rows of each logical object look up the
        transfer maps from the left/right ear positions (listener +-
        ear_distance/2 along ``ear_axis``)."""
        import jax.numpy as jnp
        world_pos = np.asarray(world_pos, np.float64)
        self._last_world_listener = world_pos.copy()
        if self.binaural:
            ear = np.asarray(ear_axis, np.float64)
            ear = ear / np.linalg.norm(ear) * (self.ear_distance / 2)
            self._ear_offsets = np.stack([-ear, ear])
        rel = self._relative_rows(world_pos)
        self.session.set_listener_relative(rel)
        if distance_attenuation:
            r = np.maximum(np.linalg.norm(rel, axis=-1), 1e-3)
            # replicated/single: r [O] -> per-row column; shared-state
            # multi-listener: r [L, O] -> per-(object, channel) factors
            att = (1.0 / r.T) if r.ndim == 2 else (1.0 / r)[:, None]
            self.session.gains = jnp.asarray(self._base_gains * att,
                                             self.session.gains.dtype)
        else:
            # restore base gains so a previous attenuated update cannot
            # leave stale 1/r factors for the old listener position
            self.session.gains = jnp.asarray(self._base_gains,
                                             self.session.gains.dtype)

    def set_object_position(self, index: int, world_pos: np.ndarray) -> None:
        """Host-only position update (no transfer recompute): safe to call
        from any thread; the next listener (re)apply — e.g. an
        engine-queued refresh, which runs on the synthesis thread — picks
        the new position up through the installed listener_frame."""
        ll = self.num_listeners
        pos = np.asarray(world_pos, np.float64)
        if ll > 1 and not self.shared_state:
            # replicated layout: logical object i owns rows i*L..i*L+L-1
            n_logical = len(self.instances) // ll
            if not 0 <= index < n_logical:
                raise IndexError(f"object {index} out of range "
                                 f"[0, {n_logical})")
            self.positions[ll * index: ll * (index + 1)] = pos
        else:
            if not 0 <= index < len(self.positions):
                raise IndexError(f"object {index} out of range "
                                 f"[0, {len(self.positions)})")
            self.positions[index] = pos

    def object_position(self, index: int) -> np.ndarray:
        """Current world position of logical object ``index`` (a copy).

        Mirrors set_object_position's indexing: in the replicated
        multi-listener layout, logical object i owns rows i*L..i*L+L-1
        and all share one world position."""
        ll = self.num_listeners
        if ll > 1 and not self.shared_state:
            n_logical = len(self.instances) // ll
            if not 0 <= index < n_logical:
                raise IndexError(f"object {index} out of range "
                                 f"[0, {n_logical})")
            return self.positions[ll * index].copy()
        if not 0 <= index < len(self.positions):
            raise IndexError(f"object {index} out of range "
                             f"[0, {len(self.positions)})")
        return self.positions[index].copy()

    def move_object(self, index: int, world_pos: np.ndarray) -> None:
        """Move logical object ``index`` to a new world position LIVE
        (the reference has no notion of object motion at all; offline
        motion is render_moving's object_paths). The listener-relative
        transfer rows recompute from the remembered world listener, so
        the next block hears the object at its new place. For streaming
        use, the server's ``object_pos`` command routes the refresh
        through the engine's event queue instead (set_object_position +
        a queued listener re-apply); pair with DopplerPostMix.positions
        updates for live object Doppler.
        """
        self.set_object_position(index, world_pos)
        lw = getattr(self, "_last_world_listener", None)
        if lw is not None:
            if np.asarray(lw).ndim == 2:
                # per-client serving recorded [L, 3] world rows; reapply
                # through the frame (Scene.set_listener is single-head)
                self.session.set_listener(lw)
            else:
                self.set_listener(lw)

    def step(self):
        return self.session.step()

    def render(self, num_blocks: int) -> np.ndarray:
        return self.session.render(num_blocks)

    def render_multi(self, num_blocks: int, **kw) -> np.ndarray:
        return self.session.render_multi(num_blocks, **kw)

    def _relative_path(self, listener_path, object_paths):
        """World listener path [T, 3] (and optionally per-block object
        world positions [T, O, 3]) -> listener-relative [T, O, 3], or
        [T, L, O, 3] for shared-state multi-listener scenes (each
        listener's offset applied per row, same geometry as
        _relative_rows)."""
        listener_path = np.asarray(listener_path, np.float64)
        if listener_path.ndim != 2 or listener_path.shape[1] != 3:
            raise ValueError("listener_path must be [T, 3] world positions")
        t = listener_path.shape[0]
        if object_paths is None:
            obj = np.broadcast_to(self.positions[None, :, :],
                                  (t, len(self.instances), 3))
        else:
            obj = np.asarray(object_paths, np.float64)
            if obj.shape != (t, len(self.instances), 3):
                raise ValueError(
                    f"object_paths must be [T={t}, O="
                    f"{len(self.instances)}, 3], got {obj.shape}")
        if self.num_listeners > 1:
            offsets = self._ear_offsets if self.binaural else self._offsets
            if self.shared_state:
                return (listener_path[:, None, None, :]
                        + offsets[None, :, None, :]) - obj[:, None, :, :]
            rows = np.arange(len(self.instances)) % self.num_listeners
            return (listener_path[:, None, :] + offsets[rows][None]) - obj
        return listener_path[:, None, :] - obj

    def render_moving(self, listener_path: np.ndarray,
                      object_paths: np.ndarray | None = None,
                      **kw) -> np.ndarray:
        """Moving-listener (and optionally moving-object) render: world
        positions per block -> per-object relative transfer schedules in
        chunked single dispatches (session.render_moving). Row t of
        ``listener_path`` [T, 3] is the listener during block t;
        ``object_paths`` [T, O, 3] moves the objects too (the reference
        has no notion of motion at all — its one object sits at the
        origin, real_time_modal_sound.cpp:508-525). Multi-listener scenes
        (binaural / listener_offsets) move every listener along the path
        with its offset held, one output channel each (round-2 VERDICT
        gap 3 closed)."""
        rel = self._relative_path(listener_path, object_paths)
        return self.session.render_moving(rel, **kw)

    def render_doppler(self, listener_path: np.ndarray,
                       object_paths: np.ndarray | None = None,
                       **kw) -> np.ndarray:
        """render_moving + physical propagation delay r(t)/c per object
        (session.render_doppler): moving listeners AND moving objects get
        true Doppler shift from their radial velocities. Multi-listener
        scenes return one Doppler-delayed channel per listener (each
        offset ear/listener follows its own distance trajectory)."""
        rel = self._relative_path(listener_path, object_paths)
        return self.session.render_doppler(rel, **kw)
