"""Orbax checkpointing for (sharded) simulation state.

The reference checkpoints by pickling ``f`` (``_flow.py:226-236``);
``Flow.dump/load`` keeps that format. This module adds the TPU-native
path: orbax saves each shard from its owning device (no host gather),
optionally asynchronously (the simulation continues while the previous
snapshot flushes), and restores directly INTO the target sharding.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from ..simulation import Reporter

__all__ = ["save_state", "restore_state", "CheckpointReporter"]


def _checkpointer(async_save: bool):
    import orbax.checkpoint as ocp

    if async_save:
        return ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return ocp.StandardCheckpointer()


def save_state(flow: "Flow", directory: str, name: str = "state",
               async_save: bool = False):
    """Save ``{f, i}`` under ``directory/name``. With ``async_save`` the
    write happens in the background; returns the checkpointer — call its
    ``wait_until_finished()`` before reading the files externally."""
    ckptr = _checkpointer(async_save)
    path = os.path.abspath(os.path.join(directory, name))
    ckptr.save(path, {"f": flow.f, "i": flow.i}, force=True)
    if not async_save:
        ckptr.wait_until_finished()
    return ckptr


def restore_state(flow: "Flow", directory: str, name: str = "state",
                  sharding: Optional[jax.sharding.Sharding] = None):
    """Restore ``flow.f`` / ``flow.i`` from ``directory/name``, placed
    with ``sharding`` (defaults to the current placement of ``flow.f``,
    so a sharded simulation restores shard-to-device without a host
    round-trip)."""
    import orbax.checkpoint as ocp  # noqa: F401  (registers handlers)

    ckptr = _checkpointer(False)
    path = os.path.abspath(os.path.join(directory, name))
    sharding = sharding or flow.f.sharding
    target = {
        "f": jax.ShapeDtypeStruct(flow.f.shape, flow.f.dtype,
                                  sharding=sharding),
        "i": 0,
    }
    payload = ckptr.restore(path, target)
    flow.f = payload["f"]
    flow.i = int(payload["i"])
    return flow


class CheckpointReporter(Reporter):
    """Periodic async checkpointing through the reporter system: snapshot
    ``{f, i}`` every ``interval`` steps into ``directory/step_<i>``."""

    def __init__(self, directory: str, interval: int = 1000,
                 keep: Optional[int] = 3, async_save: bool = True):
        super().__init__(interval)
        self.directory = directory
        self.keep = keep
        self.async_save = async_save
        self._pending = None
        self._saved = []

    def __call__(self, simulation: "Simulation"):
        flow = simulation.flow
        if flow.i % self.interval != 0:
            return
        if self._pending is not None:
            self._pending.wait_until_finished()
        self._pending = save_state(flow, self.directory,
                                   name=f"step_{flow.i:09d}",
                                   async_save=self.async_save)
        self._saved.append(flow.i)
        if self.keep is not None and len(self._saved) > self.keep:
            import shutil
            drop = self._saved.pop(0)
            shutil.rmtree(os.path.join(self.directory,
                                       f"step_{drop:09d}"),
                          ignore_errors=True)

    def wait(self):
        if self._pending is not None:
            self._pending.wait_until_finished()

    def latest(self) -> Optional[str]:
        return f"step_{self._saved[-1]:09d}" if self._saved else None
