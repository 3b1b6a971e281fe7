"""HDF5 time-series storage and dataset for learned-operator training.

Parity with reference ``/root/reference/lettuce/util/datautils.py``:
``HDF5Reporter`` appends f snapshots to a resizable HDF5 dataset with
simulation metadata in attrs; ``LettuceDataset`` iterates (f, f_target at
idx+k, idx) pairs for training.

Differences: instead of pickling live flow/collision objects (which would
capture device handles), a JSON metadata dict describes the run; samples
come back as numpy arrays, ready for jax device_put or a torch DataLoader
(both work — numpy is the lingua franca of both input pipelines).
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np

from ..simulation import Reporter

__all__ = ["HDF5Reporter", "LettuceDataset"]


class HDF5Reporter(Reporter):
    """Saves the f field every ``interval`` steps to a resizable HDF5
    dataset."""

    def __init__(self, flow: "Flow", collision: "Collision", interval: int,
                 filebase: str = "./output", metadata: Optional[dict] = None,
                 compression: Optional[str] = None):
        import h5py

        super().__init__(interval)
        self.filebase = filebase
        fs = h5py.File(self.filebase + ".h5", "w")
        meta = {
            "flow_class": type(flow).__name__,
            "collision_class": type(collision).__name__,
            "stencil": type(flow.stencil).__name__,
            "resolution": list(flow.resolution),
            "dtype": str(flow.context.dtype.name),
            "reynolds_number": float(flow.units.reynolds_number),
            "mach_number": float(flow.units.mach_number),
            "interval": int(interval),
        }
        if metadata:
            meta.update(metadata)
        fs.attrs["metadata"] = json.dumps(meta)
        from .. import __version__
        fs.attrs["version"] = __version__
        self.shape = (flow.stencil.q, *flow.resolution)
        fs.create_dataset(name="f",
                          shape=(0, *self.shape),
                          maxshape=(None, *self.shape),
                          compression=compression)
        fs.create_dataset(name="steps", shape=(0,), maxshape=(None,),
                          dtype=np.int64)
        self.fs = fs

    def __call__(self, simulation: "Simulation"):
        if simulation.flow.i % self.interval == 0:
            ds_f = self.fs["f"]
            ds_i = self.fs["steps"]
            n = ds_f.shape[0] + 1
            ds_f.resize(n, axis=0)
            ds_i.resize(n, axis=0)
            ds_f[-1, ...] = np.asarray(simulation.flow.f)
            ds_i[-1] = simulation.flow.i
            self.fs.flush()

    def close(self):
        self.fs.close()

    def __del__(self):
        try:
            self.fs.close()
        except Exception:
            pass


class LettuceDataset:
    """Indexable dataset over an HDF5 file written by :class:`HDF5Reporter`.

    With ``target=True``, item i is ``(f_i, f_{i+skip_idx_to_target}, i)``
    — the training pairs for learned LBM operators. Works as a
    ``torch.utils.data.Dataset`` (duck-typed) and as a plain iterable for
    jax input pipelines.
    """

    def __init__(self, filebase, transform=None, target=False,
                 skip_idx_to_target=1):
        import h5py

        self.filebase = filebase
        self.fs = h5py.File(filebase if filebase.endswith(".h5")
                            else filebase + ".h5", "r")
        self.transform = transform
        self.target = target
        self.skip_idx_to_target = skip_idx_to_target
        self.keys = ["f"]
        self.metadata = json.loads(self.fs.attrs.get("metadata", "{}"))

    def __len__(self):
        n = self.fs["f"].shape[0]
        return n - self.skip_idx_to_target if self.target else n

    def __getitem__(self, idx):
        f = self.get_data(idx)
        if self.target:
            f_target = self.get_data(idx + self.skip_idx_to_target)
            return f, f_target, idx
        return f, idx

    def get_data(self, idx):
        f = np.asarray(self.fs["f"][idx])
        if self.transform is not None:
            f = self.transform(f)
        return f

    def steps(self):
        return np.asarray(self.fs["steps"])

    def loader(self, batch_size: int = 4, shuffle: bool = False,
               seed: int = 0, drop_last: bool = False):
        """Minimal batching/shuffling iterator yielding stacked numpy
        batches — the jax-side analog of wrapping this dataset in a torch
        ``DataLoader`` (the reference's training pattern,
        ``util/datautils.py:83-156``). With ``target=True`` each batch is
        ``(f [B, q, *res], f_target [B, q, *res], idx [B])``."""
        order = np.arange(len(self))
        if shuffle:
            np.random.RandomState(seed).shuffle(order)
        stop = len(order)
        if drop_last:
            stop -= stop % batch_size
        for s in range(0, stop, batch_size):
            items = [self[int(i)] for i in order[s:s + batch_size]]
            yield tuple(np.stack(col) for col in zip(*items))

    def close(self):
        self.fs.close()

    def __del__(self):
        try:
            self.fs.close()
        except Exception:
            pass
