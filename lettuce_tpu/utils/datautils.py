"""HDF5 time-series storage and dataset for learned-operator training.

Parity with reference ``/root/reference/lettuce/util/datautils.py``:
``HDF5Reporter`` appends f snapshots to a resizable HDF5 dataset with
simulation metadata in attrs; ``LettuceDataset`` iterates (f, f_target at
idx+k, idx) pairs for training.

Differences: instead of pickling live flow/collision objects (which would
capture device handles and tie the file to torch's pickle format,
reference ``util/datautils.py:112-133``), the flow's and collision's
recorded constructor arguments (``Flow._init_record``) are stored as JSON
— :meth:`LettuceDataset.make_flow` / :meth:`make_collision` rebuild the
objects from file, so a training consumer gets stencil, units and flow
back programmatically. Samples come back as numpy arrays, ready for jax
device_put or a torch DataLoader (both work — numpy is the lingua franca
of both input pipelines).
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np

from ..simulation import Reporter

__all__ = ["HDF5Reporter", "LettuceDataset"]

_STENCIL_KEY = "__stencil__"


def _jsonable(v):
    """(ok, encoded) for a constructor-argument value. Stencils encode by
    class name; small arrays by value; device handles and callables are
    not encodable (the caller records them as dropped)."""
    from ..stencil import Stencil
    if v is None or isinstance(v, (bool, int, str)):
        return True, v
    if isinstance(v, float):
        return True, v
    if isinstance(v, (np.integer,)):
        return True, int(v)
    if isinstance(v, (np.floating,)):
        return True, float(v)
    if isinstance(v, (list, tuple)):
        out = []
        for x in v:
            ok, sx = _jsonable(x)
            if not ok:
                return False, None
            out.append(sx)
        return True, out
    if isinstance(v, type) and issubclass(v, Stencil):
        return True, {_STENCIL_KEY: v.__name__}
    if isinstance(v, Stencil):
        return True, {_STENCIL_KEY: type(v).__name__}
    try:
        a = np.asarray(v)
        if a.size <= 256 and a.dtype.kind in "biuf":
            return True, a.tolist()
    except Exception:
        pass
    return False, None


def _init_spec(obj) -> dict:
    """JSON spec of how ``obj`` was constructed, from its
    ``_init_record`` (see ``utils/utility.py:install_init_recorder``)."""
    spec = {"class": type(obj).__name__, "kwargs": None, "dropped": []}
    rec = getattr(obj, "_init_record", None)
    if rec is None or rec[1] is None:
        return spec
    kwargs, dropped = {}, []
    for k, v in rec[1].items():
        if k == "context":
            continue
        ok, sv = _jsonable(v)
        if ok:
            kwargs[k] = sv
        else:
            dropped.append(k)
    spec["kwargs"] = kwargs
    spec["dropped"] = dropped
    return spec


def _decode_kwargs(kwargs: dict):
    import lettuce_tpu as lt
    out = {}
    for k, v in kwargs.items():
        if isinstance(v, dict) and _STENCIL_KEY in v:
            out[k] = getattr(lt, v[_STENCIL_KEY])()
        else:
            out[k] = v
    return out


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
        # reconstruction specs: what the reference achieves by pickling
        # the live objects, stored as constructor args instead
        meta["flow_spec"] = _init_spec(flow)
        meta["collision_spec"] = _init_spec(collision)
        if metadata:
            meta.update(metadata)
        fs.attrs["metadata"] = json.dumps(meta)
        mask = getattr(flow, "mask", None)
        if mask is not None and np.asarray(mask).dtype == bool:
            # user-settable obstacle masks are state, not constructor
            # args — persist so make_flow restores the exact geometry
            fs.create_dataset(name="flow_mask", data=np.asarray(mask))
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

    # ------------------------------------------------------------------
    # reconstruction (reference parity: the torch version unpickles the
    # flow/collision objects from the HDF5 attrs,
    # /root/reference/lettuce/util/datautils.py:112-133)
    # ------------------------------------------------------------------
    def make_flow(self, context: Optional["Context"] = None) -> "Flow":
        """Rebuild the writer's flow (stencil, units, geometry) from the
        stored constructor spec — no hand-wiring needed on the training
        side. Pass a :class:`Context` to choose device/dtype; defaults to
        a context with the writer's dtype."""
        import lettuce_tpu as lt

        spec = self.metadata.get("flow_spec")
        if not spec or spec.get("kwargs") is None:
            raise ValueError(
                "file has no flow reconstruction spec (written by an "
                "older HDF5Reporter?)")
        if spec["dropped"]:
            raise ValueError(
                f"flow constructor argument(s) {spec['dropped']} could "
                f"not be stored; rebuild this flow by hand")
        if context is None:
            context = lt.Context(dtype=self.metadata.get("dtype",
                                                         "float32"))
        cls = getattr(lt, spec["class"])
        flow = cls(context=context, **_decode_kwargs(spec["kwargs"]))
        if "flow_mask" in self.fs:
            flow.mask = np.asarray(self.fs["flow_mask"])
        return flow

    def make_collision(self, flow: Optional["Flow"] = None) -> "Collision":
        """Rebuild the writer's collision operator (tau etc. were
        recorded as plain numbers, so no flow is strictly required;
        accepted for API symmetry)."""
        import lettuce_tpu as lt

        spec = self.metadata.get("collision_spec")
        if not spec or spec.get("kwargs") is None:
            raise ValueError("file has no collision reconstruction spec")
        if spec["dropped"]:
            raise ValueError(
                f"collision constructor argument(s) {spec['dropped']} "
                f"could not be stored; rebuild this operator by hand")
        cls = getattr(lt, spec["class"])
        return cls(**_decode_kwargs(spec["kwargs"]))

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
