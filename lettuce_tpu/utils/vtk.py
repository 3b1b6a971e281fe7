"""Dependency-free VTK writer (legacy binary STRUCTURED_POINTS).

Replaces the reference's ``pyevtk`` dependency (``vtk_reporter.py:18-65``)
with a direct writer for the legacy VTK file format, readable by ParaView /
VisIt. Data is written big-endian binary, x-fastest ordering as VTK
requires.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["write_vtk"]


def _write_array(fh, name: str, data: np.ndarray, path: str):
    data = np.ascontiguousarray(data)
    if data.dtype.kind != "f":
        data = data.astype(np.float64)
    vtk_type = {4: "float", 8: "double"}[data.dtype.itemsize]
    fh.write(f"SCALARS {name} {vtk_type} 1\n".encode())
    fh.write(b"LOOKUP_TABLE default\n")
    # VTK legacy binary is big-endian; x varies fastest (Fortran order).
    # The native C++ writer does transpose + byteswap + write in one pass.
    if data.dtype.itemsize == 4:
        from .._native import get_native_lib
        lib = get_native_lib()
        if lib is not None:
            import ctypes
            fh.flush()
            nx, ny, nz = data.shape
            rc = lib.lt_write_be_f32_fortran(
                path.encode(), data.ctypes.data_as(ctypes.c_void_p),
                nx, ny, nz)
            if rc == 0:
                fh.seek(0, 2)  # continue appending after native write
                fh.write(b"\n")
                return
    fh.write(data.ravel(order="F").astype(f">f{data.dtype.itemsize}")
             .tobytes())
    fh.write(b"\n")


def write_vtk(point_dict: Dict[str, np.ndarray], id: int = 0,
              filename_base: str = "./data/output",
              suffix: str = None) -> str:
    """Write all fields in ``point_dict`` (each [nx, ny, nz]) to
    ``{filename_base}_{id:08d}.vtk``. Returns the filename."""
    first = next(iter(point_dict.values()))
    nx, ny, nz = first.shape
    if suffix is None:
        filename = f"{filename_base}_{id:08d}.vtk"
    else:
        filename = f"{filename_base}{suffix}.vtk"
    with open(filename, "wb") as fh:
        fh.write(b"# vtk DataFile Version 3.0\n")
        fh.write(b"lettuce-tpu output\n")
        fh.write(b"BINARY\n")
        fh.write(b"DATASET STRUCTURED_POINTS\n")
        fh.write(f"DIMENSIONS {nx} {ny} {nz}\n".encode())
        fh.write(b"ORIGIN 0 0 0\n")
        fh.write(b"SPACING 1 1 1\n")
        fh.write(f"POINT_DATA {nx * ny * nz}\n".encode())
        for name, data in point_dict.items():
            assert data.shape == (nx, ny, nz), \
                f"field {name} has shape {data.shape}, expected {(nx, ny, nz)}"
            _write_array(fh, name, data, filename)
    return filename
