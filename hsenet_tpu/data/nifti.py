"""Minimal NIfTI-1 reader (host side, numpy only).

The reference decodes NIfTI via nibabel (`CT-RATE_nii_to_3D_volume_npy_file
.py:52-55`); that dependency isn't available here, so this is a
from-scratch parser of the 348-byte NIfTI-1 header + raw/gzip data section.
Covers what chest-CT archives actually use: int16/uint16/float32/float64,
scl_slope/inter, pixdim spacing, optional .gz. Returns the raw array —
HU conversion and geometry live in the on-device pipeline
(`hsenet_tpu.data.preprocess`).
"""

from __future__ import annotations

import gzip
import struct
from dataclasses import dataclass
from typing import Tuple

import numpy as np

_DTYPES = {
    2: np.uint8,
    4: np.int16,
    8: np.int32,
    16: np.float32,
    64: np.float64,
    256: np.int8,
    512: np.uint16,
    768: np.uint32,
}


@dataclass
class NiftiVolume:
    data: np.ndarray  # as stored (i, j, k) fastest-first -> shape (nx, ny, nz)
    spacing: Tuple[float, float, float]  # (dx, dy, dz) in mm
    scl_slope: float
    scl_inter: float

    @property
    def zyx_data(self) -> np.ndarray:
        """(nz, ny, nx) — the z-leading layout the pipeline consumes
        (matches the reference's transpose(2, 0, 1), nii_to_3D:86)."""
        return np.ascontiguousarray(self.data.transpose(2, 1, 0))

    @property
    def zyx_spacing(self) -> Tuple[float, float, float]:
        dx, dy, dz = self.spacing
        return (dz, dy, dx)


def read_nifti(path: str, native: str = "auto") -> NiftiVolume:
    """Parse one NIfTI-1 volume.

    native: 'auto' uses the C++ decoder (`hsenet_tpu.native`) when it
    compiled — one fused inflate+convert pass, float32 out — and falls back
    to this pure-Python parser; 'never' forces Python; 'require' raises if
    the native library is unavailable.
    """
    if native in ("auto", "require"):
        try:
            from hsenet_tpu import native as native_mod

            if native_mod.available():
                data, spacing_zyx, slope, inter = native_mod.decode(path)
                return NiftiVolume(
                    # store (nx, ny, nz) like the Python path; transpose of
                    # the zyx buffer is a view and zyx_data round-trips to
                    # the original contiguous layout for free
                    data=data.transpose(2, 1, 0),
                    spacing=(spacing_zyx[2], spacing_zyx[1], spacing_zyx[0]),
                    scl_slope=slope,
                    scl_inter=inter,
                )
            if native == "require":
                raise RuntimeError("native nifti decoder unavailable")
        except ImportError:
            if native == "require":
                raise

    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "rb") as f:
        header = f.read(348)
        if len(header) < 348:
            raise ValueError(f"{path}: truncated NIfTI header")
        sizeof_hdr = struct.unpack("<i", header[:4])[0]
        if sizeof_hdr == 348:
            end = "<"
        elif struct.unpack(">i", header[:4])[0] == 348:
            end = ">"
        else:
            raise ValueError(f"{path}: not a NIfTI-1 file")
        magic = header[344:348]
        if magic[:2] not in (b"n+", b"ni"):
            raise ValueError(f"{path}: bad NIfTI magic {magic!r}")

        dim = struct.unpack(end + "8h", header[40:56])
        ndim = dim[0]
        shape = tuple(int(d) for d in dim[1 : 1 + max(ndim, 3)][:3])
        datatype = struct.unpack(end + "h", header[70:72])[0]
        if datatype not in _DTYPES:
            raise ValueError(f"{path}: unsupported datatype {datatype}")
        np_dtype = np.dtype(_DTYPES[datatype]).newbyteorder(end)
        pixdim = struct.unpack(end + "8f", header[76:108])
        vox_offset = int(struct.unpack(end + "f", header[108:112])[0])
        scl_slope = struct.unpack(end + "f", header[112:116])[0]
        scl_inter = struct.unpack(end + "f", header[116:120])[0]
        if scl_slope == 0 or not np.isfinite(scl_slope):
            scl_slope = 1.0
        if not np.isfinite(scl_inter):
            scl_inter = 0.0

        f.seek(vox_offset)
        count = int(np.prod(shape))
        raw = f.read(count * np_dtype.itemsize)
        if len(raw) < count * np_dtype.itemsize:
            raise ValueError(f"{path}: truncated data section")
        data = np.frombuffer(raw, dtype=np_dtype, count=count)
        # NIfTI stores x fastest: reshape in Fortran order to (nx, ny, nz)
        data = data.reshape(shape, order="F")

    return NiftiVolume(
        data=data,
        spacing=(float(pixdim[1]), float(pixdim[2]), float(pixdim[3])),
        scl_slope=float(scl_slope),
        scl_inter=float(scl_inter),
    )


def write_nifti(path: str, data: np.ndarray, spacing=(1.0, 1.0, 1.0),
                scl_slope: float = 1.0, scl_inter: float = 0.0) -> None:
    """Tiny NIfTI-1 writer (tests + synthetic data). data: (nx, ny, nz)."""
    dtype_code = {np.dtype(v): k for k, v in _DTYPES.items()}[
        np.dtype(data.dtype)
    ]
    header = bytearray(348)
    struct.pack_into("<i", header, 0, 348)
    dim = [3, *data.shape, 1, 1, 1, 1][:8]
    struct.pack_into("<8h", header, 40, *dim)
    struct.pack_into("<h", header, 70, dtype_code)
    struct.pack_into("<h", header, 72, data.dtype.itemsize * 8)
    struct.pack_into(
        "<8f", header, 76, 1.0, spacing[0], spacing[1], spacing[2], 0, 0, 0, 0
    )
    struct.pack_into("<f", header, 108, 352.0)
    struct.pack_into("<f", header, 112, scl_slope)
    struct.pack_into("<f", header, 116, scl_inter)
    header[344:348] = b"n+1\x00"
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "wb") as f:
        f.write(bytes(header))
        f.write(b"\x00" * 4)  # pad to vox_offset 352
        f.write(np.asfortranarray(data).tobytes(order="F"))
