"""RGL tensor-file parser (Dupuy & Jakob measured-BSDF container).

The reference reads `rendering/measuredbsdfs/*.bsdf` through Mitsuba's
`measured` plugin (`/root/reference/rendering/brdf_measured_disk.py:43-47`,
scene hook `rendering/matpreview/scene_measured.xml:60-62`). This framework
evaluates the files natively, so it carries its own parser for the simple
binary "tensor_file" container:

    bytes 0..11   magic  b"tensor_file\\0"
    u8 x 2        version (1, 0)
    u32           field count
    per field:    u16 name_len | name | u16 ndim | u8 dtype
                  | u64 byte offset | u64 x ndim shape

Field dtypes follow the tensor-file enum; only the ones present in RGL
files are mapped. Pure numpy, host-side (file IO is not device work).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Dict

import numpy as np

_MAGIC = b"tensor_file\x00"

_DTYPES = {
    1: np.uint8,
    2: np.int8,
    3: np.uint16,
    4: np.int16,
    5: np.uint32,
    6: np.int32,
    7: np.uint64,
    8: np.int64,
    9: np.float16,
    10: np.float32,
    11: np.float64,
}


@dataclass(frozen=True)
class TensorFile:
    fields: Dict[str, np.ndarray]

    def __getitem__(self, name: str) -> np.ndarray:
        return self.fields[name]

    def __contains__(self, name: str) -> bool:
        return name in self.fields


def read_tensor_file(path: str) -> TensorFile:
    with open(path, "rb") as f:
        raw = f.read()
    if raw[: len(_MAGIC)] != _MAGIC:
        raise ValueError(f"{path}: not a tensor_file (bad magic)")
    off = len(_MAGIC)
    ver_major, ver_minor = struct.unpack_from("BB", raw, off)
    off += 2
    if ver_major != 1:
        raise ValueError(f"{path}: unsupported tensor_file version {ver_major}.{ver_minor}")
    (n_fields,) = struct.unpack_from("<I", raw, off)
    off += 4
    fields: Dict[str, np.ndarray] = {}
    for _ in range(n_fields):
        (name_len,) = struct.unpack_from("<H", raw, off)
        off += 2
        name = raw[off : off + name_len].decode("ascii")
        off += name_len
        (ndim,) = struct.unpack_from("<H", raw, off)
        off += 2
        (dtype_code,) = struct.unpack_from("<B", raw, off)
        off += 1
        (data_offset,) = struct.unpack_from("<Q", raw, off)
        off += 8
        shape = struct.unpack_from(f"<{ndim}Q", raw, off)
        off += 8 * ndim
        dtype = _DTYPES.get(dtype_code)
        if dtype is None:
            raise ValueError(f"{path}: field {name!r} has unknown dtype {dtype_code}")
        count = int(np.prod(shape)) if shape else 1
        arr = np.frombuffer(raw, dtype=dtype, count=count, offset=data_offset)
        fields[name] = arr.reshape(shape)
    return TensorFile(fields)
