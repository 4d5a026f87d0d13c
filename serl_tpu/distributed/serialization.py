"""Fast pytree <-> bytes codec for the native transport.

Array leaves travel as raw buffers (dtype/shape header), tree structure and
non-array leaves via a small pickled skeleton — no per-leaf pickling of
multi-MB params (the reference pays zmq+pickle+lz4 per publish;
agentlace transport, SURVEY.md L1).

Wire format:
  [u32 skeleton_len][skeleton pickle][for each array: u32 header_len
   [header pickle (dtype, shape)] raw bytes]
"""

import io
import pickle
import struct
from typing import Any

import jax
import numpy as np

_U32 = struct.Struct("<I")


def dumps(tree: Any) -> bytes:
    leaves, treedef = jax.tree.flatten(tree)
    arrays = []
    skeleton = []
    for leaf in leaves:
        if isinstance(leaf, (np.ndarray, jax.Array)):
            arrays.append(np.asarray(leaf))
            skeleton.append(None)  # placeholder: filled from arrays
        else:
            skeleton.append(("py", leaf))
    buf = io.BytesIO()
    skel_bytes = pickle.dumps((treedef, skeleton))
    buf.write(_U32.pack(len(skel_bytes)))
    buf.write(skel_bytes)
    for arr in arrays:
        arr = np.ascontiguousarray(arr)
        # dtype.name survives ml_dtypes types (bfloat16 etc.); dtype.str
        # degrades them to raw void bytes
        hdr = pickle.dumps((arr.dtype.name, arr.shape))
        buf.write(_U32.pack(len(hdr)))
        buf.write(hdr)
        buf.write(arr.tobytes())
    return buf.getvalue()


def _resolve_dtype(name: str) -> np.dtype:
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes

        return np.dtype(getattr(ml_dtypes, name))


def loads(data: bytes) -> Any:
    mv = memoryview(data)
    off = 0
    (skel_len,) = _U32.unpack_from(mv, off)
    off += 4
    treedef, skeleton = pickle.loads(bytes(mv[off : off + skel_len]))
    off += skel_len
    leaves = []
    for item in skeleton:
        if item is None:
            (hdr_len,) = _U32.unpack_from(mv, off)
            off += 4
            dtype_name, shape = pickle.loads(bytes(mv[off : off + hdr_len]))
            off += hdr_len
            dtype = _resolve_dtype(dtype_name)
            nbytes = int(dtype.itemsize * np.prod(shape)) if shape else dtype.itemsize
            arr = np.frombuffer(mv[off : off + nbytes], dtype=dtype).reshape(shape)
            off += nbytes
            leaves.append(arr.copy())
        else:
            leaves.append(item[1])
    return jax.tree.unflatten(treedef, leaves)
