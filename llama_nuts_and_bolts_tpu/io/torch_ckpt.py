"""Zero-copy PyTorch ``.pth`` checkpoint reader (zip + pickle VM + memmap).

Capability parity with the reference's torch ingest (reference:
src/torch/torchmodelreader.go:22-145, src/torch/types.go:9-56,
src/common/memorymapper_unix.go:18-41), rebuilt for a JAX host: the ``.pth``
file is a zip archive whose tensor-payload members are STORED (uncompressed),
so each storage can be aliased as a slice of one big ``np.memmap`` over the
checkpoint file — no copy until ``jax.device_put`` ships (possibly sharded)
views to TPU HBM.

Pipeline: open zip → find the single ``*.pkl`` member → run the pickle VM with
``find_class`` limited to a torch-class table and ``persistent_load`` resolving
``('storage', kind, filename, device, numel)`` pids to memmap slices →
``torch._utils._rebuild_tensor_v2`` builds :class:`HostTensor` views.
"""

from __future__ import annotations

import os
import struct
import zipfile
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import ml_dtypes

from llama_nuts_and_bolts_tpu.io.pickle_vm import PickleVM, UnpickleError

bfloat16 = np.dtype(ml_dtypes.bfloat16)

# torch storage class name -> numpy dtype of the raw payload
_STORAGE_DTYPES: Dict[str, np.dtype] = {
    "BFloat16Storage": bfloat16,
    "HalfStorage": np.dtype(np.float16),
    "FloatStorage": np.dtype(np.float32),
    "DoubleStorage": np.dtype(np.float64),
    "IntStorage": np.dtype(np.int32),
    "LongStorage": np.dtype(np.int64),
    "ShortStorage": np.dtype(np.int16),
    "CharStorage": np.dtype(np.int8),
    "ByteStorage": np.dtype(np.uint8),
    "BoolStorage": np.dtype(np.bool_),
}


@dataclass
class _StorageKind:
    dtype: np.dtype


@dataclass
class _Storage:
    """A raw storage aliased onto the checkpoint memmap."""

    kind: _StorageKind
    data: np.ndarray  # 1-D array of ``kind.dtype`` viewing the memmap


@dataclass
class HostTensor:
    """A named, shaped view over checkpoint bytes on the host.

    ``array`` aliases the checkpoint memmap whenever the tensor is contiguous
    (all Meta checkpoint tensors are); materialize to device with
    ``jax.device_put(t.array, sharding)``.
    """

    name: str
    shape: Tuple[int, ...]
    stride: Tuple[int, ...]
    dtype: np.dtype
    array: np.ndarray

    @property
    def elem_count(self) -> int:
        return int(np.prod(self.shape)) if self.shape else 1

    @property
    def byte_count(self) -> int:
        return self.elem_count * self.dtype.itemsize


def _rebuild_tensor_v2(
    storage: _Storage,
    storage_offset: int,
    size: Sequence[int],
    stride: Sequence[int],
    requires_grad: bool = False,
    backward_hooks: Any = None,
    metadata: Any = None,
) -> HostTensor:
    shape = tuple(int(s) for s in size)
    strides = tuple(int(s) for s in stride)
    n = int(np.prod(shape)) if shape else 1
    flat = storage.data[storage_offset : storage_offset + _span(shape, strides)]
    if _is_contiguous(shape, strides):
        arr = flat[:n].reshape(shape)
    else:
        itemsize = storage.kind.dtype.itemsize
        arr = np.lib.stride_tricks.as_strided(
            flat, shape=shape, strides=tuple(s * itemsize for s in strides)
        )
    return HostTensor(name="", shape=shape, stride=strides,
                      dtype=storage.kind.dtype, array=arr)


def _span(shape: Sequence[int], strides: Sequence[int]) -> int:
    if not shape:
        return 1
    if any(d == 0 for d in shape):
        return 0
    return 1 + sum((d - 1) * s for d, s in zip(shape, strides))


def _is_contiguous(shape: Sequence[int], strides: Sequence[int]) -> bool:
    expected = 1
    for dim, s in zip(reversed(shape), reversed(strides)):
        if dim != 1 and s != expected:
            return False
        expected *= dim
    return True


def _zip_member_data_offset(f, info: zipfile.ZipInfo) -> int:
    """Absolute file offset of a STORED zip member's payload.

    The central directory's ``header_offset`` points at the member's local file
    header; the payload begins after the 30-byte fixed header plus the local
    (not central!) filename and extra fields, which we parse directly.
    """
    f.seek(info.header_offset)
    hdr = f.read(30)
    if hdr[:4] != b"PK\x03\x04":
        raise UnpickleError(f"bad local file header for zip member {info.filename}")
    name_len, extra_len = struct.unpack("<HH", hdr[26:30])
    return info.header_offset + 30 + name_len + extra_len


class TorchCheckpointReader:
    """Reads a ``consolidated.XX.pth``-style checkpoint into HostTensor views."""

    def __init__(self, path: str) -> None:
        self.path = path
        self._mmap: Optional[np.memmap] = None

    def load(self) -> Dict[str, HostTensor]:
        self._mmap = np.memmap(self.path, dtype=np.uint8, mode="r")
        with zipfile.ZipFile(self.path, "r") as zf, open(self.path, "rb") as raw:
            pkl_members = [i for i in zf.infolist() if i.filename.endswith(".pkl")]
            if len(pkl_members) != 1:
                raise UnpickleError(
                    f"expected exactly one .pkl member in {self.path}, found {len(pkl_members)}"
                )
            pkl = pkl_members[0]
            base = pkl.filename[: -len(".pkl")].rsplit("/", 1)[0]
            offsets: Dict[str, Tuple[int, int]] = {}
            for info in zf.infolist():
                if info.compress_type != zipfile.ZIP_STORED:
                    if info.filename.startswith(base + "/data/"):
                        raise UnpickleError(
                            f"zip member {info.filename} is compressed; cannot alias memmap"
                        )
                    continue
                offsets[info.filename] = (_zip_member_data_offset(raw, info), info.file_size)

            def persistent_load(pid: Any) -> _Storage:
                if not isinstance(pid, tuple) or pid[0] != "storage":
                    raise UnpickleError(f"unsupported persistent id {pid!r}")
                kind, filename_stem, _device, numel = pid[1], pid[2], pid[3], int(pid[4])
                member = f"{base}/data/{filename_stem}"
                if member not in offsets:
                    raise UnpickleError(f"storage member {member} not found in zip")
                off, size = offsets[member]
                nbytes = numel * kind.dtype.itemsize
                if nbytes > size:
                    raise UnpickleError(
                        f"storage {member}: need {nbytes} bytes but member holds {size}"
                    )
                data = self._mmap[off : off + nbytes].view(kind.dtype)
                return _Storage(kind=kind, data=data)

            with zf.open(pkl.filename) as pf:
                vm = PickleVM(pf, find_class=_find_class_torch,
                              persistent_load=persistent_load)
                obj = vm.load()

        if not isinstance(obj, dict):
            raise UnpickleError(f"checkpoint root is {type(obj).__name__}, expected dict")
        tensors: Dict[str, HostTensor] = {}
        for key, val in obj.items():
            if not isinstance(val, HostTensor):
                raise UnpickleError(f"checkpoint entry {key!r} is not a tensor")
            val.name = key
            tensors[key] = val
        return tensors


def _find_class_torch(module: str, name: str) -> Any:
    if module == "torch._utils" and name == "_rebuild_tensor_v2":
        return _rebuild_tensor_v2
    if module == "torch" and name in _STORAGE_DTYPES:
        return _StorageKind(_STORAGE_DTYPES[name])
    if module == "collections" and name == "OrderedDict":
        return dict
    raise UnpickleError(f"unknown class {module}.{name} in checkpoint pickle")


def load_torch_checkpoint(path: str) -> Dict[str, HostTensor]:
    return TorchCheckpointReader(path).load()


# ---------------------------------------------------------------- sharded

# Meta's model-parallel checkpoint sharding (70B ships as consolidated.00-07.pth):
# column-parallel weights concatenate along dim 0, row-parallel along dim 1,
# embeddings along the embedding dim; norms are replicated across shards.
_SHARD_AXIS_RULES: Tuple[Tuple[str, Optional[int]], ...] = (
    ("tok_embeddings.weight", 1),
    ("output.weight", 0),
    (".attention.wq.weight", 0),
    (".attention.wk.weight", 0),
    (".attention.wv.weight", 0),
    (".attention.wo.weight", 1),
    (".feed_forward.w1.weight", 0),
    (".feed_forward.w3.weight", 0),
    (".feed_forward.w2.weight", 1),
    ("norm.weight", None),          # replicated (attention_norm/ffn_norm/norm)
    ("rope.freqs", None),
)


def shard_concat_axis(name: str) -> Optional[int]:
    for suffix, axis in _SHARD_AXIS_RULES:
        if name.endswith(suffix) or name == suffix:
            return axis
    return None


@dataclass
class ShardedHostTensor:
    """A tensor split across checkpoint shards; concatenated lazily.

    ``array`` materializes the combined tensor (one host copy of THIS tensor
    only — callers assemble one weight group at a time, so peak host memory
    stays bounded by a single layer's weights, not the model).
    """

    name: str
    shards: List[HostTensor]
    axis: Optional[int]

    @property
    def shape(self) -> Tuple[int, ...]:
        base = list(self.shards[0].shape)
        if self.axis is not None:
            base[self.axis] = sum(s.shape[self.axis] for s in self.shards)
        return tuple(base)

    @property
    def dtype(self) -> np.dtype:
        return self.shards[0].dtype

    @property
    def array(self) -> np.ndarray:
        if self.axis is None or len(self.shards) == 1:
            return self.shards[0].array
        return np.concatenate([s.array for s in self.shards], axis=self.axis)

    @property
    def elem_count(self) -> int:
        return int(np.prod(self.shape))

    @property
    def byte_count(self) -> int:
        return self.elem_count * self.dtype.itemsize


def load_sharded_checkpoint(paths: Sequence[str]) -> Dict[str, ShardedHostTensor]:
    """Load ``consolidated.00..NN.pth`` as lazily-concatenated tensors."""
    per_shard = [TorchCheckpointReader(p).load() for p in paths]
    names = list(per_shard[0].keys())
    out: Dict[str, ShardedHostTensor] = {}
    for name in names:
        shards = [s[name] for s in per_shard if name in s]
        out[name] = ShardedHostTensor(
            name=name, shards=shards, axis=shard_concat_axis(name))
    return out


def find_checkpoint_shards(model_dir: str) -> List[str]:
    import glob

    paths = sorted(glob.glob(os.path.join(model_dir, "consolidated.*.pth")))
    return [p for p in paths if os.path.basename(p).split(".")[1].isdigit()]
