"""Lazy tensors for streamed, memory-bounded GGUF conversion.

The reference keeps conversion memory bounded with a lazy-tensor layer
(``fun_asr_gguf/gguf/lazy.py:1-228``: LazyBase/LazyNumpyTensor deferring
every transform until write time). This is the TPU-repo equivalent,
scoped to what the converter actually defers:

* :class:`LazyTensor` — a thunk + shape; materializes on ``__array__``
  (so eager numpy code paths keep working untouched) or explicit call.
* :class:`LazyStack` — a per-layer list of LazyTensors standing in for
  the stacked ``[n_layers, ...]`` array of the param tree; the GGUF
  export indexes it one layer at a time.
* :class:`LazyHFDict` — a safetensors-backed mapping that reads one
  tensor per access (``safetensors.safe_open``), so the HF state dict
  never lives in RAM as a whole.

With these, ``tools/convert.py`` + ``GGUFWriter.add_tensor_lazy`` keep
peak RSS at ~one largest tensor instead of 2-3 full models.
"""

import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


class LazyTensor:
    """A deferred tensor: ``fn()`` produces the array on demand.

    ``shape`` is the OUR-convention shape ([in, out] for matmul
    weights). ``raw_fn``, when given, produces the UNTRANSPOSED HF/GGUF
    orientation ([out, in]) — the exporter prefers it to skip a double
    transpose.
    """

    __slots__ = ("_fn", "shape", "dtype", "raw_fn")

    def __init__(self, fn: Callable[[], np.ndarray],
                 shape: Tuple[int, ...], dtype=np.float32,
                 raw_fn: Optional[Callable[[], np.ndarray]] = None):
        self._fn = fn
        self.shape = tuple(int(s) for s in shape)
        self.dtype = np.dtype(dtype)
        self.raw_fn = raw_fn

    @property
    def ndim(self) -> int:
        return len(self.shape)

    def __call__(self) -> np.ndarray:
        return self._fn()

    def __array__(self, dtype=None, copy=None):
        a = np.asarray(self._fn())
        return a.astype(dtype) if dtype is not None else a


class LazyStack:
    """Stands in for ``np.stack([...])`` over per-layer LazyTensors."""

    __slots__ = ("items", "shape", "dtype")

    def __init__(self, items: Sequence[LazyTensor]):
        self.items = list(items)
        self.shape = (len(self.items), *self.items[0].shape)
        self.dtype = self.items[0].dtype

    @property
    def ndim(self) -> int:
        return len(self.shape)

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, i: int) -> LazyTensor:
        return self.items[i]


def tree_has_lazy(tree) -> bool:
    import jax
    return any(isinstance(leaf, (LazyTensor, LazyStack))
               for leaf in jax.tree_util.tree_leaves(tree))


class LazyHFDict:
    """Read-on-demand mapping over a directory of ``.safetensors``.

    API-compatible with the plain ``load_hf_safetensors_dir`` dict for
    the accesses the converter makes (``in``, ``[]``, ``keys``), plus
    ``shape(name)`` for metadata-only queries.
    """

    def __init__(self, hf_dir: str):
        from safetensors import safe_open
        self._handles = []
        self._where: Dict[str, int] = {}
        for fname in sorted(os.listdir(hf_dir)):
            if not fname.endswith(".safetensors"):
                continue
            h = safe_open(os.path.join(hf_dir, fname), framework="numpy")
            idx = len(self._handles)
            self._handles.append(h)
            for key in h.keys():
                self._where[key] = idx

    def __contains__(self, name: str) -> bool:
        return name in self._where

    def __getitem__(self, name: str) -> np.ndarray:
        return self._handles[self._where[name]].get_tensor(name)

    def __bool__(self) -> bool:
        return bool(self._where)

    def keys(self) -> List[str]:
        return list(self._where)

    def shape(self, name: str) -> Tuple[int, ...]:
        h = self._handles[self._where[name]]
        return tuple(h.get_slice(name).get_shape())
