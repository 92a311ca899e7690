"""`tiff` — float TIFF image interface (reference: io/tiff.hpp:20-66 and its
binding io.cpp:20-35).

    t = soil.tiff("height.tiff")      # load
    t.tensor                          # jnp array (H, W)
    out = soil.tiff(array); out.write("out.tiff")
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from soillib_tpu.io import tiffcore


class tiff:
    def __init__(self, source=None):
        self._array = None
        self._info = None
        self.filename = None
        if source is None:
            return
        if isinstance(source, (str, bytes)):
            self.read(source)
        else:
            self._array = np.asarray(source)

    # -- I/O ---------------------------------------------------------------

    def peek(self, filename: str) -> bool:
        """Load metadata only (io/tiff.hpp:69-97)."""
        self._info = tiffcore.peek(filename)
        self.filename = filename
        return True

    def read(self, filename: str) -> bool:
        arr, info = tiffcore.read(filename)
        self._array = arr
        self._info = info
        self.filename = filename
        return True

    def write(self, filename: str) -> bool:
        tiffcore.write(filename, np.asarray(self._array), self._extra_tags())
        return True

    def _extra_tags(self):
        return []

    # -- Properties (io.cpp:32-35) ------------------------------------------

    @property
    def width(self) -> int:
        if self._array is not None:
            return self._array.shape[1]
        return self._info.width if self._info else 0

    @property
    def height(self) -> int:
        if self._array is not None:
            return self._array.shape[0]
        return self._info.height if self._info else 0

    @property
    def bits(self) -> int:
        if self._array is not None:
            return np.asarray(self._array).dtype.itemsize * 8
        return self._info.bits if self._info else 0

    @property
    def tensor(self):
        """Image data as a jnp array (device transfer = the `.gpu()` of the
        reference's silt tensors)."""
        return jnp.asarray(self._array)

    @property
    def buffer(self):
        return self.tensor

    @property
    def shape(self):
        return tuple(self._array.shape) if self._array is not None else (self.height, self.width)

    def numpy(self):
        return np.asarray(self._array)
