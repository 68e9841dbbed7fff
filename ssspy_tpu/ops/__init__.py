"""TPU kernel fast paths.

- :mod:`.splitc` — split-complex (planar real/imag) formulations of the
  hot separation math; TPU MXUs have no complex datapath, so the
  production path carries ``(2, ...)`` f32 arrays.

Pallas small-matrix kernels land here as they are promoted from the
``jnp.linalg`` fallbacks after parity.
"""

from . import splitc

__all__ = ["splitc"]
