"""Kernel-backend selection policy, shared by every step builder.

One place answers "Pallas or XLA?" so the class pipelines
(pipelines/mono_odometry_tsdf.py), the sharded multi-chip step
(parallel/sharded_volume.py) and the volume ops (tsdf/volume.py) cannot
drift apart: "pallas" / "xla" are explicit, "auto" means Pallas exactly
when the default backend is a real TPU. Off-TPU Pallas runs use the
interpreter (slow, for parity tests only).
"""

from __future__ import annotations

from typing import Tuple

import jax


def resolve_backend(backend: str) -> Tuple[bool, bool]:
    """Return ``(use_pallas, interpret)`` for a backend spec.

    ``use_pallas``: run the Pallas kernels (else the identical-semantics
    XLA mirrors). ``interpret``: Pallas was forced on a non-TPU backend,
    so kernels must run under the interpreter.
    """
    on_tpu = jax.default_backend() == "tpu"
    if backend == "auto":
        use_pallas = on_tpu
    else:
        assert backend in ("pallas", "xla"), backend
        use_pallas = backend == "pallas"
    return use_pallas, use_pallas and not on_tpu
