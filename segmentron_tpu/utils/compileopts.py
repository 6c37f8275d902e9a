"""Per-executable XLA compiler options for TPU jits.

The fused stem+block1 Pallas kernel (ops/entrychain.py) needs more
scoped VMEM than the Mosaic default budget: its working set measured
~19.6 MB against the 16 MB default limit on v5e (compile-time OOM),
while the chip has 128 MB of VMEM total. XLA's escape hatch is the
per-compile ``xla_tpu_scoped_vmem_limit_kib`` option, which jax
forwards through ``jax.jit(..., compiler_options=...)``.

Because inner jits inline into the enclosing computation, the option
must be set on the OUTERMOST jit — the bench loop, the TTA programs,
the eval/predict steps — not on ``fused_stem_block1`` itself. Every
such call site asks this module for the current options.

No reference analogue (CUDA has no scoped-VMEM compile budget); knob
lives at ``cfg.TPU.SCOPED_VMEM_KIB``.
"""

from __future__ import annotations

import jax

__all__ = ["tpu_compiler_options"]

# measured: fused_stem_block1 needs ~19.6 MB of kernel stack; 24 MiB
# leaves headroom without eating into XLA's own pipelining budget
_BLOCK1_SCOPED_KIB = 24576


def tpu_compiler_options() -> dict | None:
    """Compiler options for an outermost TPU jit under the current cfg.

    Returns ``None`` (use backend defaults) unless the config requires
    a raised scoped-VMEM limit AND the default backend is a TPU —
    the option is unknown to the CPU compiler, and the CPU/interpret
    test paths must stay flag-free.
    """
    from ..config import cfg

    if jax.default_backend() != "tpu":
        return None
    kib = int(getattr(cfg.TPU, "SCOPED_VMEM_KIB", 0) or 0)
    if kib <= 0 and cfg.TPU.FUSED_STEM == "block1":
        kib = _BLOCK1_SCOPED_KIB
    if kib <= 0:
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": str(kib)}
