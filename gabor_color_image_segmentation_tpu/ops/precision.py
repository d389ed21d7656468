"""Shared matmul-precision policy (single source of truth).

TPU DEFAULT-precision f32 dots round operands to bf16 (measured: 0.76 SLIC
label agreement vs exact f32 — BASELINE.md precision audit). Policy:

* genuine f32 operands in score/affinity/init paths -> Precision.HIGHEST
* bf16 operands -> DEFAULT (lossless: the rounding already happened)

In Pallas/Mosaic only DEFAULT and HIGHEST lower (HIGH raises); use
hand-rolled bf16x3 operand splits for the middle ground there
(models/slic_pallas.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST
DEFAULT = jax.lax.Precision.DEFAULT


def precision_for(dtype) -> jax.lax.Precision:
    """HIGHEST for f32 compute dtype (parity-grade), DEFAULT for bf16."""
    return HIGHEST if dtype == jnp.float32 else DEFAULT
