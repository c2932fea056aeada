"""Sample unpacking: raw digitizer bytes -> float voltages.

Ref: convertarray (src/pb_kernels.cu:23-33).  The VLITE digitizers deliver
8-bit offset-binary samples with mean 128; the conversion maps u -> u/128 - 1
except that exact 0 (a fill/flag value written by the capture gap-filler,
ref src/writer.c:674-687) stays 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def convert_uint8(u: jax.Array) -> jax.Array:
    """uint8 offset-binary -> float32 voltage; 0 maps to 0 (gap fill)."""
    f = u.astype(jnp.float32) * (1.0 / 128.0) - 1.0
    return jnp.where(u == 0, 0.0, f)


def digitize_uint8(x: jax.Array, scale: float = 0.02957 * 2,
                   offset: float = 128.5) -> jax.Array:
    """float voltage -> uint8 offset-binary, inverse of convert_uint8 up to
    quantization.  Matches genbase's digitize (ref src/genbase.cu:689-708):
    u = clip(x/scale + offset, 0, 255) truncated toward zero."""
    tmp = x / scale + offset
    return jnp.clip(tmp, 0.0, 255.0).astype(jnp.uint8)
