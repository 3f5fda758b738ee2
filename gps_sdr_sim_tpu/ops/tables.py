"""Quantized trig lookup tables used by the IQ mixer.

Parity target: sinTable512/cosTable512 (gpssim.c:15-83): 512-entry tables of
round(250*sin(2*pi*(i+0.5)/512)), except four entries that sit exactly on a
rounding boundary (value 105.50007) where the original table rounds *down*;
we apply those as explicit corrections. The cos table is exactly the sin
table rotated by 128 entries (verified against the reference binary).

The device kernel consumes a single packed int32 table with cos in the high
16 bits and sin in the low 16 bits, so the carrier mix needs one gather.
"""

from __future__ import annotations

import numpy as np

# Indices where round-half-away-from-zero disagrees with the reference table
# (the magnitude is 105.5000677; the reference rounds it to 105).
_BOUNDARY_FIX = (35, 220, 291, 476)


def _build_sin512() -> np.ndarray:
    i = np.arange(512)
    s = 250.0 * np.sin(2.0 * np.pi * (i + 0.5) / 512.0)
    t = (np.sign(s) * np.floor(np.abs(s) + 0.5)).astype(np.int32)
    for j in _BOUNDARY_FIX:
        t[j] -= np.sign(t[j]).astype(np.int32)
    return t


SIN_TABLE512 = _build_sin512()
COS_TABLE512 = SIN_TABLE512[(np.arange(512) + 128) % 512]


def packed_trig_table() -> np.ndarray:
    """int32 table: (cos & 0xFFFF) << 16 | (sin & 0xFFFF).

    Unpack in the kernel with arithmetic shifts:
      cos = packed >> 16 ; sin = (packed << 16) >> 16.
    """
    cos16 = COS_TABLE512.astype(np.int64) & 0xFFFF
    sin16 = SIN_TABLE512.astype(np.int64) & 0xFFFF
    return ((cos16 << 16) | sin16).astype(np.uint32).view(np.int32)
