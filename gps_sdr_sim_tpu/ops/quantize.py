"""Output sample-format packing: SC16 / SC08 / SC01.

Parity targets (gpssim.c:2266-2288):
 - SC16: int16 I/Q pairs as-is.
 - SC08: arithmetic >> 4 of each int16 sample (12-bit bladeRF -> 8-bit).
 - SC01: the sign bit (sample > 0) of each interleaved I/Q value packed
   MSB-first, 4 IQ pairs per byte: {I0,Q0,I1,Q1,I2,Q2,I3,Q3}.

All packing runs on-device so only the final bytes cross PCIe. Outputs keep
the [B, N, 2] shape where possible -- it is bytewise identical to the
interleaved [B, 2N] stream, and XLA:CPU pathologically slow-compiles int8
reshapes (~77 s) that would otherwise be no-ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIT_WEIGHTS = jnp.array([128, 64, 32, 16, 8, 4, 2, 1], dtype=jnp.int32)


@jax.jit
def pack_sc16(iq: jax.Array) -> jax.Array:
    """[B, N, 2] int16 -> int16 interleaved I/Q (layout already correct)."""
    return iq


@jax.jit
def pack_sc08(iq: jax.Array) -> jax.Array:
    """[B, N, 2] int16 -> int8 via arithmetic >> 4."""
    return (iq >> 4).astype(jnp.int8)


@jax.jit
def pack_sc01(iq: jax.Array) -> jax.Array:
    """[B, N, 2] int16 -> [B, N//4] uint8, sign bits packed MSB-first.

    Like the reference (gpssim.c:2266-2276, loop bound iq_buff_size/4),
    a trailing partial group of <4 IQ pairs is dropped.
    """
    b, n, _ = iq.shape
    n4 = n // 4
    bits = (iq[:, :n4 * 4] > 0).reshape(b, n4, 8).astype(jnp.int32)
    return jnp.sum(bits * _BIT_WEIGHTS, axis=-1).astype(jnp.uint8)


def pack(iq: jax.Array, data_format: int) -> jax.Array:
    if data_format == 16:
        return pack_sc16(iq)
    if data_format == 8:
        return pack_sc08(iq)
    if data_format == 1:
        return pack_sc01(iq)
    raise ValueError(f"Invalid I/Q data format: {data_format}")


# ---------------------------------------------------------------------------
# Packed-word-stream helpers (the kernel-epilogue fast path,
# synth_pallas.synth_staged_packed: [B, W] int32 little-endian words that
# ARE the output byte stream, with per-epoch tile padding past the valid
# prefix of packed_bytes(n_out, fmt) bytes).
# ---------------------------------------------------------------------------

from functools import partial  # noqa: E402

import numpy as np  # noqa: E402


def words_to_bytes(words: np.ndarray, n_out: int, fmt: int) -> np.ndarray:
    """Host [B, W] int32 words -> [B, valid_bytes] uint8 view (zero-copy
    until the caller materializes it)."""
    from gps_sdr_sim_tpu.ops.synth_pallas import packed_bytes

    b = words.shape[0]
    return words.view(np.uint8).reshape(b, -1)[:, :packed_bytes(n_out, fmt)]


@partial(jax.jit, static_argnums=(1, 2, 3))
def checksum_packed(words: jax.Array, valid_epochs: int, n_out: int,
                    fmt: int) -> tuple[jax.Array, jax.Array]:
    """(sum, nonzero_count) over the VALID region of a packed word batch.

    The sum matches the legacy per-format checksum exactly: SC16 sums the
    int16 samples, SC08 the int8 samples, SC01 the packed uint8 bytes —
    so golden values carry over from the unpacked path. nonzero counts
    nonzero ELEMENTS of the same typed view (int16 samples / int8 samples
    / packed bytes), a cheap dropped-batch detector (a synthesized-silence
    batch has sum 0 AND nonzero 0; a real batch always has signal).

    Both reductions read ONE typed view so XLA fuses them into a single
    pass over the stream: the earlier separate uint8 nonzero-byte pass
    cost ~30% of end-to-end bench throughput (same-window A/B vs the
    round-2 sum-only path, BASELINE.md reconciliation note)."""
    from gps_sdr_sim_tpu.ops.synth_pallas import packed_bytes

    w = words[:valid_epochs]
    if fmt == 16:
        v = jax.lax.bitcast_convert_type(w, jnp.int16).reshape(
            w.shape[0], -1)[:, :n_out * 2]
    elif fmt == 8:
        v = jax.lax.bitcast_convert_type(w, jnp.int8).reshape(
            w.shape[0], -1)[:, :n_out * 2]
    else:
        v = jax.lax.bitcast_convert_type(w, jnp.uint8).reshape(
            w.shape[0], -1)[:, :packed_bytes(n_out, fmt)]
    return (jnp.sum(v.astype(jnp.int32)),
            jnp.sum((v != 0).astype(jnp.int32)))
