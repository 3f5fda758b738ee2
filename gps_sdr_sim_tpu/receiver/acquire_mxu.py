"""MXU acquisition: parallel code-phase search as int8 circulant matmuls.

The FFT search (acquire.py) needs complex64, which some TPU PJRT backends
reject — and on any TPU the systolic array, not the FFT, is where the
FLOPs are. This formulation puts the whole search on the MXU:

    corr[d, tau] = sum_k wipe(x, f_d)[k] * code[(k - tau) mod S]

is a [n_dopp*n_blocks*2, S] @ [S, S] matmul per PRN (re/im wiped signal
rows, circulant code-replica matrix columns). Everything is quantized to
int8 — the code is +-1 exactly and acquisition only needs ~20 dB of
dynamic range — so the matmuls run on the MXU's int8 path with int32
accumulation. The circulant matrices are built on device from the
[32, S] sampled codes with one shared index gather.

Same detection contract as acquire.py: results are interchangeable
(tested against the FFT path bit-for-bit on detections).
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gps_sdr_sim_tpu.receiver.acquire import (AcqResult, assemble_results,
                                              search_prep)


@lru_cache(maxsize=None)
def _acq_mxu_fn(s: int, n_dopp: int, n_blocks: int, n_prn: int):
    @jax.jit
    def run(x_re, x_im, codes, dopp_hz, fs):
        # x_re/x_im [n_blocks, S] f32; codes [P, S] int8 in {-1, +1}.
        t = jnp.arange(s, dtype=jnp.float32) / fs
        ang = 2.0 * jnp.pi * dopp_hz[:, None] * t[None, :]
        c, sn = jnp.cos(ang), jnp.sin(ang)
        # wipe = x * e^{-j 2 pi f t}, then max-normalized into int8
        # (acquisition needs correlation gain across ~2048 samples, not
        # per-sample precision; the int8 quantization noise is ~40 dB
        # below the coherent peak).
        w_re = x_re[None] * c[:, None, :] + x_im[None] * sn[:, None, :]
        w_im = x_im[None] * c[:, None, :] - x_re[None] * sn[:, None, :]
        w = jnp.stack([w_re, w_im], axis=2)  # [D, B, 2, S]
        scale = 127.0 / (jnp.max(jnp.abs(w)) + 1e-9)
        w8 = jnp.clip(jnp.round(w * scale), -127, 127).astype(jnp.int8)
        w8 = w8.reshape(n_dopp * n_blocks * 2, s)

        # Shared circulant index: C_prn[tau, k] = code[(k - tau) mod S].
        k = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        tau = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        idx = jnp.remainder(k - tau, s)

        def per_prn(code):
            circ = code[idx]  # [tau, k] int8
            corr = jax.lax.dot_general(
                w8, circ, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)  # [D*B*2, tau]
            corr = corr.astype(jnp.float32).reshape(n_dopp, n_blocks, 2, s)
            power = jnp.sum(corr[:, :, 0] ** 2 + corr[:, :, 1] ** 2,
                            axis=1)  # [D, tau]
            flat = power.reshape(-1)
            return jnp.max(flat), jnp.argmax(flat), jnp.mean(flat)

        return jax.lax.map(per_prn, codes)

    return run


def acquire_mxu(x: np.ndarray, fs: float,
                prns: Optional[Sequence[int]] = None,
                dopp_max: float = 5000.0, dopp_step: float = 250.0,
                n_blocks: int = 4, threshold: float = 12.0,
                fine: bool = True) -> List[AcqResult]:
    """Drop-in alternative to acquire() that runs on the MXU, complex-free."""
    prns, s, codes, dopp, xb = search_prep(x, fs, prns, dopp_max, dopp_step,
                                           n_blocks)
    codes8 = codes.astype(np.int8)

    run = _acq_mxu_fn(s, len(dopp), n_blocks, len(prns))
    peak, arg, mean = jax.device_get(run(
        jnp.asarray(np.ascontiguousarray(xb.real, np.float32)),
        jnp.asarray(np.ascontiguousarray(xb.imag, np.float32)),
        jnp.asarray(codes8), jnp.asarray(dopp), jnp.float32(fs)))

    return assemble_results(x, fs, prns, codes8, s, dopp, peak, arg, mean,
                            threshold, fine)
