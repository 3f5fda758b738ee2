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

from gps_sdr_sim_tpu.receiver.acquire import (AcqResult, _fine_doppler,
                                              sampled_codes)


@lru_cache(maxsize=None)
def _acq_mxu_fn(s: int, n_dopp: int, n_blocks: int, n_prn: int):
    @jax.jit
    def run(x_re, x_im, codes, dopp_hz, fs):
        # x_re/x_im [n_blocks, S] f32; codes [P, S] int8 in {-1, +1}.
        t = jnp.arange(s, dtype=jnp.float32) / fs
        ang = 2.0 * jnp.pi * dopp_hz[:, None] * t[None, :]
        c, sn = jnp.cos(ang), jnp.sin(ang)
        # wipe = x * e^{-j 2 pi f t}, quantized to int8 at 1/16 LSB of the
        # SC16 scale (acquisition needs correlation gain, not precision).
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
    if prns is None:
        prns = range(1, 33)
    prns = list(prns)
    s = int(round(fs * 1e-3))
    if len(x) < n_blocks * s:
        raise ValueError(f"need {n_blocks} ms of samples, got {len(x)/s:.2f}")

    codes = sampled_codes(fs)[[p - 1 for p in prns]].astype(np.int8)
    dopp = np.arange(-dopp_max, dopp_max + dopp_step / 2, dopp_step,
                     dtype=np.float32)
    xb = np.asarray(x[:n_blocks * s], np.complex64).reshape(n_blocks, s)

    run = _acq_mxu_fn(s, len(dopp), n_blocks, len(prns))
    peak, arg, mean = jax.device_get(run(
        jnp.asarray(np.ascontiguousarray(xb.real, np.float32)),
        jnp.asarray(np.ascontiguousarray(xb.imag, np.float32)),
        jnp.asarray(codes), jnp.asarray(dopp), jnp.float32(fs)))

    out = []
    for i, prn in enumerate(prns):
        d_idx, c_idx = divmod(int(arg[i]), s)
        metric = float(peak[i] / mean[i])
        detected = metric > threshold
        fd = float(dopp[d_idx])
        if detected and fine:
            fd = _fine_doppler(np.asarray(x, np.complex64), fs,
                               codes[i].astype(np.float32), c_idx, fd)
        out.append(AcqResult(
            prn=prn, doppler=fd, code_phase=float(c_idx),
            metric=metric, detected=detected))
    return out
