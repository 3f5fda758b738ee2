"""End-to-end simulation runner: scenario -> device batches -> output file.

Replaces the reference's sequential epoch loop (gpssim.c:2154-2353) with a
pipelined producer/consumer: the host prepares fixed-point phase-ramp
batches while the TPU synthesizes the previous batch asynchronously (JAX
dispatch is async; we only block when fetching bytes for the writer).
Batches are padded to a fixed epoch count so exactly one XLA compilation is
ever needed per (sample-rate, format) pair.
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass
from typing import BinaryIO, Callable, Optional

import numpy as np

from gps_sdr_sim_tpu.models.scenario import (
    Scenario,
    ScenarioConfig,
    build_scenario,
)
from gps_sdr_sim_tpu.ops.plan import (
    DeviceBatch,
    pad_epochs,
    plan_batch,
    plan_epochs,
)
from gps_sdr_sim_tpu.ops.quantize import pack
from gps_sdr_sim_tpu.ops import synth_jnp, synth_pallas


@dataclass
class RunStats:
    total_samples: int = 0
    wall_seconds: float = 0.0
    device_batches: int = 0

    @property
    def samples_per_second(self) -> float:
        return self.total_samples / self.wall_seconds if self.wall_seconds else 0.0


def _pad_batch(db: DeviceBatch, target_b: int) -> DeviceBatch:
    """Pad a batch to `target_b` epochs (zero gain => silent padding)."""
    b = db.gain.shape[0]
    if b == target_b:
        return db
    pad = target_b - b

    def padarr(a, axis=0):
        widths = [(0, 0)] * a.ndim
        widths[axis] = (0, pad)
        return np.pad(a, widths, mode="edge")

    out = DeviceBatch(
        code_s=padarr(db.code_s), carr_s=padarr(db.carr_s),
        code_p=padarr(db.code_p), carr_p=padarr(db.carr_p),
        t_base=padarr(db.t_base), m0=padarr(db.m0), b0=padarr(db.b0),
        navbits=padarr(db.navbits),
        gain=np.pad(db.gain, ((0, pad), (0, 0))),  # zeros: silent epochs
        ca_words=db.ca_words)
    return out


def run_simulation(scn: Scenario, fp: BinaryIO, batch_epochs: int = 20,
                   log: Optional[Callable[[str], None]] = None,
                   impl: str = "pallas") -> RunStats:
    """Synthesize the whole scenario into `fp`. Returns throughput stats.

    impl: "pallas" (fused kernel + on-device rebase; the TPU fast path) or
    "xla" (pure jax.numpy kernel; correctness anchor, works everywhere).
    """
    if log is None:
        log = lambda s: print(s, end="", file=sys.stderr, flush=True)

    n = scn.iq_buff_size
    fmt = scn.config.data_format
    stats = RunStats()
    t_start = time.time()

    pending = None  # (device_array, valid_epochs)

    def flush(item):
        dev, valid = item
        host = np.asarray(dev)  # blocks until device work completes
        fp.write(np.ascontiguousarray(host[:valid]).data)

    for seg in scn.segments:
        e = 0
        while e < seg.n_epochs:
            b = min(batch_epochs, seg.n_epochs - e)
            if impl == "pallas":
                eb = pad_epochs(plan_epochs(seg, e, e + b, scn.delt),
                                batch_epochs)
                iq = synth_pallas.synth_epochs(eb, n)  # async dispatch
            else:
                db = _pad_batch(plan_batch(seg, e, e + b, n, scn.delt),
                                batch_epochs)
                iq = synth_jnp.synth_batch(db, n)
            out = pack(iq, fmt)
            if pending is not None:
                flush(pending)
            pending = (out, b)
            stats.device_batches += 1
            stats.total_samples += b * n
            e += b
            t_into = (seg.first_epoch + e - 1) * 0.1
            log(f"\rTime into run = {t_into:4.1f}")

    if pending is not None:
        flush(pending)

    stats.wall_seconds = time.time() - t_start
    return stats
