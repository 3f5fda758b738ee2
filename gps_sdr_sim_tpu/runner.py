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
from collections import deque
from dataclasses import dataclass
from typing import BinaryIO, Callable, Optional

import numpy as np

from gps_sdr_sim_tpu.models.scenario import Scenario
from gps_sdr_sim_tpu.ops.plan import (
    DeviceBatch,
    pad_epoch_axis,
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
    plan_seconds: float = 0.0   # host batch preparation (ops/plan.py)
    fetch_seconds: float = 0.0  # blocked on device->host readback
    write_seconds: float = 0.0  # file writes

    @property
    def samples_per_second(self) -> float:
        return self.total_samples / self.wall_seconds if self.wall_seconds else 0.0

    def summary(self, samp_freq: float) -> dict:
        """Structured run summary (SURVEY.md §5: observability contract)."""
        return {
            "total_samples": self.total_samples,
            "device_batches": self.device_batches,
            "wall_seconds": round(self.wall_seconds, 3),
            "plan_seconds": round(self.plan_seconds, 3),
            "fetch_seconds": round(self.fetch_seconds, 3),
            "write_seconds": round(self.write_seconds, 3),
            "samples_per_second": round(self.samples_per_second, 1),
            "realtime_factor": round(
                self.samples_per_second / samp_freq, 2) if samp_freq else 0.0,
        }


def _pad_batch(db: DeviceBatch, target_b: int) -> DeviceBatch:
    """Pad a batch to `target_b` epochs (zero gain => silent padding)."""
    return pad_epoch_axis(db, target_b)


def _fetch_with_retry(dev, recompute, retries: int = 2,
                      log=None) -> np.ndarray:
    """Device->host fetch with transient-error recovery.

    Time-shared/tunneled accelerators surface transient INTERNAL /
    UNIMPLEMENTED / UNAVAILABLE bursts at readback time (the dispatch was
    async). Failure detection + recovery is batch-granular by design —
    every batch is independently recomputable from host state (SURVEY.md
    §5) — so a failed fetch re-synthesizes that one batch and tries again
    instead of killing an hours-long run.
    """
    for attempt in range(retries + 1):
        try:
            return np.asarray(dev)
        except Exception as ex:  # jaxlib XlaRuntimeError has no stable path
            if attempt >= retries or type(ex).__name__ not in (
                    "XlaRuntimeError", "JaxRuntimeError"):
                raise
            if log is not None:
                log(f"\ntransient device error, recomputing batch "
                    f"(attempt {attempt + 1}): {str(ex)[:120]}\n")
            time.sleep(1.0 + 2.0 * attempt)
            dev = recompute()
    raise AssertionError("unreachable")


def iter_segment_batches(segments, lo: int, hi: int, batch_epochs: int):
    """Yield (segment, e0, e1) covering output epochs [lo, hi) in order.

    Output epoch k (0-based) is synthesized by segment-local epoch
    k - (first_epoch - 1) of the segment containing it; segments tile the
    output range contiguously, so any sub-range — a shard for one host, a
    resume after failure — maps to per-segment slices with no overlap.
    `segments` may be any iterable, including the lazy stream from
    models.scenario.build_scenario_streaming (day-scale runs plan each
    30 s segment only when synthesis reaches it).
    """
    for seg in segments:
        s0 = seg.first_epoch - 1
        a, b = max(lo, s0), min(hi, s0 + seg.n_epochs)
        e = a - s0
        while e < b - s0:
            step = min(batch_epochs, (b - s0) - e)
            yield seg, e, e + step
            e += step


def iter_seg_batches(scn: Scenario, lo: int, hi: int, batch_epochs: int):
    """iter_segment_batches over a fully-materialized Scenario."""
    return iter_segment_batches(scn.segments, lo, hi, batch_epochs)


def run_epoch_range(scn: Scenario, fp: BinaryIO, lo: int, hi: int,
                    batch_epochs: int = 20,
                    log: Optional[Callable[[str], None]] = None,
                    impl: str = "pallas", queue_depth: int = 4) -> RunStats:
    """Synthesize output epochs [lo, hi) of `scn` into `fp`.

    impl: "pallas" (fused kernel + on-device rebase; the TPU fast path),
    "xla" (pure jax.numpy kernel; correctness anchor, works everywhere),
    or "pallas-sharded" / "xla-sharded" (same kernels sharded over ALL
    local devices of a multi-chip host via parallel/shard.py — use
    --shard-dir/--multihost for multi-process scaling instead).

    queue_depth batches stay in flight with device->host copies started
    eagerly (copy_to_host_async), so synthesis, the readback link, and the
    file writes all overlap; the writer drains in order, preserving the
    reference's sequential byte stream.
    """
    if log is None:
        log = lambda s: print(s, end="", file=sys.stderr, flush=True)

    mesh = None
    if impl in ("pallas-sharded", "xla-sharded"):
        from gps_sdr_sim_tpu.parallel import auto_mesh

        mesh = auto_mesh()  # time-only mesh over all local devices
        impl = impl.split("-")[0]

    n = scn.iq_buff_size
    fmt = scn.config.data_format
    # Fast path: quantization + format packing fused into the kernel
    # epilogue (synth_staged_packed) — the device emits the final byte
    # stream; the host just slices each epoch's valid prefix.
    packed = (impl == "pallas" and mesh is None
              and synth_pallas.packed_supported(fmt))
    stats = RunStats()
    t_start = time.time()

    pending = deque()  # (device_array, valid_epochs, recompute), oldest first

    def flush(item):
        dev, valid, recompute = item
        t0 = time.time()
        # Blocks until device work + copy complete; transient device
        # errors (time-shared/tunneled chips) re-synthesize this batch.
        host = _fetch_with_retry(dev, recompute, log=log)
        t1 = time.time()
        if packed:
            from gps_sdr_sim_tpu.ops.quantize import words_to_bytes

            fp.write(np.ascontiguousarray(
                words_to_bytes(host[:valid], n, fmt)).data)
        else:
            fp.write(np.ascontiguousarray(host[:valid]).data)
        stats.fetch_seconds += t1 - t0
        stats.write_seconds += time.time() - t1

    items = list(iter_seg_batches(scn, lo, hi, batch_epochs))
    # Single-chip pallas path: one-batch-lookahead upload staging (the
    # upload of batch k+1 streams while the device computes batch k; see
    # synth_pallas.iter_staged for the ordering contract).
    staged_stream = None
    if impl == "pallas" and mesh is None:
        def _stage(item):
            seg, e, e1 = item
            return synth_pallas.stage_epochs(pad_epochs(
                plan_epochs(seg, e, e1, scn.delt), batch_epochs))

        staged_stream = synth_pallas.iter_staged(items, _stage)

    def compute(seg, e, e1):
        """Plan + synthesize + pack one batch (fresh; used for retry)."""
        if mesh is not None:
            if impl == "pallas":
                from gps_sdr_sim_tpu.parallel import synth_epochs_sharded

                eb = pad_epochs(plan_epochs(seg, e, e1, scn.delt),
                                batch_epochs)
                return pack(synth_epochs_sharded(eb, n, mesh), fmt)
            from gps_sdr_sim_tpu.parallel import synth_batch_sharded

            db = _pad_batch(plan_batch(seg, e, e1, n, scn.delt),
                            batch_epochs)
            return pack(synth_batch_sharded(db, n, mesh), fmt)
        if impl == "pallas":
            eb = pad_epochs(plan_epochs(seg, e, e1, scn.delt), batch_epochs)
            if packed:
                return synth_pallas.synth_staged_packed(
                    synth_pallas.stage_epochs(eb), n, fmt)
            return pack(synth_pallas.synth_epochs(eb, n), fmt)
        db = _pad_batch(plan_batch(seg, e, e1, n, scn.delt), batch_epochs)
        return pack(synth_jnp.synth_batch(db, n), fmt)

    for idx, (seg, e, e1) in enumerate(items):
        b = e1 - e
        t_plan = time.time()
        if staged_stream is not None:
            # Single-chip pallas hot path: consume the pre-staged upload.
            staged, _item = next(staged_stream)
            if packed:  # format packing fused into the kernel epilogue
                out = synth_pallas.synth_staged_packed(staged, n, fmt)
            else:
                out = pack(synth_pallas.synth_staged(staged, n), fmt)
        else:
            out = compute(seg, e, e1)
        try:
            out.copy_to_host_async()
        except AttributeError:
            pass
        stats.plan_seconds += time.time() - t_plan  # host plan + dispatch
        if len(pending) >= queue_depth:
            flush(pending.popleft())  # timed as fetch/write, not plan
        pending.append((out, b,
                        lambda seg=seg, e=e, e1=e1: compute(seg, e, e1)))
        stats.device_batches += 1
        stats.total_samples += b * n
        t_into = (seg.first_epoch + e1 - 1) * 0.1
        log(f"\rTime into run = {t_into:4.1f}")

    while pending:
        flush(pending.popleft())

    stats.wall_seconds = time.time() - t_start
    return stats


def run_simulation(scn: Scenario, fp: BinaryIO, batch_epochs: int = 20,
                   log: Optional[Callable[[str], None]] = None,
                   impl: str = "pallas", queue_depth: int = 4) -> RunStats:
    """Synthesize the whole scenario into `fp`. Returns throughput stats."""
    return run_epoch_range(scn, fp, 0, scn.n_output_epochs,
                           batch_epochs=batch_epochs, log=log, impl=impl,
                           queue_depth=queue_depth)
