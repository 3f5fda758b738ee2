"""Full-day (86,400 s) static run — the reference's maximum duration
(gpssim.h:24, duration check gpssim.c:1869-1874) executed end-to-end.

The run exercises the long-context design at full scale: 864,000 epochs /
2.25e11 samples at 2.6 Msps, planned LAZILY (models.scenario.
build_scenario_streaming keeps host memory at one 30 s segment instead of
~700 MB of materialized plan state) while the TPU synthesizes
device-materialized batches with per-batch checksums + nonzero counts.
Sampled epoch blocks are read back and saved so a separately-run C oracle
pass (--phase oracle, ~5.5 h of single-core C at 2.6 Msps) can diff them.

Phases (the sampled block list is deterministic from the scenario config,
so synth and oracle are fully independent and can run CONCURRENTLY — the
synth phase is device/transfer-bound and leaves the CPU core to the
~5.5 h single-threaded C oracle):
  synth   : plan + synthesize the full day on the default backend; saves
            sampled blocks to --blocks-file and stats to --json.
  oracle  : stream the C reference's stdout through the block sampler
            (tools/deepcheck.py machinery) and save ITS sampled blocks
            to --oracle-blocks-file.
  diff    : compare the two block files, merge the result into --json.

Usage:
  python tools/dayrun.py --phase synth  --json DAYRUN_r03.json &
  python tools/dayrun.py --phase oracle &
  wait; python tools/dayrun.py --phase diff --json DAYRUN_r03.json
"""

from __future__ import annotations

import argparse
import datetime
import hashlib
import json
import pathlib
import resource
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))

LOC = "35.681298,139.766247,10.0"


def _cfg(ns):
    from gps_sdr_sim_tpu.constants import R2D
    from gps_sdr_sim_tpu.models.scenario import ScenarioConfig
    from gps_sdr_sim_tpu.utils.coord import llh2xyz

    lat, lon, hgt = (float(v) for v in LOC.split(","))
    return ScenarioConfig(
        nav_file=str(ROOT / "data" / "brdc3540.14n"),
        samp_freq=ns.samp_freq, duration=ns.duration,
        static_xyz=llh2xyz(np.array([lat / R2D, lon / R2D, hgt])))


def phase_synth(ns) -> int:
    import queue
    import threading

    from gps_sdr_sim_tpu.utils.compcache import enable as enable_cache

    enable_cache()
    import jax
    import jax.numpy as jnp

    from deepcheck import pick_blocks
    from gps_sdr_sim_tpu.models.scenario import build_scenario_streaming
    from gps_sdr_sim_tpu.ops import synth_pallas
    from gps_sdr_sim_tpu.ops.plan import pad_epochs, plan_epochs
    from gps_sdr_sim_tpu.ops.quantize import checksum_packed, words_to_bytes
    from gps_sdr_sim_tpu.runner import _fetch_with_retry, iter_segment_batches

    t0 = time.time()
    scn, engine = build_scenario_streaming(_cfg(ns))
    n = scn.iq_buff_size
    B = ns.batch_epochs
    total = scn.n_output_epochs
    print(f"day run: {total} epochs, {scn.total_samples:,} samples, "
          f"streaming-planned", file=sys.stderr)

    blocks = pick_blocks(scn, ns.block_epochs, ns.filler_blocks)
    print(f"sampling {len(blocks)} oracle blocks", file=sys.stderr)
    sampled: dict = {}

    # ---- Kernel-signature warmup (off the timed region) ----
    # The channel count varies over the day (satellite rise/set), and each
    # distinct (n_chan, premult) pair is a separate Mosaic kernel: compiled
    # lazily mid-run, each cold compile is a 20-60 s pipeline stall through
    # the remote compile service (the r05 first day run lost ~160 s to
    # these). A throwaway engine pass (~18 s host at the vectorized
    # planner's rate) collects the EXACT signature set; compiling them up
    # front is a few seconds warm via .jax_cache, one-time cost cold.
    t_warm = time.time()
    # The signature set is deterministic from the scenario config, so a
    # tiny disk cache (keyed by nav-file digest + scenario knobs) lets
    # repeat runs skip the throwaway engine pass entirely.
    sig_key = hashlib.sha256(json.dumps([
        hashlib.sha256(pathlib.Path(
            ROOT / "data" / "brdc3540.14n").read_bytes()).hexdigest(),
        LOC, ns.duration, ns.samp_freq, ns.fmt]).encode()).hexdigest()[:16]
    sig_cache = ROOT / ".jax_cache" / f"dayrun_sigs_{sig_key}.json"
    if sig_cache.exists():
        sigs = {tuple(s) for s in json.loads(sig_cache.read_text())}
        eb = plan_epochs(next(
            build_scenario_streaming(_cfg(ns))[1].iter_run()), 0, 1,
            scn.delt)
    else:
        sigs = set()
        warm_engine = build_scenario_streaming(_cfg(ns))[1]
        for wseg in warm_engine.iter_run():
            # Full-segment plan: premult is decided per batch from the
            # max gain; real batches are segment-aligned at the default B.
            eb = plan_epochs(wseg, 0, wseg.n_epochs, scn.delt)
            sigs.add((eb.n_chan, synth_pallas.premult_ok(eb.gain),
                      bool(np.any(eb.code_s >> 56))))
        sig_cache.parent.mkdir(exist_ok=True)
        sig_cache.write_text(json.dumps(sorted(sigs)))
    from gps_sdr_sim_tpu.ops.synth_pallas import _ca_device, _get_epoch_fn
    sub_blocks = -(-n // synth_pallas.SUBBLOCK)
    dummy_wire = jnp.zeros((B, eb.t0.shape[1], 12), dtype=jnp.int32)
    dummy_ca = _ca_device(np.zeros_like(eb.ca_words))
    for n_chan, premult, int_step in sorted(sigs):
        fn = _get_epoch_fn(max(n_chan, 1), sub_blocks, n, premult,
                           int_step, ns.fmt, synth_pallas.nav_gather_enabled())
        fn(dummy_wire, dummy_ca).block_until_ready()
    warm_s = time.time() - t_warm
    print(f"warmed {len(sigs)} kernel signatures in {warm_s:.1f} s",
          file=sys.stderr)

    plan_s = 0.0
    sums = []
    nz_min = 1 << 62
    batches = 0
    timeline = []  # one row per checksum drain: interval throughput

    def _stage(item):
        nonlocal plan_s
        seg, e0, e1 = item
        t = time.time()
        staged = synth_pallas.stage_epochs(
            pad_epochs(plan_epochs(seg, e0, e1, scn.delt), B))
        plan_s += time.time() - t
        return staged

    # Planning runs on a BACKGROUND thread feeding a bounded queue: on a
    # single core it cannot add CPU, but whenever the main thread blocks
    # with the GIL released — the bulk checksum drain (device sync) and
    # the ~20 s of sampled-block readbacks over the 35 MB/s tunnel — the
    # planner keeps producing, so plan time hides under device/transfer
    # waits instead of serializing with them (DAYRUN_r04's 127 s plan_s
    # was 26% of wall; post-vectorization it is ~20 s and overlapped).
    q: queue.Queue = queue.Queue(maxsize=3)
    plan_err = []

    def _producer():
        nonlocal plan_s
        try:
            it = iter_segment_batches(engine.iter_run(), 0, total, B)
            while True:
                t = time.time()  # segment planning happens inside next()
                item = next(it, None)
                plan_s += time.time() - t
                if item is None:
                    break
                q.put((_stage(item), item))
        except BaseException as ex:  # surfaced on the main thread
            plan_err.append(ex)
        finally:
            q.put(None)

    t_run = time.time()
    t_last, e_last = t_run, 0
    threading.Thread(target=_producer, daemon=True).start()

    drain_every = max(1, ns.drain_epochs // B)  # batches between syncs
    pending_sums = []  # device scalars; drained in bulk

    # Sampled-block readbacks drain on a dedicated collector thread: the
    # D2H tunnel swings 0.3-35 MB/s, so a ~21 MB block can take up to a
    # minute — np.asarray releases the GIL, and the main loop keeps
    # dispatching while the collector waits. Results are keyed by a
    # sequence number so block parts reassemble in epoch order.
    fetch_q: queue.Queue = queue.Queue()
    fetched: dict = {}
    fetch_err = []

    def _collector():
        try:
            while True:
                item = fetch_q.get()
                if item is None:
                    return
                seqno, blo, sl, recompute = item
                host = _fetch_with_retry(sl, recompute)
                by = words_to_bytes(host, n, ns.fmt)
                fetched[seqno] = (blo, bytes(np.ascontiguousarray(by)))
        except BaseException as ex:
            fetch_err.append(ex)

    collector = threading.Thread(target=_collector, daemon=True)
    collector.start()
    fetch_seq = 0

    while True:
        got = q.get()
        if got is None:
            if plan_err:
                raise plan_err[0]
            break
        staged, (seg, e0, e1) = got
        words = synth_pallas.synth_staged_packed(staged, n, ns.fmt)
        s, z = checksum_packed(words, e1 - e0, n, ns.fmt)
        pending_sums.append((s, z))
        out_lo = seg.first_epoch - 1 + e0
        out_hi = seg.first_epoch - 1 + e1
        for blo, bhi in blocks:
            a, b = max(blo, out_lo), min(bhi, out_hi)
            if a < b:  # start this batch's slice of a sampled block
                # Slice epoch rows ON DEVICE before the fetch: the tunnel
                # runs at ~35 MB/s, so pulling the whole ~100 MB batch per
                # block (33 blocks over a day) would cost ~28 h of
                # readback vs ~10 MB/block sliced. The copy starts ASYNC
                # and is collected at the next drain, overlapping the
                # transfer with device compute of the following batches.
                lo_r, hi_r = a - out_lo, b - out_lo
                sl = words[lo_r:hi_r]
                try:
                    sl.copy_to_host_async()
                except Exception:
                    pass  # backends without async D2H fetch at collect
                fetch_q.put((
                    fetch_seq, blo, sl,
                    lambda lo_r=lo_r, hi_r=hi_r, seg=seg, e0=e0, e1=e1:
                    synth_pallas.synth_staged_packed(
                        _stage((seg, e0, e1)), n, ns.fmt)[lo_r:hi_r]))
                fetch_seq += 1
        batches += 1
        if batches % drain_every == 0:
            # Drain checksums in ONE transfer: forces device sync, which
            # bounds in-flight batch buffers (each ~B*n*4 B of HBM) while
            # keeping the dispatch pipeline drain_epochs epochs deep.
            drained = np.asarray(jnp.stack(
                [jnp.stack(p) for p in pending_sums]))
            sums.extend(int(v) for v in drained[:, 0])
            nz_min = min(nz_min, int(drained[:, 1].min()))
            pending_sums.clear()
            done = out_hi / total
            now = time.time()
            # Per-interval throughput row (epochs + wall since the
            # previous drain) — attributes sustained-vs-headline gaps
            # to device weather (slow intervals) vs pipeline structure
            # (uniformly low rate).
            timeline.append({
                "t_s": round(now - t_run, 1),
                "epochs_done": out_hi,
                "interval_gsps": round(
                    (out_hi - e_last) * n / max(now - t_last, 1e-9) / 1e9,
                    3),
            })
            t_last, e_last = now, out_hi
            rate = out_hi * n / (now - t_run)
            print(f"\r{done * 100:5.1f}%  {rate / 1e9:.2f} Gsamples/s  "
                  f"plan {plan_s:.0f} s", end="", file=sys.stderr)
    fetch_q.put(None)
    collector.join()
    if fetch_err:
        raise fetch_err[0]
    for seqno in sorted(fetched):
        blo, by = fetched[seqno]
        sampled.setdefault(blo, []).append(by)
    if pending_sums:
        drained = np.asarray(jnp.stack([jnp.stack(p) for p in pending_sums]))
        sums.extend(int(v) for v in drained[:, 0])
        nz_min = min(nz_min, int(drained[:, 1].min()))
    wall = time.time() - t_run
    print(file=sys.stderr)

    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    csum = int(np.asarray(jnp.sum(jnp.asarray(sums, dtype=jnp.int32))))
    # Durable record of the sampled blocks: the npz files are too large to
    # commit (~0.5 GB), so the committed artifact carries a sha256 per
    # block — the on-disk file is verifiable against the artifact.
    block_sha = {
        str(lo): hashlib.sha256(b"".join(parts)).hexdigest()
        for lo, parts in sampled.items()}
    rates = sorted(r["interval_gsps"] for r in timeline) or [0.0]
    stats = {
        "metric": "day_run_86400s",
        "started_utc": datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds"),
        "duration_s": ns.duration, "samp_freq": ns.samp_freq,
        "fmt": ns.fmt, "epochs": total,
        "total_samples": scn.total_samples,
        "wall_s": round(wall, 1),
        "build_s": round(t_run - t0 - warm_s, 2),
        "warm_s": round(warm_s, 1),
        "kernel_signatures": sorted(sigs),
        "batch_epochs": B,
        "drain_epochs": ns.drain_epochs,
        "plan_s": round(plan_s, 1),
        "plan_overlapped": True,  # planner thread; plan_s hides in waits
        "plan_epochs_per_s": round(total / max(plan_s, 1e-9), 1),
        "realtime_factor": round(ns.duration / wall, 1),
        "samples_per_s": round(scn.total_samples / wall / 1e9, 3),
        "peak_rss_mb": round(rss_mb, 1),
        "checksum_wrapped_int32": csum,
        "min_batch_nonzero": nz_min,
        "all_batches_nonzero": nz_min > 0,
        "sampled_blocks": [[lo, hi] for lo, hi in blocks],
        "blocks_file": str(ns.blocks_file),
        "block_sha256": block_sha,
        "interval_gsps_min": rates[0],
        "interval_gsps_median": rates[len(rates) // 2],
        "interval_gsps_max": rates[-1],
        "throughput_timeline": timeline,
        "oracle": "pending (run --phase oracle)",
    }
    np.savez_compressed(
        ns.blocks_file,
        **{f"b{lo}": np.frombuffer(b"".join(parts), np.uint8)
           for lo, parts in sampled.items()})
    pathlib.Path(ns.json).write_text(json.dumps(stats, indent=1))
    print(json.dumps({k: v for k, v in stats.items()
                      if k != "sampled_blocks"}))
    return 0


def _blocks_for(ns):
    """The deterministic sampled-block list + geometry, CPU-side only.

    Both phases derive the SAME list from the scenario config alone, so
    the oracle stream can run concurrently with the synth phase.
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    from deepcheck import pick_blocks
    from gps_sdr_sim_tpu.models.scenario import build_scenario_streaming

    scn, _engine = build_scenario_streaming(_cfg(ns))
    blocks = pick_blocks(scn, ns.block_epochs, ns.filler_blocks)
    return scn, blocks


def phase_oracle(ns) -> int:
    import tempfile

    from deepcheck import build_oracle, stream_sample

    scn, blocks = _blocks_for(ns)
    n = scn.iq_buff_size
    bpe = {16: n * 4, 8: n * 2, 1: n // 4}[ns.fmt]
    total_bytes = scn.n_output_epochs * bpe
    ranges_bytes = [(lo * bpe, hi * bpe) for lo, hi in blocks]

    with tempfile.TemporaryDirectory() as td:
        oracle = build_oracle(pathlib.Path(td))
        t0 = time.time()
        kept = stream_sample(
            [str(oracle), "-e", str(ROOT / "data" / "brdc3540.14n"),
             "-l", LOC, "-d", str(ns.duration),
             "-s", str(int(ns.samp_freq)), "-b", str(ns.fmt), "-o", "-"],
            ranges_bytes, total_bytes)
        oracle_s = time.time() - t0
    print(f"oracle run: {oracle_s:.0f} s", file=sys.stderr)
    np.savez_compressed(
        ns.oracle_blocks_file,
        oracle_wall_s=np.float64(oracle_s),
        **{f"b{lo}": np.frombuffer(bytes(kept[blo]), np.uint8)
           for (lo, _hi), (blo, _bhi) in zip(blocks, ranges_bytes)})
    return 0


def phase_diff(ns) -> int:
    _scn, blocks = _blocks_for(ns)
    stats = json.loads(pathlib.Path(ns.json).read_text())
    assert [list(b) for b in blocks] == stats["sampled_blocks"], \
        "synth ran with different block geometry"
    ours = np.load(ns.blocks_file)
    ref = np.load(ns.oracle_blocks_file)
    oracle_s = float(ref["oracle_wall_s"])

    view = {16: np.int16, 8: np.int8, 1: np.uint8}[ns.fmt]
    report = []
    worst = {"frac": 0.0, "max": 0, "big": 0, "straddles": 0, "vals": 0}
    for lo, hi in blocks:
        a = ours[f"b{lo}"].view(view).astype(np.int32)
        b = ref[f"b{lo}"].view(view).astype(np.int32)
        assert a.size == b.size, (lo, hi, a.size, b.size)
        d = np.abs(a - b)
        frac = float(np.count_nonzero(d) / d.size)
        big_idx = np.where(d > 8)[0]
        # Chip-edge straddles: the planner computes the f64 code phase in
        # closed form while the C hot loop accumulates it per sample
        # (gpssim.c:2190-2264); a sample landing within ~1 ULP of a C/A
        # chip boundary can pick the opposite chip for ONE channel at ONE
        # sample — a large isolated |Δ| on that sample's I and Q only.
        # Classify: an event is a straddle iff all its >8 deltas live in
        # a single complex sample AND both neighbor samples match clean.
        straddle, hard = 0, 0
        for s in sorted({int(i) // 2 for i in big_idx}):
            ev = d[max(0, 2 * s - 2):2 * s + 4]
            if ev[:2].max(initial=0) <= 8 and ev[4:].max(initial=0) <= 8 \
                    and ev.size >= 4:
                straddle += 1
            else:
                hard += 1
        entry = {"epochs": [lo, hi], "t_start_s": round(lo * 0.1, 1),
                 "mismatch_fraction": round(frac, 8),
                 "max_delta": int(d.max(initial=0)),
                 "chip_straddles": straddle, "hard_mismatches": hard}
        report.append(entry)
        worst["frac"] = max(worst["frac"], frac)
        worst["max"] = max(worst["max"], entry["max_delta"])
        worst["straddles"] += straddle
        worst["big"] += hard
        worst["vals"] += d.size
        print(json.dumps(entry), file=sys.stderr)

    # Pass = NCO-noise fraction within budget, zero non-straddle bigs,
    # straddle rate below 1e-6 of compared complex samples (observed rate
    # is ~1 per 5e7; a cluster or drift fails the isolation test above).
    ok = (worst["frac"] <= 1e-4 and worst["big"] == 0
          and worst["straddles"] <= max(2, int(worst["vals"] / 2e6)))
    stats["oracle"] = {
        "oracle_wall_s": round(oracle_s, 1),
        "oracle_blocks_file": str(ns.oracle_blocks_file),
        "oracle_block_sha256": {
            str(lo): hashlib.sha256(ref[f"b{lo}"].tobytes()).hexdigest()
            for lo, _hi in blocks},
        "worst_mismatch_fraction": worst["frac"],
        "worst_max_delta": worst["max"],
        "chip_straddles": worst["straddles"],
        "hard_mismatches": worst["big"],
        "compared_values": worst["vals"],
        "pass": ok, "detail": report,
    }
    pathlib.Path(ns.json).write_text(json.dumps(stats, indent=1))
    print(json.dumps({"oracle_pass": ok, **{k: v for k, v in
                      stats["oracle"].items() if k != "detail"}}))
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="synth",
                    choices=("synth", "oracle", "diff"))
    ap.add_argument("--duration", type=float, default=86400.0)
    ap.add_argument("--samp-freq", type=float, default=2.6e6)
    ap.add_argument("--fmt", type=int, default=16, choices=(16, 8, 1))
    # 300-epoch batches align exactly with the engine's 30 s segments
    # (boundaries land every 300 epochs on whole-minute starts), so no
    # batch carries pad epochs — at 200 every segment split into a 200 +
    # a 100-padded-to-200 batch, wasting 1/3 of device work. The drain
    # cadence is in EPOCHS so the HBM bound (~drain_epochs*n*4 B of
    # in-flight output) and timeline granularity are batch-size-invariant.
    ap.add_argument("--batch-epochs", type=int, default=300)
    ap.add_argument("--drain-epochs", type=int, default=2000)
    ap.add_argument("--block-epochs", type=int, default=20)
    ap.add_argument("--filler-blocks", type=int, default=8)
    ap.add_argument("--json", default=str(ROOT / "DAYRUN_r03.json"))
    ap.add_argument("--blocks-file",
                    default=str(ROOT / ".dayrun_blocks.npz"))
    ap.add_argument("--oracle-blocks-file",
                    default=str(ROOT / ".dayrun_oracle_blocks.npz"))
    ns = ap.parse_args()
    return {"synth": phase_synth, "oracle": phase_oracle,
            "diff": phase_diff}[ns.phase](ns)


if __name__ == "__main__":
    raise SystemExit(main())
