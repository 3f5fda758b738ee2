"""Cost attribution for the fused synthesis kernel (ops/synth_pallas.py).

The axon PJRT plugin exposes no op-level trace viewer, so attribution is
measured the direct way: the REAL production kernel is timed against
variants with exactly one cost center stubbed out (the `ablate` parameter
of ops/synth_pallas._get_pallas_fn — same source, same shapes, same
schedule), so the timing delta IS that center's share of the kernel's
cycles.

Method (round 4): all variants are compiled in ONE process and timed
INTERLEAVED — rep r times every variant back-to-back before rep r+1 —
so every delta is a same-device-window comparison. The earlier subprocess
ablation (one process per variant, GPS_SDR_SIM_ABLATE env) measured each
variant in a different minutes-apart window of this time-shared device;
its per-gather deltas carried window noise larger than the effects
(PROFILE_r03 gather_additivity_check = 2.24). The interleaved design is
the same harness that adjudicated the v5 nav-gather variant
(tools/ab_kernel.py); the additivity check below is the self-test that
the noise is gone.

Centers measured (default window-walk kernel — two gathers + ALU):
  trig_gather : the per-(channel, sample) tpu.dynamic_gather of the
                quarter-folded packed sin|cos table
  ca_gather   : the per-(channel, sample) tpu.dynamic_gather of the
                bit-packed C/A chip word
  nav_walk    : the ~11-op ALU nav window walk (period count, bit index,
                window shift — the default nav-sign path; the opt-in
                GPS_SDR_SIM_NAV_GATHER mask-table variant measured ~7%
                slower end-to-end, see ops/synth_pallas.py::_make_kernel)
  alu         : everything else per chan-sample (ramps, chip wrap,
                sign composition, accumulate) = the no_gathers row
  epilogue    : per-SAMPLE format packing cost, from the fmt=8/1 deltas
                against fmt=16

Cross-checked against tools/vpu_peak.py (VPU_PEAK.json): the measured
standalone gather cost and delivered ALU rate convert each center's time
into ALU-op equivalents; tools/op_budget.py reconciles those against a
static op count of the compiled kernel. Workload contract:
/root/reference/gpssim.c:2190-2264.

Usage:  python tools/profile_kernel.py [--json PROFILE_r04.json]
        (run on the TPU; --cpu only smoke-tests the plumbing)
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

VARIANTS = {
    # name -> (ablate set, fmt)
    "full": ((), 16),
    "no_trig_gather": (("no_trig_gather",), 16),
    "no_ca_gather": (("no_ca_gather",), 16),
    "no_nav_walk": (("no_nav_walk",), 16),
    "no_gathers": (("no_trig_gather", "no_ca_gather"), 16),
    "full_sc08": ((), 8),
    "full_sc01": ((), 1),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-epochs", type=int, default=400)
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--json", default="")
    ns = ap.parse_args()

    from gps_sdr_sim_tpu.utils.compcache import enable as enable_cache

    enable_cache()
    import jax

    if ns.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from gps_sdr_sim_tpu.constants import R2D, SUBBLOCK
    from gps_sdr_sim_tpu.models.scenario import ScenarioConfig, build_scenario
    from gps_sdr_sim_tpu.ops import synth_pallas
    from gps_sdr_sim_tpu.ops.plan import pad_epochs, plan_epochs
    from gps_sdr_sim_tpu.ops.quantize import checksum_packed
    from gps_sdr_sim_tpu.utils.coord import llh2xyz

    B = ns.batch_epochs
    xyz = llh2xyz(np.array([35.681298 / R2D, 139.766247 / R2D, 10.0]))
    cfg = ScenarioConfig(nav_file=str(ROOT / "data" / "brdc3540.14n"),
                         static_xyz=xyz, duration=0.1 * (2 * B + 2),
                         samp_freq=2.6e6)
    scn = build_scenario(cfg)
    seg = scn.segments[0]
    n = scn.iq_buff_size
    wire, ca, n_chan, premult, int_step = synth_pallas.stage_epochs(
        pad_epochs(plan_epochs(seg, 0, B, scn.delt), B))
    sub_blocks = -(-n // SUBBLOCK)
    tile, SBp = synth_pallas._aligned_tile(sub_blocks)

    def build(ablate, fmt):
        inner = synth_pallas._get_pallas_fn(
            n_chan, uniform=True, tile_rows=tile, premult=premult,
            int_step=int_step, fmt=fmt, ablate=frozenset(ablate))
        div = synth_pallas.PACK_DIV[fmt]

        @jax.jit
        def run(wire, ca):
            params, _rows = synth_pallas._wire_to_params(
                wire, sub_blocks, align=True)
            return inner(params, ca).reshape(
                wire.shape[0], SBp * SUBBLOCK // div)

        def one_pass():
            t0 = time.time()
            w = run(wire, ca)
            s, _z = checksum_packed(w, B, n, fmt)
            _ = int(np.asarray(s))  # data-dependent sync
            return time.time() - t0

        return one_pass

    fns = {name: build(*spec) for name, spec in VARIANTS.items()}
    for name, fn in fns.items():  # compile + warm every variant first
        t = fn()
        print(f"warmup {name}: {t:.3f} s", file=sys.stderr)

    # Fixed-overhead separation: every one_pass above carries a constant
    # dispatch + tunnel-latency + checksum-sync cost on top of the
    # kernel's per-sample time (bench.py's pipelined passes measure the
    # same kernel ~1.6x faster than a single synchronous pass at B=400,
    # which is how the overhead was noticed). Timing the FULL kernel at
    # three batch sizes and fitting a line gives slope = true
    # ns/chan-sample and intercept = per-pass overhead; the single-size
    # ablation deltas below are differences of equal-overhead passes, so
    # they stay valid as deltas.
    def build_sized(epochs):
        eb = pad_epochs(plan_epochs(seg, 0, epochs, scn.delt), epochs)
        w2, ca2, nc2, pm2, is2 = synth_pallas.stage_epochs(eb)
        inner = synth_pallas._get_pallas_fn(
            nc2, uniform=True, tile_rows=tile, premult=pm2,
            int_step=is2, fmt=16, ablate=frozenset())

        @jax.jit
        def run2(w2, ca2):
            params, _rows = synth_pallas._wire_to_params(
                w2, sub_blocks, align=True)
            return inner(params, ca2).reshape(w2.shape[0], SBp * SUBBLOCK)

        def one_pass2():
            t0 = time.time()
            w = run2(w2, ca2)
            s, _z = checksum_packed(w, epochs, n, 16)
            _ = int(np.asarray(s))
            return time.time() - t0

        return one_pass2

    sizes = sorted({B // 4, B, 2 * B})
    sized = {e: build_sized(e) for e in sizes}
    for e, fn in sized.items():
        print(f"warmup full@B={e}: {fn():.3f} s", file=sys.stderr)
    size_best = {e: [] for e in sizes}
    for rep in range(ns.reps):
        for e, fn in sized.items():
            size_best[e].append(min(fn() for _ in range(ns.passes)))
    xs = np.array(sizes, dtype=np.float64) * n * n_chan
    ys = np.array([min(size_best[e]) for e in sizes])
    slope, intercept = np.polyfit(xs, ys, 1)
    overhead_ms = float(intercept) * 1e3
    slope_ns = float(slope) * 1e9
    print(f"slope fit: {slope_ns:.4f} ns/chan-sample kernel + "
          f"{overhead_ms:.1f} ms fixed per pass", file=sys.stderr)

    reps: dict = {name: [] for name in fns}
    for rep in range(ns.reps):
        for name, fn in fns.items():  # interleaved: same device window
            best = min(fn() for _ in range(ns.passes))
            reps[name].append(round(best, 5))
            print(f"rep{rep} {name}: {best:.4f} s", file=sys.stderr)

    samples = B * n
    cs = samples * n_chan
    rows = {name: {
        "variant": name, "fmt": VARIANTS[name][1],
        "best_s": min(t), "reps_s": t,
        "epochs": B, "samples": samples, "n_chan": n_chan,
        "chan_samples_per_s": cs / min(t),
        "samples_per_s": samples / min(t),
    } for name, t in reps.items()}

    t_full = rows["full"]["best_s"]
    t_trig = t_full - rows["no_trig_gather"]["best_s"]
    t_ca = t_full - rows["no_ca_gather"]["best_s"]
    t_nav = t_full - rows["no_nav_walk"]["best_s"]
    t_alu = rows["no_gathers"]["best_s"]

    peak = {}
    pk = ROOT / "VPU_PEAK.json"
    if pk.exists():
        peak = json.loads(pk.read_text())
    alu_rate = None
    for c in peak.get("cases", []):
        if c["name"] == "alu":
            alu_rate = c["teraops"] * 1e12

    def per_cs_ns(t):
        return t / cs * 1e9

    # One noise gate, used for BOTH the additivity ratio and the flag
    # (they previously disagreed when t_full - t_alu went negative):
    # rep-to-rep spread of the full kernel in THIS window. Any ablation
    # delta smaller than this is below the measurement's noise floor —
    # per-gather shares over such deltas are 0/0 and are REPORTED AS
    # None rather than as numbers. The static op budget
    # (tools/op_budget.py) is the primary attribution path once this
    # profiler saturates; see OPBUDGET_r*.json.
    noise = max(reps["full"]) - min(reps["full"])
    # Signed comparisons: a NEGATIVE joint-gather delta (no_gathers
    # slower than full — scheduling noise) is just as uninterpretable as
    # a tiny one, so any delta not positively above the noise floor
    # makes the per-gather attribution vacuous.
    vacuous = bool(t_full - t_alu < noise or max(t_trig, t_ca) < noise)
    if vacuous:
        print("NOTE: ablation deltas are BELOW the rep-to-rep noise "
              "floor in this window — per-gather shares are vacuous and "
              "reported as null; use tools/op_budget.py for attribution.",
              file=sys.stderr)
    breakdown = {
        "trig_gather_ns_per_chan_sample": (
            None if vacuous else round(per_cs_ns(t_trig), 4)),
        "ca_gather_ns_per_chan_sample": (
            None if vacuous else round(per_cs_ns(t_ca), 4)),
        "nav_walk_ns_per_chan_sample": (
            None if vacuous else round(per_cs_ns(t_nav), 4)),
        "alu_ns_per_chan_sample": round(per_cs_ns(t_alu), 4),
        "full_ns_per_chan_sample": round(per_cs_ns(t_full), 4),
        "gather_share_of_kernel": (
            None if vacuous else round((t_trig + t_ca) / t_full, 3)),
        # Self-test: the two single-gather deltas must sum to the joint
        # all-gathers delta. Near 1.0 = the interleaving removed the
        # window noise; PROFILE_r03's subprocess method scored 2.24 here.
        "gather_additivity_check": (
            None if vacuous
            else round((t_trig + t_ca) / max(t_full - t_alu, 1e-12), 3)),
        "noise_floor_ns_per_chan_sample": round(per_cs_ns(noise), 4),
        "additivity_vacuous_below_noise": vacuous,
        "gathers_total_ns_per_chan_sample": (
            None if vacuous else round(per_cs_ns(t_full - t_alu), 4)),
        "gathers_total_share_of_kernel": (
            None if vacuous else round((t_full - t_alu) / t_full, 3)),
    }
    if alu_rate:
        breakdown["alu_equiv_ops_per_chan_sample"] = round(
            t_alu / cs * alu_rate, 1)
        breakdown["full_equiv_ops_per_chan_sample"] = round(
            t_full / cs * alu_rate, 1)
        # Per-center equivalents inherit the vacuous gate: below the
        # noise floor the per-gather deltas carry no information.
        breakdown["trig_gather_equiv_alu_ops"] = (
            None if vacuous else round(t_trig / cs * alu_rate, 1))
        breakdown["ca_gather_equiv_alu_ops"] = (
            None if vacuous else round(t_ca / cs * alu_rate, 1))
        breakdown["nav_walk_equiv_alu_ops"] = (
            None if vacuous else round(t_nav / cs * alu_rate, 1))

    epilogue = {
        "sc08_extra_ns_per_sample": round(
            (rows["full_sc08"]["best_s"] - t_full) / samples * 1e9, 4),
        "sc01_extra_ns_per_sample": round(
            (rows["full_sc01"]["best_s"] - t_full) / samples * 1e9, 4),
    }

    overhead = {
        "batch_sizes_epochs": sizes,
        "best_s_per_size": {str(e): round(min(size_best[e]), 5)
                            for e in sizes},
        "kernel_slope_ns_per_chan_sample": round(slope_ns, 4),
        "fixed_overhead_ms_per_pass": round(overhead_ms, 2),
        "note": ("every single-pass time above includes the fixed "
                 "overhead; the slope is the true per-sample kernel "
                 "cost. Ablation deltas subtract equal overheads and "
                 "stay valid."),
    }
    if alu_rate:
        overhead["kernel_slope_equiv_alu_ops"] = round(
            slope_ns * 1e-9 * alu_rate, 1)

    out = {
        "metric": "kernel_cost_attribution",
        "overhead_separation": overhead,
        "method": ("interleaved same-window ablation: all variants "
                   "compiled in one process (explicit ablate= cache keys) "
                   "and timed alternately, best of passes x reps"),
        "backend": "cpu" if ns.cpu else "default",
        "rows": rows,
        "breakdown": breakdown,
        "epilogue": epilogue,
        "vpu_peak_ref": {k: peak.get(k) for k in
                         ("measured_vpu_peak_teraops",
                          "gather_cost_alu_ops")} if peak else None,
    }
    if ns.json:
        pathlib.Path(ns.json).write_text(json.dumps(out, indent=1))
    print(json.dumps({k: v for k, v in out.items() if k != "rows"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
