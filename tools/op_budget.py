"""Static op budget of the fused synthesis kernel (VERDICT r3 weak #1).

PROFILE_r03 measured the kernel's ALU body at ~113 peak-equivalent ops per
channel-sample while bench.py hand-counts the algorithm at 53 — a 2.1x gap
with no committed evidence of where the ops go. This tool produces that
evidence without an op-level trace viewer (the axon plugin has none):

1. Compile the PRODUCTION kernel with pl.pallas_call(debug=True), which
   prints the vector-dialect Mosaic MLIR at lowering time; capture it at
   the fd level (Mosaic prints from C++/MLIR, not Python print).
2. Count the vector ops (vector<NxMxi32> results) by class — adds, shifts,
   masks, int32 MULTIPLIES, f32 converts/floors, gathers, selects — and
   normalize per channel-sample (tile_rows x n_chan vector ops of slab
   shape per tile body).
3. Price each class with the MEASURED marginal costs from tools/
   vpu_peak.py (VPU_PEAK.json: imul_cost_alu_ops, f32_roundtrip_cost_alu_
   ops, gather_cost_alu_ops) and reconcile the predicted total against the
   interleaved profiler's measured full-kernel equivalents
   (tools/profile_kernel.py).

The same dump for the int_m kernel variant (exact integer period count —
no converts, no multiply-by-1023) shows what that variant removes; the
adoption decision is made by tools/ab_kernel.py measurement, not here.

Usage:  python tools/op_budget.py [--json OPBUDGET_r04.json]
            [--dump-dir DIR]      (run on the TPU; CPU has no Mosaic path)
Workload contract: /root/reference/gpssim.c:2190-2264.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import re
import sys
import tempfile

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

# Vector-op classes and their MLIR spellings (Mosaic input dialect).
CLASSES = {
    "add_sub": r"arith\.(addi|subi)",
    "imul": r"arith\.muli",
    "shift": r"arith\.(shli|shrsi|shrui)",
    "bitwise": r"arith\.(andi|ori|xori)",
    "cmp": r"arith\.cmpi",
    "select": r"arith\.select",
    "i2f": r"arith\.sitofp",
    "f2i": r"arith\.fptosi",
    "f32_arith": r"arith\.(addf|mulf|subf)",
    "floor": r"(math\.floor|vector\.floor|tpu\.floor)",
    "gather": r"tpu\.dynamic_gather",
    "broadcast": r"(vector\.broadcast|tpu\.broadcast)",
    "iota": r"(vector\.iota|tpu\.iota)",
    "load_store": r"(vector\.load|vector\.store|tpu\.load|tpu\.store|"
                  r"memref\.load|memref\.store)",
}
_VEC_RE = re.compile(r"vector<\d+x\d+x")


def _capture_fds(fn):
    """Run fn() with OS-level fd 1/2 redirected; return (result, text)."""
    with tempfile.TemporaryFile(mode="w+b") as tmp:
        saved = [os.dup(1), os.dup(2)]
        try:
            sys.stdout.flush()
            sys.stderr.flush()
            os.dup2(tmp.fileno(), 1)
            os.dup2(tmp.fileno(), 2)
            result = fn()
        finally:
            sys.stdout.flush()
            sys.stderr.flush()
            os.dup2(saved[0], 1)
            os.dup2(saved[1], 2)
            os.close(saved[0])
            os.close(saved[1])
        tmp.seek(0)
        return result, tmp.read().decode("utf-8", errors="replace")


def _count(mlir: str) -> dict:
    """Per-class counts of vector-shaped (slab) ops in the kernel module.

    A line counts as a vector op iff it both names the op and carries a
    vector<RxLx...> type; scalar arith on SMEM params stays out (it runs
    on the scalar core concurrently with the VPU)."""
    counts = {k: 0 for k in CLASSES}
    scalar = {k: 0 for k in CLASSES}
    for line in mlir.splitlines():
        for name, pat in CLASSES.items():
            if re.search(pat, line):
                if _VEC_RE.search(line):
                    counts[name] += 1
                else:
                    scalar[name] += 1
                break
    counts["vector_total"] = sum(counts[k] for k in CLASSES)
    counts["scalar_total"] = sum(scalar.values())
    return counts


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="")
    ap.add_argument("--dump-dir", default="",
                    help="also save the raw captured MLIR per variant")
    ap.add_argument("--batch-epochs", type=int, default=8)
    ns = ap.parse_args()

    from gps_sdr_sim_tpu.utils.compcache import enable as enable_cache

    enable_cache()
    import jax
    import numpy as np

    from gps_sdr_sim_tpu.constants import R2D, SUBBLOCK
    from gps_sdr_sim_tpu.models.scenario import ScenarioConfig, build_scenario
    from gps_sdr_sim_tpu.ops import synth_pallas
    from gps_sdr_sim_tpu.ops.plan import pad_epochs, plan_epochs
    from gps_sdr_sim_tpu.utils.coord import llh2xyz

    if jax.default_backend() == "cpu":
        print("op_budget needs the TPU lowering path (Mosaic); the CPU "
              "interpreter emits no MLIR", file=sys.stderr)
        return 1

    B = ns.batch_epochs
    xyz = llh2xyz(np.array([35.681298 / R2D, 139.766247 / R2D, 10.0]))
    cfg = ScenarioConfig(nav_file=str(ROOT / "data" / "brdc3540.14n"),
                         static_xyz=xyz, duration=0.1 * (B + 2),
                         samp_freq=2.6e6)
    scn = build_scenario(cfg)
    seg = scn.segments[0]
    n = scn.iq_buff_size
    wire, ca, n_chan, premult, int_step = synth_pallas.stage_epochs(
        pad_epochs(plan_epochs(seg, 0, B, scn.delt), B))
    sub_blocks = -(-n // SUBBLOCK)
    tile, SBp = synth_pallas._aligned_tile(sub_blocks)

    def lower(int_m, fmt=16):
        inner = synth_pallas._get_pallas_fn(
            n_chan, uniform=True, tile_rows=tile, premult=premult,
            int_step=int_step, fmt=fmt, int_m=int_m,
            ablate=frozenset(), debug=True)

        def trigger():
            params, _rows = synth_pallas._wire_to_params(
                wire, sub_blocks, align=True)
            out = inner(params, ca)
            out.block_until_ready()
            return out

        _, text = _capture_fds(trigger)
        return text

    variants = {}
    # sc08/sc01: the same hot loop with the denser format-packing
    # epilogues — static budgets for every shipped format (round-4
    # verdict #7), so epilogue cost differences are attributable without
    # the saturated timing profiler.
    for name, int_m, fmt in (("default", False, 16), ("int_m", True, 16),
                             ("sc08", False, 8), ("sc01", False, 1)):
        text = lower(int_m, fmt)
        if "dynamic_gather" not in text:
            print(f"{name}: no Mosaic MLIR captured ({len(text)} bytes) — "
                  "is debug=True plumbed and the backend TPU?",
                  file=sys.stderr)
            return 1
        if ns.dump_dir:
            d = pathlib.Path(ns.dump_dir)
            d.mkdir(parents=True, exist_ok=True)
            (d / f"mosaic_{name}.mlir").write_text(text)
        counts = _count(text)
        denom = tile * n_chan  # slab-shaped ops per (row, channel) body
        per_cs = {k: round(v / denom, 2) for k, v in counts.items()}
        variants[name] = {"counts": counts, "per_chan_sample": per_cs}
        print(f"{name}: {counts['vector_total']} vector ops "
              f"({per_cs['vector_total']}/chan-sample), "
              f"{counts['imul']} imul, {counts['i2f'] + counts['f2i']} "
              f"converts, {counts['floor']} floors, "
              f"{counts['gather']} gathers", file=sys.stderr)

    # Price the default variant's classes with measured costs.
    peak = {}
    pk = ROOT / "VPU_PEAK.json"
    if pk.exists():
        peak = json.loads(pk.read_text())
    pricing = None
    if peak.get("imul_cost_alu_ops") is not None:
        c = variants["default"]["per_chan_sample"]
        g_cost = peak.get("gather_cost_alu_ops", 42.0)
        imul_cost = peak["imul_cost_alu_ops"]
        # f32 round-trip was priced as a whole 5-op pattern incl. one mask
        # op of harness overhead; per-op residual = (pattern - 5)/4 extra
        # on each of convert/convert/floor/f32-arith beyond 1.
        f32_ops = c["i2f"] + c["f2i"] + c["floor"] + c["f32_arith"]
        patterns = (c["i2f"] + c["f2i"]) / 2 or f32_ops / 4
        f32_extra = max(
            peak["f32_roundtrip_cost_alu_ops"] - 5.0 - 1.0, 0.0)
        simple = (c["vector_total"] - c["imul"] - c["gather"] - f32_ops)
        predicted = (simple
                     + c["imul"] * imul_cost
                     + f32_ops + patterns * f32_extra
                     + c["gather"] * g_cost)
        pricing = {
            "simple_int_ops": round(simple, 2),
            "imul_ops": c["imul"],
            "imul_cost_alu_ops": imul_cost,
            "f32_ops": round(f32_ops, 2),
            "f32_pattern_extra_alu_ops": round(f32_extra, 2),
            "gathers": c["gather"],
            "gather_cost_alu_ops": g_cost,
            "predicted_equiv_ops_per_chan_sample": round(predicted, 1),
            "note": "gathers priced at their STANDALONE cost; in-kernel "
                    "their marginal cost is lower (latency hides under "
                    "ALU chains — PROFILE gathers_total_share), so this "
                    "is an upper bound.",
        }

    out = {
        "metric": "kernel_static_op_budget",
        "geometry": {"n_chan": n_chan, "tile_rows": tile,
                     "sub_blocks_padded": SBp, "premult": bool(premult),
                     "int_step": bool(int_step), "fmt": 16},
        "method": ("pl.pallas_call(debug=True) Mosaic MLIR capture; "
                   "vector-shaped op lines counted per class and "
                   "normalized by tile_rows x n_chan"),
        "variants": variants,
        "pricing_vs_measured": pricing,
        "hand_count_ref": "bench.py _OPS_PER_CHAN_SAMPLE",
    }
    if ns.json:
        pathlib.Path(ns.json).write_text(json.dumps(out, indent=1))
    print(json.dumps({
        "default_vector_ops_per_chan_sample":
            variants["default"]["per_chan_sample"]["vector_total"],
        "int_m_vector_ops_per_chan_sample":
            variants["int_m"]["per_chan_sample"]["vector_total"],
        "sc08_vector_ops_per_chan_sample":
            variants["sc08"]["per_chan_sample"]["vector_total"],
        "sc01_vector_ops_per_chan_sample":
            variants["sc01"]["per_chan_sample"]["vector_total"],
        "predicted_equiv_ops_per_chan_sample":
            pricing and pricing["predicted_equiv_ops_per_chan_sample"],
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
