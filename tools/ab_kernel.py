"""Interleaved same-window A/B for fused-kernel variants.

The tunneled device is time-shared and its delivered throughput drifts
minute-to-minute, so cross-subprocess comparisons (tools/profile_kernel.py)
carry window noise. This harness times two variants of the REAL production
kernel alternately in ONE process — same device window, same staged batch —
after first proving they produce identical bytes. An interleaved A/B here
is the measurement that demoted the v5 nav-mask-table gather (0.0406 s vs
0.0379 s for the window walk, 2026-08-19) and is the gate for flipping any
kernel-variant default.

Variants (ops/synth_pallas.py::_make_kernel):
  default     the production kernel as synth_staged_packed builds it
  int_m       exact integer code-period count M + chip wrap (no
              int<->float converts, no multiply-by-1023)
  int_nav     exact integer nav-walk bit index (floor(mg/20) via one
              small magic multiply instead of the f32 round trip)
  int_all     int_m + int_nav together: an f32-free kernel body
  nav_gather  the v5 per-epoch nav sign-mask-table gather
  mix         gain multiplied in the mix instead of premultiplied into
              the trig table (premult=False)
  wrap        legacy gather lowering with the negative-index wrap ops
              (nowrap=False) — the pre-2026-08-20 default, demoted after
              an interleaved A/B measured promise_in_bounds 2.2% faster
  tree        pairwise tree-reduced channel accumulation (bit-identical
              by int32 associativity; measured neutral 1.007x
              2026-08-20, AB_TREE_r04.json — default stays serial)

Usage: python tools/ab_kernel.py --b int_m [--a default] [--fmt 16]
           [--batch-epochs 400] [--passes 7] [--reps 3] [--json AB.json]
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

# int_nav=True became the DEFAULT in r5: with the order-alternating
# harness (see the rep loop), f32_nav measures 1.018/1.005/1.028 vs the
# int_nav default while the identity A/B scatters +-1% with no sign —
# a real ~1-2% win on top of the 2-op static saving. "f32_nav"
# re-enables the old f32 walk; "int_nav" is now an alias of default.
VARIANTS = ("default", "int_m", "int_nav", "f32_nav", "int_all",
            "nav_gather", "mix", "wrap", "tree")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", default="default", choices=VARIANTS)
    ap.add_argument("--b", required=True, choices=VARIANTS)
    ap.add_argument("--fmt", type=int, default=16, choices=(16, 8, 1))
    ap.add_argument("--batch-epochs", type=int, default=400)
    ap.add_argument("--passes", type=int, default=7)
    ap.add_argument("--reps", type=int, default=4,
                help="use an EVEN count: burst order alternates per rep to cancel window-warming bias")
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
                         static_xyz=xyz, duration=0.1 * (B + 2),
                         samp_freq=2.6e6)
    scn = build_scenario(cfg)
    seg = scn.segments[0]
    n = scn.iq_buff_size
    wire, ca, n_chan, premult, int_step = synth_pallas.stage_epochs(
        pad_epochs(plan_epochs(seg, 0, B, scn.delt), B))
    sub_blocks = -(-n // SUBBLOCK)
    tile, SBp = synth_pallas._aligned_tile(sub_blocks)
    div = synth_pallas.PACK_DIV[ns.fmt]

    def build(variant):
        kw = dict(uniform=True, tile_rows=tile, fmt=ns.fmt,
                  premult=premult and variant != "mix", int_step=int_step)
        if variant == "nav_gather":
            kw["tpe"] = SBp // tile
        if variant in ("int_m", "int_all"):
            kw["int_m"] = True
        if variant in ("int_nav", "int_all"):
            kw["int_nav"] = True
        if variant == "f32_nav":
            kw["int_nav"] = False
        if variant == "wrap":
            kw["nowrap"] = False
        if variant == "tree":
            kw["tree"] = True
        inner = synth_pallas._get_pallas_fn(n_chan, **kw)

        @jax.jit
        def run(wire, ca):
            params, _rows = synth_pallas._wire_to_params(
                wire, sub_blocks, align=True)
            extra = ((synth_pallas.nav_table_from_wire(wire),)
                     if variant == "nav_gather" else ())
            return inner(params, ca, *extra).reshape(
                wire.shape[0], SBp * SUBBLOCK // div)

        return run

    fns = {name: build(name) for name in dict.fromkeys((ns.a, ns.b))}

    # Bit-equality gate BEFORE timing: the variants must be the same
    # function or the comparison is meaningless.
    import jax.numpy as jnp

    words = {name: fn(wire, ca) for name, fn in fns.items()}
    sums = {}
    for name, w in words.items():
        s, z = checksum_packed(w, B, n, ns.fmt)
        sums[name] = (int(np.asarray(s)), int(np.asarray(z)))
    equal = bool(np.asarray(jnp.array_equal(words[ns.a], words[ns.b])))
    del words
    if not equal:
        print(f"MISMATCH: {ns.a}={sums[ns.a]} {ns.b}={sums[ns.b]}",
              file=sys.stderr)
        return 1

    def one_pass(fn):
        t0 = time.time()
        w = fn(wire, ca)
        s, _z = checksum_packed(w, B, n, ns.fmt)
        _ = int(np.asarray(s))  # data-dependent sync
        return time.time() - t0

    for fn in fns.values():  # warm both before the first timed pass
        one_pass(fn)

    reps = {name: [] for name in fns}
    order = list(fns.items())
    for rep in range(ns.reps):
        # Alternate the burst order per rep: a monotonically-warming
        # window otherwise hands the SECOND variant a systematic edge —
        # an identity A/B (two jit wrappers of the same kernel) measured
        # b_over_a 0.987 under the fixed order (AB harness audit,
        # 2026-08-20). With alternation the warm-trend bias cancels in
        # the per-variant best-of-reps.
        for name, fn in (order if rep % 2 == 0 else order[::-1]):
            best = min(one_pass(fn) for _ in range(ns.passes))
            reps[name].append(round(best, 5))
            print(f"rep{rep} {name}: {best:.4f} s", file=sys.stderr)

    best = {name: min(t) for name, t in reps.items()}
    out = {
        "metric": "kernel_variant_ab",
        "a": ns.a, "b": ns.b, "fmt": ns.fmt,
        "epochs": B, "samples": B * n, "n_chan": n_chan,
        "bit_equal": True, "checksum": sums[ns.a],
        "reps_s": reps,
        "best_s": {k: round(v, 5) for k, v in best.items()},
        "b_over_a": round(best[ns.b] / best[ns.a], 4),
        "backend": "cpu" if ns.cpu else jax.default_backend(),
    }
    if ns.json:
        pathlib.Path(ns.json).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
