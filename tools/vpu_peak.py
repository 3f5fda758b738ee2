"""Measure this chip's actually-delivered int32 VPU throughput.

The synthesis kernel (ops/synth_pallas.py) is pure int32 VPU work in a
(SLAB, 128) slab geometry: adds, shifts, masks, compares, and lane-indexed
dynamic gathers. bench.py's MFU-style utilization figure needs a *measured*
ceiling, not an assumed one (round-2 verdict) — this microbenchmark runs
Pallas kernels of exactly that shape and mix and reports sustained
ops/s:

  alu       : dependency-limited add/xor/shift chains with 8-way ILP —
              the practical VPU int32 ceiling for non-gather work.
  gather    : the same chains with one lane-indexed dynamic gather
              (jnp.take_along_axis, tpu.dynamic_gather) folded into each
              round — what the synthesis kernel's table lookups can
              sustain. The gap between the two is the gather cost.
  mix       : a 2:1 alu:gather blend approximating the synthesis kernel's
              measured op mix (~57 ops/chan-sample, 3 gathers).
  imul      : the chains with int32 vector MULTIPLIES folded in — int32
              multiply has no single-op VPU lowering (Mosaic emulates it
              multi-op); the marginal cost prices the kernel's 1023*M
              chip-wrap multiply and the hoisted r*step ramps.
  f32rt     : the chains with the kernel's M/nav-walk pattern folded in:
              i32->f32 convert, +0.5, *const, floor, f32->i32 convert.
              Nominally 5 ops; the marginal cost is what it really costs,
              pricing the int_m kernel variant (ops/synth_pallas.py).

Usage: python tools/vpu_peak.py [--json FILE] [--iters N]
Writes a JSON summary (default VPU_PEAK.json at the repo root) that
bench.py uses as the roofline denominator.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))

from gps_sdr_sim_tpu.utils.compcache import enable as enable_cache  # noqa: E402

enable_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

SLAB = 16  # rows per slab, the synthesis kernel's geometry (SUBBLOCK/128)
LANES = 128
N_ACC = 8  # independent chains per round: enough ILP to fill the pipeline


def _make_kernel(rounds: int, gathers_per_round: int, alu_per_round: int,
                 extra: str = "", extra_per_round: int = 0):
    """rounds x (N_ACC chains x [alu ops + gathers]) on a (SLAB,128) slab.

    Every chain starts from RUNTIME data (the seed input) and every op
    reads another live chain, so nothing is compile-time constant-foldable
    (a first draft seeded from iota and mixed in loop constants — Mosaic
    folded the whole loop to one op per chain and reported 100x over any
    plausible peak). Chains are mutually independent within a round (ILP);
    op counts per element per round: alu_per_round alu ops +
    gathers_per_round gathers + extra_per_round `extra` patterns
    ("imul" = one int32 vector multiply; "f32rt" = the synthesis kernel's
    convert/+0.5/*const/floor/convert period-count pattern).
    """

    def kernel(seed_ref, tbl_ref, o_ref):
        shape = (SLAB, LANES)
        tbl = jnp.broadcast_to(tbl_ref[0:1, :], shape)
        seed = seed_ref[:, :]
        acc = [seed + c for c in range(N_ACC)]

        def body(r, acc):
            acc = list(acc)
            # alternating add / xor-shift, each reading a neighboring
            # live chain: data-dependent, unfoldable, 1 op deep per
            # chain per step with N_ACC-way ILP across chains.
            for j in range(alu_per_round):
                c = j % N_ACC
                if (j // N_ACC) % 2 == 0:
                    acc[c] = acc[c] + acc[(c + 3) % N_ACC]
                else:
                    acc[c] = acc[c] ^ (acc[(c + 1) % N_ACC] >> 1)
            for j in range(gathers_per_round):
                c = (j + 1) % N_ACC
                g = jnp.take_along_axis(tbl, acc[c] & 127, axis=1)
                acc[c] = acc[c] + g
            for j in range(extra_per_round):
                c = (j + 5) % N_ACC
                if extra == "imul":
                    acc[c] = acc[c] * acc[(c + 3) % N_ACC]
                elif extra == "f32rt":
                    # The kernel's code-period-count pattern
                    # (ops/synth_pallas.py M computation / nav walk):
                    # masked to keep the f32 value exactly representable.
                    t = (acc[(c + 3) % N_ACC] & 0xFFFFF).astype(jnp.float32)
                    m = jnp.floor((t + 0.5) * np.float32(1.0 / 1023.0)
                                  ).astype(jnp.int32)
                    acc[c] = acc[c] + m
                else:
                    raise ValueError(extra)
            return tuple(acc)

        acc = jax.lax.fori_loop(0, rounds, body, tuple(acc))
        out = acc[0]
        for c in range(1, N_ACC):
            out = out ^ acc[c]
        o_ref[:, :] = out

    return kernel


def _run_case(name: str, tiles: int, rounds: int, gathers: int, alu: int,
              reps: int = 5, interpret: bool = False, extra: str = "",
              extra_per_round: int = 0) -> dict:
    kernel = _make_kernel(rounds, gathers, alu, extra, extra_per_round)
    tbl = np.arange(LANES, dtype=np.int32).reshape(1, LANES)
    rng = np.random.default_rng(7)
    seed = rng.integers(0, 1 << 20, size=(SLAB, LANES), dtype=np.int32)

    fn = pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((SLAB, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tiles * SLAB, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )
    # Force completion with a REAL value readback: behind this
    # environment's tunneled PJRT plugin, block_until_ready returns
    # before device completion (measured sub-launch-latency "walls"), so
    # the timed quantity is fn + a 1-int32 checksum fetch (~2 ms tunnel
    # latency, amortized by sizing the kernel to hundreds of ms).
    run = jax.jit(lambda s, x: jnp.sum(fn(s, x), dtype=jnp.int32))
    s, x = jnp.asarray(seed), jnp.asarray(tbl)
    int(np.asarray(run(s, x)))  # warmup/compile

    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        int(np.asarray(run(s, x)))
        best = min(best, time.perf_counter() - t0)
    elems = tiles * SLAB * LANES
    # Gathers counted as ONE op each; their real cost shows up as
    # (alu+g)/t_gather vs alu/t_alu.
    total_ops = elems * rounds * (alu + gathers)
    ops_s = total_ops / best
    print(f"{name:8s}: {best * 1e3:8.2f} ms  {ops_s / 1e12:6.3f} Tops/s "
          f"({alu} alu + {gathers} gather + {extra_per_round} {extra or '-'}"
          f" per round, {rounds} rounds, {tiles} tiles)", file=sys.stderr)
    return {"name": name, "wall_s": best, "teraops": ops_s / 1e12,
            "alu_per_round": alu, "gathers_per_round": gathers,
            "extra": extra, "extra_per_round": extra_per_round,
            "rounds": rounds, "tiles": tiles}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=str(_ROOT / "VPU_PEAK.json"))
    ap.add_argument("--tiles", type=int, default=2048)
    ap.add_argument("--rounds", type=int, default=2048)
    ns = ap.parse_args()

    if jax.default_backend() == "cpu":
        print("warning: running on CPU (interpret mode) — numbers are "
              "meaningless for the TPU roofline", file=sys.stderr)

    # Fold-detection self-check: quadrupling the rounds must grow the wall
    # time substantially, or the compiler simplified the chains away and
    # the numbers are meaningless (caught a first draft reporting
    # 700 Tops/s). The quarter-run also anchors a two-point fit that
    # removes the fixed overhead (launch + output write + ~2 ms tunnel
    # readback) from the reported peak.
    small = _run_case("alu/4", ns.tiles, ns.rounds // 4, gathers=0, alu=32)
    results = [
        _run_case("alu", ns.tiles, ns.rounds, gathers=0, alu=32),
        _run_case("gather", ns.tiles, ns.rounds, gathers=4, alu=32),
        _run_case("mix", ns.tiles, ns.rounds, gathers=2, alu=38),
        _run_case("imul", ns.tiles, ns.rounds, gathers=0, alu=32,
                  extra="imul", extra_per_round=4),
        _run_case("f32rt", ns.tiles, ns.rounds, gathers=0, alu=32,
                  extra="f32rt", extra_per_round=4),
    ]
    alu = next(r for r in results if r["name"] == "alu")
    gat = next(r for r in results if r["name"] == "gather")
    imul = next(r for r in results if r["name"] == "imul")
    f32rt = next(r for r in results if r["name"] == "f32rt")
    if alu["wall_s"] < 1.5 * small["wall_s"]:
        print("ERROR: wall time does not scale with rounds — the compiler "
              "folded the measurement kernel; numbers are invalid",
              file=sys.stderr)
        return 1
    elems = ns.tiles * SLAB * LANES
    slope = (alu["wall_s"] - small["wall_s"]) / (ns.rounds - ns.rounds // 4)
    peak = elems * 32 / slope  # fixed-overhead-free alu ops/s
    # Marginal cost of one dynamic_gather, in alu-op equivalents.
    g_cost = ((gat["wall_s"] - alu["wall_s"]) / (ns.rounds * 4)) * peak / elems
    # Same marginal pricing for one int32 vector multiply and for one
    # convert/+0.5/*const/floor/convert round trip (the kernel's M
    # pattern; includes one &0xFFFF mask op of harness overhead).
    m_cost = ((imul["wall_s"] - alu["wall_s"]) / (ns.rounds * 4)) \
        * peak / elems
    f_cost = ((f32rt["wall_s"] - alu["wall_s"]) / (ns.rounds * 4)) \
        * peak / elems
    print(f"slope-fit alu peak: {peak / 1e12:.3f} Tops/s; one gather costs "
          f"~{g_cost:.1f} alu-ops; one int32 multiply ~{m_cost:.1f}; one "
          f"f32 round-trip (convert/madd/floor/convert) ~{f_cost:.1f}",
          file=sys.stderr)
    out = {
        "device": str(jax.devices()[0]),
        "backend": jax.default_backend(),
        "measured_vpu_peak_teraops": round(peak / 1e12, 3),
        "gather_cost_alu_ops": round(g_cost, 2),
        "imul_cost_alu_ops": round(m_cost, 2),
        "f32_roundtrip_cost_alu_ops": round(f_cost, 2),
        "cases": results,
        "note": "sustained int32 VPU alu ops/s in the synthesis kernel's "
                "(16,128) slab geometry with 8-way ILP, two-point fit "
                "removing fixed launch/readback overhead; "
                "gather_cost_alu_ops is the measured marginal cost of one "
                "tpu.dynamic_gather in the same chains. The device is "
                "time-shared; values are best-of-5 per case.",
    }
    pathlib.Path(ns.json).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps({"measured_vpu_peak_teraops": out[
        "measured_vpu_peak_teraops"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
