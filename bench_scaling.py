"""Scaling sweep: sharded synthesis throughput over growing device meshes.

Measures samples/s of the shard_map'd synthesis (parallel/shard.py) on
meshes of 1, 2, 4, ... devices and reports scaling efficiency relative to
the single-device rate (BASELINE.md north star: >=80% at N>=2).

On real pod slices this measures ICI-sharded throughput; in this
environment (one tunneled TPU chip) run it on a virtual CPU mesh to
validate the machinery and the efficiency accounting:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python bench_scaling.py

Prints one JSON line per mesh size; the last line carries the headline
efficiency number.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs-per-device", type=int, default=8)
    ap.add_argument("--samp-freq", type=float, default=2.6e6)
    ap.add_argument("--chan-axis", type=int, default=1,
                    help="devices on the channel axis (rest go to time)")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--impl", default="xla",
                    choices=("xla", "pallas", "pallas-wire"),
                    help="pallas = fused kernel over pre-packed params; "
                         "pallas-wire = the production pod path (compact "
                         "wire upload + per-device rebase)")
    ns = ap.parse_args()

    import os

    if os.environ.get("JAX_PLATFORMS"):
        # An installed TPU PJRT plugin can win platform selection over the
        # JAX_PLATFORMS env var; pin the user's choice through jax.config
        # (required for the virtual-device CPU mesh, see CLAUDE.md).
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from gps_sdr_sim_tpu.utils.compcache import enable as enable_cache
    enable_cache()

    import jax

    from gps_sdr_sim_tpu.constants import R2D
    from gps_sdr_sim_tpu.models.scenario import ScenarioConfig, build_scenario
    from gps_sdr_sim_tpu.ops.plan import plan_batch, plan_epochs
    from gps_sdr_sim_tpu.parallel import (auto_mesh, synth_batch_sharded,
                                          synth_epochs_sharded,
                                          synth_pallas_sharded)
    from gps_sdr_sim_tpu.utils.coord import llh2xyz

    n_dev = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_dev]

    xyz = llh2xyz(np.array([35.681298 / R2D, 139.766247 / R2D, 10.0]))
    max_epochs = ns.epochs_per_device * sizes[-1]
    cfg = ScenarioConfig(nav_file="data/brdc3540.14n", static_xyz=xyz,
                         duration=0.1 * (max_epochs + 1),
                         samp_freq=ns.samp_freq)
    scn = build_scenario(cfg)
    seg = scn.segments[0]

    base_rate = None
    for n in sizes:
        if n > 1 and n % ns.chan_axis:
            continue
        # n=1 always runs on a (1,1) mesh so efficiency_vs_1dev is anchored
        # to the true single-device rate even for chan-axis sweeps.
        mesh = auto_mesh(n, ns.chan_axis if n > 1 else 1)
        b = min(ns.epochs_per_device * n, seg.n_epochs)
        if ns.impl == "pallas-wire":
            eb = plan_epochs(seg, 0, b, scn.delt)
            synth = lambda _db, n_out, m: synth_epochs_sharded(eb, n_out, m)
            db = None
        else:
            db = plan_batch(seg, 0, b, scn.iq_buff_size, scn.delt)
            synth = (synth_pallas_sharded if ns.impl == "pallas"
                     else synth_batch_sharded)

        out = synth(db, scn.iq_buff_size, mesh)
        out.block_until_ready()  # compile warmup
        best = np.inf
        for _ in range(ns.repeats):
            t0 = time.time()
            out = synth(db, scn.iq_buff_size, mesh)
            # forced readback: block_until_ready is unreliable on some
            # backends (see CLAUDE.md); a checksum has a data dependency
            _ = int(np.asarray(out.astype(np.int32).sum()))
            best = min(best, time.time() - t0)
        rate = b * scn.iq_buff_size / best
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n)
        print(json.dumps({
            "metric": "scaling_samples_per_sec",
            "devices": n, "mesh": list(mesh.shape.items()),
            "value": round(rate / 1e6, 1), "unit": "Msamples_per_sec",
            "efficiency_vs_1dev": round(eff, 3),
        }))
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
