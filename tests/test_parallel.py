"""Sharding correctness on a virtual 8-device CPU mesh (see conftest.py).

Invariants (SURVEY.md §4): N-device shard_map output is bit-identical to
the 1-device kernel for every (time, chan) mesh factorization; time-shard
files concatenate to the exact single-file byte stream regardless of where
block boundaries fall; resume regenerates exactly the missing shards.
"""

import io
import pathlib

import numpy as np
import pytest

from gps_sdr_sim_tpu.constants import R2D
from gps_sdr_sim_tpu.models.scenario import ScenarioConfig, build_scenario
from gps_sdr_sim_tpu.ops.plan import plan_batch
from gps_sdr_sim_tpu.ops.synth_jnp import synth_batch
from gps_sdr_sim_tpu.parallel import (
    auto_mesh,
    concat_shards,
    plan_epoch_shards,
    run_simulation_sharded,
    synth_batch_sharded,
)
from gps_sdr_sim_tpu.runner import run_simulation
from gps_sdr_sim_tpu.utils.coord import llh2xyz

DATA = pathlib.Path(__file__).parent.parent / "data"
TOKYO = llh2xyz(np.array([35.681298 / R2D, 139.766247 / R2D, 10.0]))


# 200 ksps keeps XLA:CPU compile + run times small; sharding correctness is
# rate-independent (the kernels' fixed-point plans handle code steps above
# one chip/sample, see ops/plan.py), and cross-implementation equality is
# the invariant here -- the C-oracle comparisons live in test_iq_golden.py.
SAMP = 2.0e5


@pytest.fixture(scope="module")
def scenario():
    cfg = ScenarioConfig(nav_file=str(DATA / "brdc3540.14n"),
                         static_xyz=TOKYO, duration=0.8, samp_freq=SAMP)
    return build_scenario(cfg)


@pytest.fixture(scope="module")
def batch(scenario):
    seg = scenario.segments[0]
    return plan_batch(seg, 0, seg.n_epochs, scenario.iq_buff_size,
                      scenario.delt)


@pytest.mark.parametrize("n_time,n_chan", [(8, 1), (1, 8), (4, 2), (2, 4)])
def test_mesh_invariance(scenario, batch, n_time, n_chan):
    """Any mesh factorization reproduces the 1-device output bit-exactly."""
    ref = np.asarray(synth_batch(batch, scenario.iq_buff_size))
    mesh = auto_mesh(n_time * n_chan, n_chan)
    out = np.asarray(synth_batch_sharded(batch, scenario.iq_buff_size, mesh))
    np.testing.assert_array_equal(out, ref)


def test_time_padding_sharded(scenario, batch):
    """B=7 epochs on an 8-wide time axis: padding is silent and stripped."""
    mesh = auto_mesh(8, 1)
    ref = np.asarray(synth_batch(batch, scenario.iq_buff_size))
    out = np.asarray(synth_batch_sharded(batch, scenario.iq_buff_size, mesh))
    assert out.shape == ref.shape
    np.testing.assert_array_equal(out, ref)


def test_plan_epoch_shards():
    ranges = plan_epoch_shards(10, 3)
    assert ranges == [(0, 4), (4, 7), (7, 10)]
    assert plan_epoch_shards(2, 4) == [(0, 1), (1, 2), (2, 2), (2, 2)]


@pytest.mark.parametrize("data_format", [16, 1])
def test_shard_files_concat_bitexact(tmp_path, data_format):
    """Time-shard files assemble to the exact single-process byte stream."""
    cfg = ScenarioConfig(nav_file=str(DATA / "brdc3540.14n"),
                         static_xyz=TOKYO, duration=0.7, samp_freq=SAMP,
                         data_format=data_format)
    scn = build_scenario(cfg)
    buf = io.BytesIO()
    run_simulation(scn, buf, batch_epochs=2, log=lambda s: None, impl="xla")

    out_dir = tmp_path / f"shards{data_format}"
    run_simulation_sharded(scn, str(out_dir), n_shards=3, batch_epochs=2,
                           impl="xla")
    out_file = tmp_path / f"joined{data_format}.bin"
    manifest = concat_shards(str(out_dir), str(out_file))
    assert manifest.total_epochs == scn.n_output_epochs
    assert out_file.read_bytes() == buf.getvalue()


def test_shard_resume_regenerates_missing(tmp_path):
    """Deleting one shard + resume=True restores the byte-exact stream."""
    cfg = ScenarioConfig(nav_file=str(DATA / "brdc3540.14n"),
                         static_xyz=TOKYO, duration=0.5, samp_freq=SAMP)
    scn = build_scenario(cfg)
    out_dir = tmp_path / "shards"
    run_simulation_sharded(scn, str(out_dir), n_shards=2, batch_epochs=2,
                           impl="xla")
    victim = out_dir / "shard_00001.bin"
    good = victim.read_bytes()
    victim.write_bytes(good[: len(good) // 2])  # simulate a failed host

    mtime0 = (out_dir / "shard_00000.bin").stat().st_mtime_ns
    run_simulation_sharded(scn, str(out_dir), n_shards=2, batch_epochs=2,
                           impl="xla", resume=True)
    assert victim.read_bytes() == good
    # The intact shard was not rewritten.
    assert (out_dir / "shard_00000.bin").stat().st_mtime_ns == mtime0


def test_epoch_range_split_anywhere_bitexact(scenario):
    """[0,N) in one go == [0,k) + [k,N) for any split and batch size."""
    from gps_sdr_sim_tpu.runner import run_epoch_range

    n = scenario.n_output_epochs
    whole = io.BytesIO()
    run_simulation(scenario, whole, batch_epochs=20, log=lambda s: None,
                   impl="xla")
    for k, be in ((1, 3), (n // 2, 7), (n - 1, 20)):
        parts = io.BytesIO()
        run_epoch_range(scenario, parts, 0, k, batch_epochs=be,
                        log=lambda s: None, impl="xla")
        run_epoch_range(scenario, parts, k, n, batch_epochs=be,
                        log=lambda s: None, impl="xla")
        assert parts.getvalue() == whole.getvalue(), (k, be)


@pytest.mark.parametrize("n_time,n_chan",
                         [(2, 1), (8, 1), (1, 8), (4, 2), (2, 4)])
def test_pallas_sharded_matches_unsharded(scenario, batch, n_time, n_chan):
    """Fused kernel over any (time, chan) factorization == single device.

    chan > 1 exercises the raw-accumulator kernel variant + pre-quantization
    psum over the channel axis (the reference's reduction placement,
    gpssim.c:2192-2259)."""
    from gps_sdr_sim_tpu.ops import synth_pallas
    from gps_sdr_sim_tpu.parallel import synth_pallas_sharded

    n = scenario.iq_buff_size
    mesh = auto_mesh(n_time * n_chan, n_chan)
    got = np.asarray(synth_pallas_sharded(batch, n, mesh))
    want = np.asarray(synth_pallas.synth_batch(batch, n))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n_time,n_chan",
                         [(2, 1), (8, 1), (1, 8), (4, 2), (2, 4)])
def test_wire_sharded_matches_unsharded(scenario, n_time, n_chan):
    """The compact-wire pod path (per-device rebase + fused kernel +
    pre-quantization chan psum) == single-device synth_epochs, bit-exact,
    for every (time, chan) factorization — including channel counts that
    need zero-gain channel padding to divide the 'chan' axis."""
    from gps_sdr_sim_tpu.ops import synth_pallas
    from gps_sdr_sim_tpu.ops.plan import pad_epochs, plan_epochs
    from gps_sdr_sim_tpu.parallel import synth_epochs_sharded

    seg = scenario.segments[0]
    n = scenario.iq_buff_size
    eb = pad_epochs(plan_epochs(seg, 0, seg.n_epochs, scenario.delt), 8)
    want = np.asarray(synth_pallas.synth_epochs(eb, n))
    mesh = auto_mesh(n_time * n_chan, n_chan)
    got = np.asarray(synth_epochs_sharded(eb, n, mesh))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("impl", ["xla-sharded", "pallas-sharded"])
def test_runner_sharded_impls_match_single(scenario, impl):
    """run_simulation over the full local (virtual) mesh == single device."""
    ref = io.BytesIO()
    run_simulation(scenario, ref, batch_epochs=2, log=lambda s: None,
                   impl="xla")
    got = io.BytesIO()
    run_simulation(scenario, got, batch_epochs=2, log=lambda s: None,
                   impl=impl)
    assert got.getvalue() == ref.getvalue()


def test_shard_resume_refuses_different_scenario(tmp_path):
    """A stale shard dir from different inputs must be refused on resume,
    even when bytes-per-epoch happen to match (manifest scenario hash)."""
    cfg_a = ScenarioConfig(nav_file=str(DATA / "brdc3540.14n"),
                           static_xyz=TOKYO, duration=0.4, samp_freq=SAMP)
    out_dir = tmp_path / "shards"
    run_simulation_sharded(build_scenario(cfg_a), str(out_dir), n_shards=2,
                           batch_epochs=2, impl="xla")

    other = llh2xyz(np.array([0.1, 0.2, 100.0]))
    cfg_b = ScenarioConfig(nav_file=str(DATA / "brdc3540.14n"),
                           static_xyz=other, duration=0.4, samp_freq=SAMP)
    with pytest.raises(ValueError, match="different scenario"):
        run_simulation_sharded(build_scenario(cfg_b), str(out_dir),
                               n_shards=2, batch_epochs=2, impl="xla",
                               resume=True)
    # Same scenario resumes fine (no-op: all shards complete).
    run_simulation_sharded(build_scenario(cfg_a), str(out_dir), n_shards=2,
                           batch_epochs=2, impl="xla", resume=True)


def test_sharded_run_returns_aggregated_stats(tmp_path):
    """run_simulation_sharded aggregates RunStats (feeds --json-summary)."""
    cfg = ScenarioConfig(nav_file=str(DATA / "brdc3540.14n"),
                         static_xyz=TOKYO, duration=0.4, samp_freq=SAMP)
    scn = build_scenario(cfg)
    _manifest, stats = run_simulation_sharded(
        scn, str(tmp_path / "s"), n_shards=2, batch_epochs=2, impl="xla")
    assert stats.total_samples == scn.total_samples
    assert stats.device_batches >= 2
    assert stats.wall_seconds > 0


def test_fetch_with_retry_recomputes_on_transient_device_error():
    """runner._fetch_with_retry: a transient XlaRuntimeError at readback
    re-synthesizes the batch (every batch is independently recomputable);
    non-transient exception types propagate immediately."""
    from gps_sdr_sim_tpu.runner import _fetch_with_retry

    class XlaRuntimeError(Exception):
        pass

    class FlakyDev:
        def __init__(self, fails):
            self.fails = fails

        def __array__(self, dtype=None, copy=None):
            if self.fails > 0:
                self.fails -= 1
                raise XlaRuntimeError("INTERNAL: transient burst")
            return np.arange(4)

    calls = []

    def recompute():
        calls.append(1)
        return FlakyDev(0)

    out = _fetch_with_retry(FlakyDev(1), recompute, log=lambda s: None)
    np.testing.assert_array_equal(out, np.arange(4))
    assert len(calls) == 1

    # Exhausted retries -> the error propagates.
    with pytest.raises(XlaRuntimeError):
        _fetch_with_retry(FlakyDev(9), lambda: FlakyDev(9), retries=1,
                          log=lambda s: None)

    # Non-device exceptions are not retried.
    class Boom(Exception):
        pass

    class BadDev:
        def __array__(self, dtype=None, copy=None):
            raise Boom()

    with pytest.raises(Boom):
        _fetch_with_retry(BadDev(), recompute, log=lambda s: None)
    assert len(calls) == 1  # recompute not called again
