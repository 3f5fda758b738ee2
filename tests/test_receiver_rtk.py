"""Software RTK closure: the reference's rtk/ validation, hardware-free.

The reference's strongest correctness evidence is carrier-phase
differential positioning of its simulated signals (rtk/base.obs +
rtk/rover.csv post-processed with RTKLIB, SURVEY.md §2.3/§4). Here the
whole chain runs in software: synthesize base + rover scenes, track
both with the software receiver, write RINEX pairs
(receiver/rinex.py), parse them back (receiver/rinexobs.py), and solve
the double-difference baseline with integer (half-cycle) ambiguity
resolution (receiver/rtk.py + receiver/ambiguity.py). A millimeter-
level fixed baseline proves inter-scenario carrier coherence — a claim
no pseudorange test can make.
"""

import io
import itertools

import numpy as np
import pytest

from gps_sdr_sim_tpu.constants import R2D
from gps_sdr_sim_tpu.models.ephemeris import IonoUtc, read_rinex_nav_all
from gps_sdr_sim_tpu.models.scenario import ScenarioConfig, build_scenario
from gps_sdr_sim_tpu.receiver import acquire, load_iq, track
from gps_sdr_sim_tpu.receiver.ambiguity import ils_solve
from gps_sdr_sim_tpu.receiver.rinex import write_nav, write_obs
from gps_sdr_sim_tpu.receiver.rinexobs import read_rinex_obs
from gps_sdr_sim_tpu.receiver.rtk import solve_baseline
from gps_sdr_sim_tpu.runner import run_simulation
from gps_sdr_sim_tpu.utils.coord import llh2xyz

pytestmark = [pytest.mark.receiver, pytest.mark.slow]

FS = 2.048e6
DURATION = 26.0  # covers subframes 1-4: ephemeris + iono decode

BASE_LLH = np.array([35.681298 / R2D, 139.766247 / R2D, 10.0])
ROVER_LLH = np.array([(35.681298 + 0.00020) / R2D,
                      (139.766247 + 0.00025) / R2D, 12.0])
BASE = llh2xyz(BASE_LLH)
ROVER = llh2xyz(ROVER_LLH)  # ~32 m baseline


def _capture(xyz):
    cfg = ScenarioConfig(nav_file="data/brdc3540.14n", static_xyz=xyz,
                         duration=DURATION, samp_freq=FS, data_format=16)
    scn = build_scenario(cfg)
    buf = io.BytesIO()
    run_simulation(scn, buf, batch_epochs=16, impl="xla",
                   log=lambda s: None)
    x = load_iq(buf.getvalue(), 16)
    return track(x, FS, acquire(x, FS, dopp_step=50.0))


@pytest.fixture(scope="module")
def rinex_pair():
    tr_base = _capture(BASE)
    tr_rover = _capture(ROVER)
    fo_b, fo_r, fn = io.StringIO(), io.StringIO(), io.StringIO()
    write_obs(fo_b, tr_base, interval=1.0, approx_xyz=BASE)
    write_obs(fo_r, tr_rover, interval=1.0)
    write_nav(fn, tr_base)
    return fo_b.getvalue(), fo_r.getvalue(), fn.getvalue()


@pytest.fixture(scope="module")
def eph_by_prn(rinex_pair, tmp_path_factory):
    _, _, nav_txt = rinex_pair
    p = tmp_path_factory.mktemp("rtk") / "rx.nav"
    p.write_text(nav_txt)
    eph, _ = read_rinex_nav_all(str(p), IonoUtc())
    return {k + 1: eph[0][k] for k in range(32) if eph[0][k].vflg}


def test_obs_parser_roundtrips_writer(rinex_pair):
    """read_rinex_obs is the exact inverse of write_obs at the file's
    print precision."""
    obs_txt, _, _ = rinex_pair
    data = read_rinex_obs(io.StringIO(obs_txt))
    assert data.types == ["C1", "L1", "D1", "S1"]
    assert np.allclose(data.approx_xyz, BASE, atol=1e-4)
    assert len(data.epochs) >= 20
    for ep in data.epochs:
        assert ep.t.sec == round(ep.t.sec)  # steered to whole seconds
        for prn, vals in ep.obs.items():
            assert 1 <= prn <= 32
            assert set(vals) == {"C1", "L1", "D1", "S1"}
            assert 1.8e7 < vals["C1"] < 3.0e7
            assert 25.0 < vals["S1"] < 60.0


def test_ils_matches_brute_force():
    """ambiguity.ils_solve returns the true two best lattice points."""
    rng = np.random.default_rng(7)
    for _ in range(10):
        n = int(rng.integers(2, 5))
        M = rng.normal(size=(n, n))
        Q = M @ M.T + 0.01 * np.eye(n)
        a = rng.normal(scale=3.0, size=n)
        cands, dists = ils_solve(a, Q, n_cand=2)
        W = np.linalg.inv(Q)
        lo = np.floor(a).astype(int) - 5
        grid = [range(v, v + 11) for v in lo]
        scored = sorted((((z - a) @ W @ (z - a)), z)
                        for z in map(np.array, itertools.product(*grid)))
        assert np.array_equal(scored[0][1], cands[0])
        assert abs(scored[0][0] - dists[0]) < 1e-8
        assert abs(scored[1][0] - dists[1]) < 1e-8


def test_lll_invariants_and_scale():
    """The incremental-GS LLL must (a) return a basis of the SAME lattice
    (B_out = B_in U with U unimodular), (b) be size-reduced and satisfy
    the Lovász condition, and (c) stay fast at the ambiguity dimensions a
    slip-segmented kinematic window produces (the O(n^3)-per-step
    re-orthogonalization it replaced took minutes at n ~ 60)."""
    import time

    from gps_sdr_sim_tpu.receiver.ambiguity import _lll

    rng = np.random.default_rng(3)
    for n in (2, 5, 9, 24, 60):
        M = rng.normal(size=(n, n)) + np.eye(n)
        t0 = time.perf_counter()
        Bred, U = _lll(M)
        assert time.perf_counter() - t0 < 5.0, f"LLL slow at n={n}"
        assert abs(abs(round(np.linalg.det(U.astype(float)))) - 1) == 0
        assert np.allclose(Bred, M @ U, atol=1e-9 * np.abs(M).max())
        # Size-reduction + Lovász on the reduced basis's own GS.
        Q, R = np.linalg.qr(Bred)
        d = np.abs(np.diag(R))
        mu = R / np.sign(np.diag(R))[:, None] / d[:, None]
        off = np.triu(np.abs(mu), k=1)
        assert off.max() <= 0.5 + 1e-9, f"not size-reduced at n={n}"
        for k in range(1, n):
            assert d[k] ** 2 >= (0.75 - mu[k - 1, k] ** 2) * \
                d[k - 1] ** 2 - 1e-9, f"Lovász fails at n={n}, k={k}"


def test_dd_baseline_fixes_to_millimeters(rinex_pair, eph_by_prn):
    """Double-difference solution with a known base: the fixed baseline
    must agree with the simulated geometry at the millimeter level."""
    obs_b, obs_r, _ = rinex_pair
    sol = solve_baseline(read_rinex_obs(io.StringIO(obs_r)),
                         read_rinex_obs(io.StringIO(obs_b)),
                         eph_by_prn, base_xyz=BASE)
    true_baseline = ROVER - BASE
    assert sol.n_sats >= 8 and sol.n_epochs >= 20
    float_err = np.linalg.norm(sol.baseline_float - true_baseline)
    assert float_err < 0.5, f"float baseline error {float_err:.3f} m"
    assert sol.fixed and sol.ratio > 3.0, (sol.ratio, sol.amb_frac)
    fixed_err = np.linalg.norm(sol.baseline - true_baseline)
    assert fixed_err < 0.005, f"fixed baseline error {fixed_err * 1e3:.2f} mm"
    assert sol.phase_rms < 0.005  # meters: DD carrier coherence


def test_dd_baseline_without_base_anchor(rinex_pair, eph_by_prn):
    """With the base position unknown (single-point averaged, RTKLIB's
    default), the BASELINE stays millimetric even though the absolute
    positions are only meter-level."""
    obs_b, obs_r, _ = rinex_pair
    sol = solve_baseline(read_rinex_obs(io.StringIO(obs_r)),
                         read_rinex_obs(io.StringIO(obs_b)), eph_by_prn)
    assert sol.fixed
    err = np.linalg.norm(sol.baseline - (ROVER - BASE))
    assert err < 0.005, f"baseline error {err * 1e3:.2f} mm"


def test_cycle_slip_is_detected_and_refixed(rinex_pair, eph_by_prn):
    """Cycle slips open fresh ambiguities (RTKLIB re-initialization):
    inject half-cycle slips into two satellites mid-window; the solver
    must report them and still fix the baseline to millimeters."""
    obs_b, obs_r, _ = rinex_pair
    rover = read_rinex_obs(io.StringIO(obs_r))
    base = read_rinex_obs(io.StringIO(obs_b))
    clean = solve_baseline(rover, base, eph_by_prn, base_xyz=BASE)
    assert clean.n_slips == 0

    # Slip two non-reference satellites (a reference-satellite slip
    # shows in every DD series instead).
    v1, v2 = int(clean.prns[0]), int(clean.prns[1])
    for ep in rover.epochs[10:]:
        ep.obs[v1]["L1"] += 1.0      # +2 half cycles
    for ep in rover.epochs[15:]:
        ep.obs[v2]["L1"] -= 3.5      # the Costas 180-deg half-cycle case
    sol = solve_baseline(rover, base, eph_by_prn, base_xyz=BASE)
    assert sol.n_slips == 2
    assert sol.fixed, (sol.ratio, sol.amb_frac)
    err = np.linalg.norm(sol.baseline - (ROVER - BASE))
    assert err < 0.005, f"post-slip fixed error {err * 1e3:.2f} mm"
    assert sol.phase_rms < 0.005


def test_reference_satellite_slip_counts_once(rinex_pair, eph_by_prn):
    """A slip on the REFERENCE satellite steps every DD series at once;
    the Doppler detector attributes it to the one physical event (RTKLIB
    slip accounting), re-initializes all columns, and still fixes."""
    obs_b, obs_r, _ = rinex_pair
    rover = read_rinex_obs(io.StringIO(obs_r))
    base = read_rinex_obs(io.StringIO(obs_b))
    clean = solve_baseline(rover, base, eph_by_prn, base_xyz=BASE)

    for ep in rover.epochs[12:]:
        ep.obs[clean.ref_prn]["L1"] += 2.5
    sol = solve_baseline(rover, base, eph_by_prn, base_xyz=BASE)
    assert sol.ref_prn == clean.ref_prn
    assert sol.n_slips == 1
    assert sol.fixed, (sol.ratio, sol.amb_frac)
    err = np.linalg.norm(sol.baseline - (ROVER - BASE))
    assert err < 0.005, f"ref-sat-slip fixed error {err * 1e3:.2f} mm"


def test_kinematic_rover_fixes_to_centimeters():
    """RTKLIB 'kinematic' mode on a MOVING rover (the reference's actual
    rtk/ dataset shape: static base + rover.csv trajectory, ground track
    in rtk/rtklib/gndtrk.png). Base sits at the circle.csv center; the
    per-epoch fixed baselines must land on the simulated trajectory at
    the true reception instants to a few centimeters."""
    from gps_sdr_sim_tpu.models.trajectory import read_user_motion

    traj = read_user_motion("data/circle.csv")
    center = traj.mean(axis=0)

    tr_base = _capture(center)
    cfg = ScenarioConfig(nav_file="data/brdc3540.14n",
                         motion_file="data/circle.csv",
                         duration=DURATION, samp_freq=FS, data_format=16)
    scn = build_scenario(cfg)
    buf = io.BytesIO()
    run_simulation(scn, buf, batch_epochs=16, impl="xla",
                   log=lambda s: None)
    x = load_iq(buf.getvalue(), 16)
    tr_rov = track(x, FS, acquire(x, FS, dopp_step=50.0))

    fo_b, fo_r, fn = io.StringIO(), io.StringIO(), io.StringIO()
    write_obs(fo_b, tr_base, interval=1.0, approx_xyz=center)
    write_obs(fo_r, tr_rov, interval=1.0)
    write_nav(fn, tr_base)

    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".nav",
                                     delete=False) as fp:
        fp.write(fn.getvalue())
        navp = fp.name
    eph, _ = read_rinex_nav_all(navp, IonoUtc())
    eph_by_prn = {k + 1: eph[0][k] for k in range(32) if eph[0][k].vflg}

    sol = solve_baseline(read_rinex_obs(io.StringIO(fo_r.getvalue())),
                         read_rinex_obs(io.StringIO(fo_b.getvalue())),
                         eph_by_prn, base_xyz=center, kinematic=True)
    assert sol.fixed and sol.ratio > 3.0, (sol.ratio, sol.amb_frac)
    assert sol.baselines.shape == (sol.n_epochs, 3)
    assert sol.phase_rms < 0.01

    # The obs writer steers epochs onto whole seconds of the
    # clock-corrected receiver time (receiver/rinex.py), so the time
    # tags ARE true GPS reception instants — evaluate the trajectory
    # there directly (the rover moves ~2 m/s; a raw-sample-clock tag
    # would be ~12 ms = 2.5 cm off).
    g0_sow = scn.g0.sec
    errs = []
    for t, bl in zip(sol.times, sol.baselines):
        tt = (t - g0_sow) * 10.0  # trajectory rows are 0.1 s
        i0 = int(tt)
        frac = tt - i0
        truth = traj[i0] * (1 - frac) + traj[min(i0 + 1,
                                                 len(traj) - 1)] * frac
        errs.append(np.linalg.norm(center + bl - truth))
    errs = np.array(errs)
    assert errs.max() < 0.03, f"worst kinematic error {errs.max():.3f} m"
    assert errs.mean() < 0.02, f"mean kinematic error {errs.mean():.3f} m"

    # Kinematic cycle slip: a post-fit residual test is blind here (the
    # per-epoch position unknowns absorb the step), which is exactly why
    # the detector is the geometry-free Doppler check. Inject a slip
    # mid-track and the solution must re-fix onto the trajectory.
    rov2 = read_rinex_obs(io.StringIO(fo_r.getvalue()))
    v = int(sol.prns[0])
    for ep in rov2.epochs[10:]:
        ep.obs[v]["L1"] += 1.5
    sol2 = solve_baseline(rov2,
                          read_rinex_obs(io.StringIO(fo_b.getvalue())),
                          eph_by_prn, base_xyz=center, kinematic=True)
    assert sol2.n_slips == 1
    assert sol2.fixed, (sol2.ratio, sol2.amb_frac)
    errs2 = []
    for t, bl in zip(sol2.times, sol2.baselines):
        tt = (t - g0_sow) * 10.0
        i0 = int(tt)
        frac = tt - i0
        truth = traj[i0] * (1 - frac) + traj[min(i0 + 1,
                                                 len(traj) - 1)] * frac
        errs2.append(np.linalg.norm(center + bl - truth))
    assert np.max(errs2) < 0.03, \
        f"worst post-slip kinematic error {np.max(errs2):.3f} m"


def test_rtk_cli_reports_fix(rinex_pair, tmp_path, capsys):
    from gps_sdr_sim_tpu.receiver.rtk import main

    obs_b, obs_r, nav_txt = rinex_pair
    pb, pr, pn = (tmp_path / n for n in ("base.obs", "rover.obs", "rx.nav"))
    pb.write_text(obs_b)
    pr.write_text(obs_r)
    pn.write_text(nav_txt)
    xyz = ",".join(f"{v:.4f}" for v in BASE)
    # --base-xyz=VALUE: ECEF coordinates can be negative, so the glued
    # form is the only one argparse accepts.
    assert main([str(pr), str(pb), str(pn), f"--base-xyz={xyz}"]) == 0
    out = capsys.readouterr().out
    assert "FIX" in out and "float baseline" in out
    # printed |b| must be the ~32 m separation
    import re
    m = re.search(r"FIX.*\|b\| = *([0-9.]+) m", out)
    assert m and abs(float(m.group(1))
                     - np.linalg.norm(ROVER - BASE)) < 0.01
