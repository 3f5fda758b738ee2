"""Unit tests for the host (NumPy f64) layers against C-reference goldens."""

import numpy as np
import pytest

from gps_sdr_sim_tpu.models.cacode import all_codes, codegen
from gps_sdr_sim_tpu.models.ephemeris import (
    IonoUtc,
    eph_field_arrays,
    read_rinex_nav_all,
)
from gps_sdr_sim_tpu.models.navmsg import (
    compute_checksum,
    dwrd_to_bits,
    eph2sbf,
    generate_nav_msg,
)
from gps_sdr_sim_tpu.models.observables import compute_range, sat_visibility
from gps_sdr_sim_tpu.models.orbit import satpos
from gps_sdr_sim_tpu.utils.coord import llh2xyz, xyz2llh
from gps_sdr_sim_tpu.utils.gpstime import (
    DateTime,
    GpsTime,
    date2gps,
    gps2date,
    inc_gps_time,
    sub_gps_time,
)
from gps_sdr_sim_tpu.constants import N_DWRD, R2D


def test_cacode_golden(golden):
    for line in golden["cacode"]:
        parts = line.split()
        prn = int(parts[1])
        want = np.array([int(c) for c in parts[2]], dtype=np.int32)
        got = codegen(prn)
        np.testing.assert_array_equal(got, want, err_msg=f"PRN {prn}")


def test_all_codes_shape():
    codes = all_codes()
    assert codes.shape == (32, 1023)
    assert set(np.unique(codes)) <= {0, 1}


def test_time_golden(golden):
    lines = {l.split(" -> ")[0]: l.split(" -> ")[1] for l in golden["time"]}
    g = date2gps(DateTime(2014, 12, 20, 0, 0, 0.0))
    w, s = lines["date2gps 2014,12,20,0,0,0"].split()
    assert g.week == int(w) and g.sec == float(s)

    t2 = gps2date(g)
    vals = lines["gps2date"].split()
    assert (t2.y, t2.m, t2.d, t2.hh, t2.mm) == tuple(int(v) for v in vals[:5])
    assert t2.sec == float(vals[5])

    g2 = date2gps(DateTime(2026, 3, 1, 13, 59, 59.5))
    w, s = lines["date2gps 2026,3,1,13,59,59.5"].split()
    assert g2.week == int(w) and g2.sec == float(s)


def test_inc_sub_gpstime():
    g = GpsTime(1823, 604799.95)
    g2 = inc_gps_time(g, 0.1)
    assert g2.week == 1824
    # C rounds to ms *before* the week wrap, leaving float64 subtraction
    # residue of (604800.05 - 604800); replicate, don't "fix".
    assert abs(g2.sec - 0.05) < 1e-9
    assert abs(sub_gps_time(g2, g) - 0.1) < 1e-9
    g3 = inc_gps_time(GpsTime(1823, 0.05), -0.1)
    assert g3.week == 1822
    assert abs(g3.sec - 604799.95) < 1e-9


def test_geodesy_golden(golden):
    lines = {l.split()[0]: [float(v) for v in l.split()[1:]]
             for l in golden["geodesy"]}
    xyz = np.array([-3813477.954, 3554276.552, 3662785.237])
    llh = xyz2llh(xyz)
    np.testing.assert_allclose(llh, lines["xyz2llh"], rtol=0, atol=0)
    xyz2 = llh2xyz(llh)
    np.testing.assert_allclose(xyz2, lines["llh2xyz"], rtol=0, atol=0)
    llh0 = xyz2llh(np.zeros(3))
    np.testing.assert_allclose(llh0, lines["xyz2llh_origin"], rtol=0, atol=0)


def test_geodesy_batch_matches_scalar():
    rng = np.random.default_rng(0)
    llh_in = np.stack([
        rng.uniform(-1.4, 1.4, 50), rng.uniform(-3.1, 3.1, 50),
        rng.uniform(-100, 3e7, 50)], axis=-1)
    xyz = llh2xyz(llh_in)
    batch = xyz2llh(xyz)
    for i in range(50):
        single = xyz2llh(xyz[i])
        np.testing.assert_array_equal(batch[i], single)


@pytest.fixture(scope="module")
def parsed(brdc_path):
    ionoutc = IonoUtc()
    eph, neph = read_rinex_nav_all(brdc_path, ionoutc)
    return eph, neph, ionoutc


def test_rinex_golden(golden, parsed):
    eph, neph, ionoutc = parsed
    lines = golden["rinex"]
    assert int(lines[0].split()[1]) == neph == 13

    io = lines[1].split()[1:]
    assert int(io[0]) == int(ionoutc.vflg)
    got = [ionoutc.alpha0, ionoutc.alpha1, ionoutc.alpha2, ionoutc.alpha3,
           ionoutc.beta0, ionoutc.beta1, ionoutc.beta2, ionoutc.beta3,
           ionoutc.A0, ionoutc.A1]
    np.testing.assert_array_equal(got, [float(v) for v in io[1:11]])
    assert [ionoutc.dtls, ionoutc.tot, ionoutc.wnt] == [int(v) for v in io[11:14]]

    n_checked = 0
    for line in lines[2:]:
        p = line.split()
        assert p[0] == "eph"
        ie, sv = int(p[1]), int(p[2]) - 1
        e = eph[ie][sv]
        assert e.vflg == 1
        assert e.toc.week == int(p[4]) and e.toc.sec == float(p[5])
        assert e.toe.week == int(p[7]) and e.toe.sec == float(p[8])
        assert e.iodc == int(p[10]) and e.iode == int(p[12])
        vals = [float(v) for v in p[13:32]]
        got = [e.deltan, e.cuc, e.cus, e.cic, e.cis, e.crc, e.crs, e.ecc,
               e.sqrta, e.m0, e.omg0, e.inc0, e.aop, e.omgdot, e.idot,
               e.af0, e.af1, e.af2, e.tgd]
        np.testing.assert_array_equal(got, vals)
        assert e.svhlth == int(p[32]) and e.codeL2 == int(p[33])
        derived = [float(v) for v in p[34:38]]
        np.testing.assert_array_equal([e.n, e.sq1e2, e.A, e.omgkdot], derived)
        n_checked += 1
    assert n_checked > 300


def test_satpos_golden(golden, parsed):
    eph, _, _ = parsed
    fields = eph_field_arrays(eph[0])
    for line in golden["satpos"]:
        p = line.split()
        sv = int(p[1]) - 1
        gsec = float(p[2])
        one = {k: v[sv] for k, v in fields.items()}
        pos, vel, clk = satpos(one, gsec)
        want = [float(v) for v in p[3:]]
        got = np.concatenate([pos, vel, clk])
        # Transcendental libm vs numpy differences allow ~1e-8 m.
        np.testing.assert_allclose(got[:6], want[:6], rtol=0, atol=2e-7)
        np.testing.assert_allclose(got[6:], want[6:8], rtol=1e-12, atol=1e-19)


def test_range_golden(golden, parsed):
    eph, _, ionoutc = parsed
    ionoutc.enable = True
    fields = eph_field_arrays(eph[0])
    llh = np.array([35.681298 / R2D, 139.766247 / R2D, 10.0])
    xyz = llh2xyz(llh)
    for line in golden["range"]:
        p = line.split()
        if p[0] == "range":
            sv = int(p[1]) - 1
            one = {k: v[sv] for k, v in fields.items()}
            g_sec = fields["toc_sec"][sv]
            rho = compute_range(one, ionoutc, g_sec, xyz)
            want = [float(v) for v in p[2:8]]
            np.testing.assert_allclose(
                [rho["range"], rho["rate"], rho["d"],
                 rho["azel"][0], rho["azel"][1], rho["iono_delay"]],
                want, rtol=0, atol=2e-6)
        else:  # vis
            sv = int(p[1]) - 1
            one = {k: v[sv] for k, v in fields.items()}
            g_sec = fields["toc_sec"][sv]
            vis, azel = sat_visibility(one, g_sec, xyz, 0.0)
            assert int(vis) == max(int(p[2]), 0)
            np.testing.assert_allclose(azel, [float(p[3]), float(p[4])],
                                       rtol=0, atol=1e-9)


def test_navmsg_golden(golden, parsed):
    eph, _, ionoutc = parsed
    sbf_lines = {int(l.split()[1]): l for l in golden["navmsg"]
                 if l.startswith("sbf ")}
    init_lines = {int(l.split()[1]): l for l in golden["navmsg"]
                  if l.startswith("dwrd_init ")}
    cont_lines = {int(l.split()[1]): l for l in golden["navmsg"]
                  if l.startswith("dwrd_cont ")}
    for prn, line in sbf_lines.items():
        e = eph[0][prn - 1]
        sbf = eph2sbf(e, ionoutc)
        want = np.array([int(v) for v in line.split()[2:]],
                        dtype=np.uint64).reshape(5, 10)
        np.testing.assert_array_equal(sbf, want, err_msg=f"PRN {prn} sbf")

        dwrd = np.zeros(N_DWRD, dtype=np.uint64)
        g = GpsTime(e.toc.week, e.toc.sec + 47.0)
        g0 = generate_nav_msg(g, sbf, dwrd, init=True)
        p = init_lines[prn].split()
        assert g0.week == int(p[2]) and g0.sec == float(p[3])
        want_init = np.array([int(v) for v in p[4:]], dtype=np.uint64)
        np.testing.assert_array_equal(dwrd, want_init, err_msg=f"PRN {prn} init")

        g2 = GpsTime(g.week, g.sec + 30.0)
        generate_nav_msg(g2, sbf, dwrd, init=False)
        want_cont = np.array([int(v) for v in cont_lines[prn].split()[2:]],
                             dtype=np.uint64)
        np.testing.assert_array_equal(dwrd, want_cont, err_msg=f"PRN {prn} cont")


def test_checksum_golden(golden):
    for line in golden["checksum"]:
        _, src, nib0, nib1 = line.split()
        assert compute_checksum(int(src), False) == int(nib0)
        assert compute_checksum(int(src), True) == int(nib1)


def test_dwrd_to_bits_roundtrip():
    dwrd = np.arange(N_DWRD, dtype=np.uint64) * np.uint64(0x01010101)
    bits = dwrd_to_bits(dwrd)
    assert bits.shape == (1800,)
    # Spot-check the extraction convention against the C expression.
    for b in (0, 1, 29, 30, 31, 59, 60, 1799):
        iword, ibit = b // 30, b % 30
        want = ((int(dwrd[iword]) >> (29 - ibit)) & 1) * 2 - 1
        assert bits[b] == want
