"""Native tool suite tests: build with `make -C tools`, then verify the
format conversions against the Python/JAX implementations and the CLI
contracts against the reference tools' behavior.
"""

import pathlib
import shutil
import subprocess
import sys

import numpy as np
import pytest

TOOLS = pathlib.Path(__file__).parent.parent / "tools"
DATA = pathlib.Path(__file__).parent.parent / "data"


@pytest.fixture(scope="module", autouse=True)
def build_tools():
    if shutil.which("g++") is None and shutil.which("c++") is None:
        pytest.skip("no C++ compiler available")
    subprocess.run(["make", "-C", str(TOOLS)], check=True,
                   capture_output=True)


def test_expand_1bit_roundtrip():
    """C++ 1-bit expansion inverts the generator's SC01 packing."""
    from gps_sdr_sim_tpu.ops.quantize import pack_sc01
    from gps_sdr_sim_tpu.utils import playerfmt

    rng = np.random.default_rng(7)
    iq = rng.integers(-2000, 2000, size=(1, 256, 2), dtype=np.int16)
    iq[iq == 0] = 1  # sign(0) packs as negative; keep the test unambiguous
    packed = np.asarray(pack_sc01(iq)).reshape(-1)
    expanded = playerfmt.expand_1bit(packed, amplitude=1000)
    expect = np.where(iq.reshape(-1) > 0, 1000, -1000).astype(np.int16)
    np.testing.assert_array_equal(expanded, expect)


def test_rescale_matches_generator():
    from gps_sdr_sim_tpu.utils import playerfmt

    v = np.array([-32768, -4096, -17, -1, 0, 1, 15, 4095, 32767],
                 dtype=np.int16)
    np.testing.assert_array_equal(playerfmt.shift16(v, 4), v >> 4)
    # 16->8 narrowing is the generator's own SC08 rule (gpssim.c:2278-2284).
    np.testing.assert_array_equal(playerfmt.narrow16to8(v, 4),
                                  (v >> 4).astype(np.int8))
    b = np.array([-128, -1, 0, 1, 127], dtype=np.int8)
    np.testing.assert_array_equal(playerfmt.widen8(b, 4),
                                  b.astype(np.int16) << 4)


def test_player_file_backend_16bit_passthrough(tmp_path):
    rng = np.random.default_rng(3)
    data = rng.integers(-3000, 3000, size=100000, dtype=np.int16)
    src = tmp_path / "in.bin"
    src.write_bytes(data.tobytes())
    dst = tmp_path / "out.bin"
    subprocess.run([str(TOOLS / "gps-sdr-player"), "-f", str(src), "-b",
                    "16", "-n", "4096", "-o", str(dst)], check=True,
                   capture_output=True)
    out = np.frombuffer(dst.read_bytes(), dtype=np.int16)
    # Trailing block is zero-padded to the buffer size (bladeplayer.c:262):
    # 100,000 values in 4096-sample (8192-value) buffers -> 13 blocks.
    assert out.size == 13 * 8192
    np.testing.assert_array_equal(out[:data.size], data)
    assert not out[data.size:].any()


def test_player_1bit_expansion(tmp_path):
    src = tmp_path / "in.bin"
    src.write_bytes(bytes([0b10110001]))
    dst = tmp_path / "out.bin"
    subprocess.run([str(TOOLS / "gps-sdr-player"), "-f", str(src), "-b", "1",
                    "-a", "1000", "-n", "4", "-o", str(dst)], check=True,
                   capture_output=True)
    out = np.frombuffer(dst.read_bytes(), dtype=np.int16)
    np.testing.assert_array_equal(
        out, [1000, -1000, 1000, 1000, -1000, -1000, -1000, 1000])


def test_nmea2um_matches_python(tmp_path):
    """C++ nmea2um agrees with the Python NMEA reader on the bundled log."""
    from gps_sdr_sim_tpu.models.trajectory import read_nmea_gga

    out = tmp_path / "um.csv"
    subprocess.run([str(TOOLS / "nmea2um"), str(DATA / "triumphv3.txt"),
                    str(out)], check=True, capture_output=True)
    rows = np.loadtxt(out, delimiter=",")
    ref = read_nmea_gga(str(DATA / "triumphv3.txt"), 10000)
    assert rows.shape[0] == ref.shape[0]
    np.testing.assert_allclose(rows[:, 0], 0.1 * np.arange(rows.shape[0]),
                               atol=1e-9)
    # Output is printed at millimeter resolution (%12.3f).
    np.testing.assert_allclose(rows[:, 1:], ref, atol=5e-4)


def test_iqcompare(tmp_path):
    a = np.arange(-500, 500, dtype=np.int16)
    pa, pb = tmp_path / "a.bin", tmp_path / "b.bin"
    pa.write_bytes(a.tobytes())
    pb.write_bytes(a.tobytes())
    r = subprocess.run([str(TOOLS / "iqcompare"), "-b", "16", str(pa),
                        str(pb)], capture_output=True, text=True)
    assert r.returncode == 0 and '"pass": true' in r.stdout

    b = a.copy()
    b[10] += 100  # one full-scale error must fail the default thresholds
    pb.write_bytes(b.tobytes())
    r = subprocess.run([str(TOOLS / "iqcompare"), "-b", "16", "--max-big",
                        "0", str(pa), str(pb)], capture_output=True,
                       text=True)
    assert r.returncode == 1 and '"pass": false' in r.stdout
    assert '"max_delta": 100' in r.stdout


def test_uhd_player_file_sink(tmp_path):
    """uhd_player --sink must emit the exact fc32 stream the DAC would get."""
    rng = np.random.default_rng(3)
    iq = rng.integers(-2047, 2047, size=256, dtype=np.int16)
    src = tmp_path / "sim.bin"
    src.write_bytes(iq.tobytes())
    out = tmp_path / "dac.fc32"
    subprocess.run(
        [sys.executable, str(TOOLS / "uhd_player.py"), "-t", str(src),
         "-b", "16", "--no-repeat", "--sink", str(out)],
        check=True, capture_output=True)
    got = np.frombuffer(out.read_bytes(), np.complex64)
    want = (iq.astype(np.float32).reshape(-1, 2) / 2048.0)
    np.testing.assert_array_equal(got.real, want[:, 0])
    np.testing.assert_array_equal(got.imag, want[:, 1])


def test_asan_build_runs_clean(tmp_path):
    """Sanitizer pass for the native tools (SURVEY.md §5: race/sanitizers).

    Builds the suite with -fsanitize=address,undefined into a scratch copy
    and runs each tool on real inputs; any ASan/UBSan report fails the run.
    """
    src = tmp_path / "tools"
    shutil.copytree(TOOLS, src, ignore=shutil.ignore_patterns(
        "gps-sdr-player", "nmea2um", "iqcompare", "*.so", "*.py",
        "*.script"))
    subprocess.run(["make", "-C", str(src), "asan"], check=True,
                   capture_output=True)

    iq = np.arange(-400, 400, dtype=np.int16)
    a = tmp_path / "a.bin"
    a.write_bytes(iq.tobytes())
    r = subprocess.run([str(src / "iqcompare"), "-b", "16", str(a), str(a)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr

    out = tmp_path / "um.csv"
    r = subprocess.run([str(src / "nmea2um"), str(DATA / "triumphv3.txt"),
                        str(out)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr

    conv = tmp_path / "conv.bin"
    r = subprocess.run([str(src / "gps-sdr-player"), "-f", str(a), "-b",
                        "16", "-B", "file", "-o", str(conv)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    # The streaming state machine zero-pads the trailing partial buffer
    # (bladeplayer.c PAD_TRAILING); payload must pass through untouched.
    raw = a.read_bytes()
    assert conv.read_bytes()[:len(raw)] == raw


def test_sdr_option_clamps_match_reference():
    """Vendor option validation (sdr_backends.cpp, compiled without any
    SDK) mirrors the reference players' clamping rules."""
    from gps_sdr_sim_tpu.utils import playerfmt

    # Lime normalized gain into [0, 1] (limeplayer.c:158-163).
    assert playerfmt.lime_clamp_gain(-0.5) == 0.0
    assert playerfmt.lime_clamp_gain(0.25) == 0.25
    assert playerfmt.lime_clamp_gain(1.5) == 1.0
    # Lime 1-bit dynamic clamps above 2047 only (limeplayer.c:138-140).
    assert playerfmt.lime_clamp_dynamic(4096) == 2047
    assert playerfmt.lime_clamp_dynamic(1000) == 1000
    # Lime channel falls back to 0 outside [0, count) (limeplayer.c:183-189).
    assert playerfmt.lime_clamp_channel(1, 2) == 1
    assert playerfmt.lime_clamp_channel(5, 2) == 0
    assert playerfmt.lime_clamp_channel(-1, 2) == 0
    # Pluto attenuation into [-80, 0] dB (plutoplayer.c:84-86).
    assert playerfmt.pluto_clamp_atten(5.0) == 0.0
    assert playerfmt.pluto_clamp_atten(-20.0) == -20.0
    assert playerfmt.pluto_clamp_atten(-100.0) == -80.0
    # Pluto RF bandwidth into [1, 5] MHz (plutoplayer.c:89-91).
    assert playerfmt.pluto_clamp_bw(0.5e6) == 1.0e6
    assert playerfmt.pluto_clamp_bw(3.0e6) == 3.0e6
    assert playerfmt.pluto_clamp_bw(9.0e6) == 5.0e6
    # HackRF filter BW: widest MAX2837 filter below the rate
    # (hackplayer.c:118 -> hackrf_compute_baseband_filter_bw_round_down_lt).
    assert playerfmt.hackrf_filter_bw(2600000) == 2500000
    assert playerfmt.hackrf_filter_bw(1750000) == 1750000  # none below
    assert playerfmt.hackrf_filter_bw(10000000) == 9000000


def test_bytering_push_pull_inversion():
    """The HackRF shim's ring (tools/bytering.cpp): a push-side producer
    and the async-pull consumer exchange bytes losslessly through a ring
    smaller than the payload, with blocking backpressure, wrap-around, and
    the close-then-drain-dry EOF contract of hack_tx_callback."""
    import threading

    from gps_sdr_sim_tpu.utils import playerfmt

    rng = np.random.default_rng(11)
    payload = rng.integers(-128, 128, size=50000, dtype=np.int8)
    ring = playerfmt.ByteRing(997)  # odd, < payload: forces wrap + blocking
    chunks = []

    def consumer():
        while True:
            got = ring.drain(1234)
            chunks.append(got)
            if got.size < 1234:  # short drain only once closed and dry
                return

    t = threading.Thread(target=consumer)
    t.start()
    # push() blocks while the ring is full; the consumer thread unblocks it.
    for off in range(0, payload.size, 3000):
        ring.push(payload[off:off + 3000])
    assert ring.wait_drained(5000)
    ring.close()
    t.join(timeout=5)
    assert not t.is_alive()
    np.testing.assert_array_equal(np.concatenate(chunks), payload)
    # Post-close: pushes drop silently, drains come up empty immediately.
    ring.push(payload[:10])
    assert ring.fill() == 0
    assert ring.drain(64).size == 0
    ring.free()


def test_bytering_zero_capacity_does_not_deadlock():
    import threading

    from gps_sdr_sim_tpu.utils import playerfmt

    ring = playerfmt.ByteRing(0)  # clamped to 1 byte internally
    got = []
    t = threading.Thread(target=lambda: got.append(ring.drain(4)))
    t.start()
    ring.push(np.arange(4, dtype=np.int8))
    t.join(timeout=5)
    assert not t.is_alive()
    np.testing.assert_array_equal(got[0], np.arange(4, dtype=np.int8))
    ring.close()
    ring.free()


def test_bytering_wait_drained_timeout():
    from gps_sdr_sim_tpu.utils import playerfmt

    ring = playerfmt.ByteRing(64)
    ring.push(np.ones(8, dtype=np.int8))
    assert not ring.wait_drained(50)  # data stuck, no consumer
    assert ring.drain(8).size == 8
    assert ring.wait_drained(50)
    ring.close()
    ring.free()


def test_vendor_backends_compile_against_mock_sdks():
    """`make -C tools vendor-check` type-checks ALL vendor-gated backend
    code (HAVE_LIBBLADERF/LIBHACKRF/LIMESUITE/LIBIIO/LIBAD9361) against
    mock SDK headers carrying the real signatures — no SDK exists in CI,
    so without this the gated ~350 lines never meet a compiler."""
    r = subprocess.run(["make", "-C", str(TOOLS), "vendor-check"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr


def test_vendor_check_catches_typos(tmp_path):
    """The mock-SDK compile is strict enough that a wrong call in a gated
    block fails it (arity error injected into the bladeRF block)."""
    src = (TOOLS / "sdr_backends.cpp").read_text()
    broken = src.replace("bladerf_set_txvga1(dev, cfg.tx_gain)",
                         "bladerf_set_txvga1(dev)")
    assert broken != src
    bad = tmp_path / "sdr_backends_typo.cpp"
    bad.write_text(broken)
    r = subprocess.run(
        ["g++", "-std=c++17", "-fsyntax-only",
         "-I" + str(TOOLS / "mock_sdk"), "-I" + str(TOOLS),
         "-DHAVE_LIBBLADERF", "-DHAVE_LIBHACKRF", "-DHAVE_LIMESUITE",
         "-DHAVE_LIBIIO", "-DHAVE_LIBAD9361", str(bad)],
        capture_output=True, text=True)
    assert r.returncode != 0
    assert "too few arguments" in r.stderr


def test_player_vendor_backends_fail_cleanly(tmp_path):
    """Without vendor SDKs at build time, each backend is recognized and
    fails with the compiled-out message (not a usage error)."""
    src = tmp_path / "in.bin"
    src.write_bytes(b"\x00" * 64)
    for name in ("hackrf", "lime", "pluto", "bladerf"):
        r = subprocess.run(
            [str(TOOLS / "gps-sdr-player"), "-f", str(src), "-B", name],
            capture_output=True, text=True)
        assert r.returncode == 1
        assert "not compiled in" in r.stderr, (name, r.stderr)


def test_player_vendor_option_parsing(tmp_path):
    """The per-vendor option surface (-c/-G/-A/-w/-N) parses and the file
    pipeline is unaffected by RF-only options."""
    data = np.arange(-512, 512, dtype=np.int16)
    src = tmp_path / "in.bin"
    src.write_bytes(data.tobytes())
    dst = tmp_path / "out.bin"
    r = subprocess.run(
        [str(TOOLS / "gps-sdr-player"), "-f", str(src), "-b", "16",
         "-c", "1", "-G", "7.5", "-A", "-200", "-w", "9", "-N",
         "192.168.2.1", "-o", str(dst)],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    out = np.frombuffer(dst.read_bytes(), dtype=np.int16)
    np.testing.assert_array_equal(out[:data.size], data)
