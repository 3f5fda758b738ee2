#include "sdr_backends.h"

#include <stdio.h>
#include <string.h>

// ---------------------------------------------------------------------------
// Option validation (compiled unconditionally; unit-tested without hardware).
// ---------------------------------------------------------------------------

extern "C" double sdr_lime_clamp_gain(double gain) {
  if (gain < 0.0) return 0.0;
  if (gain > 1.0) return 1.0;
  return gain;
}

extern "C" long sdr_lime_clamp_dynamic(long dynamic) {
  return dynamic > 2047 ? 2047 : dynamic;
}

extern "C" int sdr_lime_clamp_channel(int channel, int channel_count) {
  if (channel < 0 || channel >= channel_count) return 0;
  return channel;
}

extern "C" double sdr_pluto_clamp_atten(double gain_db) {
  if (gain_db > 0.0) return 0.0;
  if (gain_db < -80.0) return -80.0;
  return gain_db;
}

extern "C" double sdr_pluto_clamp_bw(double bw_hz) {
  if (bw_hz > 5.0e6) return 5.0e6;
  if (bw_hz < 1.0e6) return 1.0e6;
  return bw_hz;
}

extern "C" uint32_t sdr_hackrf_filter_bw(uint32_t sample_rate_hz) {
  // The MAX2837 filter table (MHz): pick the widest strictly below the
  // sample rate, like hackrf_compute_baseband_filter_bw_round_down_lt.
  static const uint32_t kBwHz[] = {
      1750000,  2500000,  3500000,  5000000,  5500000,  6000000,
      7000000,  8000000,  9000000,  10000000, 12000000, 14000000,
      15000000, 20000000, 24000000, 28000000};
  uint32_t best = kBwHz[0];
  for (uint32_t bw : kBwHz) {
    if (bw < sample_rate_hz) best = bw;
  }
  return best;
}

// ---------------------------------------------------------------------------
// bladeRF (reference: player/bladeplayer.c): SC16_Q11 synchronous TX.
// ---------------------------------------------------------------------------
#ifdef HAVE_LIBBLADERF
#include <libbladeRF.h>

namespace {

struct BladeState {
  struct bladerf* dev;
  unsigned timeout_ms;
};

void* blade_open(const SdrConfig& cfg, const char** error) {
  static BladeState st{nullptr, 10000};
  struct bladerf* dev = nullptr;
  if (bladerf_open(&dev, nullptr) != 0) {
    *error = "bladerf_open failed (no device?)";
    return nullptr;
  }
  if (bladerf_set_frequency(dev, BLADERF_MODULE_TX,
                            (unsigned)cfg.frequency_hz) != 0 ||
      bladerf_set_sample_rate(dev, BLADERF_MODULE_TX,
                              (unsigned)cfg.sample_rate_hz, nullptr) != 0 ||
      bladerf_set_bandwidth(dev, BLADERF_MODULE_TX,
                            (unsigned)cfg.bandwidth_hz, nullptr) != 0 ||
      bladerf_set_txvga1(dev, cfg.tx_gain) != 0) {
    *error = "bladeRF TX configuration failed";
    bladerf_close(dev);
    return nullptr;
  }
  // 32 buffers x 32768 samples, as bladeplayer.c:197-203.
  if (bladerf_sync_config(dev, BLADERF_MODULE_TX, BLADERF_FORMAT_SC16_Q11,
                          32, 32768, 16, st.timeout_ms) != 0 ||
      bladerf_enable_module(dev, BLADERF_MODULE_TX, true) != 0) {
    *error = "bladerf_sync_config/enable failed";
    bladerf_close(dev);
    return nullptr;
  }
  st.dev = dev;
  return &st;
}

int blade_send(const int16_t* values, size_t n_values, void* user) {
  auto* st = static_cast<BladeState*>(user);
  return bladerf_sync_tx(st->dev, values, (unsigned)(n_values / 2), nullptr,
                         st->timeout_ms) == 0 ? 0 : 1;
}

void blade_close(void* user) {
  auto* st = static_cast<BladeState*>(user);
  bladerf_enable_module(st->dev, BLADERF_MODULE_TX, false);
  bladerf_close(st->dev);
}

}  // namespace
#define BLADE_AVAILABLE true
#else
namespace {
void* blade_open(const SdrConfig&, const char** error) {
  *error = "libbladeRF support not compiled in (SDK not found at build time)";
  return nullptr;
}
int blade_send(const int16_t*, size_t, void*) { return 1; }
void blade_close(void*) {}
}  // namespace
#define BLADE_AVAILABLE false
#endif

// ---------------------------------------------------------------------------
// HackRF (reference: player/hackplayer.c). The vendor API is async-pull
// (tx_callback freads into the USB transfer, hackplayer.c:53-72); our sink
// contract is push. The shim inverts control with a ByteRing (bytering.h,
// compiled unconditionally so the push<->pull logic is unit-tested without
// libhackrf): the pipeline's int16 values are narrowed to the 8-bit wire
// format the reference transmits (its input file is the generator's -b 8
// output) and the callback drains the ring; send() blocks while it's full.
// ---------------------------------------------------------------------------
#ifdef HAVE_LIBHACKRF
#include <libhackrf/hackrf.h>

#include "bytering.h"

namespace {

struct HackState {
  hackrf_device* dev = nullptr;
  ByteRing ring{1 << 18};  // 256 KiB elastic buffer
  int wire_shift = 4;      // pipeline int16 -> 8-bit wire (see hack_open)
};

int hack_tx_callback(hackrf_transfer* transfer) {
  auto* st = static_cast<HackState*>(transfer->tx_ctx);
  size_t want = (size_t)transfer->valid_length;
  size_t got = st->ring.drain(
      reinterpret_cast<int8_t*>(transfer->buffer), want);
  if (got < want) {
    // drain() comes up short only once the ring is closed and dry. Pad the
    // final transfer with zeros (the reference returns -1 and drops the
    // tail; padding keeps the last real samples on air, matching
    // bladeplayer's trailing-block behavior) and end the stream.
    memset(transfer->buffer + got, 0, want - got);
    return -1;
  }
  return 0;
}

// 8-bit wire shift for the pipeline's value domain: 16-bit input is
// pre-shifted right by `rescale_shift` (wire = v >> (4 - s)), 8-bit input
// left (wire = v >> s recovers the original bytes), 1-bit input is the
// +-amplitude expansion (scale like 12-bit).
int hack_wire_shift(const SdrConfig& cfg) {
  int sh = cfg.input_bits == 16 ? 4 - cfg.rescale_shift
           : cfg.input_bits == 8 ? cfg.rescale_shift
                                 : 4;
  return sh < 0 ? 0 : sh;
}

void* hack_open(const SdrConfig& cfg, const char** error) {
  static HackState st;
  st.wire_shift = hack_wire_shift(cfg);
  if (hackrf_init() != HACKRF_SUCCESS) {
    *error = "hackrf_init failed";
    return nullptr;
  }
  if (hackrf_open(&st.dev) != HACKRF_SUCCESS) {
    *error = "hackrf_open failed (no device?)";
    hackrf_exit();
    return nullptr;
  }
  uint32_t rate = (uint32_t)cfg.sample_rate_hz;
  if (hackrf_set_sample_rate_manual(st.dev, rate, 1) != HACKRF_SUCCESS ||
      hackrf_set_baseband_filter_bandwidth(
          st.dev, sdr_hackrf_filter_bw(rate)) != HACKRF_SUCCESS ||
      hackrf_set_txvga_gain(st.dev, (unsigned)(cfg.tx_gain < 0
                                                   ? 0
                                                   : cfg.tx_gain)) !=
          HACKRF_SUCCESS) {
    *error = "HackRF TX configuration failed";
    hackrf_close(st.dev);
    hackrf_exit();
    return nullptr;
  }
  if (hackrf_start_tx(st.dev, hack_tx_callback, &st) != HACKRF_SUCCESS ||
      hackrf_set_freq(st.dev, (uint64_t)cfg.frequency_hz) != HACKRF_SUCCESS ||
      hackrf_set_amp_enable(st.dev, 1) != HACKRF_SUCCESS) {
    *error = "hackrf_start_tx/set_freq/amp_enable failed";
    hackrf_close(st.dev);
    hackrf_exit();
    return nullptr;
  }
  return &st;
}

int hack_send(const int16_t* values, size_t n_values, void* user) {
  auto* st = static_cast<HackState*>(user);
  // Pipeline int16 values -> the 8-bit wire samples the reference streams
  // (its input file is the generator's -b 8 output, i.e. the 16->4-shift
  // rule of gpssim.c:2278-2284). The shift depends on how the pipeline
  // scaled the input (see hack_open); bounded chunks keep ring pushes
  // memcpy-sized.
  const int sh = st->wire_shift;
  int8_t wire[4096];
  size_t done = 0;
  while (done < n_values) {
    size_t n = n_values - done;
    if (n > sizeof(wire)) n = sizeof(wire);
    for (size_t k = 0; k < n; ++k) {
      wire[k] = (int8_t)(values[done + k] >> sh);
    }
    st->ring.push(wire, n);
    done += n;
  }
  return 0;
}

void hack_close(void* user) {
  auto* st = static_cast<HackState*>(user);
  // Let the callback flush the tail before stopping the stream.
  st->ring.wait_drained(2000);
  st->ring.close();
  hackrf_stop_tx(st->dev);
  hackrf_close(st->dev);
  hackrf_exit();
}

}  // namespace
#define HACKRF_AVAILABLE true
#else
namespace {
void* hack_open(const SdrConfig&, const char** error) {
  *error = "libhackrf support not compiled in (SDK not found at build time)";
  return nullptr;
}
int hack_send(const int16_t*, size_t, void*) { return 1; }
void hack_close(void*) {}
}  // namespace
#define HACKRF_AVAILABLE false
#endif

// ---------------------------------------------------------------------------
// LimeSDR (reference: player/limeplayer.c): native 12-bit LMS_FMT_I12
// stream. The pipeline's -s 4 shift already produces 12-bit values, so
// send() hands buffers straight to LMS_SendStream. Includes the RX0-enable
// LimeSuite bug workaround (limeplayer.c:215) and the per-100-block
// link-rate report (limeplayer.c:296-303).
// ---------------------------------------------------------------------------
#ifdef HAVE_LIMESUITE
#include <lime/LimeSuite.h>

namespace {

struct LimeState {
  lms_device_t* dev = nullptr;
  lms_stream_t stream{};
  long blocks = 0;
};

void* lime_open(const SdrConfig& cfg, const char** error) {
  static LimeState st;
  int device_count = LMS_GetDeviceList(nullptr);
  if (device_count < 1) {
    *error = "no LimeSDR device found";
    return nullptr;
  }
  lms_info_str_t list[8];
  if (device_count > 8) device_count = 8;
  LMS_GetDeviceList(list);
  if (LMS_Open(&st.dev, list[0], nullptr) != 0) {
    *error = "LMS_Open failed";
    return nullptr;
  }
  LMS_Reset(st.dev);
  LMS_Init(st.dev);

  int channel_count = LMS_GetNumChannels(st.dev, LMS_CH_TX);
  int channel = sdr_lime_clamp_channel(cfg.channel, channel_count);
  double gain = sdr_lime_clamp_gain(cfg.gain_norm);
  LMS_SetNormalizedGain(st.dev, LMS_CH_TX, channel, gain);
  // Disable the other TX channel; enable RX0 to work around the LimeSuite
  // regression since v18.06.0 (limeplayer.c:215), disable RX1; enable TX.
  LMS_EnableChannel(st.dev, LMS_CH_TX, 1 - channel, false);
  LMS_EnableChannel(st.dev, LMS_CH_RX, 0, true);
  LMS_EnableChannel(st.dev, LMS_CH_RX, 1, false);
  LMS_EnableChannel(st.dev, LMS_CH_TX, channel, true);

  if (LMS_SetLOFrequency(st.dev, LMS_CH_TX, channel, cfg.frequency_hz) != 0 ||
      LMS_SetSampleRate(st.dev, cfg.sample_rate_hz, 0) != 0) {
    *error = "Lime LO/sample-rate configuration failed";
    LMS_Close(st.dev);
    return nullptr;
  }
  LMS_Calibrate(st.dev, LMS_CH_TX, channel, cfg.bandwidth_hz, 0);

  st.stream.channel = (uint32_t)channel;
  st.stream.fifoSize = 1024 * 1024;
  st.stream.throughputVsLatency = 0.5;
  st.stream.isTx = true;
  st.stream.dataFmt = lms_stream_t::LMS_FMT_I12;
  if (LMS_SetupStream(st.dev, &st.stream) != 0) {
    *error = "LMS_SetupStream failed";
    LMS_Close(st.dev);
    return nullptr;
  }
  LMS_StartStream(&st.stream);
  st.blocks = 0;
  return &st;
}

int lime_send(const int16_t* values, size_t n_values, void* user) {
  auto* st = static_cast<LimeState*>(user);
  if (++st->blocks % 100 == 0) {
    lms_stream_status_t status;
    LMS_GetStreamStatus(&st->stream, &status);
    fprintf(stderr, "TX rate:%lf MB/s\n", status.linkRate / 1e6);
  }
  return LMS_SendStream(&st->stream, values, n_values / 2, nullptr, 1000) < 0
             ? 1
             : 0;
}

void lime_close(void* user) {
  auto* st = static_cast<LimeState*>(user);
  LMS_StopStream(&st->stream);
  LMS_DestroyStream(st->dev, &st->stream);
  LMS_EnableChannel(st->dev, LMS_CH_TX, (int)st->stream.channel, false);
  LMS_Close(st->dev);
}

}  // namespace
#define LIME_AVAILABLE true
#else
namespace {
void* lime_open(const SdrConfig&, const char** error) {
  *error = "LimeSuite support not compiled in (SDK not found at build time)";
  return nullptr;
}
int lime_send(const int16_t*, size_t, void*) { return 1; }
void lime_close(void*) {}
}  // namespace
#define LIME_AVAILABLE false
#endif

// ---------------------------------------------------------------------------
// ADALM-Pluto (reference: player/plutoplayer.c): libiio context (default,
// then network "pluto.local" or -n ip), AD9361 phy attributes with the
// reference's attenuation/bandwidth clamps, iio_buffer_push streaming.
// ---------------------------------------------------------------------------
#ifdef HAVE_LIBIIO
#include <iio.h>
#ifdef HAVE_LIBAD9361
#include <ad9361.h>
#endif

namespace {

struct PlutoState {
  struct iio_context* ctx = nullptr;
  struct iio_device* tx = nullptr;
  struct iio_channel* tx0_i = nullptr;
  struct iio_channel* tx0_q = nullptr;
  struct iio_buffer* buf = nullptr;
  size_t buf_samples = 0;
  size_t fill = 0;  // int16 values accumulated in buf (push when full)
};

void pluto_teardown(PlutoState* st) {
  if (st->ctx != nullptr) {
    struct iio_device* phy = iio_context_find_device(st->ctx, "ad9361-phy");
    if (phy != nullptr) {
      iio_channel_attr_write_bool(
          iio_device_find_channel(phy, "altvoltage1", true), "powerdown",
          true);  // TX LO off
    }
  }
  if (st->buf != nullptr) iio_buffer_destroy(st->buf);
  if (st->tx0_i != nullptr) iio_channel_disable(st->tx0_i);
  if (st->tx0_q != nullptr) iio_channel_disable(st->tx0_q);
  if (st->ctx != nullptr) iio_context_destroy(st->ctx);
  *st = PlutoState{};
}

void* pluto_open(const SdrConfig& cfg, const char** error) {
  static PlutoState st;
  st.ctx = iio_create_default_context();
  if (st.ctx == nullptr) {
    st.ctx = iio_create_network_context(
        cfg.pluto_addr != nullptr ? cfg.pluto_addr : "pluto.local");
  }
  if (st.ctx == nullptr) {
    *error = "failed creating IIO context (no Pluto reachable)";
    return nullptr;
  }
  st.tx = iio_context_find_device(st.ctx, "cf-ad9361-dds-core-lpc");
  struct iio_device* phy = iio_context_find_device(st.ctx, "ad9361-phy");
  if (st.tx == nullptr || phy == nullptr) {
    *error = "no supported PlutoSDR device found";
    pluto_teardown(&st);
    return nullptr;
  }
  iio_device_set_kernel_buffers_count(st.tx, 8);

  struct iio_channel* phy_chn = iio_device_find_channel(phy, "voltage0", true);
  iio_channel_attr_write(phy_chn, "rf_port_select", "A");
  iio_channel_attr_write_longlong(phy_chn, "rf_bandwidth",
                                  (long long)sdr_pluto_clamp_bw(cfg.bandwidth_hz));
  iio_channel_attr_write_longlong(phy_chn, "sampling_frequency",
                                  (long long)cfg.sample_rate_hz);
  iio_channel_attr_write_double(phy_chn, "hardwaregain",
                                sdr_pluto_clamp_atten(cfg.atten_db));
  iio_channel_attr_write_bool(
      iio_device_find_channel(phy, "altvoltage0", true), "powerdown",
      true);  // RX LO off
  iio_channel_attr_write_longlong(
      iio_device_find_channel(phy, "altvoltage1", true), "frequency",
      (long long)cfg.frequency_hz);  // TX LO

  st.tx0_i = iio_device_find_channel(st.tx, "voltage0", true);
  if (st.tx0_i == nullptr)
    st.tx0_i = iio_device_find_channel(st.tx, "altvoltage0", true);
  st.tx0_q = iio_device_find_channel(st.tx, "voltage1", true);
  if (st.tx0_q == nullptr)
    st.tx0_q = iio_device_find_channel(st.tx, "altvoltage1", true);
  if (st.tx0_i == nullptr || st.tx0_q == nullptr) {
    *error = "Pluto TX streaming channels not found";
    pluto_teardown(&st);
    return nullptr;
  }
  iio_channel_enable(st.tx0_i);
  iio_channel_enable(st.tx0_q);
#ifdef HAVE_LIBAD9361
  ad9361_set_bb_rate(phy, (unsigned long)cfg.sample_rate_hz);
#endif

  st.buf_samples = (size_t)cfg.sample_rate_hz;  // 1 s, as plutoplayer.c:33
  st.buf = iio_device_create_buffer(st.tx, st.buf_samples, false);
  if (st.buf == nullptr) {
    *error = "could not create Pluto TX buffer";
    pluto_teardown(&st);
    return nullptr;
  }
  iio_channel_attr_write_bool(
      iio_device_find_channel(phy, "altvoltage1", true), "powerdown",
      false);  // TX LO on
  return &st;
}

int pluto_send(const int16_t* values, size_t n_values, void* user) {
  // Accumulate into the iio buffer and push only FULL buffers — the
  // reference reads exactly one whole buffer per push
  // (plutoplayer.c:205-230); pushing partial pipeline blocks padded with
  // zeros would put ~1 s of silence on air after every block.
  auto* st = static_cast<PlutoState*>(user);
  int16_t* dst = (int16_t*)iio_buffer_start(st->buf);
  size_t cap = st->buf_samples * 2;
  size_t done = 0;
  while (done < n_values) {
    size_t n = n_values - done;
    if (n > cap - st->fill) n = cap - st->fill;
    memcpy(dst + st->fill, values + done, n * sizeof(int16_t));
    st->fill += n;
    done += n;
    if (st->fill == cap) {
      if (iio_buffer_push(st->buf) < 0) return 1;
      st->fill = 0;
    }
  }
  return 0;
}

void pluto_close(void* user) {
  auto* st = static_cast<PlutoState*>(user);
  if (st->buf && st->fill > 0) {
    // Flush the trailing partial buffer, zero-padded (the trailing-block
    // padding the player applies elsewhere, bladeplayer.c:262-276).
    int16_t* dst = (int16_t*)iio_buffer_start(st->buf);
    size_t cap = st->buf_samples * 2;
    memset(dst + st->fill, 0, (cap - st->fill) * sizeof(int16_t));
    iio_buffer_push(st->buf);
    st->fill = 0;
  }
  pluto_teardown(st);
}

}  // namespace
#define PLUTO_AVAILABLE true
#else
namespace {
void* pluto_open(const SdrConfig&, const char** error) {
  *error = "libiio support not compiled in (SDK not found at build time)";
  return nullptr;
}
int pluto_send(const int16_t*, size_t, void*) { return 1; }
void pluto_close(void*) {}
}  // namespace
#define PLUTO_AVAILABLE false
#endif

// ---------------------------------------------------------------------------

namespace {

const SdrBackend kBackends[] = {
    {blade_open, blade_send, blade_close, "bladerf", BLADE_AVAILABLE},
    {hack_open, hack_send, hack_close, "hackrf", HACKRF_AVAILABLE},
    {lime_open, lime_send, lime_close, "lime", LIME_AVAILABLE},
    {pluto_open, pluto_send, pluto_close, "pluto", PLUTO_AVAILABLE},
};

}  // namespace

const SdrBackend* sdr_backend(const char* name) {
  for (const auto& b : kBackends) {
    if (strcmp(b.name, name) == 0) return &b;
  }
  return nullptr;
}
