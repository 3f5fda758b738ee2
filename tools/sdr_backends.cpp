#include "sdr_backends.h"

#include <stdio.h>
#include <string.h>

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
// hackrf / lime / pluto: recognized names; streaming shims are added the
// same way when built against libhackrf / LimeSuite / libiio (each adapts
// the push sink to its own buffer API, see reference player/*.c).
// ---------------------------------------------------------------------------
namespace {

void* unavailable_open(const SdrConfig&, const char** error) {
  *error = "vendor SDK support not compiled in (SDK not found at build time)";
  return nullptr;
}
int unavailable_send(const int16_t*, size_t, void*) { return 1; }
void unavailable_close(void*) {}

const SdrBackend kBackends[] = {
    {blade_open, blade_send, blade_close, "bladerf", BLADE_AVAILABLE},
    {unavailable_open, unavailable_send, unavailable_close, "hackrf", false},
    {unavailable_open, unavailable_send, unavailable_close, "lime", false},
    {unavailable_open, unavailable_send, unavailable_close, "pluto", false},
};

}  // namespace

const SdrBackend* sdr_backend(const char* name) {
  for (const auto& b : kBackends) {
    if (strcmp(b.name, name) == 0) return &b;
  }
  return nullptr;
}
