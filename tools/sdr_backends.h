// SDR transmit backends for gps-sdr-player.
//
// Each backend exposes the same pull-free sink contract as the file/null
// backends (playerfmt.h pf_sink_fn): the format pipeline pushes converted
// int16 interleaved I/Q buffers, the backend hands them to the vendor
// stack. Vendor libraries are compile-gated — `make -C tools` probes
// pkg-config and defines HAVE_LIBBLADERF etc.; selecting a backend whose
// SDK was absent at build time fails with a clear message (no SDR
// hardware/SDKs exist in the TPU build environment, so `file`/`null` are
// the testable targets).
//
// Reference behaviors mirrored (player/*.c):
//   bladerf: SC16_Q11 sync TX, 32 buffers x 32k samples, 2.6 Msps,
//            1575.42 MHz (bladeplayer.c:15-24,197-203)
//   hackrf / lime / pluto: recognized names, same RF defaults; the
//            streaming shims follow the same sink contract when built
//            against their SDKs.

#ifndef GPS_SDR_PLAYER_SDR_BACKENDS_H_
#define GPS_SDR_PLAYER_SDR_BACKENDS_H_

#include <stdint.h>
#include <stddef.h>

struct SdrConfig {
  double frequency_hz = 1575.42e6;
  double sample_rate_hz = 2.6e6;
  double bandwidth_hz = 2.5e6;
  int tx_gain = -25;  // vendor-specific units (bladeRF: txvga1 dB)
};

struct SdrBackend {
  // Returns nullptr + message on failure. `user` is backend state.
  void* (*open)(const SdrConfig& cfg, const char** error);
  int (*send)(const int16_t* values, size_t n_values, void* user);
  void (*close)(void* user);
  const char* name;
  bool available;  // SDK present at build time
};

// Look up a backend by name ("bladerf", "hackrf", "lime", "pluto").
// Returns nullptr for unknown names.
const SdrBackend* sdr_backend(const char* name);

#endif  // GPS_SDR_PLAYER_SDR_BACKENDS_H_
