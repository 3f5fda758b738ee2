// Mock libhackrf declarations for `make -C tools vendor-check`: the exact
// API surface sdr_backends.cpp's HAVE_LIBHACKRF block uses, with the real
// SDK's signatures (libhackrf hackrf.h), so the gated code is parsed and
// type-checked in CI without the vendor SDK installed.
#ifndef MOCK_HACKRF_H_
#define MOCK_HACKRF_H_

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

enum hackrf_error {
  HACKRF_SUCCESS = 0,
  HACKRF_ERROR_OTHER = -9999,
};

typedef struct hackrf_device hackrf_device;

typedef struct {
  hackrf_device *device;
  uint8_t *buffer;
  int buffer_length;
  int valid_length;
  void *rx_ctx;
  void *tx_ctx;
} hackrf_transfer;

typedef int (*hackrf_sample_block_cb_fn)(hackrf_transfer *transfer);

int hackrf_init(void);
int hackrf_exit(void);
int hackrf_open(hackrf_device **device);
int hackrf_close(hackrf_device *device);
int hackrf_start_tx(hackrf_device *device, hackrf_sample_block_cb_fn callback,
                    void *tx_ctx);
int hackrf_stop_tx(hackrf_device *device);
int hackrf_set_freq(hackrf_device *device, const uint64_t freq_hz);
int hackrf_set_sample_rate_manual(hackrf_device *device,
                                  const uint32_t freq_hz,
                                  const uint32_t divider);
int hackrf_set_baseband_filter_bandwidth(hackrf_device *device,
                                         const uint32_t bandwidth_hz);
int hackrf_set_txvga_gain(hackrf_device *device, uint32_t value);
int hackrf_set_amp_enable(hackrf_device *device, const uint8_t value);

#ifdef __cplusplus
}  // extern "C"
#endif

#endif  // MOCK_HACKRF_H_
