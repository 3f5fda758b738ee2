// Mock libbladeRF declarations for `make -C tools vendor-check`: the exact
// API surface sdr_backends.cpp's HAVE_LIBBLADERF block uses, with the real
// SDK's signatures (bladeRF host library, bladerf.h), so the gated code is
// parsed and type-checked in CI without the vendor SDK installed.
#ifndef MOCK_LIBBLADERF_H_
#define MOCK_LIBBLADERF_H_

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

struct bladerf;
struct bladerf_metadata;

typedef enum { BLADERF_MODULE_RX, BLADERF_MODULE_TX } bladerf_module;

typedef enum {
  BLADERF_FORMAT_SC16_Q11,
  BLADERF_FORMAT_SC16_Q11_META,
} bladerf_format;

typedef unsigned int bladerf_frequency_t;

int bladerf_open(struct bladerf **device, const char *device_identifier);
void bladerf_close(struct bladerf *device);
int bladerf_set_frequency(struct bladerf *dev, bladerf_module module,
                          unsigned int frequency);
int bladerf_set_sample_rate(struct bladerf *dev, bladerf_module module,
                            unsigned int rate, unsigned int *actual);
int bladerf_set_bandwidth(struct bladerf *dev, bladerf_module module,
                          unsigned int bandwidth, unsigned int *actual);
int bladerf_set_txvga1(struct bladerf *dev, int gain);
int bladerf_set_txvga2(struct bladerf *dev, int gain);
int bladerf_sync_config(struct bladerf *dev, bladerf_module module,
                        bladerf_format format, unsigned int num_buffers,
                        unsigned int buffer_size, unsigned int num_transfers,
                        unsigned int stream_timeout);
int bladerf_enable_module(struct bladerf *dev, bladerf_module m, bool enable);
int bladerf_sync_tx(struct bladerf *dev, const void *samples,
                    unsigned int num_samples,
                    struct bladerf_metadata *metadata,
                    unsigned int timeout_ms);

#ifdef __cplusplus
}  // extern "C"
#endif

#endif  // MOCK_LIBBLADERF_H_
