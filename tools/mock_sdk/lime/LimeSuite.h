// Mock LimeSuite declarations for `make -C tools vendor-check`: the exact
// API surface sdr_backends.cpp's HAVE_LIMESUITE block uses, with the real
// SDK's signatures (LimeSuite.h), so the gated code is parsed and
// type-checked in CI without the vendor SDK installed.
#ifndef MOCK_LIMESUITE_H_
#define MOCK_LIMESUITE_H_

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef double float_type;
typedef void lms_device_t;
typedef char lms_info_str_t[256];

static const bool LMS_CH_TX = true;
static const bool LMS_CH_RX = false;

typedef struct {
  uint32_t channel;
  uint32_t fifoSize;
  float throughputVsLatency;
  bool isTx;
  enum { LMS_FMT_F32 = 0, LMS_FMT_I16, LMS_FMT_I12 } dataFmt;
  void *handle;
} lms_stream_t;

typedef struct {
  uint64_t timestamp;
  bool waitForTimestamp;
  bool flushPartialPacket;
} lms_stream_meta_t;

typedef struct {
  bool active;
  uint32_t fifoFilledCount;
  uint32_t fifoSize;
  uint32_t underrun;
  uint32_t overrun;
  uint32_t droppedPackets;
  float_type sampleRate;
  float_type linkRate;
  uint64_t timestamp;
} lms_stream_status_t;

int LMS_GetDeviceList(lms_info_str_t *dev_list);
int LMS_Open(lms_device_t **device, const lms_info_str_t info, void *args);
int LMS_Close(lms_device_t *device);
int LMS_Reset(lms_device_t *device);
int LMS_Init(lms_device_t *device);
int LMS_GetNumChannels(lms_device_t *device, bool dir_tx);
int LMS_EnableChannel(lms_device_t *device, bool dir_tx, size_t chan,
                      bool enabled);
int LMS_SetSampleRate(lms_device_t *device, float_type rate,
                      size_t oversample);
int LMS_SetLOFrequency(lms_device_t *device, bool dir_tx, size_t chan,
                       float_type frequency);
int LMS_SetNormalizedGain(lms_device_t *device, bool dir_tx, size_t chan,
                          float_type gain);
int LMS_Calibrate(lms_device_t *device, bool dir_tx, size_t chan,
                  double bw, unsigned flags);
int LMS_SetupStream(lms_device_t *device, lms_stream_t *stream);
int LMS_DestroyStream(lms_device_t *device, lms_stream_t *stream);
int LMS_StartStream(lms_stream_t *stream);
int LMS_StopStream(lms_stream_t *stream);
int LMS_SendStream(lms_stream_t *stream, const void *samples,
                   size_t sample_count, const lms_stream_meta_t *meta,
                   unsigned timeout_ms);
int LMS_GetStreamStatus(lms_stream_t *stream, lms_stream_status_t *status);

#ifdef __cplusplus
}  // extern "C"
#endif

#endif  // MOCK_LIMESUITE_H_
