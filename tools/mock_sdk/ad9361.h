// Mock libad9361 declarations for `make -C tools vendor-check`: the exact
// API surface sdr_backends.cpp's HAVE_LIBAD9361 block uses, with the real
// SDK's signature (libad9361-iio ad9361.h).
#ifndef MOCK_AD9361_H_
#define MOCK_AD9361_H_

#ifdef __cplusplus
extern "C" {
#endif

struct iio_device;

int ad9361_set_bb_rate(struct iio_device *dev, unsigned long rate);

#ifdef __cplusplus
}  // extern "C"
#endif

#endif  // MOCK_AD9361_H_
