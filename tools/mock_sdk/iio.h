// Mock libiio declarations for `make -C tools vendor-check`: the exact API
// surface sdr_backends.cpp's HAVE_LIBIIO block uses, with the real SDK's
// signatures (libiio iio.h), so the gated code is parsed and type-checked
// in CI without the vendor SDK installed.
#ifndef MOCK_IIO_H_
#define MOCK_IIO_H_

#include <stddef.h>
#include <sys/types.h>

#ifdef __cplusplus
extern "C" {
#endif

struct iio_context;
struct iio_device;
struct iio_channel;
struct iio_buffer;

struct iio_context *iio_create_default_context(void);
struct iio_context *iio_create_network_context(const char *host);
void iio_context_destroy(struct iio_context *ctx);
struct iio_device *iio_context_find_device(const struct iio_context *ctx,
                                           const char *name);
int iio_device_set_kernel_buffers_count(const struct iio_device *dev,
                                        unsigned int nb_buffers);
struct iio_channel *iio_device_find_channel(const struct iio_device *dev,
                                            const char *name, bool output);
ssize_t iio_channel_attr_write(const struct iio_channel *chn,
                               const char *attr, const char *src);
int iio_channel_attr_write_bool(const struct iio_channel *chn,
                                const char *attr, bool val);
int iio_channel_attr_write_longlong(const struct iio_channel *chn,
                                    const char *attr, long long val);
int iio_channel_attr_write_double(const struct iio_channel *chn,
                                  const char *attr, double val);
void iio_channel_enable(struct iio_channel *chn);
void iio_channel_disable(struct iio_channel *chn);
struct iio_buffer *iio_device_create_buffer(const struct iio_device *dev,
                                            size_t samples_count,
                                            bool cyclic);
void iio_buffer_destroy(struct iio_buffer *buf);
void *iio_buffer_start(const struct iio_buffer *buf);
ssize_t iio_buffer_push(struct iio_buffer *buf);

#ifdef __cplusplus
}  // extern "C"
#endif

#endif  // MOCK_IIO_H_
