// Bounded blocking byte ring: the push<->pull inversion at the heart of
// the HackRF backend (the vendor API is async-pull via tx_callback,
// reference player/hackplayer.c:53-72, while gps-sdr-player's pipeline is
// push). SDK-independent so the logic is unit-testable without libhackrf;
// a C ABI mirror (pf_ring_*) is exported from libplayerfmt.so for the
// Python tests.

#ifndef GPS_SDR_PLAYER_BYTERING_H_
#define GPS_SDR_PLAYER_BYTERING_H_

#include <stdint.h>
#include <stddef.h>

#ifdef __cplusplus
#include <condition_variable>
#include <mutex>
#include <vector>

class ByteRing {
 public:
  // A zero capacity would deadlock both sides (push waits for a drain
  // that can never make room); clamp to one byte so the ring stays
  // functional for any caller-computed capacity.
  explicit ByteRing(size_t capacity) : buf_(capacity ? capacity : 1) {}

  // Blocks while the ring is full; after close(), drops silently.
  void push(const int8_t* data, size_t n);

  // Fills up to `want` bytes, blocking until data arrives or close();
  // returns the number of bytes written (< want only once closed and
  // drained dry — the caller zero-pads the tail, like the trailing-block
  // padding of bladeplayer.c:262-276).
  size_t drain(int8_t* out, size_t want);

  void close();
  size_t fill() const;

  // Blocks until the ring is empty or timeout; returns true when drained.
  // The close() path of the HackRF shim uses this to let the async callback
  // flush the tail before hackrf_stop_tx.
  bool wait_drained(int timeout_ms);

 private:
  std::vector<int8_t> buf_;
  size_t head_ = 0, tail_ = 0, fill_ = 0;
  bool closing_ = false;
  mutable std::mutex mu_;
  std::condition_variable can_read_, can_write_;
};

extern "C" {
#endif

// C ABI for ctypes tests (and C callers).
void* pf_ring_new(size_t capacity);
void pf_ring_push(void* ring, const int8_t* data, size_t n);
size_t pf_ring_drain(void* ring, int8_t* out, size_t want);
void pf_ring_close(void* ring);
size_t pf_ring_fill(const void* ring);
int pf_ring_wait_drained(void* ring, int timeout_ms);
void pf_ring_free(void* ring);

#ifdef __cplusplus
}
#endif

#endif  // GPS_SDR_PLAYER_BYTERING_H_
