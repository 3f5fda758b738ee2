#include "bytering.h"

#include <string.h>

#include <chrono>

void ByteRing::push(const int8_t* data, size_t n) {
  std::unique_lock<std::mutex> lock(mu_);
  size_t done = 0;
  while (done < n) {
    if (closing_) return;  // shutdown: drop the remainder
    if (fill_ == buf_.size()) {
      can_write_.wait(lock);
      continue;
    }
    size_t k = n - done;
    if (k > buf_.size() - fill_) k = buf_.size() - fill_;
    if (k > buf_.size() - tail_) k = buf_.size() - tail_;
    memcpy(buf_.data() + tail_, data + done, k);
    tail_ = (tail_ + k) % buf_.size();
    fill_ += k;
    done += k;
    can_read_.notify_all();
  }
}

size_t ByteRing::drain(int8_t* out, size_t want) {
  std::unique_lock<std::mutex> lock(mu_);
  size_t got = 0;
  while (got < want) {
    if (fill_ == 0) {
      if (closing_) break;
      can_read_.wait(lock);
      continue;
    }
    size_t k = want - got;
    if (k > fill_) k = fill_;
    if (k > buf_.size() - head_) k = buf_.size() - head_;
    memcpy(out + got, buf_.data() + head_, k);
    head_ = (head_ + k) % buf_.size();
    fill_ -= k;
    got += k;
    can_write_.notify_all();
  }
  return got;
}

void ByteRing::close() {
  std::lock_guard<std::mutex> lock(mu_);
  closing_ = true;
  can_read_.notify_all();
  can_write_.notify_all();
}

size_t ByteRing::fill() const {
  std::lock_guard<std::mutex> lock(mu_);
  return fill_;
}

bool ByteRing::wait_drained(int timeout_ms) {
  std::unique_lock<std::mutex> lock(mu_);
  return can_write_.wait_for(lock, std::chrono::milliseconds(timeout_ms),
                             [this] { return fill_ == 0; });
}

extern "C" {

void* pf_ring_new(size_t capacity) { return new ByteRing(capacity); }

void pf_ring_push(void* ring, const int8_t* data, size_t n) {
  static_cast<ByteRing*>(ring)->push(data, n);
}

size_t pf_ring_drain(void* ring, int8_t* out, size_t want) {
  return static_cast<ByteRing*>(ring)->drain(out, want);
}

void pf_ring_close(void* ring) { static_cast<ByteRing*>(ring)->close(); }

size_t pf_ring_fill(const void* ring) {
  return static_cast<const ByteRing*>(ring)->fill();
}

int pf_ring_wait_drained(void* ring, int timeout_ms) {
  return static_cast<ByteRing*>(ring)->wait_drained(timeout_ms) ? 1 : 0;
}

void pf_ring_free(void* ring) { delete static_cast<ByteRing*>(ring); }

}  // extern "C"
