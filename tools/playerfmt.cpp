// See playerfmt.h. Conversions are table-driven like the reference players
// (one 256-entry LUT of 8 expanded int16 values, built per amplitude).

#include "playerfmt.h"

#include <string.h>

#include <memory>
#include <vector>

extern "C" {

void pf_expand_1bit(const uint8_t* in, size_t n_bytes, int16_t amplitude,
                    int16_t* out) {
  // 256 x 8 LUT, MSB-first: bit (7-j) of the byte drives output j.
  int16_t lut[256][8];
  for (int b = 0; b < 256; ++b) {
    for (int j = 0; j < 8; ++j) {
      lut[b][j] = ((b >> (7 - j)) & 1) ? amplitude
                                       : static_cast<int16_t>(-amplitude);
    }
  }
  for (size_t i = 0; i < n_bytes; ++i) {
    memcpy(out + 8 * i, lut[in[i]], 8 * sizeof(int16_t));
  }
}

void pf_shift16(const int16_t* in, size_t n, int shift_right, int16_t* out) {
  for (size_t i = 0; i < n; ++i) {
    out[i] = static_cast<int16_t>(in[i] >> shift_right);
  }
}

void pf_widen8(const int8_t* in, size_t n, int shift_left, int16_t* out) {
  for (size_t i = 0; i < n; ++i) {
    out[i] = static_cast<int16_t>(static_cast<int16_t>(in[i]) << shift_left);
  }
}

void pf_narrow16to8(const int16_t* in, size_t n, int shift_right,
                    int8_t* out) {
  for (size_t i = 0; i < n; ++i) {
    out[i] = static_cast<int8_t>(in[i] >> shift_right);
  }
}

int pf_stream(FILE* in, int in_bits, int out_shift, int16_t amplitude,
              size_t buf_samples, pf_sink_fn sink, void* user) {
  if (in_bits != 1 && in_bits != 8 && in_bits != 16) return 2;
  const size_t n_values = 2 * buf_samples;  // interleaved I/Q
  std::vector<int16_t> out(n_values);

  // Raw bytes needed from the file to fill one output buffer.
  size_t raw_bytes;
  switch (in_bits) {
    case 1:  raw_bytes = n_values / 8; break;
    case 8:  raw_bytes = n_values;     break;
    default: raw_bytes = n_values * 2; break;
  }
  std::vector<uint8_t> raw(raw_bytes);

  pf_stream_state state = PF_STREAM_INIT;
  while (state != PF_STREAM_DONE) {
    size_t got = fread(raw.data(), 1, raw_bytes, in);
    if (got < raw_bytes) {
      if (ferror(in)) return 1;
      if (got == 0 && state != PF_STREAM_INIT) {
        break;  // clean EOF on a buffer boundary
      }
      // Trailing partial buffer: zero-pad to a full block so the last
      // samples still reach the sink (bladeplayer.c:262-276).
      memset(raw.data() + got, 0, raw_bytes - got);
      state = PF_STREAM_PAD_TRAILING;
    } else {
      state = PF_STREAM_READ;
    }

    switch (in_bits) {
      case 1:
        pf_expand_1bit(raw.data(), raw_bytes, amplitude, out.data());
        break;
      case 8:
        pf_widen8(reinterpret_cast<const int8_t*>(raw.data()), n_values,
                  out_shift, out.data());
        break;
      default:
        pf_shift16(reinterpret_cast<const int16_t*>(raw.data()), n_values,
                   out_shift, out.data());
        break;
    }
    if (sink(out.data(), n_values, user) != 0) return 3;
    if (state == PF_STREAM_PAD_TRAILING) state = PF_STREAM_DONE;
  }
  return 0;
}

}  // extern "C"
