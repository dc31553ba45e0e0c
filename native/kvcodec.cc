// gear_tpu native runtime: compressed-KV codec + frame store.
//
// The reference ships one native component (a CUDA GEMV kernel,
// cuda_supported_gear/quant/csrc/gemv_cuda.cu) whose compute role is replaced
// by the Pallas decode kernel. This C++ library covers the RUNTIME side the
// reference never had: fast host-side (de)serialization of compressed KV
// caches for checkpoint/resume and cross-host shipping — the wire format is
// the compressed representation (packed codes + sidebands), so snapshots are
// ~4x smaller than fp16 KV and encode/decode at memcpy-like speed.
//
// Exposed C ABI (ctypes-friendly, no pybind11 dependency):
//   gear_pack_u4 / gear_unpack_u4   — strided 4-bit pack/unpack (lane layout
//                                     identical to gear_tpu.core.quant
//                                     pack_codes_strided)
//   gear_pack_u2 / gear_unpack_u2   — 2-bit variant
//   gear_crc32                      — frame checksum
//   gear_frame_write / gear_frame_read — length+crc framed blob IO
#include <cstdint>
#include <cstdio>
#include <cstring>

extern "C" {

// Byte-strided pack: byte c of each n-element row's byte array holds codes
// {c + m * (n/vpb)} at bit position m*bits, vpb = 8/bits; int32 word w =
// bytes 4w..4w+3 little-endian. Matches
// gear_tpu/core/quant.py::pack_codes_bytestrided (the TPU-kernel-native
// layout: bitcast int32->int8 on TPU expands sublanes in byte order).
static void pack_strided(const uint8_t* codes, uint32_t* words,
                         int64_t rows, int64_t n, int bits) {
  const int vpb = 8 / bits;
  const int64_t nb = n / vpb;
  const int64_t w = nb / 4;
  for (int64_t r = 0; r < rows; ++r) {
    const uint8_t* src = codes + r * n;
    uint8_t* dst = reinterpret_cast<uint8_t*>(words + r * w);
    for (int64_t c = 0; c < nb; ++c) {
      uint8_t acc = 0;
      for (int m = 0; m < vpb; ++m) {
        acc |= static_cast<uint8_t>(src[c + m * nb] << (m * bits));
      }
      dst[c] = acc;  // little-endian: byte c of the word stream
    }
  }
}

static void unpack_strided(const uint32_t* words, uint8_t* codes,
                           int64_t rows, int64_t n, int bits) {
  const int vpb = 8 / bits;
  const int64_t nb = n / vpb;
  const int64_t w = nb / 4;
  const uint8_t mask = static_cast<uint8_t>((1u << bits) - 1u);
  for (int64_t r = 0; r < rows; ++r) {
    const uint8_t* src = reinterpret_cast<const uint8_t*>(words + r * w);
    uint8_t* dst = codes + r * n;
    for (int64_t c = 0; c < nb; ++c) {
      const uint8_t b = src[c];
      for (int m = 0; m < vpb; ++m) {
        dst[c + m * nb] = static_cast<uint8_t>((b >> (m * bits)) & mask);
      }
    }
  }
}

void gear_pack_u4(const uint8_t* codes, uint32_t* words, int64_t rows,
                  int64_t n) {
  pack_strided(codes, words, rows, n, 4);
}
void gear_unpack_u4(const uint32_t* words, uint8_t* codes, int64_t rows,
                    int64_t n) {
  unpack_strided(words, codes, rows, n, 4);
}
void gear_pack_u2(const uint8_t* codes, uint32_t* words, int64_t rows,
                  int64_t n) {
  pack_strided(codes, words, rows, n, 2);
}
void gear_unpack_u2(const uint32_t* words, uint8_t* codes, int64_t rows,
                    int64_t n) {
  unpack_strided(words, codes, rows, n, 2);
}

// CRC32 (IEEE, table-driven) for frame integrity.
static uint32_t crc_table[256];
static bool crc_init_done = false;
static void crc_init() {
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = i;
    for (int k = 0; k < 8; ++k)
      c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
    crc_table[i] = c;
  }
  crc_init_done = true;
}

uint32_t gear_crc32(const uint8_t* data, int64_t len) {
  if (!crc_init_done) crc_init();
  uint32_t c = 0xFFFFFFFFu;
  for (int64_t i = 0; i < len; ++i)
    c = crc_table[(c ^ data[i]) & 0xFF] ^ (c >> 8);
  return c ^ 0xFFFFFFFFu;
}

// Framed blob IO: [magic u32][len u64][crc u32][payload].
static const uint32_t kMagic = 0x47454152;  // "GEAR"

int gear_frame_write(const char* path, const uint8_t* data, int64_t len,
                     int append) {
  FILE* f = fopen(path, append ? "ab" : "wb");
  if (!f) return -1;
  const uint32_t crc = gear_crc32(data, len);
  const uint64_t len64 = static_cast<uint64_t>(len);
  int ok = fwrite(&kMagic, 4, 1, f) == 1 && fwrite(&len64, 8, 1, f) == 1 &&
           fwrite(&crc, 4, 1, f) == 1 &&
           fwrite(data, 1, len, f) == static_cast<size_t>(len);
  fclose(f);
  return ok ? 0 : -2;
}

// Reads frame at byte offset; returns payload length, or <0 on error
// (-1 io, -3 bad magic, -4 crc mismatch, -5 buffer too small).
int64_t gear_frame_read(const char* path, int64_t offset, uint8_t* out,
                        int64_t out_cap) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  if (fseek(f, static_cast<long>(offset), SEEK_SET) != 0) {
    fclose(f);
    return -1;
  }
  uint32_t magic = 0, crc = 0;
  uint64_t len = 0;
  if (fread(&magic, 4, 1, f) != 1 || fread(&len, 8, 1, f) != 1 ||
      fread(&crc, 4, 1, f) != 1) {
    fclose(f);
    return -1;
  }
  if (magic != kMagic) {
    fclose(f);
    return -3;
  }
  if (static_cast<int64_t>(len) > out_cap) {
    fclose(f);
    return -5;
  }
  if (fread(out, 1, len, f) != len) {
    fclose(f);
    return -1;
  }
  fclose(f);
  if (gear_crc32(out, static_cast<int64_t>(len)) != crc) return -4;
  return static_cast<int64_t>(len);
}

}  // extern "C"
