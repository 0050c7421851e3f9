// dsg_io: native IO runtime for drivescenegen_tpu.
//
// TFRecord shard indexing + CRC32-C verification in C++ (the role the
// reference delegates to tensorflow's C++ record reader,
// scripts/data_preprocess.py:161). Python binds via ctypes
// (drivescenegen_tpu/data/native_io.py) and mmaps the file, so record
// payloads are zero-copy slices; this module only walks the framing and
// checksums the payloads (the CPU-heavy part).
//
// Format: uint64 length | uint32 masked_crc(length) | data | uint32
// masked_crc(data), masked_crc = ((crc>>15 | crc<<17) + 0xa282ead8).
//
// Build: make -C native   (g++ -O3 -shared -fPIC dsg_io.cpp -o libdsg_io.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// CRC32-C (Castagnoli), slice-by-8 table-driven.
// ---------------------------------------------------------------------------

uint32_t crc_tables[8][256];
bool tables_ready = false;

void init_tables() {
  if (tables_ready) return;
  const uint32_t poly = 0x82F63B78u;  // reflected Castagnoli
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t crc = i;
    for (int k = 0; k < 8; ++k) crc = (crc & 1) ? (crc >> 1) ^ poly : crc >> 1;
    crc_tables[0][i] = crc;
  }
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t crc = crc_tables[0][i];
    for (int t = 1; t < 8; ++t) {
      crc = crc_tables[0][crc & 0xFF] ^ (crc >> 8);
      crc_tables[t][i] = crc;
    }
  }
  tables_ready = true;
}

uint32_t crc32c(const uint8_t* data, size_t len) {
  init_tables();
  uint32_t crc = 0xFFFFFFFFu;
  while (len >= 8) {
    uint64_t word;
    std::memcpy(&word, data, 8);
    word ^= crc;  // little-endian host assumed (x86/ARM LE)
    crc = crc_tables[7][word & 0xFF] ^ crc_tables[6][(word >> 8) & 0xFF] ^
          crc_tables[5][(word >> 16) & 0xFF] ^ crc_tables[4][(word >> 24) & 0xFF] ^
          crc_tables[3][(word >> 32) & 0xFF] ^ crc_tables[2][(word >> 40) & 0xFF] ^
          crc_tables[1][(word >> 48) & 0xFF] ^ crc_tables[0][(word >> 56) & 0xFF];
    data += 8;
    len -= 8;
  }
  while (len--) crc = crc_tables[0][(crc ^ *data++) & 0xFF] ^ (crc >> 8);
  return crc ^ 0xFFFFFFFFu;
}

inline uint32_t masked_crc(uint32_t crc) {
  return ((crc >> 15) | (crc << 17)) + 0xA282EAD8u;
}

}  // namespace

extern "C" {

// Exposed for parity tests against the Python implementation.
uint32_t dsg_crc32c(const uint8_t* data, uint64_t len) { return crc32c(data, len); }

uint32_t dsg_masked_crc32c(const uint8_t* data, uint64_t len) {
  return masked_crc(crc32c(data, len));
}

// Index a TFRecord file already mapped/loaded at `buf` of size `size`.
// On success returns the record count and mallocs *offsets / *lengths
// (payload byte offsets into buf). Caller frees with dsg_free.
// Errors: -1 truncated header, -2 length-crc mismatch, -3 truncated
// payload, -4 payload-crc mismatch.
int64_t dsg_tfrecord_index_buffer(const uint8_t* buf, uint64_t size,
                                  int verify_crc, uint64_t** offsets,
                                  uint64_t** lengths) {
  std::vector<uint64_t> offs, lens;
  uint64_t pos = 0;
  while (pos < size) {
    if (pos + 12 > size) return -1;
    uint64_t len;
    uint32_t len_crc;
    std::memcpy(&len, buf + pos, 8);
    std::memcpy(&len_crc, buf + pos + 8, 4);
    if (verify_crc && masked_crc(crc32c(buf + pos, 8)) != len_crc) return -2;
    pos += 12;
    if (pos + len + 4 > size) return -3;
    if (verify_crc) {
      uint32_t data_crc;
      std::memcpy(&data_crc, buf + pos + len, 4);
      if (masked_crc(crc32c(buf + pos, len)) != data_crc) return -4;
    }
    offs.push_back(pos);
    lens.push_back(len);
    pos += len + 4;
  }
  uint64_t n = offs.size();
  *offsets = static_cast<uint64_t*>(std::malloc(n * sizeof(uint64_t)));
  *lengths = static_cast<uint64_t*>(std::malloc(n * sizeof(uint64_t)));
  if (n) {
    std::memcpy(*offsets, offs.data(), n * sizeof(uint64_t));
    std::memcpy(*lengths, lens.data(), n * sizeof(uint64_t));
  }
  return static_cast<int64_t>(n);
}

void dsg_free(void* p) { std::free(p); }

// Write records (concatenated payloads + length array) as a TFRecord file.
// Returns 0 on success, -1 on IO error.
int dsg_tfrecord_write(const char* path, const uint8_t* payloads,
                       const uint64_t* lens, uint64_t n) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  const uint8_t* p = payloads;
  for (uint64_t i = 0; i < n; ++i) {
    uint64_t len = lens[i];
    uint32_t len_crc = masked_crc(crc32c(reinterpret_cast<const uint8_t*>(&len), 8));
    uint32_t data_crc = masked_crc(crc32c(p, len));
    if (std::fwrite(&len, 8, 1, f) != 1 || std::fwrite(&len_crc, 4, 1, f) != 1 ||
        (len && std::fwrite(p, len, 1, f) != 1) ||
        std::fwrite(&data_crc, 4, 1, f) != 1) {
      std::fclose(f);
      return -1;
    }
    p += len;
  }
  std::fclose(f);
  return 0;
}

}  // extern "C"
