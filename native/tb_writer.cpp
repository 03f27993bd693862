// TensorBoard event-file writer (native core).
//
// Replaces the reference's TensorFlow dependency — its Logger
// (src/util/tensorboard_logger.py:14-75) pulls in the whole TF C++ runtime
// just to write scalar summaries. This is a standalone implementation of
// the two formats involved:
//   * TFRecord framing: u64-LE length, masked CRC32C(length), payload,
//     masked CRC32C(payload).
//   * tensorflow.Event / Summary protobuf wire encoding (hand-rolled for
//     the scalar + histogram subset used by training loops).
//
// Exposed as a C API for ctypes binding (metapde_tpu/utils/tb_writer.py);
// a pure-Python fallback with identical byte output exists for environments
// without a compiler.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------- crc32c
uint32_t crc_table[256];
bool crc_init_done = false;

void crc_init() {
  if (crc_init_done) return;
  const uint32_t poly = 0x82f63b78u;  // Castagnoli, reflected
  for (uint32_t i = 0; i < 256; i++) {
    uint32_t c = i;
    for (int k = 0; k < 8; k++) c = (c & 1) ? (poly ^ (c >> 1)) : (c >> 1);
    crc_table[i] = c;
  }
  crc_init_done = true;
}

uint32_t crc32c(const uint8_t* data, size_t n) {
  crc_init();
  uint32_t c = 0xFFFFFFFFu;
  for (size_t i = 0; i < n; i++) c = crc_table[(c ^ data[i]) & 0xFF] ^ (c >> 8);
  return c ^ 0xFFFFFFFFu;
}

uint32_t masked_crc(const uint8_t* data, size_t n) {
  uint32_t crc = crc32c(data, n);
  return ((crc >> 15) | (crc << 17)) + 0xa282ead8u;
}

// ------------------------------------------------------------- protobuf
void put_varint(std::string& out, uint64_t v) {
  while (v >= 0x80) {
    out.push_back(static_cast<char>((v & 0x7F) | 0x80));
    v >>= 7;
  }
  out.push_back(static_cast<char>(v));
}

void put_tag(std::string& out, int field, int wire) {
  put_varint(out, static_cast<uint64_t>((field << 3) | wire));
}

void put_double(std::string& out, int field, double v) {
  put_tag(out, field, 1);
  char buf[8];
  memcpy(buf, &v, 8);
  out.append(buf, 8);
}

void put_float(std::string& out, int field, float v) {
  put_tag(out, field, 5);
  char buf[4];
  memcpy(buf, &v, 4);
  out.append(buf, 4);
}

void put_int64(std::string& out, int field, int64_t v) {
  put_tag(out, field, 0);
  put_varint(out, static_cast<uint64_t>(v));
}

void put_bytes(std::string& out, int field, const std::string& v) {
  put_tag(out, field, 2);
  put_varint(out, v.size());
  out.append(v);
}

// tensorflow.Event wrapper: wall_time=1 (double), step=2 (int64),
// file_version=3 (string), summary=5 (message)
std::string encode_event(double wall_time, int64_t step,
                         const std::string* file_version,
                         const std::string* summary) {
  std::string e;
  put_double(e, 1, wall_time);
  if (step >= 0) put_int64(e, 2, step);
  if (file_version) put_bytes(e, 3, *file_version);
  if (summary) put_bytes(e, 5, *summary);
  return e;
}

// Summary { repeated Value value = 1; }
// Value  { string tag = 1; float simple_value = 2; HistogramProto histo = 5; }
std::string encode_scalar_summary(const char* tag, float value) {
  std::string v;
  put_bytes(v, 1, std::string(tag));
  put_float(v, 2, value);
  std::string s;
  put_bytes(s, 1, v);
  return s;
}

// HistogramProto: min=1 max=2 num=3 sum=4 sum_squares=5 (doubles),
// bucket_limit=6 (packed double), bucket=7 (packed double)
std::string encode_histo_summary(const char* tag, const double* limits,
                                 const double* counts, int n_buckets,
                                 double mn, double mx, double num, double sum,
                                 double sum_sq) {
  std::string h;
  put_double(h, 1, mn);
  put_double(h, 2, mx);
  put_double(h, 3, num);
  put_double(h, 4, sum);
  put_double(h, 5, sum_sq);
  std::string packed_limits(reinterpret_cast<const char*>(limits),
                            n_buckets * 8);
  std::string packed_counts(reinterpret_cast<const char*>(counts),
                            n_buckets * 8);
  put_bytes(h, 6, packed_limits);
  put_bytes(h, 7, packed_counts);

  std::string v;
  put_bytes(v, 1, std::string(tag));
  put_tag(v, 5, 2);
  put_varint(v, h.size());
  v.append(h);

  std::string s;
  put_bytes(s, 1, v);
  return s;
}

struct Writer {
  FILE* f;
};

void write_record(Writer* w, const std::string& payload) {
  uint64_t len = payload.size();
  uint8_t len_buf[8];
  memcpy(len_buf, &len, 8);
  uint32_t len_crc = masked_crc(len_buf, 8);
  uint32_t data_crc = masked_crc(
      reinterpret_cast<const uint8_t*>(payload.data()), payload.size());
  fwrite(len_buf, 1, 8, w->f);
  fwrite(&len_crc, 4, 1, w->f);
  fwrite(payload.data(), 1, payload.size(), w->f);
  fwrite(&data_crc, 4, 1, w->f);
  fflush(w->f);
}

}  // namespace

extern "C" {

void* tbw_open(const char* path, double wall_time) {
  FILE* f = fopen(path, "wb");
  if (!f) return nullptr;
  Writer* w = new Writer{f};
  std::string version = "brain.Event:2";
  write_record(w, encode_event(wall_time, -1, &version, nullptr));
  return w;
}

void tbw_scalar(void* handle, const char* tag, int64_t step, float value,
                double wall_time) {
  Writer* w = static_cast<Writer*>(handle);
  std::string s = encode_scalar_summary(tag, value);
  write_record(w, encode_event(wall_time, step, nullptr, &s));
}

void tbw_histogram(void* handle, const char* tag, int64_t step,
                   const double* limits, const double* counts, int n_buckets,
                   double mn, double mx, double num, double sum, double sum_sq,
                   double wall_time) {
  Writer* w = static_cast<Writer*>(handle);
  std::string s = encode_histo_summary(tag, limits, counts, n_buckets, mn, mx,
                                       num, sum, sum_sq);
  write_record(w, encode_event(wall_time, step, nullptr, &s));
}

void tbw_close(void* handle) {
  Writer* w = static_cast<Writer*>(handle);
  fclose(w->f);
  delete w;
}

// test hook: masked crc of a buffer
uint32_t tbw_masked_crc(const uint8_t* data, size_t n) {
  return masked_crc(data, n);
}

}  // extern "C"
