// Native data-ingestion kernels (the reference's C++ addon layer).
//
// The reference engine leans on node-gyp C++ addons for everything hot on
// the host side (SURVEY.md C6a/C6b/C6c: nblas-plus, nlapack,
// shm-typed-array) and streams MovieLens rows through PostgreSQL (C7).
// On the TPU rebuild the device math is XLA/Pallas; what remains host-hot is
// ingestion: parsing tens of millions of rating rows and packing the
// chunked layout. This library provides those as a C ABI for ctypes:
//
//   ycnr_count_rows(path)                    -> row count (for preallocation)
//   ycnr_parse_ratings(path, sep, ...)       -> fill user/item/rating arrays
//   ycnr_group_chunks(...)                   -> entity-grouped chunk packing
//                                               (the inner loop of
//                                                ops/layout.build_blocked_csr)
//
// Build: g++ -O3 -march=native -shared -fPIC ingest.cc -o libycnr_ingest.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// Count data rows (newline count, minus a possible "userId,..." header).
long long ycnr_count_rows(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  long long lines = 0;
  bool header = false;
  std::vector<char> buf(1 << 20);
  size_t got;
  bool first_chunk = true;
  char last = '\n';
  while ((got = fread(buf.data(), 1, buf.size(), f)) > 0) {
    if (first_chunk) {
      // same non-digit-first-byte sniff as ycnr_parse_ratings
      size_t i = 0;
      while (i < got && (buf[i] == ' ' || buf[i] == '\t')) i++;
      header = (i < got && !(buf[i] >= '0' && buf[i] <= '9'));
      first_chunk = false;
    }
    for (size_t i = 0; i < got; i++)
      if (buf[i] == '\n') lines++;
    last = buf[got - 1];
  }
  fclose(f);
  if (last != '\n') lines++;  // unterminated final line
  return lines - (header ? 1 : 0);
}

// Parse "<user><sep><item><sep><rating>..." rows. sep_mode: 0 = single char
// in sep[0] (tab or comma), 1 = the two-char separator "::" (ml-1m/10m).
// Skips a "userId..." header. Returns rows parsed, or -1 on open failure.
long long ycnr_parse_ratings(const char* path, const char* sep, int sep_mode,
                             int64_t cap, int32_t* users, int32_t* items,
                             float* ratings) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  // read whole file (bench-scale: ~500MB; fine for the import host)
  fseek(f, 0, SEEK_END);
  long long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> data((size_t)n + 1);
  if (fread(data.data(), 1, (size_t)n, f) != (size_t)n) {
    fclose(f);
    return -1;
  }
  fclose(f);
  data[(size_t)n] = '\0';

  char* p = data.data();
  char* end = p + n;
  // header sniff: any line starting with a non-digit is a header/comment
  // (covers "userId", "userID", "user_id", ... — the Python fallback is
  // case-insensitive and this must not be stricter)
  {
    char* q = p;
    while (q < end && (*q == ' ' || *q == '\t')) q++;
    if (q < end && !(*q >= '0' && *q <= '9')) {
      while (p < end && *p != '\n') p++;
      if (p < end) p++;
    }
  }
  const int sw = (sep_mode == 1 ? 2 : 1);  // separator width
  long long row = 0;
  long long bad = 0;
  while (p < end && row < cap) {
    if (*p == '\n') { p++; continue; }
    char* line_end = p;
    while (line_end < end && *line_end != '\n') line_end++;
    char* q;
    long u = strtol(p, &q, 10);
    bool ok = (q != p) && (q + sw <= line_end);
    long it = 0;
    float r = 0.0f;
    if (ok) {
      p = q + sw;
      it = strtol(p, &q, 10);
      ok = (q != p) && (q + sw <= line_end);
    }
    if (ok) {
      p = q + sw;
      r = strtof(p, &q);
      ok = (q != p);
    }
    if (ok) {
      users[row] = (int32_t)u;
      items[row] = (int32_t)it;
      ratings[row] = r;
      row++;
    } else {
      bad++;  // malformed row: skip the LINE, keep parsing (the Python
              // fallback skips bad lines too; breaking here would silently
              // truncate the dataset at the first bad row)
    }
    p = (line_end < end) ? line_end + 1 : line_end;
  }
  // a file that yielded nothing but had content is not "an empty dataset";
  // signal failure so the caller falls back to the tolerant Python parser
  if (row == 0 && bad > 0) return -2;
  return row;
}

// Chunk-pack pre-sorted COO (sorted by entity; see build_blocked_csr).
// Inputs: sorted entity/other/rating arrays (n rows), per-entity start
// offsets for the n_active entities present (starts[n_active+1]), their
// entity ids (ids[n_active]), chunk geometry, and the block assignment
// (block_of[n_active], slot_of[n_active], chunk_base[n_active] = first chunk
// row of this entity inside its block).
// Outputs (preallocated, already filled with padding values):
//   out_oi   [NB * C_B * L]  int32
//   out_r    [NB * C_B * L]  float
//   out_seg  [NB * C_B]      int32
// Returns 0.
int ycnr_pack_chunks(const int64_t* starts, const int32_t* block_of,
                     const int32_t* slot_of, const int32_t* chunk_base,
                     int64_t n_active, const int32_t* o_sorted,
                     const float* r_sorted, int64_t C_B, int64_t L,
                     int32_t* out_oi, float* out_r, int32_t* out_seg) {
  for (int64_t a = 0; a < n_active; a++) {
    const int64_t s = starts[a], t = starts[a + 1];
    const int64_t b = block_of[a];
    const int32_t slot = slot_of[a];
    int64_t c = (int64_t)chunk_base[a];
    const int64_t base_oi = (b * C_B + c) * L;
    const int64_t cnt = t - s;
    memcpy(out_oi + base_oi, o_sorted + s, sizeof(int32_t) * cnt);
    memcpy(out_r + base_oi, r_sorted + s, sizeof(float) * cnt);
    const int64_t nch = (cnt + L - 1) / L;
    for (int64_t j = 0; j < nch; j++) out_seg[b * C_B + c + j] = slot;
  }
  return 0;
}

// Row-major pack for the bucketed layout: entity j's ratings copied into
// row j of flat [n, R] outputs (prefilled with padding).
int ycnr_pack_rows(const int64_t* src_start, const int64_t* src_cnt,
                   int64_t n, const int32_t* o_sorted, const float* r_sorted,
                   int64_t R, int32_t* out_oi, float* out_r) {
  for (int64_t j = 0; j < n; j++) {
    const int64_t s = src_start[j];
    const int64_t c = src_cnt[j];
    memcpy(out_oi + j * R, o_sorted + s, sizeof(int32_t) * c);
    memcpy(out_r + j * R, r_sorted + s, sizeof(float) * c);
  }
  return 0;
}

}  // extern "C"
