// Self-test for the native decoder: writes a small USEF file, runs the
// threaded queue with several workers, checks batch determinism (ticket
// ordering must make multi-thread output identical to single-thread) and
// densify invariants. Run under -fsanitize=thread/address via `make tsan`
// / `make asan` (SURVEY.md §5).

#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
struct urd_config {
  int32_t image_size;
  int32_t ndims;
  int32_t batch_size;
  int32_t num_class;
  int32_t n_planes;
  int32_t planes[8];
  float normalize_scale;
  float normalize_clip;
  int32_t weight_mode;
  float nonzero_boost;
  int32_t random_access;
  uint64_t seed;
  int32_t num_batch_storage;
  int32_t sparse;
  int32_t max_points;
  int32_t shard_rank;
  int32_t shard_count;
  int32_t sparse_weights;
};
struct urd_batch {
  const float* data;
  const int32_t* label;
  const float* weight;
  const int16_t* coords;   // narrow wire dtypes — keep in sync with
  const float* values;     // decoder.cpp urd_batch
  const uint8_t* slabels;
  const float* sweights;
  const int32_t* npoints;
  const int32_t* shape;
  int64_t cursor;
  int32_t slot;
};
struct urd_handle;
urd_handle* urd_open(const char** paths, int n, const urd_config* cfg);
int urd_start(urd_handle*, int num_threads);
int urd_next(urd_handle*, urd_batch*);
void urd_release(urd_handle*, int slot);
void urd_stop(urd_handle*);
void urd_close(urd_handle*);
void urd_seek(urd_handle*, int64_t);
int64_t urd_num_events(urd_handle*);
const char* urd_last_error();
}

static void write_u32(FILE* f, uint32_t v) { fwrite(&v, 4, 1, f); }
static void write_u64(FILE* f, uint64_t v) { fwrite(&v, 8, 1, f); }

// Write a USEF file with `n` deterministic events, 1 plane (id 0), 64x64.
static void write_test_file(const std::string& path, int n) {
  FILE* f = fopen(path.c_str(), "wb");
  assert(f);
  fwrite("USEF", 4, 1, f);
  write_u32(f, 1);  // version
  write_u32(f, 2);  // ndims
  write_u64(f, (uint64_t)n);
  long index_pos = ftell(f);
  std::vector<uint64_t> offsets(n, 0);
  fwrite(offsets.data(), 8, n, f);
  for (int e = 0; e < n; ++e) {
    offsets[e] = (uint64_t)ftello(f);
    write_u32(f, 1);  // num planes
    write_u32(f, 0);  // plane id
    write_u32(f, 64);
    write_u32(f, 64);
    uint32_t npts = 10 + e;
    write_u32(f, npts);
    std::vector<int32_t> coords;
    std::vector<float> vals;
    std::vector<uint8_t> labs;
    for (uint32_t i = 0; i < npts; ++i) {
      coords.push_back((int32_t)((e * 7 + i * 3) % 64));
      coords.push_back((int32_t)((e * 11 + i * 5) % 64));
      vals.push_back(10.0f + (float)((e + i) % 50));
      labs.push_back((uint8_t)(1 + (i % 2)));
    }
    fwrite(coords.data(), 4, coords.size(), f);
    fwrite(vals.data(), 4, vals.size(), f);
    fwrite(labs.data(), 1, labs.size(), f);
  }
  fseek(f, index_pos, SEEK_SET);
  fwrite(offsets.data(), 8, n, f);
  fclose(f);
}

// -- USEF corruption fuzz helpers (SURVEY.md §4 data-plane edge cases) ------

static std::vector<uint8_t> slurp(const std::string& path) {
  FILE* f = fopen(path.c_str(), "rb");
  assert(f);
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> b((size_t)n);
  assert(fread(b.data(), 1, b.size(), f) == b.size());
  fclose(f);
  return b;
}

static void dump(const std::string& path, const std::vector<uint8_t>& b,
                 size_t len) {
  FILE* f = fopen(path.c_str(), "wb");
  assert(f);
  fwrite(b.data(), 1, len, f);
  fclose(f);
}

static void patch32(std::vector<uint8_t>& b, size_t off, uint32_t v) {
  assert(off + 4 <= b.size());
  std::memcpy(&b[off], &v, 4);
}

static void patch64(std::vector<uint8_t>& b, size_t off, uint64_t v) {
  assert(off + 8 <= b.size());
  std::memcpy(&b[off], &v, 8);
}

// A corrupted file must be rejected CLEANLY: urd_open returns nullptr, or
// the first urd_next returns -1 with an error string — never a crash or a
// hang. batch_size covers every event so the first batch reads the whole
// file.
static bool fuzz_rejected(const char* path, int sparse) {
  urd_config cfg{};
  // image_size == the plane extent: the crop window covers every point, so
  // semantic corruptions (e.g. a bad label) cannot hide outside the crop
  cfg.image_size = 64;
  cfg.ndims = 2;
  cfg.batch_size = 2;
  cfg.num_class = 3;
  cfg.n_planes = 1;
  cfg.planes[0] = 0;
  cfg.normalize_scale = 0.01f;
  cfg.normalize_clip = 10.0f;
  cfg.weight_mode = 1;  // class_balance: validates every label
  cfg.random_access = 0;
  cfg.num_batch_storage = 2;
  cfg.sparse = sparse;
  cfg.max_points = 64;
  const char* paths[1] = {path};
  urd_handle* h = urd_open(paths, 1, &cfg);
  if (!h) return true;
  urd_start(h, 2);
  urd_batch b{};
  int slot = urd_next(h, &b);
  bool rej = slot < 0;
  if (rej) assert(urd_last_error()[0] != '\0');
  if (!rej) urd_release(h, slot);
  urd_stop(h);
  urd_close(h);
  return rej;
}

static std::vector<std::vector<float>> drain(const char* path, int threads,
                                             int batches, int random_access) {
  urd_config cfg{};
  cfg.image_size = 32;
  cfg.ndims = 2;
  cfg.batch_size = 4;
  cfg.num_class = 3;
  cfg.n_planes = 1;
  cfg.planes[0] = 0;
  cfg.normalize_scale = 0.01f;
  cfg.normalize_clip = 10.0f;
  cfg.weight_mode = 1;  // class_balance
  cfg.nonzero_boost = 1.0f;
  cfg.random_access = random_access;
  cfg.seed = 42;
  cfg.num_batch_storage = 3;
  const char* paths[1] = {path};
  urd_handle* h = urd_open(paths, 1, &cfg);
  assert(h && "open failed");
  urd_start(h, threads);
  std::vector<std::vector<float>> out;
  for (int b = 0; b < batches; ++b) {
    urd_batch batch{};
    int slot = urd_next(h, &batch);
    if (slot < 0) {
      fprintf(stderr, "error: %s\n", urd_last_error());
      assert(false);
    }
    size_t n = (size_t)cfg.batch_size * 32 * 32;
    std::vector<float> copy(batch.data, batch.data + n);
    // fold labels+weights into the checksum stream
    for (size_t i = 0; i < n; ++i)
      copy[i] += 0.001f * (float)batch.label[i] + 0.1f * batch.weight[i];
    out.push_back(std::move(copy));
    urd_release(h, slot);
  }
  urd_stop(h);
  urd_close(h);
  return out;
}

int main() {
  std::string path = "/tmp/urd_selftest.usef";
  write_test_file(path, 13);

  // determinism: 1 thread vs 4 threads, shuffled access
  auto a = drain(path.c_str(), 1, 12, 1);
  auto b = drain(path.c_str(), 4, 12, 1);
  assert(a.size() == b.size());
  for (size_t i = 0; i < a.size(); ++i) {
    assert(a[i].size() == b[i].size());
    assert(std::memcmp(a[i].data(), b[i].data(),
                       a[i].size() * sizeof(float)) == 0);
  }

  // sequential access sanity: labels in {0,1,2}, weights positive
  auto c = drain(path.c_str(), 2, 8, 0);
  for (auto& batch : c)
    for (float v : batch) assert(v == v);  // no NaNs

  // sparse mode: points round-trip with correct npoints
  {
    urd_config cfg{};
    cfg.image_size = 32;
    cfg.ndims = 2;
    cfg.batch_size = 2;
    cfg.num_class = 3;
    cfg.n_planes = 1;
    cfg.planes[0] = 0;
    cfg.random_access = 0;
    cfg.num_batch_storage = 2;
    cfg.sparse = 1;
    cfg.max_points = 64;
    const char* paths[1] = {path.c_str()};
    urd_handle* h = urd_open(paths, 1, &cfg);
    assert(h);
    urd_start(h, 2);
    urd_batch b{};
    int slot = urd_next(h, &b);
    assert(slot >= 0 && b.coords && b.npoints && !b.data);
    // event 0 has 10 points, event 1 has 11
    assert(b.npoints[0] == 10 && b.npoints[1] == 11);
    assert(b.shape[0] == 64 && b.shape[1] == 64);
    for (int i = 0; i < b.npoints[0]; ++i) {
      assert(b.coords[i * 2] >= 0 && b.coords[i * 2] < 64);
      assert(b.slabels[i] == 1 + (i % 2));
    }
    // padding zeroed
    assert(b.values[b.npoints[0]] == 0.0f);
    urd_release(h, slot);
    urd_stop(h);
    urd_close(h);
  }

  // same-handle restart: stop() rewinds to after the last CONSUMED batch
  // and start() resumes the exact stream (round-3; the slot ring and
  // ticket counters reset under the workers' join)
  {
    urd_config cfg{};
    cfg.image_size = 32;
    cfg.ndims = 2;
    cfg.batch_size = 4;
    cfg.num_class = 3;
    cfg.n_planes = 1;
    cfg.planes[0] = 0;
    cfg.normalize_scale = 0.01f;
    cfg.normalize_clip = 10.0f;
    cfg.weight_mode = 1;
    cfg.random_access = 1;
    cfg.seed = 42;
    cfg.num_batch_storage = 3;
    const char* paths[1] = {path.c_str()};
    urd_handle* h = urd_open(paths, 1, &cfg);
    assert(h);
    size_t n = (size_t)cfg.batch_size * 32 * 32;
    std::vector<std::vector<float>> got;
    urd_start(h, 3);
    for (int k = 0; k < 3; ++k) {
      urd_batch b{};
      int slot = urd_next(h, &b);
      assert(slot >= 0);
      got.emplace_back(b.data, b.data + n);
      urd_release(h, slot);
    }
    urd_stop(h);
    urd_start(h, 2);  // restart mid-stream with a different thread count
    for (int k = 3; k < 6; ++k) {
      urd_batch b{};
      int slot = urd_next(h, &b);
      assert(slot >= 0);
      got.emplace_back(b.data, b.data + n);
      urd_release(h, slot);
    }
    urd_stop(h);
    urd_close(h);
    // must equal the uninterrupted shuffled stream (fresh handle, 1 thread)
    auto plain = [&](int batches) {
      urd_handle* h2 = urd_open(paths, 1, &cfg);
      assert(h2);
      urd_start(h2, 1);
      std::vector<std::vector<float>> out;
      for (int k = 0; k < batches; ++k) {
        urd_batch b{};
        int slot = urd_next(h2, &b);
        assert(slot >= 0);
        out.emplace_back(b.data, b.data + n);
        urd_release(h2, slot);
      }
      urd_stop(h2);
      urd_close(h2);
      return out;
    };
    auto ref = plain(6);
    for (int k = 0; k < 6; ++k)
      assert(std::memcmp(got[k].data(), ref[k].data(),
                         n * sizeof(float)) == 0);
  }

  // USEF corruption fuzz sweep (SURVEY.md §4 data-plane edge cases, §5
  // failure detection): >= 50 deterministic corruptions of a valid file;
  // EVERY one must be rejected cleanly (nullptr open or -1 next), never a
  // crash — run under `make tsan` / `make asan` this doubles as the
  // sanitizer gate on the reject paths. Mirrors tests/test_usef_fuzz.py
  // (the numpy-reader sweep).
  {
    std::string base_path = "/tmp/urd_fuzz_base.usef";
    write_test_file(base_path, 2);  // 2 events -> one batch reads the file
    auto base = slurp(base_path);
    std::string fz = "/tmp/urd_fuzz_case.usef";
    int n_cases = 0, n_rejected = 0;
    auto expect_reject = [&](const std::vector<uint8_t>& buf, size_t len,
                             int sparse, const char* what) {
      dump(fz, buf, len);
      ++n_cases;
      if (fuzz_rejected(fz.c_str(), sparse)) {
        ++n_rejected;
      } else {
        fprintf(stderr, "fuzz case %d (%s) NOT rejected\n", n_cases, what);
      }
    };
    // 30 truncation points spread over the file (every strict prefix cuts
    // the header, the index, or the final event's payload)
    for (int i = 0; i < 30; ++i)
      expect_reject(base, base.size() * (size_t)i / 30, 0, "truncation");
    {auto b = base; b[0] = 'X'; expect_reject(b, b.size(), 0, "magic");}
    {auto b = base; patch32(b, 0, 0); expect_reject(b, b.size(), 0, "magic0");}
    {auto b = base; patch32(b, 4, 0); expect_reject(b, b.size(), 0, "ver0");}
    {auto b = base; patch32(b, 4, 3); expect_reject(b, b.size(), 0, "ver3");}
    {auto b = base; patch32(b, 8, 0); expect_reject(b, b.size(), 0, "nd0");}
    {auto b = base; patch32(b, 8, 9); expect_reject(b, b.size(), 0, "nd9");}
    // ndims 3 is in-bounds for the format but mismatches cfg.ndims=2
    {auto b = base; patch32(b, 8, 3); expect_reject(b, b.size(), 0, "ndmis");}
    {auto b = base; patch64(b, 12, ~0ull);
     expect_reject(b, b.size(), 0, "nev-huge");}
    // n=3: the over-long index overlaps event payload; the garbage third
    // offset lands outside [hdr_end, size) -> offset bound
    {auto b = base; patch64(b, 12, 3); expect_reject(b, b.size(), 0, "nev+1");}
    // index offset corruptions (offsets live at bytes 20..36)
    {auto b = base; patch64(b, 20, 0); expect_reject(b, b.size(), 0, "off0");}
    {auto b = base; patch64(b, 20, 5); expect_reject(b, b.size(), 0, "off5");}
    {auto b = base; patch64(b, 20, b.size());
     expect_reject(b, b.size(), 0, "off-eof");}
    {auto b = base; patch64(b, 20, b.size() - 1);
     expect_reject(b, b.size(), 0, "off-eof-1");}
    {auto b = base; patch64(b, 20, 1ull << 63);
     expect_reject(b, b.size(), 0, "off-2^63");}
    // event-record corruptions: event 0 starts at byte 36
    // (20-byte header + 2 * 8-byte offsets); its layout is
    // num_planes(4) plane_id(4) shape(8) npoints(4) coords(10*8)
    // values(10*4) labels(10)
    const size_t ev0 = 36;
    {auto b = base; patch32(b, ev0, 0xFFFFFFu);
     expect_reject(b, b.size(), 0, "planes-huge");}
    {auto b = base; patch32(b, ev0 + 16, 0x7FFFFFFFu);
     expect_reject(b, b.size(), 0, "npts-huge");}
    // npoints+1 shifts the stream: the trailing coord pair is read from
    // float charge bytes (values ~10-60 -> int32 ~0x41x00000, far outside
    // the 64-pixel shape) -> the sparse coord validation trips
    {auto b = base; patch32(b, ev0 + 16, 11);
     expect_reject(b, b.size(), 1, "npts+1");}
    // semantic: a label byte >= num_class (labels start after the 20-byte
    // plane header + 80 coord bytes + 40 value bytes)
    {auto b = base; b[ev0 + 20 + 80 + 40] = 250;
     expect_reject(b, b.size(), 0, "label>=C");}
    // semantic, sparse wire: coord outside the declared shape
    {auto b = base; patch32(b, ev0 + 20, (uint32_t)(int32_t)-1);
     expect_reject(b, b.size(), 1, "coord<0");}
    {auto b = base; patch32(b, ev0 + 20, 70);
     expect_reject(b, b.size(), 1, "coord>=shape");}
    // semantic, sparse wire: plane extent >= 32768 exceeds int16
    {auto b = base; patch32(b, ev0 + 8, 40000); patch32(b, ev0 + 12, 40000);
     expect_reject(b, b.size(), 1, "extent>=2^15");}
    // v2 framing over a v1 payload: the LAST event's has_weights byte
    // lands past EOF
    {auto b = base; patch32(b, 4, 2); expect_reject(b, b.size(), 0, "v2-v1");}
    assert(n_cases >= 50);
    assert(n_rejected == n_cases);
    printf("fuzz sweep: %d corrupted files, all rejected cleanly\n",
           n_cases);
  }

  printf("selftest OK (%zu batches, deterministic across thread counts; "
         "sparse mode OK; same-handle restart OK)\n", a.size());
  return 0;
}
