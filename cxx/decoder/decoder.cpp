// uresnet_tpu native data plane: threaded USEF decoder + rotating batch queue.
//
// Capability parity (SURVEY.md §2.2): the reference relies on larcv2's C++
// ThreadProcessor/BatchFiller — N worker threads randomly access event trees,
// decode sparse images into dense float tensors, and assemble batches into
// NumBatchStorage rotating buffers consumed (near) zero-copy from Python.
// This is the TPU-native equivalent: ROOT is replaced by the flat USEF sparse
// event format (uresnet_tpu/data/events.py defines the layout), and the
// dense-ification semantics (crop/pad-to-pow2 around the charge centroid,
// normalization, label map, weight-map construction) are bit-identical to the
// numpy oracle in uresnet_tpu/data/pipeline.py — tested in
// tests/test_cxx_decoder.py.
//
// Determinism: fill *tickets* are claimed atomically and consumed in ticket
// order, so batch order is deterministic for any thread count. Worker races
// are confined to slot hand-off (mutex + condvars); build with `make tsan`
// / `make asan` for sanitizer runs (SURVEY.md §5 race detection).
//
// C ABI only (bound from Python via ctypes — no pybind11 in this image).

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <random>
#include <stdexcept>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x46455355;  // 'USEF' little-endian

enum WeightMode : int32_t {
  kWeightOnes = 0,
  kWeightClassBalance = 1,
  kWeightNonzero = 2,
  kWeightFile = 3,  // per-point weights stored in the USEF v2 file
};

struct EventRef {
  int32_t file_idx;
  uint64_t offset;
};

// Epoch shuffle PRNG: splitmix64, chosen because the Python BatchLoader
// implements the exact same stream (uresnet_tpu/data/loader.py
// epoch_order) — the event order is a pure function of (seed, epoch), so
// checkpoints resume bit-identically even across decoder backends.
struct SplitMix64 {
  uint64_t s;
  explicit SplitMix64(uint64_t seed) : s(seed) {}
  uint64_t next() {
    s += 0x9e3779b97f4a7c15ull;
    uint64_t z = s;
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ull;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebull;
    return z ^ (z >> 31);
  }
};

struct FileInfo {
  std::string path;
  uint32_t version;  // 1 | 2 (v2 adds optional per-point weights)
  uint32_t ndims;
  std::vector<uint64_t> offsets;
};

// ---------------------------------------------------------------------------
// USEF reading
// ---------------------------------------------------------------------------

struct Reader {
  FILE* f = nullptr;
  uint64_t size = 0;  // file byte size: upper bound for count sanity checks
  ~Reader() {
    if (f) fclose(f);
  }
  bool open(const std::string& path) {
    f = fopen(path.c_str(), "rb");
    if (!f) return false;
    if (fseeko(f, 0, SEEK_END) != 0) return false;
    size = (uint64_t)ftello(f);
    return fseeko(f, 0, SEEK_SET) == 0;
  }
  bool read(void* dst, size_t n) { return fread(dst, 1, n, f) == n; }
  bool seek(uint64_t off) { return fseeko(f, (off_t)off, SEEK_SET) == 0; }
};

bool read_header(const std::string& path, FileInfo* info) {
  Reader r;
  if (!r.open(path)) return false;
  uint32_t magic, version, ndims;
  uint64_t n;
  if (!r.read(&magic, 4) || magic != kMagic) return false;
  if (!r.read(&version, 4) || (version != 1 && version != 2)) return false;
  if (!r.read(&ndims, 4)) return false;
  if (ndims < 1 || ndims > 8) return false;  // corrupt dimensionality
  if (!r.read(&n, 8)) return false;
  // Bound counts by the file size BEFORE resize: a corrupt header with
  // n ~ 2^64 would otherwise attempt a huge allocation and abort via
  // std::bad_alloc instead of the loud error-return contract. The index
  // alone needs 8 bytes per event past the 20-byte header.
  if (r.size < 20 || n > (r.size - 20) / 8) return false;
  info->path = path;
  info->version = version;
  info->ndims = ndims;
  info->offsets.resize(n);
  if (n && !r.read(info->offsets.data(), 8 * n)) return false;
  // Every event offset must land inside the payload region (mirrors
  // data/events.py read_header): a corrupt index pointing into the
  // header/index or past EOF would otherwise parse garbage as an event.
  const uint64_t hdr_end = 20 + 8 * n;
  for (uint64_t off : info->offsets)
    if (off < hdr_end || off >= r.size) return false;
  return true;
}

struct SparsePlane {
  uint32_t plane_id;
  std::vector<uint32_t> shape;
  std::vector<int32_t> coords;  // npoints * ndims
  std::vector<float> values;
  std::vector<uint8_t> labels;
  std::vector<float> weights;  // v2 per-point weight product (empty = none)
  bool has_weights = false;
};

bool read_event(Reader& r, uint64_t offset, uint32_t version, uint32_t ndims,
                std::vector<SparsePlane>* planes) {
  if (!r.seek(offset)) return false;
  uint32_t num_planes;
  if (!r.read(&num_planes, 4)) return false;
  // Size-bound corrupt counts before resize (see read_header): a plane
  // record occupies >= 12 bytes, a point >= 4*ndims + 5 bytes.
  if (num_planes > r.size / 12) return false;
  planes->clear();
  planes->resize(num_planes);
  for (auto& pl : *planes) {
    if (!r.read(&pl.plane_id, 4)) return false;
    pl.shape.resize(ndims);
    if (!r.read(pl.shape.data(), 4 * ndims)) return false;
    uint32_t n;
    if (!r.read(&n, 4)) return false;
    if ((uint64_t)n > r.size / (4 * (uint64_t)ndims + 5)) return false;
    pl.coords.resize((size_t)n * ndims);
    pl.values.resize(n);
    pl.labels.resize(n);
    if (n) {
      if (!r.read(pl.coords.data(), 4 * pl.coords.size())) return false;
      if (!r.read(pl.values.data(), 4 * n)) return false;
      if (!r.read(pl.labels.data(), n)) return false;
    }
    pl.has_weights = false;
    pl.weights.clear();
    if (version >= 2) {
      uint8_t has_w;
      if (!r.read(&has_w, 1)) return false;
      if (has_w) {
        pl.has_weights = true;
        pl.weights.resize(n);
        if (n && !r.read(pl.weights.data(), 4 * n)) return false;
      }
    }
  }
  return true;
}

// ---------------------------------------------------------------------------
// densify (bit-identical to uresnet_tpu/data/pipeline.py)
// ---------------------------------------------------------------------------

struct DenseConfig {
  int32_t image_size;
  int32_t ndims;
  float normalize_scale;
  float normalize_clip;
  int32_t weight_mode;
  float nonzero_boost;
  int32_t num_class;
};

// Returns nullptr on success, or a static error string (surfaced through
// urd_last_error by the calling worker — workers must not throw).
const char* densify_plane(const SparsePlane& pl, const DenseConfig& cfg,
                          float* data, int32_t* label, float* weight) {
  const int nd = cfg.ndims;
  const int64_t target = cfg.image_size;
  int64_t npix = 1;
  for (int d = 0; d < nd; ++d) npix *= target;
  std::memset(data, 0, npix * sizeof(float));
  std::memset(label, 0, npix * sizeof(int32_t));

  const size_t n = pl.values.size();
  // Crop policy (identical to uresnet_tpu/data/pipeline.py
  // crop_or_pad_coords): charge-weighted centroid in double, clamped so the
  // max-charge pixel stays inside the window, then clamped to the image.
  std::vector<double> center(nd);
  bool have_anchor = false;
  std::vector<int64_t> anchor(nd, 0);
  if (n) {
    double vsum = 0.0;
    size_t imax = 0;
    for (size_t i = 0; i < n; ++i) {
      vsum += pl.values[i];
      if (pl.values[i] > pl.values[imax]) imax = i;
    }
    if (vsum > 0.0) {
      for (size_t i = 0; i < n; ++i) {
        double w = pl.values[i] / vsum;
        for (int d = 0; d < nd; ++d) center[d] += w * pl.coords[i * nd + d];
      }
    } else {
      imax = 0;
      for (size_t i = 0; i < n; ++i)
        for (int d = 0; d < nd; ++d) center[d] += pl.coords[i * nd + d];
      for (int d = 0; d < nd; ++d) center[d] /= (double)n;
    }
    have_anchor = true;
    for (int d = 0; d < nd; ++d) anchor[d] = pl.coords[imax * nd + d];
  } else {
    for (int d = 0; d < nd; ++d) center[d] = pl.shape[d] / 2.0;
  }
  std::vector<int64_t> origin(nd);
  for (int d = 0; d < nd; ++d) {
    int64_t lo = (int64_t)std::floor(center[d] - target / 2.0 + 0.5);
    if (have_anchor) {
      int64_t amin = anchor[d] - target + 1;
      if (lo < amin) lo = amin;
      if (lo > anchor[d]) lo = anchor[d];
    }
    int64_t hi = (int64_t)pl.shape[d] > target ? (int64_t)pl.shape[d] - target : 0;
    if (lo < 0) lo = 0;
    if (lo > hi) lo = hi;
    origin[d] = lo;
  }
  const bool file_weights = cfg.weight_mode == kWeightFile;
  if (file_weights) {
    if (!pl.has_weights)
      return "weight_mode='file' but the plane carries no stored weights "
             "(USEF v1 file, or converted without --weight-producer)";
    // background pixels take weight 1.0 (data/pipeline.py 'file' mode)
    for (int64_t i = 0; i < npix; ++i) weight[i] = 1.0f;
  }
  for (size_t i = 0; i < n; ++i) {
    int64_t flat = 0;
    bool in = true;
    for (int d = 0; d < nd; ++d) {
      int64_t c = (int64_t)pl.coords[i * nd + d] - origin[d];
      if (c < 0 || c >= target) {
        in = false;
        break;
      }
      flat = flat * target + c;
    }
    if (!in) continue;
    float v = pl.values[i] * cfg.normalize_scale;
    if (v < 0.f) v = 0.f;
    if (v > cfg.normalize_clip) v = cfg.normalize_clip;
    data[flat] = v;
    label[flat] = pl.labels[i];
    if (file_weights) weight[flat] = pl.weights[i];
  }

  switch (cfg.weight_mode) {
    case kWeightOnes:
      for (int64_t i = 0; i < npix; ++i) weight[i] = 1.0f;
      break;
    case kWeightNonzero:
      for (int64_t i = 0; i < npix; ++i)
        weight[i] = data[i] > 0.f ? 1.0f + cfg.nonzero_boost : 1.0f;
      break;
    case kWeightClassBalance: {
      std::vector<int64_t> counts(cfg.num_class, 0);
      for (int64_t i = 0; i < npix; ++i) {
        // bounds-checked: a corrupt label would otherwise index past
        // `counts` (mirrors the loud failure in data/pipeline.py)
        if (label[i] < 0 || label[i] >= cfg.num_class)
          return "label value >= num_class (corrupt file or wrong "
                 "num_class)";
        counts[label[i]]++;
      }
      std::vector<float> w(cfg.num_class, 0.f);
      for (int c = 0; c < cfg.num_class; ++c)
        if (counts[c])
          w[c] = (float)((double)npix / ((double)cfg.num_class * counts[c]));
      for (int64_t i = 0; i < npix; ++i) weight[i] = w[label[i]];
      break;
    }
    case kWeightFile:
      break;  // filled in the scatter loop above
    default:
      return "bad weight mode";
  }
  return nullptr;
}

}  // namespace

// ---------------------------------------------------------------------------
// public C ABI
// ---------------------------------------------------------------------------

extern "C" {

struct urd_config {
  int32_t image_size;
  int32_t ndims;
  int32_t batch_size;  // images per batch (= events * n_planes)
  int32_t num_class;
  int32_t n_planes;
  int32_t planes[8];
  float normalize_scale;
  float normalize_clip;
  int32_t weight_mode;  // 0 ones | 1 class_balance | 2 nonzero
  float nonzero_boost;
  int32_t random_access;  // per-epoch shuffle (mt19937, own stream)
  uint64_t seed;
  int32_t num_batch_storage;
  int32_t sparse;       // 1: emit padded sparse batches (device densify)
  int32_t max_points;   // sparse pad length per image
  int32_t shard_rank;   // multi-host SPMD input sharding: this host reads
  int32_t shard_count;  // every shard_count-th event; batch_size stays the
                        // GLOBAL batch (local rows = batch/shard_count).
                        // shard_count <= 0 means 1.
  int32_t sparse_weights;  // 1: sparse batches also carry the per-point
                           // file weights (USEF v2, weight_mode='file')
};

struct urd_batch {
  // dense mode
  const float* data;     // (batch, S^ndims) C-order
  const int32_t* label;  // (batch, S^ndims)
  const float* weight;   // (batch, S^ndims)
  // sparse mode (device-side densify; uresnet_tpu/data/device_pipeline.py).
  // Wire dtypes are deliberately narrow — the sparse batch is the
  // host->device transfer payload and the link is the e2e bottleneck
  // (benchmarks/RESULTS.md round 2): coords int16 (detector extents
  // < 32768, validated at fill), labels uint8 (class ids). Lossless; the
  // device pipeline upcasts.
  const int16_t* coords;   // (batch, max_points, ndims)
  const float* values;     // (batch, max_points)
  const uint8_t* slabels;  // (batch, max_points)
  const float* sweights;   // (batch, max_points) — only when
                           // cfg.sparse_weights (USEF v2 file weights)
  const int32_t* npoints;  // (batch,)
  const int32_t* shape;    // (batch, ndims)
  int64_t cursor;        // event cursor AFTER this batch (resume contract)
  int32_t slot;          // pass to urd_release when consumed
};

struct urd_handle {
  urd_config cfg;
  std::vector<FileInfo> files;
  std::vector<EventRef> index;
  // epoch -> permutation over index. A small CACHE (mirrors the Python
  // loader's _orders dict): workers filling tickets that straddle an epoch
  // boundary alternate epochs per event, and a single rewritten buffer
  // would re-run the O(N) identity fill + Fisher-Yates under the mutex on
  // every alternation — serializing all producers on large datasets
  // (round-3 review). Entries older than 3 epochs are evicted
  // (regenerable: pure function of seed + epoch).
  std::map<uint64_t, std::vector<uint32_t>> orders;
  int events_per_batch = 1;
  int64_t pix_per_image = 1;

  // slots
  struct Slot {
    std::vector<float> data;
    std::vector<int32_t> label;
    std::vector<float> weight;
    // sparse mode (narrow wire dtypes — see urd_batch)
    std::vector<int16_t> coords;
    std::vector<float> values;
    std::vector<uint8_t> slabels;
    std::vector<float> sweights;
    std::vector<int32_t> npoints;
    std::vector<int32_t> shape;
    int64_t cursor = 0;
    enum State { kFree, kFilling, kReady, kConsuming } state = kFree;
    uint64_t ticket = 0;
    // Slot claims must be ticket-ordered: tickets t and t+nslots map to the
    // same slot, and if the later claimant won the free slot first the
    // consumer (which consumes in ticket order) would deadlock. `expected`
    // is the only ticket allowed to claim this slot next.
    uint64_t expected = 0;
  };
  std::vector<Slot> slots;

  std::mutex mu;
  std::condition_variable cv_ready;   // consumer waits
  std::condition_variable cv_free;    // producers wait
  std::atomic<uint64_t> next_fill_ticket{0};
  uint64_t next_consume_ticket = 0;
  int64_t start_cursor = 0;  // event cursor at ticket 0
  bool stopping = false;
  std::string error;
  std::vector<std::thread> workers;

  int64_t n_events() const { return (int64_t)index.size(); }

  // Must be called with `mu` held. Deterministic given (seed, epoch);
  // stream shared with the Python loader (see SplitMix64 above).
  const std::vector<uint32_t>& order_for(uint64_t ep) {
    auto it = orders.find(ep);
    if (it != orders.end()) return it->second;
    std::vector<uint32_t> order(index.size());
    for (size_t i = 0; i < order.size(); ++i) order[i] = (uint32_t)i;
    if (cfg.random_access) {
      SplitMix64 rng(cfg.seed + 0x9e3779b97f4a7c15ull * (ep + 1));
      for (size_t i = order.size(); i > 1; --i) {
        size_t j = (size_t)(rng.next() % i);
        std::swap(order[i - 1], order[j]);
      }
    }
    for (auto jt = orders.begin(); jt != orders.end();)
      jt = (jt->first + 3 < ep) ? orders.erase(jt) : std::next(jt);
    return orders.emplace(ep, std::move(order)).first->second;
  }
};

static thread_local std::string g_error;

const char* urd_last_error() { return g_error.c_str(); }

urd_handle* urd_open(const char** paths, int n_paths, const urd_config* cfg) {
  // plane/batch invariants: the planes array is fixed at 8 entries, and one
  // event contributes one row per selected plane, so batch_size must be a
  // positive multiple of n_planes (mirrored in data/cxx_decoder.py and
  // data/loader.py).
  if (cfg->n_planes < 1 || cfg->n_planes > 8) {
    g_error = "n_planes must be in [1, 8]";
    return nullptr;
  }
  if (cfg->batch_size < 1 || cfg->batch_size % cfg->n_planes) {
    g_error = "batch_size must be a positive multiple of n_planes";
    return nullptr;
  }
  auto* h = new urd_handle();
  h->cfg = *cfg;
  int shard_count = cfg->shard_count > 0 ? cfg->shard_count : 1;
  int shard_rank = cfg->shard_rank;
  int64_t pos = 0;
  for (int i = 0; i < n_paths; ++i) {
    FileInfo info;
    if (!read_header(paths[i], &info)) {
      g_error = std::string("failed to read USEF header: ") + paths[i];
      delete h;
      return nullptr;
    }
    if ((int32_t)info.ndims != cfg->ndims) {
      g_error = std::string("ndims mismatch in ") + paths[i];
      delete h;
      return nullptr;
    }
    int32_t fi = (int32_t)h->files.size();
    for (uint64_t off : info.offsets) {
      if (pos % shard_count == shard_rank) h->index.push_back({fi, off});
      ++pos;
    }
    h->files.push_back(std::move(info));
  }
  if (h->index.empty()) {
    g_error = "no events (after sharding)";
    delete h;
    return nullptr;
  }
  int global_events =
      cfg->batch_size / (cfg->n_planes > 0 ? cfg->n_planes : 1);
  if (global_events < 1) global_events = 1;
  if (global_events % shard_count) {
    g_error = "events per batch must be divisible by shard_count";
    delete h;
    return nullptr;
  }
  h->events_per_batch = global_events / shard_count;
  h->pix_per_image = 1;
  for (int d = 0; d < cfg->ndims; ++d) h->pix_per_image *= cfg->image_size;

  h->order_for(0);  // pre-generate epoch 0 (single-threaded here)

  int nslots = cfg->num_batch_storage > 0 ? cfg->num_batch_storage : 2;
  h->slots.resize(nslots);
  int64_t per_image = h->pix_per_image;
  // local rows this host produces per batch (= global batch / shard_count)
  size_t rows = (size_t)h->events_per_batch *
                (cfg->n_planes > 0 ? cfg->n_planes : 1);
  for (size_t i = 0; i < h->slots.size(); ++i) {
    auto& s = h->slots[i];
    if (cfg->sparse) {
      size_t P = (size_t)cfg->max_points;
      s.coords.resize(rows * P * cfg->ndims);
      s.values.resize(rows * P);
      s.slabels.resize(rows * P);
      if (cfg->sparse_weights) s.sweights.resize(rows * P);
      s.npoints.resize(rows);
      s.shape.resize(rows * cfg->ndims);
    } else {
      s.data.resize(rows * per_image);
      s.label.resize(rows * per_image);
      s.weight.resize(rows * per_image);
    }
    s.expected = i;  // ticket i is the first to fill slot i
  }
  return h;
}

void urd_seek(urd_handle* h, int64_t cursor) {
  // ABSOLUTE event position (epoch = cursor / n_events): resume past an
  // epoch boundary must replay that epoch's shuffle, not epoch 0's
  // (SURVEY.md §5 checkpoint/resume bitwise determinism).
  std::lock_guard<std::mutex> lk(h->mu);
  h->start_cursor = cursor < 0 ? 0 : cursor;
}

int64_t urd_num_events(urd_handle* h) { return h->n_events(); }

static void fill_worker(urd_handle* h) {
  // per-thread readers (no FILE* sharing)
  std::vector<Reader> readers(h->files.size());
  for (size_t i = 0; i < h->files.size(); ++i) {
    if (!readers[i].open(h->files[i].path)) {
      std::lock_guard<std::mutex> lk(h->mu);
      h->error = "worker failed to open " + h->files[i].path;
      h->cv_ready.notify_all();
      return;
    }
  }
  std::vector<SparsePlane> planes;
  DenseConfig dc;
  dc.image_size = h->cfg.image_size;
  dc.ndims = h->cfg.ndims;
  dc.normalize_scale = h->cfg.normalize_scale;
  dc.normalize_clip = h->cfg.normalize_clip;
  dc.weight_mode = h->cfg.weight_mode;
  dc.nonzero_boost = h->cfg.nonzero_boost;
  dc.num_class = h->cfg.num_class;

  const int64_t n_ev = h->n_events();
  const int epb = h->events_per_batch;

  while (true) {
    uint64_t ticket = h->next_fill_ticket.fetch_add(1);
    urd_handle::Slot* slot = &h->slots[ticket % h->slots.size()];
    int64_t start0;
    {
      std::unique_lock<std::mutex> lk(h->mu);
      h->cv_free.wait(lk, [&] {
        return h->stopping || (slot->state == urd_handle::Slot::kFree &&
                               slot->expected == ticket);
      });
      if (h->stopping) return;
      slot->state = urd_handle::Slot::kFilling;
      slot->ticket = ticket;
      slot->expected = ticket + h->slots.size();
      // capture under the mutex: urd_seek writes start_cursor under `mu`,
      // so an unlocked read here would be a data race (round-3 review;
      // production calls urd_seek only on a stopped handle, but the ABI
      // does not forbid a live seek and TSan rightly flags it)
      start0 = h->start_cursor;
      h->cv_free.notify_all();  // re-evaluate other waiters' predicates
    }

    // events for this ticket: deterministic function of (ticket, start_cursor)
    int64_t first = start0 + (int64_t)ticket * epb;
    bool ok = true;
    const char* fail_reason = "event decode failed";
    for (int e = 0; e < epb && ok; ++e) {
      int64_t pos = first + e;
      uint64_t ep = (uint64_t)(pos / n_ev);
      int64_t within = pos % n_ev;
      uint32_t ev_idx;
      {
        // epoch-dependent shuffle: guard the order cache with the mutex
        std::lock_guard<std::mutex> lk(h->mu);
        ev_idx = h->order_for(ep)[within];
      }
      const EventRef& ref = h->index[ev_idx];
      if (!read_event(readers[ref.file_idx], ref.offset,
                      h->files[ref.file_idx].version,
                      h->files[ref.file_idx].ndims, &planes)) {
        ok = false;
        break;
      }
      for (int p = 0; p < h->cfg.n_planes; ++p) {
        const SparsePlane* pl = nullptr;
        for (const auto& cand : planes)
          if ((int32_t)cand.plane_id == h->cfg.planes[p]) {
            pl = &cand;
            break;
          }
        if (!pl) {
          ok = false;
          break;
        }
        size_t img = (size_t)e * h->cfg.n_planes + p;
        if (h->cfg.sparse) {
          size_t P = (size_t)h->cfg.max_points;
          int nd = h->cfg.ndims;
          size_t n = pl->values.size();
          if (n > P) n = P;
          int16_t* cdst = slot->coords.data() + img * P * nd;
          float* vdst = slot->values.data() + img * P;
          uint8_t* ldst = slot->slabels.data() + img * P;
          std::memset(cdst, 0, P * nd * sizeof(int16_t));
          std::memset(vdst, 0, P * sizeof(float));
          std::memset(ldst, 0, P * sizeof(uint8_t));
          bool fits = true;
          for (int d = 0; d < nd; ++d) fits &= pl->shape[d] < 32768;
          if (!fits) {
            fail_reason = "plane extent >= 32768 exceeds the int16 sparse "
                          "wire format (see urd_batch)";
            ok = false;
            break;
          }
          // Validate BEFORE the narrowing casts: an out-of-shape coord
          // would silently wrap through (int16_t) — fail loudly like the
          // extent check (mirrors data/pipeline.py sparse_batch).
          for (size_t i = 0; i < n * (size_t)nd && ok; ++i) {
            int32_t c = pl->coords[i];
            if (c < 0 || (uint32_t)c >= pl->shape[i % nd]) {
              fail_reason = "coordinate outside the declared plane shape "
                            "(corrupt file)";
              ok = false;
            }
          }
          if (!ok) break;
          for (size_t i = 0; i < n * (size_t)nd; ++i)
            cdst[i] = (int16_t)pl->coords[i];
          std::memcpy(vdst, pl->values.data(), n * sizeof(float));
          for (size_t i = 0; i < n; ++i) ldst[i] = (uint8_t)pl->labels[i];
          if (h->cfg.sparse_weights) {
            float* wdst = slot->sweights.data() + img * P;
            std::memset(wdst, 0, P * sizeof(float));
            if (!pl->has_weights) {
              fail_reason = "weight_mode='file' but the plane carries no "
                            "stored weights (USEF v1 file, or converted "
                            "without --weight-producer)";
              ok = false;
              break;
            }
            std::memcpy(wdst, pl->weights.data(), n * sizeof(float));
          }
          slot->npoints[img] = (int32_t)n;
          for (int d = 0; d < nd; ++d)
            slot->shape[img * nd + d] = (int32_t)pl->shape[d];
        } else {
          const char* err = densify_plane(
              *pl, dc, slot->data.data() + img * h->pix_per_image,
              slot->label.data() + img * h->pix_per_image,
              slot->weight.data() + img * h->pix_per_image);
          if (err) {
            fail_reason = err;
            ok = false;
            break;
          }
        }
      }
    }

    {
      std::lock_guard<std::mutex> lk(h->mu);
      if (!ok) {
        h->error = fail_reason;
        h->cv_ready.notify_all();
        return;
      }
      slot->cursor = first + epb;  // absolute: epoch survives resume
      slot->state = urd_handle::Slot::kReady;
      h->cv_ready.notify_all();
    }
  }
}

int urd_start(urd_handle* h, int num_threads) {
  if (num_threads < 1) num_threads = 1;
  {
    // same-handle restart contract (mirrors data/loader.py stop()/start()):
    // urd_stop already rewound the ticket/slot state, so clearing
    // `stopping` here resumes the exact deterministic stream.
    std::lock_guard<std::mutex> lk(h->mu);
    h->stopping = false;
  }
  for (int i = 0; i < num_threads; ++i)
    h->workers.emplace_back([h] {
      // workers must not throw across the thread boundary: convert any
      // exception (e.g. std::bad_alloc on a corrupt-but-size-plausible
      // count) into the handle error surfaced by urd_next, instead of
      // std::terminate taking down the whole process
      try {
        fill_worker(h);
      } catch (const std::exception& e) {
        std::lock_guard<std::mutex> lk(h->mu);
        if (h->error.empty())
          h->error = std::string("decoder worker exception: ") + e.what();
        h->cv_ready.notify_all();
      }
    });
  return 0;
}

// Blocks until the next batch (in ticket order) is ready. Returns slot id
// >= 0, or -1 on error (urd_last_error()).
int urd_next(urd_handle* h, urd_batch* out) {
  std::unique_lock<std::mutex> lk(h->mu);
  uint64_t want = h->next_consume_ticket;
  urd_handle::Slot* slot = &h->slots[want % h->slots.size()];
  h->cv_ready.wait(lk, [&] {
    return !h->error.empty() ||
           (slot->state == urd_handle::Slot::kReady && slot->ticket == want);
  });
  if (!h->error.empty()) {
    g_error = h->error;
    return -1;
  }
  slot->state = urd_handle::Slot::kConsuming;
  h->next_consume_ticket++;
  if (h->cfg.sparse) {
    out->coords = slot->coords.data();
    out->values = slot->values.data();
    out->slabels = slot->slabels.data();
    out->sweights =
        h->cfg.sparse_weights ? slot->sweights.data() : nullptr;
    out->npoints = slot->npoints.data();
    out->shape = slot->shape.data();
    out->data = nullptr;
    out->label = nullptr;
    out->weight = nullptr;
  } else {
    out->data = slot->data.data();
    out->label = slot->label.data();
    out->weight = slot->weight.data();
    out->coords = nullptr;
    out->values = nullptr;
    out->slabels = nullptr;
    out->sweights = nullptr;
    out->npoints = nullptr;
    out->shape = nullptr;
  }
  out->cursor = slot->cursor;
  out->slot = (int32_t)(want % h->slots.size());
  return out->slot;
}

void urd_release(urd_handle* h, int slot) {
  std::lock_guard<std::mutex> lk(h->mu);
  h->slots[slot].state = urd_handle::Slot::kFree;
  h->cv_free.notify_all();
}

void urd_stop(urd_handle* h) {
  {
    std::lock_guard<std::mutex> lk(h->mu);
    h->stopping = true;
    h->cv_free.notify_all();
    h->cv_ready.notify_all();
  }
  for (auto& t : h->workers) t.join();
  h->workers.clear();
  // Restartable contract (mirrors data/loader.py stop()): rewind to the
  // position after the last CONSUMED batch, drop claimed-but-undelivered
  // tickets, and reset the slot ring so a later urd_start (or urd_seek +
  // urd_start) resumes the exact deterministic stream. All workers are
  // joined above, so no fill races this reset. Zero-copy views handed out
  // before the stop (urd_next without release) are invalidated by a
  // restart — consumers must copy or release before stopping.
  std::lock_guard<std::mutex> lk(h->mu);
  h->start_cursor += (int64_t)h->next_consume_ticket * h->events_per_batch;
  h->next_fill_ticket.store(0);
  h->next_consume_ticket = 0;
  for (size_t i = 0; i < h->slots.size(); ++i) {
    h->slots[i].state = urd_handle::Slot::kFree;
    h->slots[i].ticket = 0;
    h->slots[i].expected = i;  // ticket i fills slot i again after restart
  }
  h->error.clear();  // a pre-stop worker error dies with its stream
}

void urd_close(urd_handle* h) {
  if (!h->workers.empty()) urd_stop(h);
  delete h;
}

}  // extern "C"
