// Native clip-store: mmap-backed zero-copy reader + threaded batch gather.
//
// TPU-native replacement for the reference's data path (one pickle per clip
// re-read by a pool of DataLoader worker processes per epoch,
// `data/reader/sp_dataset.py:45-47` + `train_and_evaluate_sp.py:251-255`):
// clips live in ONE binary file, mapped read-only into the process once;
// batch assembly is a parallel strided copy into a caller-provided pinned
// buffer, ready for a single host->device transfer.
//
// Format (little-endian):
//   magic   "KSF1"            (4 bytes)
//   n_arrays uint32
//   per array: name_len uint32, name bytes, dtype uint32 (0=f32),
//              ndim uint32, dims uint64[ndim], byte_len uint64,
//              then 64-byte-aligned raw data.
//
// Exposed C ABI (ctypes): open/close, array lookup, and gather_rows.

#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct ArrayInfo {
  std::string name;
  uint32_t dtype = 0;
  std::vector<uint64_t> dims;
  const uint8_t* data = nullptr;
  uint64_t byte_len = 0;
};

struct Store {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  std::vector<ArrayInfo> arrays;
};

uint64_t align64(uint64_t offset) { return (offset + 63) & ~uint64_t(63); }

}  // namespace

extern "C" {

void* ksf_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) { ::close(fd); return nullptr; }
  void* mem = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (mem == MAP_FAILED) { ::close(fd); return nullptr; }
  madvise(mem, st.st_size, MADV_WILLNEED);

  auto* store = new Store;
  store->fd = fd;
  store->base = static_cast<const uint8_t*>(mem);
  store->size = st.st_size;

  const uint8_t* p = store->base;
  if (st.st_size < 8 || memcmp(p, "KSF1", 4) != 0) {
    delete store; munmap(mem, st.st_size); ::close(fd); return nullptr;
  }
  uint32_t n_arrays;
  memcpy(&n_arrays, p + 4, 4);
  uint64_t off = 8;
  for (uint32_t i = 0; i < n_arrays; ++i) {
    ArrayInfo info;
    uint32_t name_len;
    memcpy(&name_len, p + off, 4); off += 4;
    info.name.assign(reinterpret_cast<const char*>(p + off), name_len);
    off += name_len;
    memcpy(&info.dtype, p + off, 4); off += 4;
    uint32_t ndim;
    memcpy(&ndim, p + off, 4); off += 4;
    info.dims.resize(ndim);
    memcpy(info.dims.data(), p + off, 8 * ndim); off += 8 * ndim;
    memcpy(&info.byte_len, p + off, 8); off += 8;
    off = align64(off);
    info.data = p + off;
    off += info.byte_len;
    store->arrays.push_back(std::move(info));
  }
  return store;
}

void ksf_close(void* handle) {
  auto* store = static_cast<Store*>(handle);
  if (!store) return;
  munmap(const_cast<uint8_t*>(store->base), store->size);
  ::close(store->fd);
  delete store;
}

int ksf_num_arrays(void* handle) {
  return static_cast<Store*>(handle)->arrays.size();
}

const char* ksf_array_name(void* handle, int idx) {
  return static_cast<Store*>(handle)->arrays[idx].name.c_str();
}

int ksf_array_ndim(void* handle, int idx) {
  return static_cast<Store*>(handle)->arrays[idx].dims.size();
}

void ksf_array_dims(void* handle, int idx, uint64_t* out) {
  const auto& dims = static_cast<Store*>(handle)->arrays[idx].dims;
  memcpy(out, dims.data(), 8 * dims.size());
}

int ksf_array_dtype(void* handle, int idx) {
  return static_cast<Store*>(handle)->arrays[idx].dtype;
}

const void* ksf_array_data(void* handle, int idx) {
  return static_cast<Store*>(handle)->arrays[idx].data;
}

uint64_t ksf_array_bytes(void* handle, int idx) {
  return static_cast<Store*>(handle)->arrays[idx].byte_len;
}

// Gather rows (axis 0) of array `idx` into `out` for `n` int32 indices,
// splitting the copy across `n_threads` (0 = hardware concurrency).
void ksf_gather_rows(void* handle, int idx, const int32_t* indices, int n,
                     uint8_t* out, int n_threads) {
  const auto& info = static_cast<Store*>(handle)->arrays[idx];
  uint64_t row_bytes = info.byte_len / info.dims[0];
  if (n_threads <= 0) {
    n_threads = std::thread::hardware_concurrency();
    if (n_threads <= 0) n_threads = 4;
  }
  if (n_threads > n) n_threads = n;
  auto copy_range = [&](int start, int end) {
    for (int i = start; i < end; ++i) {
      memcpy(out + uint64_t(i) * row_bytes,
             info.data + uint64_t(indices[i]) * row_bytes, row_bytes);
    }
  };
  if (n_threads <= 1 || uint64_t(n) * row_bytes < (1u << 20)) {
    copy_range(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int per = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int start = t * per;
    int end = start + per < n ? start + per : n;
    if (start >= end) break;
    threads.emplace_back(copy_range, start, end);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
