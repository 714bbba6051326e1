// gray_store: memory-mapped grayscale frame store + threaded clip assembler.
//
// The TPU-native replacement for the reference's NVDEC decode path
// (/root/reference/src/frame_fetchers/nvdec.py): TPU hosts have no video
// decode hardware, so videos are transcoded ONCE to a raw uint8 grayscale
// store (decode cost paid once, offline), after which training/inference
// reads are pure page-cache memcpy at memory bandwidth — each epoch of the
// reference instead re-decodes H.264 around every sampled window
// (src/frame_fetchers/abstract.py:50-67).
//
// File layout (little-endian):
//   [0:8)   magic "GRAYSTR1"
//   [8:12)  uint32 height
//   [12:16) uint32 width
//   [16:24) uint64 frame_count
//   [24:..) frame_count * height * width bytes, frame-major
//
// C API (ctypes-friendly); all functions return 0 on success, negative on
// error. A small pthread pool parallelizes strided clip gathers across
// samples — one worker per sample, matching the reference's worker-pool
// concurrency model (src/data_loaders/random_seek.py) without processes.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <pthread.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <atomic>
#include <vector>

namespace {

constexpr char kMagic[8] = {'G', 'R', 'A', 'Y', 'S', 'T', 'R', '1'};
constexpr int64_t kHeaderSize = 24;

struct Store {
  int fd = -1;
  const uint8_t* data = nullptr;  // mmap base
  size_t size = 0;
  uint32_t height = 0;
  uint32_t width = 0;
  uint64_t frame_count = 0;

  const uint8_t* frame(uint64_t idx) const {
    return data + kHeaderSize + idx * (size_t)height * width;
  }
};

struct GatherTask {
  const Store* store;
  const int64_t* indexes;  // flattened (num_clips, frames_per_clip)
  uint8_t* out;            // (num_clips, frames_per_clip, H, W)
  int64_t num_clips;
  int64_t frames_per_clip;
  std::atomic<int64_t>* next;
};

void* gather_worker(void* arg) {
  auto* task = static_cast<GatherTask*>(arg);
  const Store& s = *task->store;
  const size_t frame_bytes = (size_t)s.height * s.width;
  for (;;) {
    int64_t clip = task->next->fetch_add(1);
    if (clip >= task->num_clips) break;
    const int64_t* idx = task->indexes + clip * task->frames_per_clip;
    uint8_t* dst = task->out + clip * task->frames_per_clip * frame_bytes;
    for (int64_t f = 0; f < task->frames_per_clip; ++f) {
      int64_t i = idx[f];
      if (i < 0) i = 0;
      if ((uint64_t)i >= s.frame_count) i = (int64_t)s.frame_count - 1;
      memcpy(dst + f * frame_bytes, s.frame((uint64_t)i), frame_bytes);
    }
  }
  return nullptr;
}

}  // namespace

extern "C" {

// Opens a store; returns a handle pointer via *out_handle.
int gray_store_open(const char* path, void** out_handle) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return -2;
  }
  void* base = mmap(nullptr, (size_t)st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) {
    close(fd);
    return -3;
  }
  auto* s = new Store();
  s->fd = fd;
  s->data = static_cast<const uint8_t*>(base);
  s->size = (size_t)st.st_size;
  if (s->size < (size_t)kHeaderSize ||
      memcmp(s->data, kMagic, sizeof(kMagic)) != 0) {
    munmap(base, s->size);
    close(fd);
    delete s;
    return -4;
  }
  memcpy(&s->height, s->data + 8, 4);
  memcpy(&s->width, s->data + 12, 4);
  memcpy(&s->frame_count, s->data + 16, 8);
  const size_t expected =
      kHeaderSize + (size_t)s->frame_count * s->height * s->width;
  if (s->size < expected) {
    munmap(base, s->size);
    close(fd);
    delete s;
    return -5;
  }
  *out_handle = s;
  return 0;
}

int gray_store_info(void* handle, uint32_t* height, uint32_t* width,
                    uint64_t* frame_count) {
  auto* s = static_cast<Store*>(handle);
  if (!s) return -1;
  *height = s->height;
  *width = s->width;
  *frame_count = s->frame_count;
  return 0;
}

// Copy frames [start, start+count) into out (count*H*W bytes).
int gray_store_read(void* handle, int64_t start, int64_t count, uint8_t* out) {
  auto* s = static_cast<Store*>(handle);
  if (!s || start < 0 || (uint64_t)(start + count) > s->frame_count) return -1;
  memcpy(out, s->frame((uint64_t)start),
         (size_t)count * s->height * s->width);
  return 0;
}

// Gather clips: indexes is (num_clips * frames_per_clip) flattened frame
// indexes (out-of-range clamped); out is (num_clips, frames_per_clip, H, W).
// num_threads <= 0 selects a single-threaded path.
int gray_store_gather(void* handle, const int64_t* indexes, int64_t num_clips,
                      int64_t frames_per_clip, uint8_t* out,
                      int num_threads) {
  auto* s = static_cast<Store*>(handle);
  if (!s) return -1;
  std::atomic<int64_t> next(0);
  GatherTask task{s, indexes, out, num_clips, frames_per_clip, &next};
  if (num_threads <= 1 || num_clips <= 1) {
    gather_worker(&task);
    return 0;
  }
  int n = num_threads < (int)num_clips ? num_threads : (int)num_clips;
  std::vector<pthread_t> threads((size_t)n);
  for (int i = 0; i < n; ++i)
    pthread_create(&threads[(size_t)i], nullptr, gather_worker, &task);
  for (int i = 0; i < n; ++i) pthread_join(threads[(size_t)i], nullptr);
  return 0;
}

int gray_store_close(void* handle) {
  auto* s = static_cast<Store*>(handle);
  if (!s) return -1;
  munmap(const_cast<uint8_t*>(s->data), s->size);
  close(s->fd);
  delete s;
  return 0;
}

// Writer-side helper: create a store file header (frames appended by the
// caller via normal file IO).
int gray_store_write_header(const char* path, uint32_t height, uint32_t width,
                            uint64_t frame_count) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  fwrite(kMagic, 1, 8, f);
  fwrite(&height, 4, 1, f);
  fwrite(&width, 4, 1, f);
  fwrite(&frame_count, 8, 1, f);
  fclose(f);
  return 0;
}

}  // extern "C"
