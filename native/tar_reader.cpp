// Native sharded-tar streaming loader.
//
// TPU-native equivalent of the reference's host-side data plumbing: the
// reference streams WebDataset tar shards through 3 torch DataLoader worker
// PROCESSES (reference train.py:197, webdataloader_utils.py:97-158 —
// tarfile_to_samples + pin-memory prefetch). Process workers pay pickle +
// IPC per batch; this library instead runs a C++ pthread pool inside the
// training process: shards are read with posix_fadvise(SEQUENTIAL),
// parsed with a zero-copy ustar walker, grouped into samples (webdataset
// key = name up to first dot), and handed to Python through a bounded
// lock-free-ish queue as raw byte buffers (numpy decodes them; the decode
// itself is already native in PIL/cv2).
//
// C ABI (ctypes, see hunyuanworld_mirror_tpu/training/native_loader.py):
//   wmtar_open(paths, n_paths, n_threads, queue_cap) -> handle
//   wmtar_next(handle, &sample)          1 on success, 0 on end-of-stream
//   wmtar_sample_parts(sample, ...)      borrow name/data pointers
//   wmtar_sample_free(sample)
//   wmtar_close(handle)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <unistd.h>

namespace {

struct Part {
  std::string name;   // suffix after the sample key ("color.png")
  std::string data;   // file bytes
};

struct Sample {
  std::string key;
  std::vector<Part> parts;
};

struct OctalView {
  static uint64_t parse(const char* p, size_t n) {
    uint64_t v = 0;
    for (size_t i = 0; i < n && p[i]; ++i) {
      if (p[i] < '0' || p[i] > '7') continue;
      v = (v << 3) | uint64_t(p[i] - '0');
    }
    return v;
  }
};

// Minimal ustar walker over an in-memory shard.
static void parse_tar(const std::string& buf,
                      std::vector<Sample>* out) {
  size_t off = 0;
  // key -> index in out (samples are contiguous in wds shards, but be safe)
  std::vector<std::pair<std::string, size_t>> index;
  while (off + 512 <= buf.size()) {
    const char* hdr = buf.data() + off;
    if (hdr[0] == '\0') break;  // end-of-archive zero block
    const uint64_t size = OctalView::parse(hdr + 124, 12);
    char type = hdr[156];
    std::string name(hdr, strnlen(hdr, 100));
    // ustar long-name prefix field
    if (std::memcmp(hdr + 257, "ustar", 5) == 0 && hdr[345] != '\0') {
      std::string prefix(hdr + 345, strnlen(hdr + 345, 155));
      name = prefix + "/" + name;
    }
    off += 512;
    if ((type == '0' || type == '\0') && off + size <= buf.size()) {
      // strip any directory components
      size_t slash = name.find_last_of('/');
      std::string base = slash == std::string::npos ? name
                                                    : name.substr(slash + 1);
      size_t dot = base.find('.');
      if (dot != std::string::npos && dot > 0) {
        std::string key = base.substr(0, dot);
        std::string suffix = base.substr(dot + 1);
        Sample* s = nullptr;
        for (auto it = index.rbegin(); it != index.rend(); ++it) {
          if (it->first == key) { s = &(*out)[it->second]; break; }
        }
        if (s == nullptr) {
          out->push_back(Sample{key, {}});
          index.emplace_back(key, out->size() - 1);
          s = &out->back();
        }
        s->parts.push_back(Part{suffix, std::string(buf.data() + off, size)});
      }
    }
    off += (size + 511) & ~uint64_t(511);
  }
}

struct Loader {
  std::vector<std::string> shards;
  std::atomic<size_t> next_shard{0};
  std::deque<std::unique_ptr<Sample>> queue;
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  size_t queue_cap;
  std::vector<std::thread> workers;
  std::atomic<int> live_workers{0};
  std::atomic<bool> stop{false};

  void worker() {
    for (;;) {
      if (stop.load()) break;
      size_t idx = next_shard.fetch_add(1);
      if (idx >= shards.size()) break;
      std::string buf;
      {
        int fd = ::open(shards[idx].c_str(), O_RDONLY);
        if (fd < 0) continue;
#ifdef POSIX_FADV_SEQUENTIAL
        posix_fadvise(fd, 0, 0, POSIX_FADV_SEQUENTIAL);
#endif
        off_t len = ::lseek(fd, 0, SEEK_END);
        ::lseek(fd, 0, SEEK_SET);
        buf.resize(size_t(len));
        size_t got = 0;
        while (got < buf.size()) {
          ssize_t r = ::read(fd, &buf[got], buf.size() - got);
          if (r <= 0) break;
          got += size_t(r);
        }
        ::close(fd);
        buf.resize(got);
      }
      std::vector<Sample> samples;
      parse_tar(buf, &samples);
      for (auto& s : samples) {
        std::unique_lock<std::mutex> lk(mu);
        cv_push.wait(lk, [&] { return queue.size() < queue_cap || stop.load(); });
        if (stop.load()) return;
        queue.push_back(std::make_unique<Sample>(std::move(s)));
        cv_pop.notify_one();
      }
    }
    if (live_workers.fetch_sub(1) == 1) {
      std::lock_guard<std::mutex> lk(mu);
      cv_pop.notify_all();  // wake consumers for end-of-stream
    }
  }

  Sample* next() {
    std::unique_lock<std::mutex> lk(mu);
    cv_pop.wait(lk, [&] {
      return !queue.empty() || live_workers.load() == 0 || stop.load();
    });
    if (queue.empty()) return nullptr;
    Sample* s = queue.front().release();
    queue.pop_front();
    cv_push.notify_one();
    return s;
  }
};

}  // namespace

extern "C" {

void* wmtar_open(const char** paths, int n_paths, int n_threads,
                 int queue_cap) {
  auto* l = new Loader();
  for (int i = 0; i < n_paths; ++i) l->shards.emplace_back(paths[i]);
  l->queue_cap = queue_cap > 0 ? size_t(queue_cap) : 64;
  int nt = n_threads > 0 ? n_threads : 2;
  l->live_workers.store(nt);
  for (int i = 0; i < nt; ++i)
    l->workers.emplace_back([l] { l->worker(); });
  return l;
}

// Returns a Sample* (owned by caller, free with wmtar_sample_free) or null.
void* wmtar_next(void* handle) {
  return static_cast<Loader*>(handle)->next();
}

const char* wmtar_sample_key(void* sample) {
  return static_cast<Sample*>(sample)->key.c_str();
}

int wmtar_sample_nparts(void* sample) {
  return int(static_cast<Sample*>(sample)->parts.size());
}

const char* wmtar_sample_part_name(void* sample, int i) {
  return static_cast<Sample*>(sample)->parts[size_t(i)].name.c_str();
}

const uint8_t* wmtar_sample_part_data(void* sample, int i, int64_t* size) {
  auto& p = static_cast<Sample*>(sample)->parts[size_t(i)];
  *size = int64_t(p.data.size());
  return reinterpret_cast<const uint8_t*>(p.data.data());
}

void wmtar_sample_free(void* sample) {
  delete static_cast<Sample*>(sample);
}

void wmtar_close(void* handle) {
  auto* l = static_cast<Loader*>(handle);
  l->stop.store(true);
  l->cv_push.notify_all();
  l->cv_pop.notify_all();
  for (auto& t : l->workers) t.join();
  delete l;
}

}  // extern "C"
