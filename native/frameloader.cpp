// Native multi-stream video frame loader.
//
// The reference feeds the pipeline from a single Python capture thread
// around cv2.VideoCapture (deepdish.py:95-129). At TPU throughput the host
// decode path becomes the bottleneck and the GIL serializes Python-side
// decoding of multiple streams; this loader decodes N streams in parallel
// C++ threads (one cv::VideoCapture each), resizes and converts BGR->RGB
// into pre-allocated ring buffers, and hands fixed-shape uint8 chunks
// (n_streams, chunk, H, W, 3) to Python through a ctypes C API — ready for
// one jax.device_put per multi-stream step.
//
// Build: make -C native  (links against the system OpenCV 4).

#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/videoio.hpp>

#include <atomic>
#include <condition_variable>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <stdexcept>
#include <string>
#include <thread>
#include <vector>

namespace {

struct StreamQueue {
  std::mutex mu;
  std::condition_variable cv_put, cv_get;
  std::deque<std::vector<unsigned char>> frames;
  size_t max_depth;
  bool finished = false;

  explicit StreamQueue(size_t depth) : max_depth(depth) {}

  void push(std::vector<unsigned char>&& f) {
    std::unique_lock<std::mutex> lk(mu);
    cv_put.wait(lk, [&] { return frames.size() < max_depth; });
    frames.push_back(std::move(f));
    cv_get.notify_one();
  }

  // Returns false when the stream is exhausted.
  bool pop(std::vector<unsigned char>* out) {
    std::unique_lock<std::mutex> lk(mu);
    cv_get.wait(lk, [&] { return !frames.empty() || finished; });
    if (frames.empty()) return false;
    *out = std::move(frames.front());
    frames.pop_front();
    cv_put.notify_one();
    return true;
  }

  void finish() {
    std::lock_guard<std::mutex> lk(mu);
    finished = true;
    cv_get.notify_all();
  }
};

struct Loader {
  int n_streams, out_w, out_h;
  bool yuv420;
  size_t frame_bytes;
  std::vector<std::unique_ptr<StreamQueue>> queues;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  Loader(const char** paths, int n, int w, int h, int depth, bool yuv)
      : n_streams(n), out_w(w), out_h(h), yuv420(yuv),
        frame_bytes(yuv ? static_cast<size_t>(w) * h * 3 / 2
                        : static_cast<size_t>(w) * h * 3) {
    for (int i = 0; i < n; ++i) {
      queues.emplace_back(new StreamQueue(depth));
      std::string path = paths[i];
      workers.emplace_back([this, i, path] { decode_loop(i, path); });
    }
  }

  ~Loader() {
    stop = true;
    for (auto& q : queues) {
      // drain so producers blocked on push can exit
      std::lock_guard<std::mutex> lk(q->mu);
      q->frames.clear();
      q->cv_put.notify_all();
    }
    for (auto& t : workers)
      if (t.joinable()) t.join();
  }

  void decode_loop(int idx, const std::string& path) {
    cv::VideoCapture cap(path);
    cv::Mat bgr, resized, out;
    while (!stop && cap.isOpened()) {
      if (!cap.read(bgr) || bgr.empty()) break;
      if (bgr.cols != out_w || bgr.rows != out_h) {
        cv::resize(bgr, resized, cv::Size(out_w, out_h));
      } else {
        resized = bgr;
      }
      // YUV420 (I420 planar) halves the host->device transfer; the device
      // converts back to RGB (deepdish_tpu/ops/colorspace.py).
      cv::cvtColor(resized, out,
                   yuv420 ? cv::COLOR_BGR2YUV_I420 : cv::COLOR_BGR2RGB);
      std::vector<unsigned char> buf(frame_bytes);
      std::memcpy(buf.data(), out.data, frame_bytes);
      queues[idx]->push(std::move(buf));
      if (stop) break;
    }
    queues[idx]->finish();
  }
};

// ---------------------------------------------------------------------
// Striped parallel decode of ONE file.
//
// A single mp4's decode is inherently sequential per decoder instance, so
// the multi-stream Loader above can never push one file past ~1 core of
// decode (the reference's capture thread, deepdish.py:79-129, has the
// same ceiling). This loader opens the SAME file in K worker threads;
// worker w decodes the interleaved frame stripes [s*L, (s+1)*L) for
// s = w, w+K, w+2K, ..., seeking each stripe start with the accurate
// (keyframe + roll-forward) FFmpeg seek, so the K decoders run disjoint
// frame ranges in parallel and the consumer reassembles global frame
// order by round-robin over the worker queues. Output is byte-equal to
// sequential decode (tests/test_striped_decode.py) because the accurate
// seek decodes forward from the previous keyframe and discards — each
// frame's pixels are produced by the same deterministic decode path.
//
// Stripe length trades seek amortization (decode-and-discard from the
// last keyframe, up to one GOP per stripe) against reassembly buffering;
// it should be >= the file's GOP so at most one GOP is discarded per
// stripe.

struct StripedLoader {
  int n_workers, stripe_len, out_w, out_h;
  bool yuv420;
  size_t frame_bytes;
  long total_frames;
  std::vector<std::unique_ptr<StreamQueue>> queues;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
  // consumer cursor (single-consumer API, like fl_next_chunk)
  long next_frame = 0;
  bool eof = false;

  StripedLoader(const std::string& path, int k, int stripe, int w, int h,
                int depth, bool yuv)
      : n_workers(k), stripe_len(stripe), out_w(w), out_h(h), yuv420(yuv),
        frame_bytes(yuv ? static_cast<size_t>(w) * h * 3 / 2
                        : static_cast<size_t>(w) * h * 3) {
    {
      cv::VideoCapture probe(path);
      if (!probe.isOpened()) throw std::runtime_error("open failed");
      total_frames =
          static_cast<long>(probe.get(cv::CAP_PROP_FRAME_COUNT));
    }
    if (total_frames <= 0)
      throw std::runtime_error("container reports no frame count");
    for (int i = 0; i < k; ++i) {
      queues.emplace_back(new StreamQueue(depth));
      workers.emplace_back([this, i, path] { stripe_loop(i, path); });
    }
  }

  ~StripedLoader() {
    stop = true;
    for (auto& q : queues) {
      std::lock_guard<std::mutex> lk(q->mu);
      q->frames.clear();
      q->cv_put.notify_all();
    }
    for (auto& t : workers)
      if (t.joinable()) t.join();
  }

  void stripe_loop(int w_idx, const std::string& path) {
    cv::VideoCapture cap(path);
    cv::Mat bgr, resized, out;
    long pos = 0;  // decoder's current frame index
    bool failed = false;  // decode failure ends THIS worker's queue; the
                          // consumer turns the gap into a global EOF at
                          // that frame index (metadata overestimate case)
    for (long s = w_idx; !stop && !failed; s += n_workers) {
      const long start = static_cast<long>(s) * stripe_len;
      if (start >= total_frames) break;
      const long end = std::min(start + stripe_len, total_frames);
      if (pos != start) {
        cap.set(cv::CAP_PROP_POS_FRAMES, static_cast<double>(start));
        pos = start;
      }
      for (; pos < end && !stop; ++pos) {
        if (!cap.read(bgr) || bgr.empty()) { failed = true; break; }
        if (bgr.cols != out_w || bgr.rows != out_h) {
          cv::resize(bgr, resized, cv::Size(out_w, out_h));
        } else {
          resized = bgr;
        }
        cv::cvtColor(resized, out,
                     yuv420 ? cv::COLOR_BGR2YUV_I420 : cv::COLOR_BGR2RGB);
        std::vector<unsigned char> buf(frame_bytes);
        std::memcpy(buf.data(), out.data, frame_bytes);
        queues[w_idx]->push(std::move(buf));
      }
    }
    queues[w_idx]->finish();
  }

  // Next `n` frames in GLOBAL order into `out`; returns frames written
  // (< n only at end of file).
  int next(int n, unsigned char* out) {
    std::vector<unsigned char> frame;
    int got = 0;
    while (got < n && !eof && next_frame < total_frames) {
      const long stripe = next_frame / stripe_len;
      StreamQueue* q = queues[stripe % n_workers].get();
      if (!q->pop(&frame)) {
        eof = true;
        break;
      }
      std::memcpy(out + static_cast<size_t>(got) * frame_bytes,
                  frame.data(), frame_bytes);
      ++got;
      ++next_frame;
    }
    return got;
  }
};

}  // namespace

extern "C" {

void* fl_open(const char** paths, int n_streams, int out_w, int out_h,
              int queue_depth) {
  try {
    return new Loader(paths, n_streams, out_w, out_h,
                      queue_depth > 0 ? queue_depth : 8, false);
  } catch (...) {
    return nullptr;
  }
}

// Same as fl_open but frames are emitted as planar YUV420 (I420): buffer
// layout per frame is (H*3/2, W) uint8 — half the bytes of RGB.
void* fl_open_yuv(const char** paths, int n_streams, int out_w, int out_h,
                  int queue_depth) {
  try {
    return new Loader(paths, n_streams, out_w, out_h,
                      queue_depth > 0 ? queue_depth : 8, true);
  } catch (...) {
    return nullptr;
  }
}

// Fill `out` with the next `chunk` frames for every stream, laid out as
// (n_streams, chunk, H, W, 3). counts[i] receives the number of valid
// frames for stream i (may be < chunk at end of stream; remaining slots
// are zeroed). Returns the total number of valid frames.
int fl_next_chunk(void* handle, int chunk, unsigned char* out, int* counts) {
  auto* ld = static_cast<Loader*>(handle);
  const size_t fb = ld->frame_bytes;
  int total = 0;
  std::vector<unsigned char> frame;
  for (int s = 0; s < ld->n_streams; ++s) {
    int got = 0;
    unsigned char* base = out + static_cast<size_t>(s) * chunk * fb;
    for (int c = 0; c < chunk; ++c) {
      if (ld->queues[s]->pop(&frame)) {
        std::memcpy(base + static_cast<size_t>(c) * fb, frame.data(), fb);
        ++got;
      } else {
        std::memset(base + static_cast<size_t>(c) * fb, 0,
                    (static_cast<size_t>(chunk) - c) * fb);
        break;
      }
    }
    counts[s] = got;
    total += got;
  }
  return total;
}

void fl_close(void* handle) { delete static_cast<Loader*>(handle); }

// --- striped single-file decode ---

// K decoder threads over ONE file, interleaved stripes of `stripe_len`
// frames, global-order reassembly. yuv420 != 0 emits planar I420
// (H*3/2, W) frames. Returns nullptr on failure (unopenable file, or a
// container with no frame count — fall back to sequential decode).
void* fls_open(const char* path, int n_workers, int stripe_len, int out_w,
               int out_h, int queue_depth, int yuv420) {
  try {
    return new StripedLoader(path, n_workers > 0 ? n_workers : 1,
                             stripe_len > 0 ? stripe_len : 64, out_w, out_h,
                             queue_depth > 0 ? queue_depth : 128,
                             yuv420 != 0);
  } catch (...) {
    return nullptr;
  }
}

int fls_total_frames(void* handle) {
  return static_cast<int>(static_cast<StripedLoader*>(handle)->total_frames);
}

// Next `n` frames in global order into `out` ((n, H, W, 3) or I420
// (n, H*3/2, W)); returns frames written, < n only at end of file.
int fls_next(void* handle, int n, unsigned char* out) {
  return static_cast<StripedLoader*>(handle)->next(n, out);
}

void fls_close(void* handle) { delete static_cast<StripedLoader*>(handle); }

}  // extern "C"
