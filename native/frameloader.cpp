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

}  // extern "C"
