// Native data-loading pipeline: PNG decode + photometric correction +
// geometric undistortion, prefetched by a worker pool.
//
// TPU-native equivalent of the reference's native input runtime
// (src/dso/util/DatasetReader.h + Undistort.cpp run on dedicated threads in
// C++): the Python layer orchestrates, but the per-frame byte crunching —
// inflate, defilter, gamma LUT, vignette division, bilinear remap — runs
// here, overlapped with device compute through an in-order ring of
// prefetched frames. Exposed through a plain C ABI for ctypes (no pybind11
// on this image).
//
// Supported input: non-interlaced 8/16-bit grayscale or 8-bit RGB(A) PNG
// (what dataset preparations produce). Output: float32 irradiance images
// remapped to the rectified camera.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

struct Image {
  int w = 0, h = 0;
  std::vector<float> pix;  // grayscale float
  bool ok = false;
};

uint32_t rd32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c, pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

Image decode_png(const std::string& path) {
  Image out;
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return out;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(n);
  if (fread(buf.data(), 1, n, f) != size_t(n)) {
    fclose(f);
    return out;
  }
  fclose(f);
  if (n < 8 || memcmp(buf.data(), "\x89PNG\r\n\x1a\n", 8) != 0) return out;

  int w = 0, h = 0, bitdepth = 0, colortype = 0;
  std::vector<uint8_t> idat;
  size_t off = 8;
  while (off + 12 <= size_t(n)) {
    uint32_t len = rd32(&buf[off]);
    // Bounds: chunk payload + CRC must fit in the file (a truncated or
    // corrupt chunk length would otherwise read out of bounds / wrap off).
    if (len > size_t(n) || off + 12 + size_t(len) > size_t(n)) return out;
    const char* type = reinterpret_cast<const char*>(&buf[off + 4]);
    const uint8_t* data = &buf[off + 8];
    if (memcmp(type, "IHDR", 4) == 0) {
      if (len < 13) return out;
      w = rd32(data);
      h = rd32(data + 4);
      bitdepth = data[8];
      colortype = data[9];
      if (data[12] != 0) return out;  // interlaced unsupported
    } else if (memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), data, data + len);
    } else if (memcmp(type, "IEND", 4) == 0) {
      break;
    }
    off += 12 + size_t(len);
  }
  if (w <= 0 || h <= 0 || size_t(w) * size_t(h) > (1u << 28)) return out;
  int ch;
  switch (colortype) {
    case 0: ch = 1; break;   // gray
    case 2: ch = 3; break;   // rgb
    case 4: ch = 2; break;   // gray+alpha
    case 6: ch = 4; break;   // rgba
    default: return out;     // palette unsupported
  }
  if (bitdepth != 8 && bitdepth != 16) return out;
  int bpp = ch * bitdepth / 8;
  size_t stride = size_t(w) * bpp;
  std::vector<uint8_t> raw((stride + 1) * h);
  uLongf rawlen = raw.size();
  if (uncompress(raw.data(), &rawlen, idat.data(), idat.size()) != Z_OK)
    return out;

  // Defilter.
  std::vector<uint8_t> img(stride * h);
  for (int y = 0; y < h; y++) {
    uint8_t ft = raw[y * (stride + 1)];
    const uint8_t* src = &raw[y * (stride + 1) + 1];
    uint8_t* dst = &img[y * stride];
    const uint8_t* up = y ? &img[(y - 1) * stride] : nullptr;
    for (size_t x = 0; x < stride; x++) {
      int a = (x >= size_t(bpp)) ? dst[x - bpp] : 0;
      int b = up ? up[x] : 0;
      int c = (up && x >= size_t(bpp)) ? up[x - bpp] : 0;
      int v = src[x];
      switch (ft) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return out;
      }
      dst[x] = uint8_t(v);
    }
  }

  out.w = w;
  out.h = h;
  out.pix.resize(size_t(w) * h);
  for (int y = 0; y < h; y++) {
    for (int x = 0; x < w; x++) {
      const uint8_t* p = &img[y * stride + size_t(x) * bpp];
      float v;
      if (ch >= 3) {  // rgb(a): mean of channels (reference grayscales too)
        if (bitdepth == 8)
          v = (p[0] + p[1] + p[2]) / 3.0f;
        else
          v = ((p[0] << 8 | p[1]) + (p[2] << 8 | p[3]) +
               (p[4] << 8 | p[5])) / (3.0f * 256.0f);
      } else {
        v = (bitdepth == 8) ? float(p[0])
                            : float(p[0] << 8 | p[1]) / 256.0f;
      }
      out.pix[size_t(y) * w + x] = v;
    }
  }
  out.ok = true;
  return out;
}

struct Loader {
  std::vector<std::string> paths;
  int in_w = 0, in_h = 0, out_w = 0, out_h = 0;
  std::vector<float> remap_x, remap_y;  // out-grid -> input pixel coords
  std::vector<float> gamma;             // 256-entry LUT ([] = identity)
  std::vector<float> vignette;          // input-sized ([] = none)

  std::vector<std::vector<float>> slots;  // ring of processed frames
  std::vector<std::atomic<int>> state;    // 0 empty, 1 processing, 2 ready
  std::atomic<size_t> next_submit{0};
  size_t next_read = 0;
  int n_threads = 4;
  std::vector<std::thread> workers;
  std::mutex m;
  std::condition_variable cv;
  std::atomic<bool> stop{false};

  explicit Loader(size_t ring) : slots(ring), state(ring) {
    for (auto& s : state) s.store(0);
  }

  void process(size_t idx) {
    Image im = decode_png(paths[idx]);
    std::vector<float>& dst = slots[idx % slots.size()];
    dst.assign(size_t(out_w) * out_h, 0.0f);
    // A decoded size different from the declared calibration size would
    // index the vignette map and the remap grid out of bounds.
    if (im.ok && (im.w != in_w || im.h != in_h)) im.ok = false;
    if (im.ok) {
      // Photometric correction on the raw grid.
      if (!gamma.empty() || !vignette.empty()) {
        for (size_t i = 0; i < im.pix.size(); i++) {
          float v = im.pix[i];
          if (!gamma.empty()) {
            int b = int(v);
            if (b < 0) b = 0;
            if (b > 255) b = 255;
            v = gamma[b];
          }
          if (!vignette.empty()) v /= vignette[i];
          im.pix[i] = v;
        }
      }
      // Bilinear remap to the rectified grid.
      for (int y = 0; y < out_h; y++) {
        for (int x = 0; x < out_w; x++) {
          float sx = remap_x[size_t(y) * out_w + x];
          float sy = remap_y[size_t(y) * out_w + x];
          if (sx < 0 || sy < 0 || sx >= im.w - 1 || sy >= im.h - 1) continue;
          int x0 = int(sx), y0 = int(sy);
          float dx = sx - x0, dy = sy - y0;
          const float* p = &im.pix[size_t(y0) * im.w + x0];
          dst[size_t(y) * out_w + x] =
              p[0] * (1 - dx) * (1 - dy) + p[1] * dx * (1 - dy) +
              p[im.w] * (1 - dx) * dy + p[im.w + 1] * dx * dy;
        }
      }
    }
    {
      // The state transition must be serialized with the waiters'
      // predicate checks: storing outside the mutex can publish 2 between
      // a waiter's predicate evaluation and its sleep (lost wakeup).
      std::lock_guard<std::mutex> lk(m);
      state[idx % slots.size()].store(2);
    }
    cv.notify_all();
  }

  void worker() {
    while (!stop.load()) {
      size_t idx = next_submit.fetch_add(1);
      if (idx >= paths.size()) return;
      // Wait until the ring slot is free (consumer caught up).
      {
        std::unique_lock<std::mutex> lk(m);
        cv.wait(lk, [&] {
          return stop.load() ||
                 state[idx % slots.size()].load() == 0;
        });
        if (stop.load()) return;
        state[idx % slots.size()].store(1);
      }
      process(idx);
    }
  }

  void start() {
    for (int t = 0; t < n_threads; t++)
      workers.emplace_back([this] { worker(); });
  }

  bool next(float* out) {
    if (next_read >= paths.size()) return false;
    size_t slot = next_read % slots.size();
    std::unique_lock<std::mutex> lk(m);
    cv.wait(lk, [&] { return state[slot].load() == 2; });
    memcpy(out, slots[slot].data(),
           sizeof(float) * size_t(out_w) * out_h);
    state[slot].store(0);  // still under the mutex (lk) — see process()
    next_read++;
    lk.unlock();
    cv.notify_all();
    return true;
  }

  ~Loader() {
    stop.store(true);
    cv.notify_all();
    for (auto& t : workers)
      if (t.joinable()) t.join();
  }
};

}  // namespace

extern "C" {

void* dl_create(const char** paths, int n_paths, int in_w, int in_h,
                int out_w, int out_h, const float* remap_x,
                const float* remap_y, const float* gamma_lut,
                const float* vignette, int n_threads, int ring) {
  auto* L = new Loader(size_t(ring > 0 ? ring : 8));
  for (int i = 0; i < n_paths; i++) L->paths.emplace_back(paths[i]);
  L->in_w = in_w;
  L->in_h = in_h;
  L->out_w = out_w;
  L->out_h = out_h;
  size_t no = size_t(out_w) * out_h;
  L->remap_x.assign(remap_x, remap_x + no);
  L->remap_y.assign(remap_y, remap_y + no);
  if (gamma_lut) L->gamma.assign(gamma_lut, gamma_lut + 256);
  if (vignette)
    L->vignette.assign(vignette, vignette + size_t(in_w) * in_h);
  L->n_threads = n_threads > 0 ? n_threads : 4;
  L->start();
  return L;
}

int dl_next(void* handle, float* out) {
  return static_cast<Loader*>(handle)->next(out) ? 1 : 0;
}

void dl_destroy(void* handle) { delete static_cast<Loader*>(handle); }

// Standalone single-image decode (for tests / non-pipelined use).
int dl_decode_png(const char* path, float* out, int max_w, int max_h,
                  int* w, int* h) {
  Image im = decode_png(path);
  if (!im.ok || im.w > max_w || im.h > max_h) return 0;
  *w = im.w;
  *h = im.h;
  memcpy(out, im.pix.data(), sizeof(float) * im.pix.size());
  return 1;
}
}
