// Native frame loader: threaded read-ahead + PNG decode + grayscale float32.
//
// TPU-native equivalent of the reference's C++ image input path (ROS image
// transport + cv_bridge toCvShare, mono_vo.cpp:92-98): a worker pool decodes
// frames ahead of the consumer into a bounded ring of reusable buffers, so
// host decode overlaps device compute. Exposed to Python via a plain C ABI
// (ctypes — no pybind11 in this image).
//
// PNG subset: 8/16-bit, color types 0 (gray), 2 (RGB), 3 (palette),
// 4 (gray+alpha), 6 (RGBA); non-interlaced (KITTI / TUM / EuRoC images all
// qualify). Inflate is delegated to zlib. Grayscale conversion uses the
// BT.601 weights OpenCV uses, so outputs match cv2.imread(...,
// IMREAD_GRAYSCALE) to rounding.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 frame_loader.cpp -o
//        libframe_loader.so -lz -lpthread

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  std::vector<float> data;
  int height = 0;
  int width = 0;
  bool ok = false;
  std::string error;
};

uint32_t read_be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

bool inflate_all(const std::vector<uint8_t>& in, std::vector<uint8_t>& out) {
  z_stream zs{};
  if (inflateInit(&zs) != Z_OK) return false;
  zs.next_in = const_cast<uint8_t*>(in.data());
  zs.avail_in = static_cast<uInt>(in.size());
  std::vector<uint8_t> buf(1 << 20);
  int ret = Z_OK;
  while (ret != Z_STREAM_END) {
    zs.next_out = buf.data();
    zs.avail_out = static_cast<uInt>(buf.size());
    ret = inflate(&zs, Z_NO_FLUSH);
    if (ret != Z_OK && ret != Z_STREAM_END) {
      inflateEnd(&zs);
      return false;
    }
    out.insert(out.end(), buf.data(), buf.data() + (buf.size() - zs.avail_out));
  }
  inflateEnd(&zs);
  return true;
}

Image decode_png_gray_f32(const std::string& path) {
  Image img;
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) {
    img.error = "cannot open " + path;
    return img;
  }
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> raw(size);
  if (fread(raw.data(), 1, size, f) != static_cast<size_t>(size)) {
    fclose(f);
    img.error = "short read";
    return img;
  }
  fclose(f);

  static const uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (size < 8 || memcmp(raw.data(), kSig, 8) != 0) {
    img.error = "not a PNG";
    return img;
  }

  uint32_t w = 0, h = 0;
  int bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;
  std::vector<uint8_t> palette;  // RGB triples
  size_t off = 8;
  while (off + 8 <= raw.size()) {
    uint32_t len = read_be32(&raw[off]);
    const char* type = reinterpret_cast<const char*>(&raw[off + 4]);
    const uint8_t* payload = &raw[off + 8];
    if (off + 12 + len > raw.size()) break;
    if (memcmp(type, "IHDR", 4) == 0) {
      w = read_be32(payload);
      h = read_be32(payload + 4);
      bit_depth = payload[8];
      color_type = payload[9];
      interlace = payload[12];
    } else if (memcmp(type, "PLTE", 4) == 0) {
      palette.assign(payload, payload + len);
    } else if (memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), payload, payload + len);
    } else if (memcmp(type, "IEND", 4) == 0) {
      break;
    }
    off += 12 + len;
  }
  if (w == 0 || h == 0) {
    img.error = "bad IHDR";
    return img;
  }
  if (interlace != 0) {
    img.error = "interlaced PNG unsupported";
    return img;
  }
  if (bit_depth != 8 && bit_depth != 16) {
    img.error = "bit depth unsupported";
    return img;
  }

  int channels;
  switch (color_type) {
    case 0: channels = 1; break;   // gray
    case 2: channels = 3; break;   // RGB
    case 3: channels = 1; break;   // palette index
    case 4: channels = 2; break;   // gray + alpha
    case 6: channels = 4; break;   // RGBA
    default:
      img.error = "color type unsupported";
      return img;
  }
  if (color_type == 3 && bit_depth != 8) {
    img.error = "palette with depth != 8 unsupported";
    return img;
  }

  std::vector<uint8_t> decomp;
  if (!inflate_all(idat, decomp)) {
    img.error = "zlib inflate failed";
    return img;
  }
  const int bytes_per_sample = bit_depth / 8;
  const size_t bpp = size_t(channels) * bytes_per_sample;  // bytes per pixel
  const size_t stride = size_t(w) * bpp;
  if (decomp.size() < h * (stride + 1)) {
    img.error = "truncated image data";
    return img;
  }

  // Unfilter in place into `scan`
  std::vector<uint8_t> scan(h * stride);
  const uint8_t* src = decomp.data();
  for (uint32_t y = 0; y < h; ++y) {
    uint8_t filter = src[y * (stride + 1)];
    const uint8_t* in = src + y * (stride + 1) + 1;
    uint8_t* out = scan.data() + y * stride;
    const uint8_t* up = y ? scan.data() + (y - 1) * stride : nullptr;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= bpp ? out[x - bpp] : 0;
      int b = up ? up[x] : 0;
      int c = (up && x >= bpp) ? up[x - bpp] : 0;
      int v = in[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default:
          img.error = "bad filter type";
          return img;
      }
      out[x] = static_cast<uint8_t>(v);
    }
  }

  // To grayscale float32 (BT.601, matching OpenCV)
  img.data.resize(size_t(w) * h);
  img.width = static_cast<int>(w);
  img.height = static_cast<int>(h);
  auto sample = [&](const uint8_t* px, int ch) -> float {
    if (bytes_per_sample == 1) return float(px[ch]);
    return float(px[2 * ch]) * 256.f / 257.f;  // 16-bit: high byte approx
  };
  for (uint32_t y = 0; y < h; ++y) {
    const uint8_t* row = scan.data() + y * stride;
    float* out = img.data.data() + size_t(y) * w;
    for (uint32_t x = 0; x < w; ++x) {
      const uint8_t* px = row + x * bpp;
      float v;
      if (color_type == 0 || color_type == 4) {
        v = sample(px, 0);
      } else if (color_type == 3) {
        const uint8_t idx = px[0];
        if (size_t(idx) * 3 + 2 < palette.size()) {
          v = 0.299f * palette[idx * 3] + 0.587f * palette[idx * 3 + 1] +
              0.114f * palette[idx * 3 + 2];
        } else {
          v = 0.f;
        }
      } else {  // RGB / RGBA
        v = 0.299f * sample(px, 0) + 0.587f * sample(px, 1) +
            0.114f * sample(px, 2);
      }
      out[x] = v;
    }
  }
  img.ok = true;
  return img;
}

// ---------------------------------------------------------------------------
// Threaded prefetcher
// ---------------------------------------------------------------------------

struct Loader {
  std::vector<std::string> paths;
  size_t next_submit = 0;   // next index a worker should decode
  size_t next_consume = 0;  // next index the consumer wants
  size_t capacity;          // max decoded-ahead frames
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_work;  // workers wait: room in window?
  std::condition_variable cv_done;  // consumer waits: frame ready?
  std::vector<Image> slots;         // ring of decoded frames
  std::vector<int> slot_state;      // 0 empty, 1 in-flight, 2 ready
  std::atomic<bool> stop{false};

  Loader(std::vector<std::string> p, size_t cap, int n_threads)
      : paths(std::move(p)),
        capacity(cap),
        slots(cap),
        slot_state(cap, 0) {
    for (int i = 0; i < n_threads; ++i) {
      workers.emplace_back([this] { worker(); });
    }
  }

  ~Loader() {
    stop = true;
    cv_work.notify_all();
    cv_done.notify_all();
    for (auto& t : workers) t.join();
  }

  void worker() {
    while (true) {
      size_t idx;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [&] {
          return stop || (next_submit < paths.size() &&
                          next_submit < next_consume + capacity &&
                          slot_state[next_submit % capacity] == 0);
        });
        if (stop) return;
        idx = next_submit++;
        slot_state[idx % capacity] = 1;
      }
      Image img = decode_png_gray_f32(paths[idx]);
      {
        std::unique_lock<std::mutex> lk(mu);
        slots[idx % capacity] = std::move(img);
        slot_state[idx % capacity] = 2;
      }
      cv_done.notify_all();
    }
  }

  // Returns 0 ok, 1 end-of-sequence, 2 decode error.
  int next(float* out, int* height, int* width, size_t out_capacity) {
    size_t idx;
    {
      std::unique_lock<std::mutex> lk(mu);
      if (next_consume >= paths.size()) return 1;
      idx = next_consume;
      cv_done.wait(lk, [&] { return stop || slot_state[idx % capacity] == 2; });
      if (stop) return 1;
    }
    Image& img = slots[idx % capacity];
    int rc = 2;
    if (img.ok && img.data.size() <= out_capacity) {
      memcpy(out, img.data.data(), img.data.size() * sizeof(float));
      *height = img.height;
      *width = img.width;
      rc = 0;
    } else if (!img.error.empty()) {
      fprintf(stderr, "frame_loader: %s\n", img.error.c_str());
    }
    {
      std::unique_lock<std::mutex> lk(mu);
      img = Image();
      slot_state[idx % capacity] = 0;
      next_consume = idx + 1;
    }
    cv_work.notify_all();
    return rc;
  }
};

}  // namespace

extern "C" {

void* fl_open(const char** paths, int n_paths, int ring_capacity,
              int n_threads) {
  std::vector<std::string> p(paths, paths + n_paths);
  return new Loader(std::move(p), static_cast<size_t>(ring_capacity),
                    n_threads);
}

int fl_next(void* handle, float* out, int* height, int* width,
            long out_capacity) {
  return static_cast<Loader*>(handle)->next(out, height, width,
                                            static_cast<size_t>(out_capacity));
}

void fl_close(void* handle) { delete static_cast<Loader*>(handle); }

// Single-shot decode (no threading) — used by tests and as a cv2-free
// fallback decode path.
int fl_decode(const char* path, float* out, int* height, int* width,
              long out_capacity) {
  Image img = decode_png_gray_f32(path);
  if (!img.ok) {
    fprintf(stderr, "frame_loader: %s\n", img.error.c_str());
    return 2;
  }
  if (static_cast<long>(img.data.size()) > out_capacity) return 3;
  memcpy(out, img.data.data(), img.data.size() * sizeof(float));
  *height = img.height;
  *width = img.width;
  return 0;
}

}  // extern "C"
