// Native EuRoC data-loading runtime: CSV parse, stereo+IMU sync, prefetch.
//
// TPU-native counterpart of the reference's C++ data provider
// (reference: cpp/src/dataproviders/adataprovider.cpp -- EUROCGrabber CSV
// parsing + timestamp sync:269-483, grabber thread + frame queue:14-26,257).
// The reference runs a detached grabber thread feeding a spin-wait queue;
// here a worker thread decodes images ahead of the consumer into a bounded
// ring buffer, exposed to Python through a plain C ABI (ctypes -- no
// pybind11 in this environment).
//
// Images: 8-bit grayscale PNG (EuRoC cam format) decoded with a minimal
// libz-based decoder (non-interlaced, bit depth 8, color types 0/2/6), or
// raw PGM (P5).
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <cmath>
#include <condition_variable>
#include <fstream>
#include <mutex>
#include <sstream>
#include <string>
#include <thread>
#include <vector>
#include <zlib.h>

namespace {

struct ImuSample { double ts; double wxyz[3]; double axyz[3]; };
struct CamEntry { double ts; std::string file; };

static bool read_imu_csv(const std::string& path, std::vector<ImuSample>& out) {
    std::ifstream f(path);
    if (!f) return false;
    std::string line;
    while (std::getline(f, line)) {
        if (line.empty() || line[0] == '#') continue;
        ImuSample s;
        char* end = nullptr;
        const char* p = line.c_str();
        s.ts = strtod(p, &end) * 1e-9;
        double* dst[6] = {&s.wxyz[0], &s.wxyz[1], &s.wxyz[2],
                          &s.axyz[0], &s.axyz[1], &s.axyz[2]};
        for (int i = 0; i < 6; i++) {
            p = end;
            while (*p == ',' || *p == ' ') p++;
            *dst[i] = strtod(p, &end);
        }
        out.push_back(s);
    }
    return !out.empty();
}

static bool read_cam_csv(const std::string& path, std::vector<CamEntry>& out) {
    std::ifstream f(path);
    if (!f) return false;
    std::string line;
    while (std::getline(f, line)) {
        if (line.empty() || line[0] == '#') continue;
        auto comma = line.find(',');
        if (comma == std::string::npos) continue;
        CamEntry e;
        e.ts = strtod(line.substr(0, comma).c_str(), nullptr) * 1e-9;
        e.file = line.substr(comma + 1);
        while (!e.file.empty() && (e.file.back() == '\r' || e.file.back() == '\n' ||
                                   e.file.back() == ' '))
            e.file.pop_back();
        out.push_back(e);
    }
    return !out.empty();
}

// ---------------------------------------------------------------------------
// minimal PNG decode (8-bit, non-interlaced; gray/rgb/rgba -> gray float)
// ---------------------------------------------------------------------------

static uint32_t be32(const uint8_t* p) {
    return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
           (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

static int paeth(int a, int b, int c) {
    int p = a + b - c, pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
    if (pa <= pb && pa <= pc) return a;
    if (pb <= pc) return b;
    return c;
}

static bool decode_png(const std::vector<uint8_t>& buf, std::vector<float>& img,
                       int* w_out, int* h_out) {
    static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    if (buf.size() < 8 || memcmp(buf.data(), sig, 8) != 0) return false;
    size_t pos = 8;
    uint32_t w = 0, h = 0;
    int bit_depth = 0, color = -1, channels = 0;
    std::vector<uint8_t> idat;
    while (pos + 8 <= buf.size()) {
        uint32_t len = be32(&buf[pos]);
        const char* type = reinterpret_cast<const char*>(&buf[pos + 4]);
        const uint8_t* data = &buf[pos + 8];
        if (pos + 12 + len > buf.size()) return false;
        if (!memcmp(type, "IHDR", 4)) {
            w = be32(data); h = be32(data + 4);
            bit_depth = data[8]; color = data[9];
            if (bit_depth != 8 || data[12] != 0) return false;  // interlaced
            channels = (color == 0) ? 1 : (color == 2) ? 3 : (color == 6) ? 4
                        : (color == 4) ? 2 : 0;
            if (channels == 0) return false;  // palette unsupported
        } else if (!memcmp(type, "IDAT", 4)) {
            idat.insert(idat.end(), data, data + len);
        } else if (!memcmp(type, "IEND", 4)) {
            break;
        }
        pos += 12 + len;
    }
    if (w == 0 || h == 0 || idat.empty()) return false;

    const size_t stride = size_t(w) * channels;
    std::vector<uint8_t> raw((stride + 1) * h);
    uLongf raw_len = raw.size();
    if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK)
        return false;

    std::vector<uint8_t> prev(stride, 0), cur(stride, 0);
    img.resize(size_t(w) * h);
    for (uint32_t y = 0; y < h; y++) {
        const uint8_t* row = &raw[y * (stride + 1)];
        uint8_t filter = row[0];
        const uint8_t* src = row + 1;
        for (size_t x = 0; x < stride; x++) {
            int a = (x >= size_t(channels)) ? cur[x - channels] : 0;
            int b = prev[x];
            int c = (x >= size_t(channels)) ? prev[x - channels] : 0;
            int v = src[x];
            switch (filter) {
                case 1: v += a; break;
                case 2: v += b; break;
                case 3: v += (a + b) / 2; break;
                case 4: v += paeth(a, b, c); break;
                default: break;
            }
            cur[x] = uint8_t(v);
        }
        for (uint32_t x = 0; x < w; x++) {
            const uint8_t* px = &cur[size_t(x) * channels];
            float g;
            if (channels == 1 || channels == 2) g = px[0];
            else g = 0.299f * px[0] + 0.587f * px[1] + 0.114f * px[2];
            img[size_t(y) * w + x] = g;
        }
        std::swap(prev, cur);
    }
    *w_out = int(w); *h_out = int(h);
    return true;
}

static bool decode_pgm(const std::vector<uint8_t>& buf, std::vector<float>& img,
                       int* w_out, int* h_out) {
    if (buf.size() < 10 || buf[0] != 'P' || buf[1] != '5') return false;
    std::istringstream hs(std::string(buf.begin(), buf.begin() + 64));
    std::string magic; int w, h, maxv;
    hs >> magic >> w >> h >> maxv;
    size_t off = size_t(hs.tellg()) + 1;
    if (off + size_t(w) * h > buf.size()) return false;
    img.resize(size_t(w) * h);
    for (size_t i = 0; i < img.size(); i++) img[i] = float(buf[off + i]);
    *w_out = w; *h_out = h;
    return true;
}

static bool load_image(const std::string& path, std::vector<float>& img,
                       int* w, int* h) {
    std::ifstream f(path, std::ios::binary);
    if (!f) return false;
    std::vector<uint8_t> buf((std::istreambuf_iterator<char>(f)),
                             std::istreambuf_iterator<char>());
    if (decode_png(buf, img, w, h)) return true;
    return decode_pgm(buf, img, w, h);
}

// ---------------------------------------------------------------------------
// synced frame assembly + prefetch ring
// ---------------------------------------------------------------------------

struct Frame {
    double ts = 0;
    int width = 0, height = 0;
    std::vector<float> img0, img1;
    std::vector<double> imu;  // n x 7: dt, wx, wy, wz, ax, ay, az
    bool ok = false;
};

struct Dataset {
    std::vector<ImuSample> imu;
    std::vector<CamEntry> cam0, cam1;
    std::string root;
    // sync bookkeeping (EUROCGrabber semantics: 2.5 ms seek, 20 ms gate)
    std::vector<std::pair<size_t, size_t>> pairs;

    // prefetch ring
    static const size_t RING = 8;
    Frame ring[RING];
    std::atomic<size_t> head{0};  // next to produce
    std::atomic<size_t> tail{0};  // next to consume
    std::mutex mu;
    std::condition_variable cv_room, cv_data;
    std::thread worker;
    std::atomic<bool> stop{false};

    void build_pairs() {
        size_t j = 0;
        for (size_t i = 0; i < cam0.size(); i++) {
            double t0 = cam0[i].ts;
            while (j + 1 < cam1.size() && cam1[j].ts < t0 - 0.0025) j++;
            if (j < cam1.size() && fabs(cam1[j].ts - t0) <= 0.020)
                pairs.emplace_back(i, j);
        }
    }

    void produce() {
        size_t i_imu = 0;
        double last_t = -1;
        for (size_t k = 0; k < pairs.size() && !stop; k++) {
            Frame f;
            const auto& [i0, j1] = pairs[k];
            f.ts = cam0[i0].ts;
            int w0, h0, w1, h1;
            bool ok0 = load_image(root + "/cam0/data/" + cam0[i0].file, f.img0, &w0, &h0);
            bool ok1 = load_image(root + "/cam1/data/" + cam1[j1].file, f.img1, &w1, &h1);
            f.ok = ok0 && ok1 && w0 == w1 && h0 == h1;
            f.width = w0; f.height = h0;
            // IMU batch covering (last_t, ts]
            size_t k0 = i_imu;
            while (i_imu < imu.size() && imu[i_imu].ts <= f.ts) i_imu++;
            if (last_t >= 0) {
                double prev = last_t;
                for (size_t s = k0; s < i_imu; s++) {
                    f.imu.push_back(imu[s].ts - prev);
                    for (int d = 0; d < 3; d++) f.imu.push_back(imu[s].wxyz[d]);
                    for (int d = 0; d < 3; d++) f.imu.push_back(imu[s].axyz[d]);
                    prev = imu[s].ts;
                }
            }
            last_t = f.ts;

            std::unique_lock<std::mutex> lk(mu);
            cv_room.wait(lk, [&] { return stop || head - tail < RING; });
            if (stop) return;
            ring[head % RING] = std::move(f);
            head++;
            cv_data.notify_one();
        }
        // sentinel: empty non-ok frame marks end
        std::unique_lock<std::mutex> lk(mu);
        cv_room.wait(lk, [&] { return stop || head - tail < RING; });
        if (stop) return;
        ring[head % RING] = Frame{};
        ring[head % RING].ts = -1;
        head++;
        cv_data.notify_one();
    }
};

}  // namespace

extern "C" {

void* euroc_open(const char* root_dir) {
    auto* d = new Dataset();
    d->root = root_dir;
    std::string m = d->root + "/mav0";
    std::ifstream probe(m + "/cam0/data.csv");
    if (probe) d->root = m;
    if (!read_imu_csv(d->root + "/imu0/data.csv", d->imu) ||
        !read_cam_csv(d->root + "/cam0/data.csv", d->cam0) ||
        !read_cam_csv(d->root + "/cam1/data.csv", d->cam1)) {
        delete d;
        return nullptr;
    }
    d->build_pairs();
    d->worker = std::thread([d] { d->produce(); });
    return d;
}

int euroc_n_frames(void* handle) {
    return int(static_cast<Dataset*>(handle)->pairs.size());
}

// Peek next frame's dims + imu count.  Returns 1 if a frame is ready,
// 0 at end of stream.
int euroc_next_info(void* handle, int* width, int* height, int* n_imu) {
    auto* d = static_cast<Dataset*>(handle);
    std::unique_lock<std::mutex> lk(d->mu);
    d->cv_data.wait(lk, [&] { return d->head > d->tail; });
    Frame& f = d->ring[d->tail % Dataset::RING];
    if (f.ts < 0) return 0;
    *width = f.width;
    *height = f.height;
    *n_imu = int(f.imu.size() / 7);
    return 1;
}

// Copy out the frame (buffers sized from euroc_next_info) and advance.
double euroc_next_frame(void* handle, float* img0, float* img1, double* imu7) {
    auto* d = static_cast<Dataset*>(handle);
    std::unique_lock<std::mutex> lk(d->mu);
    d->cv_data.wait(lk, [&] { return d->head > d->tail; });
    Frame& f = d->ring[d->tail % Dataset::RING];
    double ts = f.ts;
    if (ts >= 0 && f.ok) {
        memcpy(img0, f.img0.data(), f.img0.size() * sizeof(float));
        memcpy(img1, f.img1.data(), f.img1.size() * sizeof(float));
        if (!f.imu.empty())
            memcpy(imu7, f.imu.data(), f.imu.size() * sizeof(double));
    }
    d->tail++;
    d->cv_room.notify_one();
    return ts;
}

void euroc_close(void* handle) {
    auto* d = static_cast<Dataset*>(handle);
    d->stop = true;
    d->cv_room.notify_all();
    d->cv_data.notify_all();
    if (d->worker.joinable()) d->worker.join();
    delete d;
}

}  // extern "C"
