// Native I/O helpers for lettuce-tpu.
//
// The TPU compute path is JAX/XLA/Pallas; the I/O runtime around it is
// native, mirroring how the reference keeps its performance-critical
// non-Python pieces in C++/CUDA (lettuce/cuda_native/). VTK legacy binary
// requires big-endian payloads: doing byteswap + buffered write in one C
// pass avoids materialising a second numpy copy of multi-GB fields.
//
// Built on demand with g++ (see native.py); exposed via ctypes.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

// Append `count` float32 values to `path`, byteswapped to big-endian.
// Returns 0 on success, negative errno-style codes on failure.
int lt_write_be_f32(const char* path, const float* data, int64_t count) {
    FILE* fh = std::fopen(path, "ab");
    if (!fh) return -1;
    const uint32_t* src = reinterpret_cast<const uint32_t*>(data);
    const int64_t CHUNK = 1 << 16;
    uint32_t* buf = static_cast<uint32_t*>(std::malloc(CHUNK * 4));
    if (!buf) { std::fclose(fh); return -2; }
    for (int64_t off = 0; off < count; off += CHUNK) {
        int64_t n = count - off < CHUNK ? count - off : CHUNK;
        for (int64_t i = 0; i < n; ++i) {
            buf[i] = __builtin_bswap32(src[off + i]);
        }
        if (std::fwrite(buf, 4, n, fh) != static_cast<size_t>(n)) {
            std::free(buf);
            std::fclose(fh);
            return -3;
        }
    }
    std::free(buf);
    std::fclose(fh);
    return 0;
}

int lt_write_be_f64(const char* path, const double* data, int64_t count) {
    FILE* fh = std::fopen(path, "ab");
    if (!fh) return -1;
    const uint64_t* src = reinterpret_cast<const uint64_t*>(data);
    const int64_t CHUNK = 1 << 15;
    uint64_t* buf = static_cast<uint64_t*>(std::malloc(CHUNK * 8));
    if (!buf) { std::fclose(fh); return -2; }
    for (int64_t off = 0; off < count; off += CHUNK) {
        int64_t n = count - off < CHUNK ? count - off : CHUNK;
        for (int64_t i = 0; i < n; ++i) {
            buf[i] = __builtin_bswap64(src[off + i]);
        }
        if (std::fwrite(buf, 8, n, fh) != static_cast<size_t>(n)) {
            std::free(buf);
            std::fclose(fh);
            return -3;
        }
    }
    std::free(buf);
    std::fclose(fh);
    return 0;
}

// Transpose a C-ordered [nx, ny, nz] array to VTK's x-fastest (Fortran)
// order while byteswapping, appending to `path`. One pass, no numpy
// intermediate.
int lt_write_be_f32_fortran(const char* path, const float* data,
                            int64_t nx, int64_t ny, int64_t nz) {
    FILE* fh = std::fopen(path, "ab");
    if (!fh) return -1;
    const uint32_t* src = reinterpret_cast<const uint32_t*>(data);
    int64_t total = nx * ny * nz;
    uint32_t* buf = static_cast<uint32_t*>(std::malloc(total * 4));
    if (!buf) { std::fclose(fh); return -2; }
    int64_t k = 0;
    for (int64_t z = 0; z < nz; ++z) {
        for (int64_t y = 0; y < ny; ++y) {
            for (int64_t x = 0; x < nx; ++x) {
                buf[k++] = __builtin_bswap32(src[(x * ny + y) * nz + z]);
            }
        }
    }
    size_t written = std::fwrite(buf, 4, total, fh);
    std::free(buf);
    std::fclose(fh);
    return written == static_cast<size_t>(total) ? 0 : -3;
}

}  // extern "C"
