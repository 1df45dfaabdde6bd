// tapecraft — native host runtime for stringzilla_tpu.
//
// The TPU kernels consume dense, padded, lane-aligned blocks; everything the
// device cannot do — ragged→dense packing, corpus tokenization, sort-key
// export — is host work on the critical path of every engine call. The
// reference keeps this layer native too (its CPython bindings and ForkUnion
// runtime are C/C++; see reference c/stringzillas/runtime.cpp,
// python/stringzilla.c). This is the TPU build's equivalent: a small C++17
// shared library driven through ctypes (no pybind11 in the image).
//
// All functions are plain-C ABI, operate on caller-owned buffers, and are
// thread-free (callers parallelize if they care; packing is memory-bound).

#include <cstdint>
#include <cstring>

extern "C" {

// Ragged → dense uint8 matrix. Strings selected by `indices` out of the tape
// (data, offsets[count+1]) are copied into `out` of shape [rows, row_len]
// (row-major), zero-padded. When `transpose` != 0, `out` is [row_len, rows]
// instead (the lane-packed layout: candidates across the minor axis).
void tc_pack_u8(const uint8_t* data, const int64_t* offsets,
                const int64_t* indices, int64_t count,
                uint8_t* out, int64_t rows, int64_t row_len,
                int transpose) {
    if (!transpose) {
        std::memset(out, 0, (size_t)(rows * row_len));
        for (int64_t r = 0; r < count; ++r) {
            int64_t idx = indices ? indices[r] : r;
            int64_t lo = offsets[idx], hi = offsets[idx + 1];
            int64_t n = hi - lo;
            if (n > row_len) n = row_len;
            std::memcpy(out + r * row_len, data + lo, (size_t)n);
        }
    } else {
        std::memset(out, 0, (size_t)(rows * row_len));
        for (int64_t r = 0; r < count; ++r) {
            int64_t idx = indices ? indices[r] : r;
            int64_t lo = offsets[idx], hi = offsets[idx + 1];
            int64_t n = hi - lo;
            if (n > row_len) n = row_len;
            for (int64_t i = 0; i < n; ++i)
                out[i * rows + r] = data[lo + i];
        }
    }
}

// Ragged → dense int32 matrix (the DP kernels take int32 characters).
// `fill` pre-fills the matrix (0 for candidates, -1 for Myers queries).
// Layout [row_len, rows] when transpose (chars down axis 0), else
// [rows, row_len]. Also writes per-string lengths (clamped to row_len).
void tc_pack_i32(const uint8_t* data, const int64_t* offsets,
                 const int64_t* indices, int64_t count,
                 int32_t* out, int64_t rows, int64_t row_len,
                 int transpose, int32_t fill, int32_t* lengths) {
    for (int64_t i = 0, total = rows * row_len; i < total; ++i) out[i] = fill;
    for (int64_t r = 0; r < count; ++r) {
        int64_t idx = indices ? indices[r] : r;
        int64_t lo = offsets[idx], hi = offsets[idx + 1];
        int64_t n = hi - lo;
        if (lengths) lengths[r] = (int32_t)n;
        if (n > row_len) n = row_len;
        if (!transpose) {
            int32_t* row = out + r * row_len;
            for (int64_t i = 0; i < n; ++i) row[i] = data[lo + i];
        } else {
            for (int64_t i = 0; i < n; ++i) out[i * rows + r] = data[lo + i];
        }
    }
}

// Same, but for pre-decoded 32-bit rune tapes (UTF-8 engines).
void tc_pack_runes_i32(const int32_t* data, const int64_t* offsets,
                       const int64_t* indices, int64_t count,
                       int32_t* out, int64_t rows, int64_t row_len,
                       int transpose, int32_t fill, int32_t* lengths) {
    for (int64_t i = 0, total = rows * row_len; i < total; ++i) out[i] = fill;
    for (int64_t r = 0; r < count; ++r) {
        int64_t idx = indices ? indices[r] : r;
        int64_t lo = offsets[idx], hi = offsets[idx + 1];
        int64_t n = hi - lo;
        if (lengths) lengths[r] = (int32_t)n;
        if (n > row_len) n = row_len;
        if (!transpose) {
            int32_t* row = out + r * row_len;
            for (int64_t i = 0; i < n; ++i) row[i] = data[lo + i];
        } else {
            for (int64_t i = 0; i < n; ++i) out[i * rows + r] = data[lo + i];
        }
    }
}

// Whitespace tokenization: writes token [start, end) pairs, returns count.
// A second pass with bounds==nullptr just counts (callers size the buffer).
// ASCII whitespace set matches the reference bench corpora (space, \t-\r).
static inline bool tc_is_ws(uint8_t b) {
    return b == ' ' || (b >= '\t' && b <= '\r');
}

int64_t tc_tokenize_ws(const uint8_t* data, int64_t n, int64_t* bounds,
                       int64_t cap) {
    int64_t count = 0;
    int64_t i = 0;
    while (i < n) {
        while (i < n && tc_is_ws(data[i])) ++i;
        if (i >= n) break;
        int64_t start = i;
        while (i < n && !tc_is_ws(data[i])) ++i;
        if (bounds && count < cap) {
            bounds[2 * count] = start;
            bounds[2 * count + 1] = i;
        }
        ++count;
    }
    return count;
}

// Newline split: one token per line (excluding the terminator), \r\n = one
// terminator. Returns line count.
int64_t tc_split_lines(const uint8_t* data, int64_t n, int64_t* bounds,
                       int64_t cap) {
    int64_t count = 0;
    int64_t start = 0;
    for (int64_t i = 0; i <= n; ++i) {
        bool end = i == n;
        bool nl = !end && (data[i] == '\n' || data[i] == '\r');
        if (end || nl) {
            if (end && start == i && count > 0) break;  // no trailing empty
            if (bounds && count < cap) {
                bounds[2 * count] = start;
                bounds[2 * count + 1] = i;
            }
            ++count;
            if (!end && data[i] == '\r' && i + 1 < n && data[i + 1] == '\n') ++i;
            start = i + 1;
            if (end) break;
        }
    }
    return count;
}

// Sort-key export: big-endian u32 pgram keys + u32 length tiebreak, the host
// half of the device argsort (see ops/sort.py; reference exports pointer-
// sized pgrams the same way, include/stringzilla/sort.h:9-16).
// out shape: [count, words_per_str + 1] u32, keys big-endian per 4 bytes.
void tc_pgram_keys(const uint8_t* data, const int64_t* starts,
                   const int64_t* ends, int64_t count,
                   uint32_t* out, int64_t words_per_str,
                   int uncased, int reverse) {
    for (int64_t r = 0; r < count; ++r) {
        int64_t lo = starts[r], hi = ends[r];
        int64_t n = hi - lo;
        uint32_t* row = out + r * (words_per_str + 1);
        for (int64_t w = 0; w < words_per_str; ++w) {
            uint32_t key = 0;
            for (int64_t b = 0; b < 4; ++b) {
                int64_t i = w * 4 + b;
                uint32_t byte = i < n ? data[lo + i] : 0;
                if (uncased && byte >= 'A' && byte <= 'Z') byte += 32;
                if (reverse) byte = 255u - byte;
                key = (key << 8) | byte;
            }
            row[w] = key;
        }
        row[words_per_str] = reverse ? ~(uint32_t)n : (uint32_t)n;
    }
}

// 64-bit byte checksum over a tape slice (sz_bytesum analog for host tiers).
uint64_t tc_bytesum(const uint8_t* data, int64_t n) {
    uint64_t acc = 0;
    for (int64_t i = 0; i < n; ++i) acc += data[i];
    return acc;
}

int tc_version(void) { return 1; }

}  // extern "C"
