/* N-API addon over the tapecraft stable C ABI — the analog of the
 * reference's javascript/lib.c:1-1127 N-API binding over its C99 ABI.
 *
 * Covers the table-free host-tier surface (hash / bytesum / SHA-256 /
 * fill_random / tokenize / UTF-8 decode+encode / argsort); the
 * Unicode-table entry points are reachable the same way once the caller
 * loads the UCD arrays (see bindings/README.md).
 *
 * Build: node-gyp configure build   (binding.gyp links -ltapecraft)
 * NOTE: compile-ready but NOT compiled in the repo's CI image (no Node
 * toolchain there); tests/test_bindings.py drift-checks the symbol usage.
 */
#include <node_api.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

int tc_version(void);
uint64_t tc_bytesum(const uint8_t* data, int64_t n);
uint64_t tc_hash(const uint8_t* data, int64_t n, uint64_t seed);
void tc_hash_bounds(const uint8_t* data, const int64_t* starts,
                    const int64_t* ends, int64_t count, uint64_t seed,
                    uint64_t* out);
void tc_fill_random(uint8_t* out, int64_t n, uint64_t nonce);
void tc_sha256(const uint8_t* data, int64_t n, uint8_t* out32);
int64_t tc_tokenize_ws(const uint8_t* data, int64_t n, int64_t* bounds,
                       int64_t cap);
int64_t tc_split_lines(const uint8_t* data, int64_t n, int64_t* bounds,
                       int64_t cap);
int64_t tc_utf8_decode(const uint8_t* data, int64_t n, uint32_t* runes,
                       int32_t* offsets);
int64_t tc_utf8_encode(const uint32_t* runes, int64_t count, uint8_t* out);
void tc_pgram_keys(const uint8_t* data, const int64_t* starts,
                   const int64_t* ends, int64_t count, uint32_t* out,
                   int words_per_str, int uncased, int reverse);
void tc_argsort_keys(const uint32_t* keys, int64_t n, int32_t w,
                     int64_t* order);

static const uint8_t* buf_bytes(napi_env env, napi_value v, size_t* len) {
    void* data;
    if (napi_get_buffer_info(env, v, &data, len) != napi_ok) return NULL;
    return (const uint8_t*)data;
}

static napi_value js_version(napi_env env, napi_callback_info info) {
    napi_value out;
    napi_create_int32(env, tc_version(), &out);
    return out;
}

static napi_value js_bytesum(napi_env env, napi_callback_info info) {
    size_t argc = 1, len;
    napi_value argv[1], out;
    napi_get_cb_info(env, info, &argc, argv, NULL, NULL);
    const uint8_t* p = buf_bytes(env, argv[0], &len);
    napi_create_bigint_uint64(env, tc_bytesum(p, (int64_t)len), &out);
    return out;
}

static napi_value js_hash(napi_env env, napi_callback_info info) {
    size_t argc = 2, len;
    napi_value argv[2], out;
    bool lossless;
    uint64_t seed = 0;
    napi_get_cb_info(env, info, &argc, argv, NULL, NULL);
    const uint8_t* p = buf_bytes(env, argv[0], &len);
    if (argc > 1) napi_get_value_bigint_uint64(env, argv[1], &seed, &lossless);
    napi_create_bigint_uint64(env, tc_hash(p, (int64_t)len, seed), &out);
    return out;
}

static napi_value js_sha256(napi_env env, napi_callback_info info) {
    size_t argc = 1, len;
    napi_value argv[1], out;
    void* digest;
    napi_get_cb_info(env, info, &argc, argv, NULL, NULL);
    const uint8_t* p = buf_bytes(env, argv[0], &len);
    napi_create_buffer(env, 32, &digest, &out);
    tc_sha256(p, (int64_t)len, (uint8_t*)digest);
    return out;
}

static napi_value js_fill_random(napi_env env, napi_callback_info info) {
    size_t argc = 2;
    napi_value argv[2], out;
    bool lossless;
    int64_t n = 0;
    uint64_t nonce = 0;
    void* data;
    napi_get_cb_info(env, info, &argc, argv, NULL, NULL);
    napi_get_value_int64(env, argv[0], &n);
    if (argc > 1) napi_get_value_bigint_uint64(env, argv[1], &nonce, &lossless);
    napi_create_buffer(env, (size_t)n, &data, &out);
    tc_fill_random((uint8_t*)data, n, nonce);
    return out;
}

/* Shared driver for the two-call (size, fill) bounds functions; returns a
 * flat JS array [s0, e0, s1, e1, ...]. */
static napi_value bounds_list(napi_env env, napi_callback_info info,
                              int64_t (*f)(const uint8_t*, int64_t, int64_t*,
                                           int64_t)) {
    size_t argc = 1, len;
    napi_value argv[1], out;
    napi_get_cb_info(env, info, &argc, argv, NULL, NULL);
    const uint8_t* p = buf_bytes(env, argv[0], &len);
    int64_t count = f(p, (int64_t)len, NULL, 0);
    int64_t* bounds = (int64_t*)malloc((size_t)(2 * count) * sizeof(int64_t));
    f(p, (int64_t)len, bounds, count);
    napi_create_array_with_length(env, (size_t)(2 * count), &out);
    for (int64_t i = 0; i < 2 * count; i++) {
        napi_value v;
        napi_create_int64(env, bounds[i], &v);
        napi_set_element(env, out, (uint32_t)i, v);
    }
    free(bounds);
    return out;
}

static napi_value js_tokenize_ws(napi_env env, napi_callback_info info) {
    return bounds_list(env, info, tc_tokenize_ws);
}

static napi_value js_split_lines(napi_env env, napi_callback_info info) {
    return bounds_list(env, info, tc_split_lines);
}

static napi_value js_utf8_decode(napi_env env, napi_callback_info info) {
    size_t argc = 1, len;
    napi_value argv[1], out;
    napi_get_cb_info(env, info, &argc, argv, NULL, NULL);
    const uint8_t* p = buf_bytes(env, argv[0], &len);
    uint32_t* runes = (uint32_t*)malloc((len ? len : 1) * sizeof(uint32_t));
    int32_t* offs = (int32_t*)malloc((len + 1) * sizeof(int32_t));
    int64_t n = tc_utf8_decode(p, (int64_t)len, runes, offs);
    napi_create_array_with_length(env, (size_t)n, &out);
    for (int64_t i = 0; i < n; i++) {
        napi_value v;
        napi_create_uint32(env, runes[i], &v);
        napi_set_element(env, out, (uint32_t)i, v);
    }
    free(offs);
    free(runes);
    return out;
}

static napi_value js_utf8_encode(napi_env env, napi_callback_info info) {
    size_t argc = 1;
    uint32_t count, i;
    napi_value argv[1], out;
    napi_get_cb_info(env, info, &argc, argv, NULL, NULL);
    napi_get_array_length(env, argv[0], &count);
    uint32_t* runes = (uint32_t*)malloc((count ? count : 1) * sizeof(uint32_t));
    for (i = 0; i < count; i++) {
        napi_value el;
        napi_get_element(env, argv[0], i, &el);
        napi_get_value_uint32(env, el, &runes[i]);
    }
    uint8_t* tmp = (uint8_t*)malloc(4 * (size_t)count + 1);
    int64_t n = tc_utf8_encode(runes, (int64_t)count, tmp);
    void* data;
    napi_create_buffer_copy(env, (size_t)n, tmp, &data, &out);
    free(tmp);
    free(runes);
    return out;
}

/* argsort(array of Buffers) -> array of indices, via the pgram-key export
 * + MSD key sort pipeline (reference sort.h:9-16). */
static napi_value js_argsort(napi_env env, napi_callback_info info) {
    size_t argc = 1;
    uint32_t count, i;
    napi_value argv[1], out;
    napi_get_cb_info(env, info, &argc, argv, NULL, NULL);
    napi_get_array_length(env, argv[0], &count);
    if (count == 0) {
        napi_create_array_with_length(env, 0, &out);
        return out;
    }
    size_t total = 0, maxlen = 0, len;
    for (i = 0; i < count; i++) {
        napi_value el;
        napi_get_element(env, argv[0], i, &el);
        buf_bytes(env, el, &len);
        total += len;
        if (len > maxlen) maxlen = len;
    }
    uint8_t* blob = (uint8_t*)malloc(total ? total : 1);
    int64_t* starts = (int64_t*)malloc(count * sizeof(int64_t));
    int64_t* ends = (int64_t*)malloc(count * sizeof(int64_t));
    size_t pos = 0;
    for (i = 0; i < count; i++) {
        napi_value el;
        napi_get_element(env, argv[0], i, &el);
        const uint8_t* p = buf_bytes(env, el, &len);
        memcpy(blob + pos, p, len);
        starts[i] = (int64_t)pos;
        pos += len;
        ends[i] = (int64_t)pos;
    }
    int words = (int)((maxlen + 3) / 4);
    if (words < 1) words = 1;
    uint32_t* keys =
        (uint32_t*)malloc(count * (size_t)(words + 1) * sizeof(uint32_t));
    int64_t* order = (int64_t*)malloc(count * sizeof(int64_t));
    tc_pgram_keys(blob, starts, ends, (int64_t)count, keys, words, 0, 0);
    tc_argsort_keys(keys, (int64_t)count, words + 1, order);
    napi_create_array_with_length(env, count, &out);
    for (i = 0; i < count; i++) {
        napi_value v;
        napi_create_int64(env, order[i], &v);
        napi_set_element(env, out, i, v);
    }
    free(order); free(keys); free(ends); free(starts); free(blob);
    return out;
}

static napi_value init(napi_env env, napi_value exports) {
    const struct { const char* name; napi_callback fn; } fns[] = {
        {"version", js_version},       {"bytesum", js_bytesum},
        {"hash", js_hash},             {"sha256", js_sha256},
        {"fillRandom", js_fill_random}, {"tokenizeWs", js_tokenize_ws},
        {"splitLines", js_split_lines}, {"utf8Decode", js_utf8_decode},
        {"utf8Encode", js_utf8_encode}, {"argsort", js_argsort},
    };
    for (size_t i = 0; i < sizeof(fns) / sizeof(fns[0]); i++) {
        napi_value fn;
        napi_create_function(env, fns[i].name, NAPI_AUTO_LENGTH, fns[i].fn,
                             NULL, &fn);
        napi_set_named_property(env, exports, fns[i].name, fn);
    }
    return exports;
}

NAPI_MODULE(NODE_GYP_MODULE_NAME, init)
