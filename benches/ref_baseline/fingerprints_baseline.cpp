// Measures the REFERENCE's CPU fingerprints engine on this CI host, to put
// a real absolute number in the `fingerprints_minhash` vs_baseline column
// (round-4 verdict ask #2). Uses the reference's own production engine —
// floating_rolling_hashers<sz_cap_serial_k, D> (serial.hpp:1111-1317) — at
// the exact bench_all.py shape: 32768 docs of 60-180 bytes, ndim=256 spread
// round-robin over the 8 default window widths (32 dims per width).
//
// The host has one core (nproc=1), so the serial engine IS the reference's
// best schedule here; ForkUnion is stubbed (forkunion.h in this directory)
// and never used — we call engine.fingerprint() per doc directly.
//
// Build & run:
//   g++ -O3 -march=native -std=c++20 -I. -I/root/reference/include \
//       fingerprints_baseline.cpp -o /tmp/fp_baseline && /tmp/fp_baseline
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <random>
#include <vector>

#define SZ_USE_SKYLAKE 1
#include <stringzillas/fingerprints/serial.hpp>
#include <stringzillas/fingerprints/skylake.hpp>

using namespace ashvardanian::stringzillas;
namespace sz = ashvardanian::stringzilla;

static constexpr size_t docs_count_k = 32768;
static constexpr size_t dims_per_width_k = 32; // ndim=256 over 8 widths
static constexpr size_t widths_count_k = 8;
static size_t const window_widths_k[widths_count_k] = {3, 4, 5, 7, 9, 11, 15, 31};

template <sz_capability_t cap_k>
using engine_for_t = floating_rolling_hashers<cap_k, dims_per_width_k, void>;

template <sz_capability_t cap_k>
static void bench_engine(char const *name, std::vector<std::vector<sz::byte_t>> const &docs, size_t total_bytes) {
    using engine_t = engine_for_t<cap_k>;
    std::vector<engine_t> engines(widths_count_k);
    for (size_t w = 0; w < widths_count_k; ++w)
        if (engines[w].try_seed(window_widths_k[w], 256, w * dims_per_width_k) != status_t::success_k) {
            std::fprintf(stderr, "seed failed\n");
            return;
        }

    size_t const ndim_total = dims_per_width_k * widths_count_k;
    std::vector<std::uint32_t> hashes(docs_count_k * ndim_total), counts(docs_count_k * ndim_total);

    auto run_pass = [&]() {
        for (size_t d = 0; d < docs_count_k; ++d) {
            sz::span<sz::byte_t const> text {docs[d].data(), docs[d].size()};
            for (size_t w = 0; w < widths_count_k; ++w) {
                std::uint32_t *h = hashes.data() + d * ndim_total + w * dims_per_width_k;
                std::uint32_t *c = counts.data() + d * ndim_total + w * dims_per_width_k;
                engines[w].fingerprint(text, {h, dims_per_width_k}, {c, dims_per_width_k});
            }
        }
    };

    run_pass(); // warm caches / page in
    int const reps = 3;
    auto t0 = std::chrono::steady_clock::now();
    for (int r = 0; r < reps; ++r) run_pass();
    double dt = std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count() / reps;

    // Same accounting as bench_all.py: total_bytes * ndim dim-hashes per pass.
    double ghash_per_s = (double)total_bytes * (double)ndim_total / dt / 1e9;
    std::uint64_t checksum = 0;
    for (auto h : hashes) checksum += h;
    std::printf("{\"metric\": \"%s\", \"value\": %.4f, \"unit\": \"Ghash/s\", "
                "\"docs\": %zu, \"bytes\": %zu, \"ndim\": %zu, \"secs_per_pass\": %.3f, \"checksum\": %llu}\n",
                name, ghash_per_s, docs_count_k, total_bytes, ndim_total, dt, (unsigned long long)checksum);
}

int main() {
    // Same corpus shape as bench_all.py::bench_fingerprints: lengths
    // uniform in [60, 180), bytes uniform in [32, 127).
    std::mt19937_64 rng(42);
    std::uniform_int_distribution<int> len_dist(60, 179), byte_dist(32, 126);
    std::vector<std::vector<sz::byte_t>> docs(docs_count_k);
    size_t total_bytes = 0;
    for (auto &doc : docs) {
        doc.resize((size_t)len_dist(rng));
        for (auto &b : doc) b = (sz::byte_t)byte_dist(rng);
        total_bytes += doc.size();
    }

    bench_engine<sz_cap_serial_k>("reference_fingerprints_serial", docs, total_bytes);
    bench_engine<sz_cap_skylake_k>("reference_fingerprints_skylake", docs, total_bytes);
    return 0;
}
