// CPU oracle benchmark: a reference-style k-mer count + probe loop,
// used as the measurable baseline for bench.py's vs_baseline ratio.
//
// The reference (vgl-hub/kreeq) cannot be built in this environment
// (its gfalibs submodule is not vendored), so this program implements
// the same two-phase algorithm its hot path runs — canonical k-mer
// extraction into per-partition 9-byte (key,edgeBit) buffers
// (/root/reference/src/graph-builder.cpp:75-113), then per-partition
// hash-map count/edge updates (graph-builder.cpp:160-205) — with
// every design choice resolved in the REFERENCE'S favor:
//
//   * rolling O(1) canonical hashing (the reference re-packs all k
//     bases per position via gfalibs hash(str+p) — O(k) per k-mer; we
//     also report that variant as "as_written")
//   * in-memory partition buffers (the reference spills .buf.m.bin
//     to disk and reads them back)
//   * a flat open-addressing table with 9-byte values and a
//     multiply-xor hash, load factor <= 0.5 (comparable to phmap's
//     flat submaps, no allocator churn)
//   * all phases multithreaded over the machine's cores (extraction
//     over base ranges, updates over partitions, probes over ranges)
//
// Workload mirrors bench.py: one 8M-base random chunk, k=31, count;
// then a 4M-base probe against the built table.
//
// Output: one JSON line with counted/probed k-mers/s (single-thread
// and all-core) so BASELINE.md can record a real number to beat.

#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

static const int K = 31;
static const uint64_t CHUNK = 1ull << 23;   // 8M bases (bench.py count)
static const uint64_t PCHUNK = 1ull << 22;  // 4M bases (bench.py probe)
static const int MAPCOUNT = 128;            // reference partition count

struct DBGkmer {  // 9-byte node, include/kreeq.h:20-66 layout
    uint8_t fw[4] = {0, 0, 0, 0};
    uint8_t bw[4] = {0, 0, 0, 0};
    uint8_t cov = 0;
};

// Open-addressing map: u64 key -> DBGkmer, linear probing, pow2 size.
// EMPTY sentinel = UINT64_MAX (cannot collide with 2k-bit packed keys
// for k<=31).
struct FlatMap {
    std::vector<uint64_t> keys;
    std::vector<DBGkmer> vals;
    uint64_t mask = 0;
    uint64_t used = 0;
    void init(uint64_t expect) {
        uint64_t cap = 16;
        while (cap < expect * 2) cap <<= 1;  // load factor <= 0.5
        keys.assign(cap, UINT64_MAX);
        vals.assign(cap, DBGkmer{});
        mask = cap - 1;
        used = 0;
    }
    static inline uint64_t mix(uint64_t h) {
        // phmap/absl-style multiplicative mix
        h ^= h >> 33;
        h *= 0xff51afd7ed558ccdULL;
        h ^= h >> 33;
        return h;
    }
    inline DBGkmer *find_or_insert(uint64_t key) {
        uint64_t i = mix(key) & mask;
        for (;;) {
            uint64_t k = keys[i];
            if (k == key) return &vals[i];
            if (k == UINT64_MAX) {
                keys[i] = key;
                ++used;
                return &vals[i];
            }
            i = (i + 1) & mask;
        }
    }
    inline const DBGkmer *find(uint64_t key) const {
        uint64_t i = mix(key) & mask;
        for (;;) {
            uint64_t k = keys[i];
            if (k == key) return &vals[i];
            if (k == UINT64_MAX) return nullptr;
            i = (i + 1) & mask;
        }
    }
};

// Canonical rolling extraction over codes[lo, hi) (positions of k-mer
// starts), appending 9-byte records to per-partition buffers.
static void extract_range(const uint8_t *codes, uint64_t n, uint64_t lo,
                          uint64_t hi, std::vector<uint8_t> *bufs) {
    const uint64_t kmask =
        (K < 32) ? ((1ull << (2 * K)) - 1) : ~0ull;
    uint64_t fwd = 0, rc = 0;
    // prime the first k-1 bases of the window at lo
    for (uint64_t i = lo; i + 1 < lo + K; ++i) {
        fwd = ((fwd << 2) | codes[i]) & kmask;
        rc = (rc >> 2) | ((uint64_t)(3 - codes[i]) << (2 * (K - 1)));
    }
    for (uint64_t p = lo; p < hi; ++p) {
        uint64_t last = p + K - 1;
        fwd = ((fwd << 2) | codes[last]) & kmask;
        rc = (rc >> 2) | ((uint64_t)(3 - codes[last]) << (2 * (K - 1)));
        bool isFw = fwd <= rc;
        uint64_t key = isFw ? fwd : rc;
        // edge byte: next base (fw side) + prev base (bw side),
        // orientation-swapped exactly as graph-builder.cpp:99-110
        uint8_t e = 0;
        if (isFw) {
            if (last + 1 < n) e |= (uint8_t)(1u << (7 - codes[last + 1]));
            if (p > 0) e |= (uint8_t)(1u << (3 - codes[p - 1]));
        } else {
            if (p > 0) e |= (uint8_t)(1u << (7 - (3 - codes[p - 1])));
            if (last + 1 < n)
                e |= (uint8_t)(1u << (3 - (3 - codes[last + 1])));
        }
        std::vector<uint8_t> &buf = bufs[key % MAPCOUNT];
        size_t pos = buf.size();
        buf.resize(pos + 9);
        memcpy(&buf[pos], &key, 8);
        buf[pos + 8] = e;
    }
}

// The reference's per-position full repack (gfalibs hash(str+p) is
// O(k) per call): measured separately as the "as written" rate.
static uint64_t extract_repack(const uint8_t *codes, uint64_t n) {
    uint64_t acc = 0;
    for (uint64_t p = 0; p + K <= n; ++p) {
        uint64_t fwd = 0, rc = 0;
        for (int c = 0; c < K; ++c) {
            fwd = (fwd << 2) | codes[p + c];
            rc |= (uint64_t)(3 - codes[p + c]) << (2 * c);
        }
        acc += fwd < rc ? fwd : rc;
    }
    return acc;
}

static void update_partition(const std::vector<std::vector<uint8_t>> &bufs,
                             int m, FlatMap *map) {
    for (size_t t = 0; t < bufs.size(); ++t) {
        const std::vector<uint8_t> &buf = bufs[t];
        (void)m;
        for (size_t c = 0; c + 9 <= buf.size(); c += 9) {
            uint64_t key;
            uint8_t e;
            memcpy(&key, &buf[c], 8);
            e = buf[c + 8];
            DBGkmer *d = map->find_or_insert(key);
            bool overflow = d->cov >= 254;
            for (int w = 0; w < 4 && !overflow; ++w)
                if (d->fw[w] == 254 || d->bw[w] == 254) overflow = true;
            if (!overflow) {
                for (int w = 0; w < 4; ++w) {
                    d->fw[w] += (e >> (7 - w)) & 1;
                    d->bw[w] += (e >> (3 - w)) & 1;
                }
                ++d->cov;
            }
            // u32 overflow path unreachable on this workload (random
            // 8M-base chunk: max multiplicity << 254)
        }
    }
}

int main(int argc, char **argv) {
    int threads = (int)std::thread::hardware_concurrency();
    if (argc > 1) threads = atoi(argv[1]);

    std::mt19937_64 rng(0);
    std::vector<uint8_t> codes(CHUNK), asmcodes(PCHUNK);
    for (auto &c : codes) c = (uint8_t)(rng() & 3);
    // probe workload = assembly drawn FROM the reads (the production
    // case: probes mostly hit), mirroring bench.py
    memcpy(asmcodes.data(), codes.data(), PCHUNK);
    uint64_t kcount = CHUNK - K + 1;

    auto run_count = [&](int nthr, double *secs) {
        std::vector<std::vector<std::vector<uint8_t>>> bufs(
            nthr, std::vector<std::vector<uint8_t>>(MAPCOUNT));
        auto t0 = std::chrono::steady_clock::now();
        // phase 1: extraction
        {
            std::vector<std::thread> pool;
            uint64_t per = (kcount + nthr - 1) / nthr;
            for (int t = 0; t < nthr; ++t) {
                uint64_t lo = t * per;
                uint64_t hi = std::min(kcount, lo + per);
                if (lo >= hi) break;
                pool.emplace_back(extract_range, codes.data(), CHUNK, lo,
                                  hi, bufs[t].data());
            }
            for (auto &th : pool) th.join();
        }
        // phase 2: per-partition map updates
        std::vector<FlatMap> maps(MAPCOUNT);
        {
            std::atomic<int> next(0);
            std::vector<std::thread> pool;
            for (int t = 0; t < nthr; ++t)
                pool.emplace_back([&]() {
                    for (;;) {
                        int m = next.fetch_add(1);
                        if (m >= MAPCOUNT) return;
                        uint64_t total = 0;
                        std::vector<std::vector<uint8_t>> parts;
                        for (int u = 0; u < nthr; ++u) {
                            total += bufs[u][m].size() / 9;
                            parts.push_back(std::move(bufs[u][m]));
                        }
                        maps[m].init(total ? total : 1);
                        update_partition(parts, m, &maps[m]);
                    }
                });
            for (auto &th : pool) th.join();
        }
        auto t1 = std::chrono::steady_clock::now();
        *secs = std::chrono::duration<double>(t1 - t0).count();
        uint64_t distinct = 0;
        for (auto &m : maps) distinct += m.used;
        return maps;
    };

    double sec1 = 0, secN = 0;
    run_count(1, &sec1);
    auto maps = run_count(threads, &secN);

    // probe: per-base canonical key -> partition find, filling the
    // per-base DBGbase track {cov, isFw, fw, bw} exactly as
    // evaluateSegment does (kreeq.cpp:143-219 fills one DBGbase per
    // position before the edge tests)
    struct DBGbase {
        uint32_t fw = 0, bw = 0, cov = 0;
        bool isFw = false;
    };
    uint64_t pcount = PCHUNK - K + 1;
    std::vector<DBGbase> track(pcount);
    std::atomic<uint64_t> missing(0);
    auto run_probe = [&](int nthr) {
        auto t0 = std::chrono::steady_clock::now();
        std::vector<std::thread> pool;
        uint64_t per = (pcount + nthr - 1) / nthr;
        for (int t = 0; t < nthr; ++t) {
            uint64_t lo = t * per, hi = std::min(pcount, lo + per);
            if (lo >= hi) break;
            pool.emplace_back([&, lo, hi]() {
                const uint64_t kmask = (1ull << (2 * K)) - 1;
                uint64_t fwd = 0, rc = 0, miss = 0;
                for (uint64_t i = lo; i + 1 < lo + K; ++i) {
                    fwd = ((fwd << 2) | asmcodes[i]) & kmask;
                    rc = (rc >> 2) |
                         ((uint64_t)(3 - asmcodes[i]) << (2 * (K - 1)));
                }
                for (uint64_t p = lo; p < hi; ++p) {
                    uint64_t last = p + K - 1;
                    fwd = ((fwd << 2) | asmcodes[last]) & kmask;
                    rc = (rc >> 2) |
                         ((uint64_t)(3 - asmcodes[last]) << (2 * (K - 1)));
                    bool isFw = fwd <= rc;
                    uint64_t key = isFw ? fwd : rc;
                    const DBGkmer *d = maps[key % MAPCOUNT].find(key);
                    DBGbase &b = track[p];
                    if (!d || d->cov == 0) {
                        ++miss;
                    } else {
                        b.cov = d->cov;
                        b.isFw = isFw;
                        // next-base edge counters, orientation-swapped
                        uint8_t nx = last + 1 < PCHUNK ? asmcodes[last + 1]
                                                       : 0;
                        b.fw = isFw ? d->fw[nx] : d->bw[3 - nx];
                        b.bw = isFw ? d->bw[nx] : d->fw[3 - nx];
                    }
                }
                missing.fetch_add(miss);
            });
        }
        for (auto &th : pool) th.join();
        auto t1 = std::chrono::steady_clock::now();
        return std::chrono::duration<double>(t1 - t0).count();
    };
    double psec1 = run_probe(1);
    double psecN = run_probe(threads);

    // "as written": O(k) repack per position, single thread
    auto t0 = std::chrono::steady_clock::now();
    volatile uint64_t sink = extract_repack(codes.data(), CHUNK);
    (void)sink;
    double rsec = std::chrono::duration<double>(
                      std::chrono::steady_clock::now() - t0)
                      .count();

    printf("{\"count_kmers_per_s_1t\": %.0f, "
           "\"count_kmers_per_s_%dt\": %.0f, "
           "\"probe_kmers_per_s_1t\": %.0f, "
           "\"probe_kmers_per_s_%dt\": %.0f, "
           "\"extract_repack_kmers_per_s_1t\": %.0f, "
           "\"k\": %d, \"chunk_bases\": %llu, \"threads\": %d, "
           "\"probe_missing_frac\": %.4f}\n",
           kcount / sec1, threads, kcount / secN, pcount / psec1, threads,
           pcount / psecN, kcount / (rsec + 1e-9), K,
           (unsigned long long)CHUNK, threads,
           (double)missing.load() / (2 * pcount));
    return 0;
}
