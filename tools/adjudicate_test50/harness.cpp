// Adjudication harness for validateFiles/test.50 line 21 (sequence15).
//
// Question being adjudicated: does the vendored reference snapshot
// (/root/reference @ 2024-08-07) itself reproduce the golden VCF row
//     sequence15  46  .  AT  AAT        (a DEL)
// or does its own variant-search logic produce the COM row this
// framework emits
//     sequence15  47  .  TGCATGCATCGATCGATCG  GCATGCATCGATCGATCGA ?
//
// Method: this file is a line-faithful C++ transcription of the
// snapshot's DBG build + variant search —
//   * k-mer extraction & edge bits:  src/graph-builder.cpp:34-126
//     (including the c_str() NUL read one past the last k-mer start,
//     graph-builder.cpp:101, which suppresses the fw edge of a read's
//     final k-mer),
//   * DBGtoVariants target window:   src/variants.cpp:75-154,
//   * searchVariants bounded Dijkstra: src/variants.cpp:171-310,
//     including the quirks: bw-only coverage cutoff (:236), depth =
//     extracted nodes (:187,260), destination cap 10 (:262),
//     ref-edge exclusion (:240), priority-0 re-inserts (:218).
// The priority queue is NOT re-implemented: the harness #includes the
// reference's own include/fibonacci-heap.h (build with
// -I$(REF)/include), with phmap::parallel_flat_hash_map aliased to
// std::unordered_map (the gfalibs submodule that vendors phmap is
// empty in the snapshot; the heap uses the map only for key->node
// lookup/erase, never iterated, so the alias is behavior-preserving —
// and node-stable, unlike phmap, which makes the harness the
// *defensible* reading of the snapshot's pointer-into-map storage).
//
// The one genuinely unspecified behavior in the snapshot is the
// argument evaluation order at src/variants.cpp:134:
//     searchVariants(pair, isFw, hash(str+c+1, &isFw), ...)
// where arg 3 mutates the isFw passed by value as arg 2.  Left-to-right
// (clang-style) passes the orientation of the k-mer at c; right-to-left
// (gcc-style) passes the orientation of the k-mer at c+1.  Run both:
//     ./adjudicate --eval-order=ltr
//     ./adjudicate --eval-order=rtl
//
// Output: every discovered variant for every segment of
// testFiles/to_correct.fasta, as "header pos type refLen sequence" plus
// the rendered VCF row, so all 30 golden body rows adjudicate at once.

#include <algorithm>
#include <array>
#include <cstdint>
#include <cstring>
#include <deque>
#include <fstream>
#include <iostream>
#include <limits>
#include <string>
#include <tuple>
#include <unordered_map>
#include <utility>
#include <vector>

namespace phmap {
template <typename K, typename V>
using parallel_flat_hash_map = std::unordered_map<K, V>;
}

#include "fibonacci-heap.h"  // the reference's own heap, verbatim

struct DBGkmer32 {
    uint32_t fw[4]{0, 0, 0, 0};
    uint32_t bw[4]{0, 0, 0, 0};
    uint32_t cov = 0;
};

using Map = std::unordered_map<uint64_t, DBGkmer32>;

static int K = 21;
static int MAX_SPAN = 32;
static int KMER_DEPTH = 50;   // --search-depth 50 (src/main.cpp:121-122)
static uint32_t COV_CUTOFF = 0;
static bool EVAL_RTL = false;  // arg-eval order at variants.cpp:134

static uint8_t ctoi_tab(unsigned char c) {
    switch (c) {
        case 'A': case 'a': return 0;
        case 'C': case 'c': return 1;
        case 'G': case 'g': return 2;
        case 'T': case 't': return 3;
        default: return 4;
    }
}
static const char ITOC[4] = {'A', 'C', 'G', 'T'};

// Canonical 2-bit pack, first base in the low bits (pinned by the
// framework's 50/51 golden matches; buildNextKmer fw = kmer[1:]+base =
// key>>2 | base<<2(k-1), consistent with src/subgraph.cpp:581-597).
static uint64_t hashKmer(const uint8_t* s, bool* isFw = nullptr) {
    uint64_t fw = 0, rc = 0;
    for (int i = 0; i < K; ++i) {
        fw |= (uint64_t)(s[i] & 3) << (2 * i);
        rc |= (uint64_t)(3 - (s[i] & 3)) << (2 * (K - 1 - i));
    }
    if (isFw) *isFw = fw <= rc;
    return fw <= rc ? fw : rc;
}

static std::string reverseHash(uint64_t key) {
    std::string out(K, 'A');
    for (int i = 0; i < K; ++i) out[i] = ITOC[(key >> (2 * i)) & 3];
    return out;
}

static char revComChar(char c) {
    switch (c) {
        case 'A': return 'T';
        case 'C': return 'G';
        case 'G': return 'C';
        default: return 'A';
    }
}

static uint64_t nextKeyCanonical(uint64_t key, uint8_t base, bool fwdir,
                                 bool* isFw) {
    // buildNextKmer (src/subgraph.cpp:581-597) + re-hash, as integer ops
    uint64_t mask = (K == 32) ? ~0ULL : ((1ULL << (2 * K)) - 1);
    uint64_t raw = fwdir ? ((key >> 2) | ((uint64_t)base << (2 * (K - 1))))
                         : (((key << 2) & mask) | base);
    uint8_t tmp[64];
    for (int i = 0; i < K; ++i) tmp[i] = (raw >> (2 * i)) & 3;
    return hashKmer(tmp, isFw);
}

// ---- DBG build: transcription of src/graph-builder.cpp:75-205 ----
static void addRead(Map& db, const std::string& seq) {
    uint64_t len = seq.size();
    if (len < (uint64_t)K) return;
    const unsigned char* first = (const unsigned char*)seq.c_str();
    std::vector<uint8_t> str(len);
    uint8_t e = 0;
    bool isFw = false;
    uint64_t kcount = len - K + 1;
    for (uint64_t p = 0; p < kcount; ++p) {
        for (uint8_t c = e; c < K; ++c) {
            str[p + c] = ctoi_tab(first[p + c]);
            if (str[p + c] > 3) {
                p = p + c;
                e = 0;
                break;
            }
            e = K - 1;
        }
        if (e == 0) continue;
        uint64_t key = hashKmer(str.data() + p, &isFw);
        DBGkmer32& node = db[key];
        if (node.cov < std::numeric_limits<uint32_t>::max()) ++node.cov;
        // edge bits (graph-builder.cpp:100-110); first[p+K] at the final
        // k-mer reads the c_str() NUL -> ctoi>3 -> no fw edge (quirk d)
        uint8_t nextc = ctoi_tab(first[p + K]);
        if (isFw) {
            if (nextc <= 3) ++node.fw[nextc];
            if (p > 0 && str[p - 1] <= 3) ++node.bw[str[p - 1]];
        } else {
            if (p > 0 && str[p - 1] <= 3) ++node.fw[3 - str[p - 1]];
            if (nextc <= 3) ++node.bw[3 - nextc];
        }
    }
}

// ---- searchVariants: transcription of src/variants.cpp:171-310 ----
enum PType { SNV, INS, DEL, COM };
static const char* PNAME[4] = {"SNV", "INS", "DEL", "COM"};

struct DBGpath {
    PType type = SNV;
    uint64_t pos = 0;
    std::string sequence;
    uint16_t refLen = 1;
};

static std::pair<bool, std::deque<DBGpath>> searchVariants(
    std::pair<const uint64_t, DBGkmer32> source, bool isSourceFw,
    uint64_t ref, const std::deque<uint64_t>& targetsQueue,
    const std::unordered_map<uint64_t, bool>& targetsMap, Map& db,
    Map* localGraphCache) {
    bool explored = false;
    std::vector<uint64_t> destinations;
    FibonacciHeap<std::pair<const uint64_t, DBGkmer32>*> Q;
    std::unordered_map<uint64_t, uint8_t> dist;
    std::unordered_map<uint64_t, std::pair<uint64_t, bool>> prev;
    std::deque<DBGpath> discoveredPaths;

    dist[source.first] = 1;
    Q.insert(&source, 1);

    uint64_t key = source.first;
    int16_t depth = 0;
    bool direction = true, isFw;

    while (Q.size() > 0 && depth < KMER_DEPTH + 1) {
        explored = false;
        std::pair<const uint64_t, DBGkmer32>* u = Q.extractMin();
        auto got = prev.find(u->first);
        if (got != prev.end()) direction = got->second.second;

        auto checkNext = [&](uint64_t key, bool direction) {
            auto startNode = targetsMap.find(key);
            if (startNode == targetsMap.end()) {
                auto nextKmer = localGraphCache->find(key);
                if (nextKmer == localGraphCache->end()) {
                    auto got2 = db.find(key);
                    if (got2 == db.end())
                        // the snapshot dereferences end() here
                        // (variants.cpp:207); unreachable in practice:
                        // a recorded edge implies the neighbor k-mer
                        // was observed in the same read
                        return false;
                    nextKmer = localGraphCache->insert(*got2).first;
                }
                uint8_t alt = dist[u->first];
                if (alt < std::numeric_limits<uint8_t>::max()) alt += 1;
                auto got3 = dist.find(nextKmer->first);
                if (got3 == dist.end()) {
                    dist[nextKmer->first] =
                        std::numeric_limits<uint8_t>::max();
                    Q.insert(&*nextKmer, 0);
                }
                if (alt < dist[nextKmer->first]) {
                    prev[nextKmer->first] =
                        std::make_pair(u->first, direction);
                    dist[nextKmer->first] = alt;
                    Q.decreaseKey(&*nextKmer, alt);
                }
            }
            return true;
        };
        uint8_t edgeCount = 0, exploredCount = 0;
        std::vector<std::tuple<uint64_t, bool, bool>> candidatePaths;

        for (uint8_t i = 0; i < 4; ++i) {
            if (depth == 0) direction = isSourceFw ? true : false;
            // quirk: cutoff applies to the bw side only (variants.cpp:236)
            if (direction ? (bool)u->second.fw[i]
                          : (u->second.bw[i] > COV_CUTOFF)) {
                key = nextKeyCanonical(u->first, i, direction, &isFw);
                if (key != ref) {
                    candidatePaths.push_back(
                        std::make_tuple(key, isFw, direction));
                    ++edgeCount;
                }
            }
        }
        for (auto& path : candidatePaths) {
            uint64_t key2 = std::get<0>(path);
            bool isFw2 = std::get<1>(path);
            bool direction2 = std::get<2>(path);
            bool found = checkNext(key2, isFw2 ? direction2 : !direction2);
            if (found) {
                ++exploredCount;
                if (targetsMap.find(key2) != targetsMap.end()) {
                    prev[key2] = std::make_pair(u->first, direction2);
                    destinations.push_back(key2);
                }
            }
        }
        depth += 1;
        if (edgeCount == exploredCount || depth == KMER_DEPTH + 1 ||
            destinations.size() >= 10)
            explored = true;
    }
    if (destinations.size() > 0) {
        for (uint64_t destination : destinations) {
            DBGpath newPath;
            uint16_t i = 0,
                     refLen = std::find(targetsQueue.begin(),
                                        targetsQueue.end(), destination) -
                              targetsQueue.begin() + K;
            uint64_t prevNode = prev[destination].first;
            while (prevNode != source.first) {
                prevNode = prev[prevNode].first;
                ++i;
            }
            prevNode = prev[destination].first;
            bool direction2 = prev[prevNode].second;
            int16_t b = i - refLen;
            if (refLen > K) {
                newPath.type = COM;
                newPath.refLen = refLen - K + 1;
                b = refLen - K;
            } else if (i == refLen)
                newPath.type = SNV;
            else if (i > refLen) {
                newPath.type = DEL;
                --b;
                prevNode = prev[prevNode].first;
                direction2 = prev[prevNode].second;
            } else
                newPath.type = INS;

            while (b >= 0) {
                newPath.sequence.push_back(
                    direction2 ? reverseHash(prevNode)[0]
                               : revComChar(reverseHash(prevNode)[K - 1]));
                prevNode = prev[prevNode].first;
                direction2 = prev[prevNode].second;
                --b;
            }
            std::reverse(newPath.sequence.begin(), newPath.sequence.end());
            discoveredPaths.push_back(newPath);
        }
    }
    if (explored) {
        for (auto& node : dist) localGraphCache->erase(node.first);
    }
    return std::make_pair(explored, discoveredPaths);
}

// ---- DBGtoVariants: transcription of src/variants.cpp:53-169 ----
static std::vector<std::deque<DBGpath>> dbgToVariants(
    const std::string& header, const std::string& seq, Map& db) {
    uint64_t explored = 0, len = seq.size();
    std::vector<std::deque<DBGpath>> variants;
    if (len < (uint64_t)K) return variants;
    uint64_t kcount = len - K + 1;
    Map* localGraphCache = new Map;
    // str gets one sentinel byte: the snapshot's hash(str+c+1) at the
    // final k-mer start reads str[len] out of bounds (heap garbage);
    // a zero sentinel ('A') is the deterministic stand-in
    std::vector<uint8_t> str(len + 1, 0);
    std::vector<bool> visited(len, false);
    for (uint64_t i = 0; i < len; ++i) str[i] = ctoi_tab(seq[i]);

    while (explored < kcount) {
        uint64_t key, rounds_before = explored;
        bool isFw = false;
        std::deque<uint64_t> targetsQueue;
        std::unordered_map<uint64_t, bool> targetsMap;
        for (uint16_t pos = 0; pos < MAX_SPAN; ++pos) {
            if (pos + K < (int64_t)kcount) {
                key = hashKmer(str.data() + pos + K);
                targetsQueue.push_back(key);
                targetsMap[key];
            }
        }
        for (uint64_t c = 0; c < kcount; ++c) {
            if (!targetsQueue.empty()) {  // snapshot: front() on empty is UB
                targetsMap.erase(targetsQueue.front());
                targetsQueue.pop_front();
            }
            if (c + K + MAX_SPAN < kcount) {
                key = hashKmer(str.data() + c + K + MAX_SPAN);
                targetsMap[key];
                targetsQueue.push_back(key);
            }
            if (!visited[c]) {
                key = hashKmer(str.data() + c, &isFw);
                auto it = db.find(key);
                if (it != db.end()) {
                    std::pair<const uint64_t, DBGkmer32> pair = *it;
                    // variants.cpp:134 — unspecified evaluation order:
                    bool isSourceFw;
                    uint64_t ref;
                    if (EVAL_RTL) {  // gcc: hash(str+c+1,&isFw) first
                        ref = hashKmer(str.data() + c + 1, &isFw);
                        isSourceFw = isFw;
                    } else {  // clang: isFw copied first
                        isSourceFw = isFw;
                        ref = hashKmer(str.data() + c + 1, &isFw);
                    }
                    auto results =
                        searchVariants(pair, isSourceFw, ref, targetsQueue,
                                       targetsMap, db, localGraphCache);
                    explored += results.first;
                    if (results.first) {
                        for (DBGpath& path : results.second)
                            path.pos = c + K;
                        if (results.second.size() != 0)
                            variants.push_back(results.second);
                        visited[c] = true;
                    }
                } else {
                    explored += 1;
                    visited[c] = true;
                }
            }
        }
        if (explored == rounds_before) {
            std::cerr << "warning: no progress in a full pass over "
                      << header << " (snapshot would loop forever)\n";
            break;
        }
    }
    delete localGraphCache;
    return variants;
}

// ---- VCF rendering (rules pinned by the golden; matches io/vcf.py) ----
static void printVCFRow(const std::string& header, const std::string& seq,
                        const DBGpath& var) {
    uint64_t pos = var.pos;
    std::string ref, alt;
    uint64_t vcfPos;
    if (var.type == SNV || var.type == COM) {
        ref = seq.substr(pos, var.type == COM ? var.refLen : 1);
        alt = var.sequence;
        vcfPos = pos + 1;
    } else if (var.type == INS) {
        uint16_t n = var.refLen > 1 ? var.refLen : 1;
        ref = seq.substr(pos - 1, n + 1);
        alt = seq.substr(pos - 1, 1);
        vcfPos = pos;
    } else {  // DEL
        ref = seq.substr(pos - 1, 2);
        alt = seq.substr(pos - 1, 1) + var.sequence + seq.substr(pos, 1);
        vcfPos = pos;
    }
    std::cout << "VCF\t" << header << "\t" << vcfPos << "\t.\t" << ref
              << "\t" << alt << "\t0\tPASS\t.\tGT:GQ\t1/1:0\n";
}

static std::vector<std::pair<std::string, std::string>> readFasta(
    const std::string& path) {
    std::vector<std::pair<std::string, std::string>> out;
    std::ifstream in(path);
    std::string line, header, seq;
    while (std::getline(in, line)) {
        if (!line.empty() && line[0] == '>') {
            if (!header.empty()) out.push_back({header, seq});
            header = line.substr(1, line.find(' ') - 1);
            seq.clear();
        } else {
            seq += line;
        }
    }
    if (!header.empty()) out.push_back({header, seq});
    return out;
}

static std::vector<std::string> readFastq(const std::string& path) {
    std::vector<std::string> out;
    std::ifstream in(path);
    std::string line;
    int ln = 0;
    while (std::getline(in, line)) {
        if (ln % 4 == 1) out.push_back(line);
        ++ln;
    }
    return out;
}

int main(int argc, char** argv) {
    std::string fasta = "/root/reference/testFiles/to_correct.fasta";
    std::string fastq = "/root/reference/testFiles/to_correct.fastq";
    for (int i = 1; i < argc; ++i) {
        std::string a = argv[i];
        if (a == "--eval-order=rtl") EVAL_RTL = true;
        else if (a == "--eval-order=ltr") EVAL_RTL = false;
        else if (a == "-f" && i + 1 < argc) fasta = argv[++i];
        else if (a == "-r" && i + 1 < argc) fastq = argv[++i];
        else if (a == "-k" && i + 1 < argc) K = atoi(argv[++i]);
        else if (a == "--max-span" && i + 1 < argc)
            MAX_SPAN = atoi(argv[++i]);
        else if (a == "--search-depth" && i + 1 < argc)
            KMER_DEPTH = atoi(argv[++i]);
    }
    std::cerr << "eval-order=" << (EVAL_RTL ? "rtl" : "ltr") << " k=" << K
              << " max-span=" << MAX_SPAN << " search-depth=" << KMER_DEPTH
              << "\n";

    Map db;
    for (const std::string& read : readFastq(fastq)) addRead(db, read);
    std::cerr << "DBG: " << db.size() << " distinct k-mers\n";

    for (auto& rec : readFasta(fasta)) {
        auto variants = dbgToVariants(rec.first, rec.second, db);
        for (auto& group : variants) {
            for (auto& var : group) {
                std::cout << "PATH\t" << rec.first << "\tpos=" << var.pos
                          << "\ttype=" << PNAME[var.type]
                          << "\trefLen=" << var.refLen << "\tseq="
                          << var.sequence << "\n";
                printVCFRow(rec.first, rec.second, var);
            }
        }
    }
    return 0;
}
