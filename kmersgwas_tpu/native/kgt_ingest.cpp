// kgt_ingest: native host-side ingest for the TPU k-mer GWAS engine.
//
// Replaces the reference stack's external KMC 3 counter plus the C++ ingest
// binaries (kmers_add_strand_information, list_kmers_found_in_multiple_samples,
// build_kmers_table — see /root/reference/src) with one shared library:
//
//   * FASTA/FASTQ (optionally gzip) k-mer counting, canonized or as-read,
//     KMC-style sort-and-collapse with prefix-bucketed spilling so memory
//     stays bounded on large read sets
//   * strand-flag merge of the canonized + as-read count sets
//   * N-way union of per-sample strand lists with MAC + strand-form filters
//   * presence/absence table construction (bit-exact .table format:
//     AA BB CC DD | uint64 N | uint32 k | rows of kmer + ceil(N/64) words)
//
// All file formats match kmersgwas_tpu/core/formats.py byte-for-byte; the
// Python package loads this library through ctypes (native/__init__.py) and
// falls back to the NumPy implementations when it is absent.
//
// Build: make -C kmersgwas_tpu/native
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

constexpr uint64_t kMask62 = 0x3FFFFFFFFFFFFFFFull;
constexpr uint64_t kFlagCanon = 0x4000000000000000ull;
constexpr uint64_t kFlagNonCanon = 0x8000000000000000ull;

inline uint64_t reverse_complement(uint64_t x, uint32_t k) {
  x = ((x & 0xFFFFFFFF00000000ull) >> 32) | ((x & 0x00000000FFFFFFFFull) << 32);
  x = ((x & 0xFFFF0000FFFF0000ull) >> 16) | ((x & 0x0000FFFF0000FFFFull) << 16);
  x = ((x & 0xFF00FF00FF00FF00ull) >> 8) | ((x & 0x00FF00FF00FF00FFull) << 8);
  x = ((x & 0xF0F0F0F0F0F0F0F0ull) >> 4) | ((x & 0x0F0F0F0F0F0F0F0Full) << 4);
  x = ((x & 0xCCCCCCCCCCCCCCCCull) >> 2) | ((x & 0x3333333333333333ull) << 2);
  return (~x) >> (64 - 2 * k);
}

// --------------------------------------------------------------------------
// gz-or-plain line reader
// --------------------------------------------------------------------------
class LineReader {
 public:
  explicit LineReader(const char* path) : gz_(gzopen(path, "rb")) {}
  ~LineReader() {
    if (gz_) gzclose(gz_);
  }
  bool ok() const { return gz_ != nullptr; }
  bool getline(std::string& out) {
    out.clear();
    if (!gz_) return false;
    char buf[1 << 16];
    for (;;) {
      if (gzgets(gz_, buf, sizeof buf) == nullptr) return !out.empty();
      size_t n = std::strlen(buf);
      bool nl = n > 0 && buf[n - 1] == '\n';
      if (nl) --n;
      out.append(buf, n);
      if (nl) return true;
    }
  }

 private:
  gzFile gz_;
};

// --------------------------------------------------------------------------
// counting: emit k-mer codes per read, bucket by top bits, sort + collapse
// --------------------------------------------------------------------------
struct CountBuckets {
  // in-memory buckets; spill paths are created lazily when a bucket grows
  static constexpr int kBucketBits = 6;  // 64 buckets
  std::vector<std::vector<uint64_t>> mem;
  std::vector<FILE*> spill;
  std::string tmpdir;
  size_t max_in_mem;
  uint32_t k;

  CountBuckets(uint32_t k_, const std::string& tmp, size_t max_mem_kmers)
      : mem(1 << kBucketBits), spill(1 << kBucketBits, nullptr), tmpdir(tmp),
        max_in_mem(max_mem_kmers >> kBucketBits), k(k_) {}

  int bucket_of(uint64_t code) const {
    return static_cast<int>(code >> (2 * k > kBucketBits ? 2 * k - kBucketBits : 0)) &
           ((1 << kBucketBits) - 1);
  }

  void add(uint64_t code) {
    int b = bucket_of(code);
    auto& v = mem[b];
    v.push_back(code);
    if (v.size() >= max_in_mem) flush(b);
  }

  void flush(int b) {
    if (mem[b].empty()) return;
    if (!spill[b]) {
      std::string p = tmpdir + "/kgt_bucket_" + std::to_string(b) + ".tmp";
      spill[b] = std::fopen(p.c_str(), "wb+");
    }
    std::fwrite(mem[b].data(), sizeof(uint64_t), mem[b].size(), spill[b]);
    mem[b].clear();
    mem[b].shrink_to_fit();
  }
};

int8_t g_code_lut[256];
struct LutInit {
  LutInit() {
    std::memset(g_code_lut, -1, sizeof g_code_lut);
    g_code_lut[(unsigned)'A'] = 0;
    g_code_lut[(unsigned)'C'] = 1;
    g_code_lut[(unsigned)'G'] = 2;
    g_code_lut[(unsigned)'T'] = 3;
    g_code_lut[(unsigned)'a'] = 0;
    g_code_lut[(unsigned)'c'] = 1;
    g_code_lut[(unsigned)'g'] = 2;
    g_code_lut[(unsigned)'t'] = 3;
  }
} g_lut_init;

void emit_kmers(const std::string& seq, uint32_t k, bool canon, CountBuckets& cb) {
  const uint64_t mask = (k == 32) ? ~0ull : ((1ull << (2 * k)) - 1);
  uint64_t code = 0;
  uint32_t run = 0;  // valid symbols in current window
  for (char c : seq) {
    int8_t s = g_code_lut[(unsigned char)c];
    if (s < 0) {
      run = 0;
      code = 0;
      continue;
    }
    code = ((code << 2) | (uint64_t)s) & mask;
    if (++run >= k) {
      uint64_t out = code;
      if (canon) {
        uint64_t rc = reverse_complement(code, k);
        if (rc < out) out = rc;
      }
      cb.add(out);
    }
  }
}

bool is_fasta_start(const std::string& line) { return !line.empty() && line[0] == '>'; }

// count one read file into the buckets
bool count_file(const char* path, uint32_t k, bool canon, CountBuckets& cb) {
  LineReader lr(path);
  if (!lr.ok()) return false;
  std::string line;
  if (!lr.getline(line)) return true;
  if (is_fasta_start(line)) {
    std::string seq;
    while (lr.getline(line)) {
      if (is_fasta_start(line)) {
        emit_kmers(seq, k, canon, cb);
        seq.clear();
      } else {
        seq += line;
      }
    }
    emit_kmers(seq, k, canon, cb);
  } else {
    // FASTQ: first line already consumed is a header (@...)
    std::string seq;
    for (;;) {
      if (!lr.getline(seq)) break;           // sequence
      emit_kmers(seq, k, canon, cb);
      if (!lr.getline(line)) break;          // '+'
      if (!lr.getline(line)) break;          // quals
      if (!lr.getline(line)) break;          // next header
    }
  }
  return true;
}

struct KCount {
  uint64_t kmer;
  uint64_t count;
};

}  // namespace

extern "C" {

// Count k-mers across read files into a binary (uint64 kmer, uint64 count)
// record file, sorted by kmer. Returns #distinct k-mers or -1 on error.
long long kgt_count(const char** paths, int n_paths, unsigned k, int canonize,
                    unsigned long long min_count, const char* out_path,
                    const char* tmpdir, unsigned long long max_mem_kmers) {
  if (k < 2 || k > 31) return -1;
  CountBuckets cb(k, tmpdir ? tmpdir : "/tmp", max_mem_kmers ? max_mem_kmers : (1ull << 27));
  for (int i = 0; i < n_paths; ++i) {
    if (!count_file(paths[i], k, canonize != 0, cb)) return -1;
  }
  FILE* out = std::fopen(out_path, "wb");
  if (!out) return -1;
  long long distinct = 0;
  std::vector<uint64_t> pool;
  for (int b = 0; b < (1 << CountBuckets::kBucketBits); ++b) {
    pool.clear();
    pool.swap(cb.mem[b]);
    if (cb.spill[b]) {
      std::fflush(cb.spill[b]);
      long long sz;
      std::fseek(cb.spill[b], 0, SEEK_END);
      sz = std::ftell(cb.spill[b]);
      std::fseek(cb.spill[b], 0, SEEK_SET);
      size_t n = (size_t)sz / sizeof(uint64_t);
      size_t base = pool.size();
      pool.resize(base + n);
      if (std::fread(pool.data() + base, sizeof(uint64_t), n, cb.spill[b]) != n) {
        std::fclose(out);
        return -1;
      }
      std::fclose(cb.spill[b]);
      cb.spill[b] = nullptr;
    }
    if (pool.empty()) continue;
    std::sort(pool.begin(), pool.end());
    size_t i = 0;
    std::vector<KCount> recs;
    while (i < pool.size()) {
      size_t j = i;
      while (j < pool.size() && pool[j] == pool[i]) ++j;
      uint64_t c = j - i;
      if (c >= min_count) recs.push_back({pool[i], c});
      i = j;
    }
    if (!recs.empty())
      std::fwrite(recs.data(), sizeof(KCount), recs.size(), out);
    distinct += (long long)recs.size();
  }
  std::fclose(out);
  return distinct;
}

// Strand merge: canonized counts + as-read counts -> sorted strand list.
// Inputs are (kmer,count) record files from kgt_count. Returns #k-mers
// written, or -1 on error, -2 if some canonized k-mer lacks orientation
// evidence (reference: flag 00 error, kmers_add_strand_information.cpp:129).
long long kgt_strand_merge(const char* canon_path, const char* non_canon_path,
                           unsigned k, const char* out_path) {
  auto load = [](const char* p, std::vector<uint64_t>& v) -> bool {
    FILE* f = std::fopen(p, "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    long long sz = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    size_t n = (size_t)sz / sizeof(KCount);
    std::vector<KCount> recs(n);
    if (std::fread(recs.data(), sizeof(KCount), n, f) != n) {
      std::fclose(f);
      return false;
    }
    std::fclose(f);
    v.resize(n);
    for (size_t i = 0; i < n; ++i) v[i] = recs[i].kmer;
    return true;
  };
  std::vector<uint64_t> canon, nonc;
  if (!load(canon_path, canon) || !load(non_canon_path, nonc)) return -1;
  std::vector<uint64_t> flags(canon.size(), 0);
  for (uint64_t kk : nonc) {
    uint64_t rc = reverse_complement(kk, k);
    uint64_t key = kk < rc ? kk : rc;
    uint64_t flag = kk < rc ? 1 : 2;
    auto it = std::lower_bound(canon.begin(), canon.end(), key);
    if (it != canon.end() && *it == key) flags[it - canon.begin()] |= flag;
  }
  for (uint64_t f : flags)
    if (f == 0) return -2;
  FILE* out = std::fopen(out_path, "wb");
  if (!out) return -1;
  std::vector<uint64_t> words(canon.size());
  for (size_t i = 0; i < canon.size(); ++i)
    words[i] = canon[i] | (flags[i] << 62);
  // canon is sorted; low-62-bit order == canon order
  std::fwrite(words.data(), sizeof(uint64_t), words.size(), out);
  std::fclose(out);
  return (long long)canon.size();
}

// Union-filter N strand lists into the master list (+ no-pass text file).
// Returns #passing k-mers or -1.
long long kgt_list_union(const char** paths, int n_samples, unsigned k,
                         unsigned long long mac, double min_strand_frac,
                         const char* out_path) {
  struct Cursor {
    std::vector<uint64_t> data;
    size_t pos = 0;
  };
  std::vector<Cursor> cur(n_samples);
  for (int i = 0; i < n_samples; ++i) {
    FILE* f = std::fopen(paths[i], "rb");
    if (!f) return -1;
    std::fseek(f, 0, SEEK_END);
    long long sz = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    size_t n = (size_t)sz / sizeof(uint64_t);
    cur[i].data.resize(n);
    if (std::fread(cur[i].data.data(), sizeof(uint64_t), n, f) != n) {
      std::fclose(f);
      return -1;
    }
    std::fclose(f);
  }
  FILE* out = std::fopen(out_path, "wb");
  if (!out) return -1;
  // k-way merge over sorted (by low 62 bits) lists with 3x20-bit counters,
  // the reference's counter packing (list_kmers_found_in_multiple_samples.cpp:135-137)
  long long n_pass = 0;
  std::vector<uint64_t> heap_kmer(n_samples);
  for (;;) {
    uint64_t lo = ~0ull;
    for (int i = 0; i < n_samples; ++i) {
      if (cur[i].pos < cur[i].data.size()) {
        uint64_t v = cur[i].data[cur[i].pos] & kMask62;
        if (v < lo) lo = v;
      }
    }
    if (lo == ~0ull) break;
    uint64_t count_all = 0, count_canon = 0, count_non = 0;
    for (int i = 0; i < n_samples; ++i) {
      if (cur[i].pos < cur[i].data.size()) {
        uint64_t w = cur[i].data[cur[i].pos];
        if ((w & kMask62) == lo) {
          uint64_t flag = w >> 62;
          ++count_all;
          if (flag == 1) ++count_canon;
          if (flag == 2) ++count_non;
          ++cur[i].pos;
        }
      }
    }
    uint64_t count_both = count_all - count_canon - count_non;
    if (count_all >= mac) {
      double need = std::ceil(min_strand_frac * (double)count_all);
      if ((double)(count_canon + count_both) >= need &&
          (double)(count_non + count_both) >= need) {
        std::fwrite(&lo, sizeof lo, 1, out);
        ++n_pass;
      }
    }
  }
  std::fclose(out);
  return n_pass;
}

// Build the presence/absence table from sorted sample lists + master list.
// Bit-exact .table output. Returns #rows or -1.
long long kgt_build_table(const char** list_paths, int n_samples,
                          const char* master_path, const char* table_path,
                          unsigned k) {
  FILE* mf = std::fopen(master_path, "rb");
  if (!mf) return -1;
  std::fseek(mf, 0, SEEK_END);
  long long msz = std::ftell(mf);
  std::fseek(mf, 0, SEEK_SET);
  size_t n_rows = (size_t)msz / sizeof(uint64_t);
  std::vector<uint64_t> master(n_rows);
  if (std::fread(master.data(), sizeof(uint64_t), n_rows, mf) != n_rows) {
    std::fclose(mf);
    return -1;
  }
  std::fclose(mf);

  size_t n_words = ((size_t)n_samples + 63) / 64;
  std::vector<uint64_t> rows(n_rows * n_words, 0);
  for (int s = 0; s < n_samples; ++s) {
    FILE* f = std::fopen(list_paths[s], "rb");
    if (!f) return -1;
    std::fseek(f, 0, SEEK_END);
    long long sz = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    size_t n = (size_t)sz / sizeof(uint64_t);
    std::vector<uint64_t> sk(n);
    if (std::fread(sk.data(), sizeof(uint64_t), n, f) != n) {
      std::fclose(f);
      return -1;
    }
    std::fclose(f);
    uint64_t word = (uint64_t)s / 64, bit = (uint64_t)s % 64;
    size_t mi = 0;
    for (size_t i = 0; i < n; ++i) {
      uint64_t v = sk[i] & kMask62;
      while (mi < n_rows && master[mi] < v) ++mi;
      if (mi == n_rows) break;
      if (master[mi] == v) rows[mi * n_words + word] |= (1ull << bit);
    }
  }
  FILE* out = std::fopen(table_path, "wb");
  if (!out) return -1;
  const unsigned char magic[4] = {0xAA, 0xBB, 0xCC, 0xDD};
  uint64_t n_acc = (uint64_t)n_samples;
  uint32_t klen = k;
  std::fwrite(magic, 1, 4, out);
  std::fwrite(&n_acc, sizeof n_acc, 1, out);
  std::fwrite(&klen, sizeof klen, 1, out);
  for (size_t r = 0; r < n_rows; ++r) {
    std::fwrite(&master[r], sizeof(uint64_t), 1, out);
    std::fwrite(&rows[r * n_words], sizeof(uint64_t), n_words, out);
  }
  std::fclose(out);
  return (long long)n_rows;
}

// Squeeze + pack a chunk of raw table rows for the device.
//
// raw:      n_rows x (1 + wf) uint64 table rows (k-mer word first)
// file_col: n_used column indices into the file's accession order
// Outputs (caller-allocated):
//   kmers_out  n_rows uint64
//   packed_out n_rows x w32 uint32 (LSB-first, zero-padded lanes)
//   pop_out    n_rows int32 popcount over used columns
//   keep_out   n_rows uint8 two-tail MAC mask (min_count <= pc <= n-min_count)
// Returns number of kept rows, or -1.
long long kgt_squeeze_pack(const unsigned long long* raw, long long n_rows,
                           int wf, const long long* file_col, int n_used,
                           int w32, unsigned long long min_count,
                           unsigned long long* kmers_out,
                           unsigned int* packed_out, int* pop_out,
                           unsigned char* keep_out) {
  if (w32 * 32 < n_used) return -1;
  // identity mapping (used columns == file columns 0..n_used-1, in order):
  // the squeeze degenerates to a word copy + popcount — the common case for
  // whole-population scans and kinship
  bool identity = true;
  for (int c = 0; c < n_used; ++c)
    if (file_col[c] != c) {
      identity = false;
      break;
    }

  auto process_range = [&](long long r0, long long r1, long long* kept_out_p) {
    long long kept = 0;
    for (long long r = r0; r < r1; ++r) {
      const unsigned long long* row = raw + r * (1 + wf);
      unsigned int* out = packed_out + r * w32;
      int pc = 0;
      if (identity) {
        std::memset(out, 0, sizeof(unsigned int) * w32);
        int nw64 = (n_used + 63) / 64;
        for (int w = 0; w < nw64; ++w) {
          unsigned long long v = row[1 + w];
          if (w == nw64 - 1 && (n_used & 63))
            v &= (1ull << (n_used & 63)) - 1;  // mask unused file columns
          pc += __builtin_popcountll(v);
          out[2 * w] = (unsigned int)v;
          if (2 * w + 1 < w32) out[2 * w + 1] = (unsigned int)(v >> 32);
        }
      } else {
        std::memset(out, 0, sizeof(unsigned int) * w32);
        for (int c = 0; c < n_used; ++c) {
          long long fc = file_col[c];
          unsigned long long bit = (row[1 + (fc >> 6)] >> (fc & 63)) & 1ull;
          pc += (int)bit;
          out[c >> 5] |= (unsigned int)bit << (c & 31);
        }
      }
      kmers_out[r] = row[0];
      pop_out[r] = pc;
      unsigned char ok = (unsigned long long)pc >= min_count &&
                         (unsigned long long)pc <=
                             (unsigned long long)n_used - min_count;
      keep_out[r] = ok;
      kept += ok;
    }
    *kept_out_p = kept;
  };

  int n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads < 1) n_threads = 1;
  if (n_threads > 8) n_threads = 8;
  if (n_rows < 4096 || n_threads == 1) {
    long long kept = 0;
    process_range(0, n_rows, &kept);
    return kept;
  }
  std::vector<std::thread> threads;
  std::vector<long long> kept_parts(n_threads, 0);
  long long per = (n_rows + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    long long r0 = t * per, r1 = std::min(n_rows, r0 + per);
    if (r0 >= r1) break;
    threads.emplace_back(process_range, r0, r1, &kept_parts[t]);
  }
  for (auto& th : threads) th.join();
  long long kept = 0;
  for (long long kp : kept_parts) kept += kp;
  return kept;
}

}  // extern "C"
