// Minimal KMC API for compiling the reference sources without the (empty)
// KMC submodule. Unlike a pure declaration stub, CKMCFile here actually
// READS KMC1-format (.kmc_pre version 0) databases — the format this
// framework's kmc-export writes — so the reference's KMC-consuming
// binaries (kmers_add_strand_information, histogram_KMC_kmers_counts) can
// run head-to-head in the golden tests. KMC2/3 layouts are not supported
// (OpenForListing returns false).
#pragma once
#include <cstdint>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

typedef unsigned int uint32;
typedef unsigned long long uint64;
typedef unsigned char uchar;
#ifndef _UINT_T_DEFINED_KMC_STUB
typedef unsigned int uint;
#define _UINT_T_DEFINED_KMC_STUB
#endif

class CKMCFile;

class CKmerAPI {
 public:
  explicit CKmerAPI(uint32 length = 0)
      : kmer_length(length),
        byte_alignment(length % 4 ? 4 - length % 4 : 0),
        no_of_rows(length ? (length + 31) / 32 : 1) {
    kmer_data = new uint64[no_of_rows]();
  }
  CKmerAPI(const CKmerAPI& o)
      : kmer_length(o.kmer_length),
        byte_alignment(o.byte_alignment),
        no_of_rows(o.no_of_rows) {
    kmer_data = new uint64[no_of_rows]();
    for (uint64 i = 0; i < no_of_rows; ++i) kmer_data[i] = o.kmer_data[i];
  }
  CKmerAPI& operator=(const CKmerAPI&) = delete;
  virtual ~CKmerAPI() { delete[] kmer_data; }

 protected:
  friend class CKMCFile;
  uint64* kmer_data;
  uint32 kmer_length;
  uchar byte_alignment;
  uint64 no_of_rows;
};

class CKMCFile {
 public:
  bool OpenForListing(const std::string& prefix) {
    std::ifstream pre(prefix + ".kmc_pre", std::ios::binary);
    if (!pre.is_open()) return false;
    pre.seekg(0, std::ios::end);
    std::streamoff size = pre.tellg();
    if (size < 16) return false;
    char marker[4];
    pre.seekg(0);
    pre.read(marker, 4);
    if (std::memcmp(marker, "KMCP", 4)) return false;
    pre.seekg(size - 12);
    uint32 version = 0, header_size = 0;
    pre.read(reinterpret_cast<char*>(&version), 4);
    pre.read(reinterpret_cast<char*>(&header_size), 4);
    if (version != 0) return false;            // KMC1 only
    std::vector<char> hdr(header_size);
    pre.seekg(size - 12 - header_size);
    pre.read(hdr.data(), header_size);
    auto u32 = [&](size_t off) {
      uint32 v;
      std::memcpy(&v, hdr.data() + off, 4);
      return v;
    };
    m_k = u32(0);
    m_counter_size = u32(8);
    m_lut_prefix_len = u32(12);
    std::memcpy(&m_total, hdr.data() + 24, 8);
    uint64 n_pref = 1ull << (2 * m_lut_prefix_len);
    m_index.resize(n_pref + 1);
    pre.seekg(4);
    pre.read(reinterpret_cast<char*>(m_index.data()), 8 * (n_pref + 1));
    m_suf.open(prefix + ".kmc_suf", std::ios::binary);
    if (!m_suf.is_open()) return false;
    m_suf.read(marker, 4);
    if (std::memcmp(marker, "KMCS", 4)) return false;
    m_suf_sym = m_k - m_lut_prefix_len;
    m_suf_bytes = (m_suf_sym + 3) / 4;
    m_rec = 0;
    m_prefix = 0;
    return true;
  }

  bool ReadNextKmer(CKmerAPI& kmer, unsigned int& count) {
    if (m_rec >= m_total) return false;
    while (m_prefix < m_index.size() - 1 && m_index[m_prefix + 1] <= m_rec)
      ++m_prefix;
    std::vector<unsigned char> buf(m_suf_bytes + m_counter_size);
    m_suf.read(reinterpret_cast<char*>(buf.data()), buf.size());
    if (!m_suf) return false;
    uint64 suffix = 0;
    for (uint32 b = 0; b < m_suf_bytes; ++b)
      for (uint32 s = 0; s < 4 && 4 * b + s < m_suf_sym; ++s)
        suffix |= (uint64)((buf[b] >> (6 - 2 * s)) & 3)
                  << (2 * (m_suf_sym - 1 - (4 * b + s)));
    uint64 code = ((uint64)m_prefix << (2 * m_suf_sym)) | suffix;
    count = 0;
    for (uint32 c = 0; c < m_counter_size; ++c)
      count |= (unsigned int)buf[m_suf_bytes + c] << (8 * c);
    // CKmerUpTo31bpAPI::to_uint() shifts kmer_data[0] down by
    // 64 - (((k - 1 + byte_alignment) % 32) * 2) - 2; store accordingly
    uint32 shift =
        64 - (((kmer.kmer_length - 1 + kmer.byte_alignment) % 32) * 2) - 2;
    kmer.kmer_data[0] = code << shift;
    ++m_rec;
    return true;
  }

  bool Close() { return true; }

 private:
  std::ifstream m_suf;
  std::vector<uint64> m_index;
  uint64 m_total = 0, m_rec = 0, m_prefix = 0;
  uint32 m_k = 0, m_counter_size = 0, m_lut_prefix_len = 0, m_suf_sym = 0,
         m_suf_bytes = 0;
};
