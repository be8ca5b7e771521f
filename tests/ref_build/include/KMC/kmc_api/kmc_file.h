// Minimal KMC API declarations so the reference sources compile without
// the (empty) KMC submodule. The KMC-reading code paths are never executed
// by the golden tests (they exercise the sorted-list/table/scan binaries);
// these stubs return failure if ever called.
#pragma once
#include <cstdint>
#include <string>

typedef unsigned int uint32;
typedef unsigned long long uint64;
typedef unsigned char uchar;

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
  uint64* kmer_data;
  uint32 kmer_length;
  uchar byte_alignment;
  uint64 no_of_rows;
};

class CKMCFile {
 public:
  bool OpenForListing(const std::string&) { return false; }
  bool ReadNextKmer(CKmerAPI&, unsigned int&) { return false; }
  bool Close() { return true; }
};
