#!/bin/bash
# Build the UNMODIFIED reference binaries out-of-tree with stub headers for
# the empty submodules (cxxopts/CTPL/KMC). Usage: build_ref.sh <outdir>
set -e
OUT="${1:-/tmp/ref_bin}"
REF=/root/reference
HERE="$(cd "$(dirname "$0")" && pwd)"
mkdir -p "$OUT"
# -include cmath: transitively provided by the real submodule headers
CXX="g++ -std=c++14 -O2 -pthread -msse4.2 -include cmath -I$REF/include -I$HERE/include -I$REF/src"
SRC=$REF/src
CORE="$SRC/kmer_general.cpp $SRC/kmers_single_database.cpp"
TBL="$CORE $SRC/kmers_merge_multiple_databaes.cpp"
MDB="$CORE $SRC/kmers_multiple_databases.cpp $SRC/best_associations_heap.cpp"
$CXX -o "$OUT/list_kmers_found_in_multiple_samples" $SRC/list_kmers_found_in_multiple_samples.cpp $CORE
$CXX -o "$OUT/build_kmers_table" $SRC/build_kmers_table.cpp $TBL
$CXX -o "$OUT/emma_kinship_kmers" $SRC/emma_kinship_kmers.cpp $MDB
$CXX -o "$OUT/associate_kmers" $SRC/associate_kmers.cpp $MDB
$CXX -o "$OUT/filter_kmers" $SRC/filter_kmers.cpp $CORE
$CXX -o "$OUT/kmers_table_to_bed" $SRC/kmers_table_to_bed.cpp $MDB
$CXX -o "$OUT/associate_snps" $SRC/associate_snps.cpp $CORE $SRC/snps_multiple_databases.cpp $SRC/best_associations_heap.cpp
$CXX -o "$OUT/emma_kinship" $SRC/emma_kinship.cpp
$CXX -o "$OUT/kmers_add_strand_information" $SRC/kmers_add_strand_information.cpp $CORE
$CXX -o "$OUT/histogram_KMC_kmers_counts" $SRC/histogram_KMC_kmers_counts.cpp $CORE
echo "built into $OUT"
