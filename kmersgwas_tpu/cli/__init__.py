"""Command-line entry points mirroring the reference binaries.

Every CLI of voichek/kmersGWAS has an equivalent subcommand here
(`python -m kmersgwas_tpu.cli <command>`):

  reference binary                      | subcommand
  --------------------------------------+----------------------------
  kmers_gwas.py (pipeline)              | gwas
  kmers_add_strand_information          | strand-merge
  list_kmers_found_in_multiple_samples  | list-kmers
  build_kmers_table                     | build-table
  associate_kmers                       | associate
  emma_kinship_kmers                    | kinship
  emma_kinship                          | kinship-bed
  associate_snps                        | associate-snps
  kmers_table_to_bed                    | table-to-bed
  filter_kmers                          | filter-kmers
  histogram_KMC_kmers_counts            | histogram
  (KMC count, external in reference)    | count
"""
