"""megapath-tpu: a TPU-native metagenomic pathogen-detection engine.

Re-implements the capabilities of HKU-BAL/MegaPath (reference surveyed in
SURVEY.md) as one JAX/XLA/Pallas framework instead of a shell-orchestrated
cascade of native tools:

- ``megapath_tpu.io``        FASTQ / cfq / LSAM / SAM formats (host-side IO).
- ``megapath_tpu.taxonomy``  NCBI taxonomy, LCA, Kraken-style reports.
- ``megapath_tpu.index``     2-bit packed references, FM-index, k-mer LUT,
                             shard splitting (replaces 2bwt-lib / splitFasta).
- ``megapath_tpu.ops``       Pallas/XLA kernels: banded affine-gap DP,
                             striped local SW, k-mer / entropy ops.
- ``megapath_tpu.align``     MMP seeding, insert-window pairing, the batch
                             alignment engine (replaces soap4).
- ``megapath_tpu.filters``   bbduk-style read QC and SPIKE coverage filters.
- ``megapath_tpu.classify``  accession->taxid lookup, read reassignment.
- ``megapath_tpu.pipeline``  end-to-end drivers (runMegaPath equivalents).
- ``megapath_tpu.parallel``  device-mesh sharding of index shards x read
                             batches, collective hit merges.
"""

__version__ = "0.1.0"
