"""poreplex-tpu: TPU-native signal-level preprocessor for nanopore direct RNA
sequencing.

A ground-up JAX/XLA/Pallas re-design of the capabilities of hyeshik/poreplex
(reference: /root/reference/poreplex/__init__.py:23-47): signal scaling,
HMM segmentation, barcode demultiplexing, poly(A) dwell measurement,
pseudo-fusion filtering and FASTQ/FAST5/BAM/nanopolish output — with every
numeric hot path compiled for TPU and batched over reads.
"""

__all__ = [
    '__version__',
    'OUTPUT_NAME_PASSED', 'OUTPUT_NAME_FAILED',
    'OUTPUT_NAME_ARTIFACT', 'OUTPUT_NAME_BARCODES',
    'OUTPUT_NAME_UNDETERMINED', 'OUTPUT_NAME_BARCODING_OFF',
]

__version__ = '0.1.0'

# Output label taxonomy matches the reference so downstream tooling keeps
# working (reference: poreplex/__init__.py:32-38).
OUTPUT_NAME_PASSED = 'pass'
OUTPUT_NAME_FAILED = 'fail'
OUTPUT_NAME_ARTIFACT = 'artifact'

OUTPUT_NAME_UNDETERMINED = 'undetermined'
OUTPUT_NAME_BARCODES = 'BC{n}'
OUTPUT_NAME_BARCODING_OFF = '-'

# Single-writer discipline; avoid HDF5 lock contention on NFS
# (reference: poreplex/__init__.py:41-46).
import os as _os
_os.environ.setdefault('HDF5_USE_FILE_LOCKING', 'FALSE')
del _os
