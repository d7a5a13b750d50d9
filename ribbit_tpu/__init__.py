"""ribbit_tpu — a TPU-native tandem-repeat detection engine.

Reimplements the capabilities of SowpatiLab/ribbit (shift-XOR periodicity
scan, rank-lattice seed merging, pseudo-perfect-repeat alignment with banded
affine-gap DP, BED emission) with a JAX/XLA/Pallas compute path designed for
TPU: bulk fixed-shape array passes on device, compact event/candidate arrays
on host, and mesh-sharded chunk parallelism for whole-genome scale.
"""

from .config import RibbitConfig
from .pipeline import (process_sequence, process_fasta, process_fasta_records,
                       process_sequence_chunked)

__version__ = "0.1.0"

__all__ = ["RibbitConfig", "process_sequence", "process_fasta",
           "process_fasta_records", "process_sequence_chunked", "__version__"]
