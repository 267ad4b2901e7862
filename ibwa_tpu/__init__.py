"""ibwa_tpu — a TPU-native iterative read-alignment framework.

A from-scratch re-design of the iBWA pipeline (BWT/FM-index short-read
alignment with iterative multi-reference remapping) for TPU hardware:

* compute path: JAX / XLA / Pallas kernels over device meshes
* host path:    C++ native library (suffix sort, sequential walks, RNG
                parity helpers) bound via ctypes + NumPy glue

Reference behavior contract: genome/ibwa (BWA 0.5.9 fork). File formats and
output semantics are kept bit-compatible so differential tests against the
reference binary validate every stage.
"""

__version__ = "0.1.0"
