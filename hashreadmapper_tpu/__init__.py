"""hashreadmapper_tpu: TPU-native bisulfite (BS-seq) read mapper.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the CUDA
reference `clubby93421234/hashreadmapper` (see SURVEY.md).
"""

__version__ = "0.1.0"
