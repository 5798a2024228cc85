"""coati_tpu: TPU-native codon-aware statistical sequence aligner.

A ground-up reimplementation of the capabilities of COATi
(CartwrightLab/coati) designed for TPU hardware: batched anti-diagonal
wavefront pair-HMM kernels (JAX/XLA + Pallas), host-side codecs and
traceback, and data-parallel scaling over device meshes.
"""

__version__ = "0.1.0"
