"""TPU compute ops: on-device sampling, Pallas kernels, quantized matmuls."""

from .sampling import sample_token  # noqa: F401
