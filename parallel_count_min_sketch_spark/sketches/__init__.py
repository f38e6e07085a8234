from .cms import CountMinSketch, dims
from .hashing import LONG_PRIME, MERSENNE_PRIME, affine_hash, affine_params, djb2_batch, djb2_py
from .reference_cms import SequentialCMS

__all__ = [
    "CountMinSketch",
    "SequentialCMS",
    "dims",
    "affine_hash",
    "affine_params",
    "djb2_batch",
    "djb2_py",
    "LONG_PRIME",
    "MERSENNE_PRIME",
]
