"""TPU compute kernels (Pallas) for the hot paths: batched block
Cholesky for condensed KKT systems, and kernel helpers."""

from .chol import batched_cholesky, cholesky_kernel_available  # noqa: F401
from .tile_chol import TileCholesky, tile_pattern_from_sparse  # noqa: F401
