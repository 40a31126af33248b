from .dense_graph import (
    pairwise_diff,
    offdiag_mask,
    masked_mean_j,
    masked_sum_j,
    EGNNLayer,
    SEGNOGCL,
)
from .spectral import SpectralConv, TimeConv, TimeConvX, timestep_embedding
