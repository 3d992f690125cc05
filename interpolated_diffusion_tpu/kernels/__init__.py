from .sla import SparseLinearAttention, get_block_map  # noqa: F401
from .block_sparse_attention import block_sparse_attention  # noqa: F401
