from .q4_matmul import q4_matmul, q4_dequantize_jnp  # noqa: F401
from .attention import multi_head_attention  # noqa: F401
