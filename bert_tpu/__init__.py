"""bert_tpu — a TPU-native quantized sentence-embedding engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference CPU engine (skeskinen/bert.cpp, surveyed in SURVEY.md): WordPiece
tokenization, ggml-bin model I/O, weight-only Q4_0/Q4_1/f16/f32 BERT-family
encoders, SentenceTransformers-style mean-pooled L2-normalized embeddings —
re-designed TPU-first: batched + masked forward under jit, fused Pallas
dequant+matmul and attention kernels, length-bucketed continuous batching,
and mesh-sharded (DP/TP) execution via shard_map.
"""

from .engine import BertTPU  # noqa: F401
from .params import BertConfig  # noqa: F401
from .quant import QuantTensor  # noqa: F401
from .tokenizer import WordPieceTokenizer, load_tokenizer  # noqa: F401
from .vocab import Vocab  # noqa: F401

__version__ = "0.1.0"
