from sd3_tpu.ops.norms import RMSNorm, AdaLNorm, layer_norm, rms_norm
from sd3_tpu.ops.time_embed import timestep_embedding, TimestepEmbedding
from sd3_tpu.ops.mlp import MLP, SwiGLU
from sd3_tpu.ops import rope
from sd3_tpu.ops.patch import (
    PatchEmbed,
    patchify,
    unpatchify,
    get_2d_sincos_pos_embed,
)
from sd3_tpu.ops.attention import JointAttention

__all__ = [
    "RMSNorm", "AdaLNorm", "layer_norm", "rms_norm",
    "timestep_embedding", "TimestepEmbedding",
    "MLP", "SwiGLU", "rope",
    "PatchEmbed", "patchify", "unpatchify", "get_2d_sincos_pos_embed",
    "JointAttention",
]
