from sd3_tpu.models.mmdit import MMDiT, DualStreamBlock

__all__ = ["MMDiT", "DualStreamBlock"]
