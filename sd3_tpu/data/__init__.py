from sd3_tpu.data.buckets import (build_bucket_indices, load_bucket_indices,
                                  RandomBucketSampler)
from sd3_tpu.data.pipeline import (clean_caption, pick_caption, decode_image,
                                   ParquetImageText, HostDataLoader,
                                   synthetic_batch_iter)

__all__ = ["build_bucket_indices", "load_bucket_indices", "RandomBucketSampler",
           "clean_caption", "pick_caption", "decode_image", "ParquetImageText",
           "HostDataLoader", "synthetic_batch_iter"]
