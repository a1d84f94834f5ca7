"""Bucket-index precomputation CLI (reference src/create_indices.py +
dataset_utils.load_indices): scan a parquet folder's bucket_size column and
save {bucket: [row indices]} as .npy.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_parquet_folder", required=True)
    p.add_argument("--bucket_indices_path", required=True)
    args = p.parse_args(argv)

    import datasets
    from sd3_tpu.data.buckets import build_bucket_indices

    ds = datasets.load_dataset(
        "parquet", data_files=f"{args.data_parquet_folder}/*.parquet",
        split="train")
    buckets = build_bucket_indices(ds["bucket_size"], args.bucket_indices_path)
    sizes = {k: len(v) for k, v in buckets.items()}
    print(f"saved {len(buckets)} buckets -> {args.bucket_indices_path}")
    for k, n in sorted(sizes.items(), key=lambda kv: -kv[1]):
        print(f"  {k}: {n}")


if __name__ == "__main__":
    main()
