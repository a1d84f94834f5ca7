"""Bucket-resize "phase" preparation CLI (reference data/create_phase.py).

For each image in a parquet folder: resize so the largest side is at most
max_resolution and BOTH sides are the nearest multiple of patch_size (16),
LANCZOS resampling; write height/width/aspect_ratio and the "HxW" bucket_size
column; drop undecodable rows; skip already-processed files (resumable).

(The reference swaps PIL's (width, height) naming throughout — harmless since
it's self-consistent; this implementation uses real (width, height).)
"""

from __future__ import annotations

import argparse
import io
import os


def nearest_multiple(x: int, m: int) -> int:
    """Round to the nearest multiple of m (at least m)."""
    r = x % m
    out = x + (m - r) if (m - r) < r else x - r
    return max(out, m)


def phase_size(width: int, height: int, max_resolution: int,
               patch_size: int = 16) -> tuple[int, int]:
    """Target (width, height) per the reference resize logic
    (create_phase.py:114-135)."""
    if width > max_resolution or height > max_resolution:
        if width > height:
            new_w = max_resolution
            new_h = nearest_multiple(int(height * (max_resolution / width)),
                                     patch_size)
        else:
            new_h = max_resolution
            new_w = nearest_multiple(int(width * (max_resolution / height)),
                                     patch_size)
    else:
        new_w = nearest_multiple(width, patch_size)
        new_h = nearest_multiple(height, patch_size)
    return new_w, new_h


def process_file(in_path: str, out_path: str, max_resolution: int,
                 patch_size: int = 16) -> int:
    import pandas as pd
    from PIL import Image

    df = pd.read_parquet(in_path)
    heights, widths, aspects, buckets, images = [], [], [], [], []
    keep = []
    for _, row in df.iterrows():
        try:
            raw = row["image"]["bytes"] if isinstance(row["image"], dict) \
                else row["image"]
            with Image.open(io.BytesIO(raw)) as im:
                im = im.convert("RGB")
                w, h = im.size
                nw, nh = phase_size(w, h, max_resolution, patch_size)
                im = im.resize((nw, nh), resample=Image.Resampling.LANCZOS)
                buf = io.BytesIO()
                im.save(buf, format="PNG")
            heights.append(nh)
            widths.append(nw)
            aspects.append(nw / nh)
            buckets.append(f"{nh}x{nw}")
            images.append(buf.getvalue())
            keep.append(True)
        except Exception as e:  # undecodable image
            print(f"  drop row: {e}")
            keep.append(False)
    df = df[keep].reset_index(drop=True)
    df["image"] = images
    df["height"] = heights
    df["width"] = widths
    df["aspect_ratio"] = aspects
    df["bucket_size"] = buckets
    if len(df):
        df.to_parquet(out_path, index=False)
    return len(df)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--max_resolution", type=int, default=1024)
    p.add_argument("--patch_size", type=int, default=16)
    p.add_argument("--num_workers", type=int, default=1)
    args = p.parse_args(argv)

    os.makedirs(args.output_dir, exist_ok=True)
    files = sorted(f for f in os.listdir(args.input_dir)
                   if f.endswith(".parquet"))
    todo = [(os.path.join(args.input_dir, f), os.path.join(args.output_dir, f))
            for f in files if not os.path.exists(os.path.join(args.output_dir, f))]
    print(f"{len(todo)}/{len(files)} files to process")

    if args.num_workers > 1:
        import concurrent.futures
        with concurrent.futures.ProcessPoolExecutor(args.num_workers) as ex:
            futs = {ex.submit(process_file, i, o, args.max_resolution,
                              args.patch_size): i for i, o in todo}
            for fut in concurrent.futures.as_completed(futs):
                print(f"{futs[fut]}: {fut.result()} rows")
    else:
        for i, o in todo:
            print(f"{i}: {process_file(i, o, args.max_resolution, args.patch_size)} rows")


if __name__ == "__main__":
    main()
