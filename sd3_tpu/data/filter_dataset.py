"""Quality-filter CLI (reference data/filter_lowres_parquets.py): compute
height/width/aspect for each image, drop rows whose BOTH sides are below
min_resolution, clean captions, drop rows with captions shorter than
min_caption_chars; resumable per-file.
"""

from __future__ import annotations

import argparse
import io
import os


def process_file(in_path: str, out_path: str, min_resolution: int,
                 min_caption_chars: int) -> int:
    import pandas as pd
    from PIL import Image

    df = pd.read_parquet(in_path)
    keep = []
    heights, widths = [], []
    for _, row in df.iterrows():
        try:
            raw = row["image"]["bytes"] if isinstance(row["image"], dict) \
                else row["image"]
            with Image.open(io.BytesIO(raw)) as im:
                w, h = im.size
            cap = (row.get("recaption") or row.get("recaption_short") or "")
            ok = (w >= min_resolution or h >= min_resolution) and \
                len(str(cap).strip()) >= min_caption_chars
            keep.append(bool(ok))
            heights.append(h)
            widths.append(w)
        except Exception:
            keep.append(False)
            heights.append(0)
            widths.append(0)
    df["height"] = heights
    df["width"] = widths
    df["aspect_ratio"] = [w / h if h else 0 for w, h in zip(widths, heights)]
    df = df[keep].reset_index(drop=True)
    if len(df):
        df.to_parquet(out_path, index=False)
    return len(df)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--min_resolution", type=int, default=256)
    p.add_argument("--min_caption_chars", type=int, default=8)
    args = p.parse_args(argv)

    os.makedirs(args.output_dir, exist_ok=True)
    for f in sorted(os.listdir(args.input_dir)):
        if not f.endswith(".parquet"):
            continue
        out = os.path.join(args.output_dir, f)
        if os.path.exists(out):
            continue
        n = process_file(os.path.join(args.input_dir, f), out,
                         args.min_resolution, args.min_caption_chars)
        print(f"{f}: kept {n} rows")


if __name__ == "__main__":
    main()
