"""MusicNet curation: extract solo-piano piece IDs from label CSVs.

Rebuild of reference preprocessing/extract_piano_pieces_from_musicnet_dataset.py:
scan ``{data_type}_labels/*.csv``; keep songs whose only instrument label is
piano (label 1); write the ID list to ``{basename}_{data_type}.txt``.
"""
from __future__ import annotations

import csv
import glob
import os

PIANO_INSTRUMENT_LABEL = 1  # reference extract_...py:8


def extract_piano_pieces(
    path_to_musicnet: str, data_type: str = "train", output_file_basename: str = "piano_pieces"
) -> list[str]:
    """Return (and write) the solo-piano song IDs (reference main(), :10-24)."""
    piano_ids: list[str] = []
    pattern = os.path.join(path_to_musicnet, f"{data_type}_labels", "*.csv")
    for csv_path in sorted(glob.glob(pattern)):
        instruments = set()
        with open(csv_path, newline="") as f:
            reader = csv.DictReader(f)
            for row in reader:
                instruments.add(int(row["instrument"]))
        if instruments == {PIANO_INSTRUMENT_LABEL}:
            piano_ids.append(os.path.splitext(os.path.basename(csv_path))[0])
    out_path = f"{output_file_basename}_{data_type}.txt"
    with open(out_path, "w") as f:
        f.writelines(f"{song_id}\n" for song_id in piano_ids)
    return piano_ids


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("path_to_musicnet")
    ap.add_argument("--data-type", default="train", choices=["train", "test"])
    ap.add_argument("--output-file-basename", default="piano_pieces")
    args = ap.parse_args()
    ids = extract_piano_pieces(args.path_to_musicnet, args.data_type, args.output_file_basename)
    print(f"{len(ids)} solo piano pieces")
