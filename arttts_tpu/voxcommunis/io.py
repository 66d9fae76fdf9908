"""VoxCommunis manifest/alignment IO (ref `src/voxcommunis/io.py:10-41`).

Manifests are TSV: first line the dataset root, then `relpath\tnum_samples`
rows. Alignments are TSV `file_id\tphone string` rows. Frame counts are read
with the stdlib `wave` module (no soundfile dependency).
"""

from __future__ import annotations

import csv
import wave
from pathlib import Path
from typing import Dict, Tuple


def write_manifest(dataset, output, file_extension: str = ".wav") -> None:
    root = Path(dataset).resolve()
    lines = [root.as_posix()]
    for name in sorted(root.rglob(f"*{file_extension}")):
        with wave.open(str(name), "rb") as w:
            frames = w.getnframes()
        lines.append(f"{name.relative_to(root)}\t{frames}")
    with open(output, "w") as f:
        f.write("\n".join(lines) + "\n")


def read_manifest(file_path) -> Dict[str, Tuple[Path, int]]:
    manifest: Dict[str, Tuple[Path, int]] = {}
    with open(file_path, "r", newline="") as fp:
        reader = csv.reader(fp, delimiter="\t")
        root = Path(next(reader)[0])
        for row in reader:
            assert len(row) == 2, f"Invalid tsv file: {file_path}"
            file, num_samples = root / row[0], int(row[1])
            assert file.stem not in manifest, f"Duplicate file id: {file.stem}"
            manifest[file.stem] = (file, num_samples)
    return manifest


def read_alignment(path) -> Dict[str, str]:
    phones: Dict[str, str] = {}
    with open(path, "r", newline="") as fp:
        reader = csv.reader(fp, delimiter="\t")
        for row in reader:
            assert len(row) == 2
            phones[row[0]] = row[1]
    return phones
