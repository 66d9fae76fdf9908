"""Repo-relative path registry (ref `/root/reference/src/paths.py:1-22`).

Central place for artifact directory conventions so CLIs and pipelines agree
on a layout; everything is overridable by flags.
"""

from __future__ import annotations

import os
from pathlib import Path

PKG_DIR = Path(__file__).resolve().parent.parent
REPO_DIR = PKG_DIR.parent

RESOURCES_DIR = PKG_DIR / "resources"
CMUDICT_PATH = RESOURCES_DIR / "cmu_dictionary"
FILELISTS_DIR = RESOURCES_DIR / "filelists"

# runtime artifact roots (overridable via env)
DATA_ROOT = Path(os.environ.get("ARTTTS_DATA_ROOT", REPO_DIR / "data"))
LOGS_DIR = Path(os.environ.get("ARTTTS_LOGS_DIR", REPO_DIR / "logs"))
CKPT_DIR = Path(os.environ.get("ARTTTS_CKPT_DIR", REPO_DIR / "checkpts"))
PREDS_DIR = Path(os.environ.get("ARTTTS_PREDS_DIR", REPO_DIR / "preds"))
WAVS_OUT_DIR = Path(os.environ.get("ARTTTS_WAVS_DIR", REPO_DIR / "wavs_out"))
