"""Opt-in dataset acquisition (ML-100K).

The reference assumes the raw files already sit at hardcoded local paths
(``const.py:200-244``); this module gives the pipeline an acquisition path
so that the moment an environment has network egress, accuracy-vs-reference
numbers are one ``--fetch`` away. Download is strictly opt-in (CLI flag),
checksummed, and degrades to a logged no-op without egress — the synthetic
stand-in dataset keeps everything runnable offline.
"""
from __future__ import annotations

import hashlib
import os
import zipfile
from typing import Dict, Optional

from lgcnhs_tpu.runtime.logging import get_logger

ML100K_URL = "https://files.grouplens.org/datasets/movielens/ml-100k.zip"
# Published by GroupLens alongside the archive (ml-100k.zip).
ML100K_MD5 = "0e33842e24a9c977be4e0107933c0723"
# The four files the pipeline consumes (handleMovielens.py:122-172).
ML100K_FILES = {
    "rating": "u.data",
    "users": "u.user",
    "items": "u.item",
    "occupation": "u.occupation",
}


def ml100k_paths(data_dir: str) -> Dict[str, str]:
    """dataset_paths dict for an extracted ml-100k directory."""
    return {key: os.path.join(data_dir, name) for key, name in ML100K_FILES.items()}


def have_ml100k(data_dir: str) -> bool:
    return all(os.path.exists(p) for p in ml100k_paths(data_dir).values())


def fetch_ml100k(
    dest_dir: str,
    url: str = ML100K_URL,
    md5: Optional[str] = ML100K_MD5,
    timeout: float = 60.0,
) -> Optional[Dict[str, str]]:
    """Download + verify + extract ML-100K into ``dest_dir/ml-100k``.

    Returns the dataset_paths dict, or None when the files can't be obtained
    (no egress, checksum mismatch) — callers fall back to the synthetic
    stand-in exactly as when raw files are absent.
    """
    log = get_logger()
    data_dir = os.path.join(dest_dir, "ml-100k")
    if have_ml100k(data_dir):
        log.info("ml-100k already present at %s", data_dir)
        return ml100k_paths(data_dir)

    import urllib.error
    import urllib.request

    os.makedirs(dest_dir, exist_ok=True)
    zip_path = os.path.join(dest_dir, "ml-100k.zip")
    try:
        log.info("fetching %s", url)
        with urllib.request.urlopen(url, timeout=timeout) as resp, open(
            zip_path, "wb"
        ) as out:
            while True:
                chunk = resp.read(1 << 20)
                if not chunk:
                    break
                out.write(chunk)
    except (urllib.error.URLError, OSError, TimeoutError) as exc:
        log.warning("ml-100k fetch failed (no egress?): %s", exc)
        return None

    if md5:
        digest = hashlib.md5()
        with open(zip_path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                digest.update(chunk)
        if digest.hexdigest() != md5:
            log.error(
                "ml-100k.zip checksum mismatch: got %s want %s — refusing",
                digest.hexdigest(), md5,
            )
            os.unlink(zip_path)
            return None

    with zipfile.ZipFile(zip_path) as z:
        wanted = {f"ml-100k/{name}" for name in ML100K_FILES.values()}
        members = [m for m in z.namelist() if m in wanted]
        if len(members) != len(wanted):
            log.error("ml-100k.zip missing expected members: %s", wanted - set(members))
            return None
        z.extractall(dest_dir, members=members)
    os.unlink(zip_path)
    log.info("ml-100k extracted to %s", data_dir)
    return ml100k_paths(data_dir)
