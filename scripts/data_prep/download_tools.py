"""Download helpers for corpus/dataset preparation
(reference: get_data/preprocessing/download_tools.py). Network egress is
required to actually fetch; everything degrades to clear errors offline."""

from __future__ import annotations

import os
import urllib.request

BASE_URL = "https://dl.fbaipublicfiles.com/atlas"


def maybe_download_file(source: str, target: str) -> str:
    """Download ``source`` to ``target`` unless it already exists."""
    if os.path.exists(target):
        print(f"exists, skipping: {target}")
        return target
    os.makedirs(os.path.dirname(target) or ".", exist_ok=True)
    print(f"downloading {source} -> {target}")
    tmp = target + ".part"
    urllib.request.urlretrieve(source, tmp)
    os.replace(tmp, target)
    return target


def get_s3_path(rel: str) -> str:
    return f"{BASE_URL}/{rel}"


def get_download_path(output_dir: str, rel: str) -> str:
    return os.path.join(output_dir, rel)
