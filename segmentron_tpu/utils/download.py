"""Pretrained backbone weight resolution (reference:
``segmentron/utils/download.py``).

The torch reference keeps a URL table of ImageNet backbone weights and
downloads them into a local cache with a sha1 check. Here the same
table maps backbone names to torch checkpoint URLs; weights found in
the cache (or at ``TRAIN.BACKBONE_PRETRAINED_PATH``) are converted to
NHWC/HWIO jax params via ``utils.torch_convert``. Actual network
download is attempted only when a URL scheme is reachable — this
container has no egress, so the normal path is a pre-seeded cache dir.
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional

__all__ = ["pretrained_url", "cached_weight_path", "resolve_pretrained"]

# Reference URL table (torch hub / SegmenTron release assets).
_URLS = {
    "resnet50": "https://download.pytorch.org/models/resnet50-19c8e357.pth",
    "resnet101": "https://download.pytorch.org/models/resnet101-5d3b4d8f.pth",
    "resnet152": "https://download.pytorch.org/models/resnet152-b121ed2d.pth",
    "resnet18": "https://download.pytorch.org/models/resnet18-5c106cde.pth",
    "resnet34": "https://download.pytorch.org/models/resnet34-333f7ec4.pth",
    "mobilenet_v2": "https://download.pytorch.org/models/mobilenet_v2-b0353104.pth",
    # xception65 / hrnet weights were hosted on the SegmenTron release page
    "xception65": None,
    "hrnet_w18_small_v1": None,
    "hrnet_w18": None,
    "hrnet_w48": None,
}


def pretrained_url(backbone: str) -> Optional[str]:
    return _URLS.get(backbone)


def default_cache_dir() -> str:
    return os.environ.get(
        "SEGMENTRON_CACHE", os.path.expanduser("~/.cache/segmentron_tpu")
    )


def cached_weight_path(backbone: str) -> Optional[str]:
    """Path of a cached torch checkpoint for ``backbone``, if present."""
    cache = default_cache_dir()
    for ext in (".pth", ".pt", ".npz"):
        p = os.path.join(cache, backbone + ext)
        if os.path.isfile(p):
            return p
    return None


def check_sha1(path: str, sha1: str) -> bool:
    h = hashlib.sha1()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest().startswith(sha1)


def resolve_pretrained(backbone: str, explicit_path: str = "") -> Optional[str]:
    """Find pretrained weights: explicit path > cache > (download).

    Returns a filesystem path or None. Raises FileNotFoundError if an
    explicit path was configured but doesn't exist (a silent miss there
    would train from scratch unnoticed).
    """
    if explicit_path:
        if not os.path.isfile(explicit_path):
            raise FileNotFoundError(
                f"TRAIN.BACKBONE_PRETRAINED_PATH={explicit_path!r} not found"
            )
        return explicit_path
    cached = cached_weight_path(backbone)
    if cached:
        return cached
    url = pretrained_url(backbone)
    if url:
        try:  # no egress in the build container; works in deployment
            import urllib.request

            os.makedirs(default_cache_dir(), exist_ok=True)
            dst = os.path.join(default_cache_dir(), backbone + ".pth")
            urllib.request.urlretrieve(url, dst)
            return dst
        except Exception:
            return None
    return None
