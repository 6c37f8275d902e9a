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

__all__ = [
    "pretrained_url",
    "cached_weight_path",
    "resolve_pretrained",
    "check_sha1",
    "check_sha256",
    "url_embedded_hash",
    "verify_weight_file",
]

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


def check_sha256(path: str, prefix: str) -> bool:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest().startswith(prefix)


def url_embedded_hash(url: Optional[str]) -> Optional[str]:
    """torch-hub filename convention: ``name-<sha256prefix8>.pth``."""
    if not url:
        return None
    base = os.path.basename(url)
    stem = base.split(".")[0]
    if "-" in stem:
        cand = stem.rsplit("-", 1)[1]
        if len(cand) >= 8 and all(c in "0123456789abcdef" for c in cand):
            return cand
    return None


def _pinned_hash(backbone: str) -> Optional[str]:
    """User-pinned sha256 prefixes from ``<cache>/hashes.json`` — for
    backbones whose weights have no stable hash-embedding URL
    (xception65 / hrnet_* live on the SegmenTron release page / Google
    Drive; SURVEY §2.2). Seed the cache, then pin:
    ``{"xception65": "<sha256-prefix>"}``."""
    import json

    try:
        with open(os.path.join(default_cache_dir(), "hashes.json")) as f:
            v = json.load(f).get(backbone)
            return str(v) if v else None
    except (OSError, ValueError):
        return None


def verify_weight_file(path: str, backbone: str) -> None:
    """Enforce the URL-embedded hash when one is known (reference
    behavior: the download path sha-checks every file), or a user-pinned
    hash from ``<cache>/hashes.json``. Raises on mismatch — a silently
    corrupt checkpoint would train to garbage."""
    expect = url_embedded_hash(pretrained_url(backbone)) or _pinned_hash(
        backbone
    )
    if expect is None:
        return
    # files renamed to <backbone>.pth by our cache keep verifiability
    # through this check; torch-hub-named files carry it in the name.
    if not check_sha256(path, expect):
        raise IOError(
            f"Pretrained checkpoint {path!r} failed its sha256 check "
            f"(expected prefix {expect!r}). Delete and re-download."
        )


def _convert_to_npz(backbone: str, pth_path: str) -> str:
    """One-time torch ``.pth`` -> converted flax ``.npz`` next to it in
    the cache; later resolves hit the ``.npz`` directly (no torch import
    at train time). Falls back to the ``.pth`` path if no converter
    exists for the backbone (on-the-fly conversion at load handles it)."""
    npz = os.path.splitext(pth_path)[0] + ".npz"
    if os.path.isfile(npz):
        return npz
    try:
        from .torch_convert import (
            convert_backbone_state, load_torch_state_dict, save_flax_npz,
        )

        tree = convert_backbone_state(backbone, load_torch_state_dict(pth_path))
        save_flax_npz(tree, npz)
        return npz
    except (KeyError, ValueError) as e:
        # no converter for this backbone (KeyError) OR the state_dict
        # layout differs from the modeled naming (ValueError — the
        # reference mount was empty, so official naming is unverified):
        # fall back to the .pth and let load-time conversion try. Never
        # crash startup or silently drop a verified file.
        import logging

        logging.getLogger("segmentron_tpu").warning(
            "pretrained %s: cached conversion failed (%s); using %s",
            backbone, e, pth_path,
        )
        return pth_path


def resolve_pretrained(
    backbone: str, explicit_path: str = "", verify: bool = True
) -> Optional[str]:
    """Find pretrained weights: explicit path > cache > (download).

    Returns a filesystem path or None. Raises FileNotFoundError if an
    explicit path was configured but doesn't exist (a silent miss there
    would train from scratch unnoticed). Cache hits and downloads are
    hash-verified against the URL-embedded sha256 prefix when known;
    explicit paths are trusted (they may be converted/retrained files).
    Cached/downloaded ``.pth`` files are converted once to a ``.npz``
    flax tree in the cache and the ``.npz`` path is returned (reference
    ``segmentron/utils/download.py`` caches the torch file; the TPU
    build additionally caches the converted form so train time never
    needs torch).
    """
    if explicit_path:
        if not os.path.isfile(explicit_path):
            raise FileNotFoundError(
                f"TRAIN.BACKBONE_PRETRAINED_PATH={explicit_path!r} not found"
            )
        return explicit_path
    cached = cached_weight_path(backbone)
    if cached:
        # .npz = our converted flax format (tools/convert_weights.py);
        # its integrity is covered by the converter roundtrip, and the
        # torch-hub hash wouldn't match it anyway.
        if cached.endswith((".pth", ".pt")):
            if verify:
                verify_weight_file(cached, backbone)
            cached = _convert_to_npz(backbone, cached)
        return cached
    url = pretrained_url(backbone)
    if url:
        try:  # no egress in the build container; works in deployment
            import urllib.request

            os.makedirs(default_cache_dir(), exist_ok=True)
            dst = os.path.join(default_cache_dir(), backbone + ".pth")
            # explicit timeout: in egress-less environments the DNS
            # blackhole otherwise stalls ~60 s before failing over to
            # train-from-scratch
            with urllib.request.urlopen(url, timeout=10) as r, open(
                dst, "wb"
            ) as f:
                while chunk := r.read(1 << 20):
                    f.write(chunk)
            if verify:
                verify_weight_file(dst, backbone)
        except Exception:
            return None  # no egress / bad download: train from scratch
        # conversion failures must NOT discard a verified download —
        # _convert_to_npz falls back to the .pth itself (with a warning)
        return _convert_to_npz(backbone, dst)
    return None
