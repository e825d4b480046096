"""Checkpoint loading: torch reference checkpoints and warm-start wiring.

Capability parity with ``utils.load_ckpt`` (reference utils/__init__.py:178-209):
latest-by-steps glob over ``model_ckpt_steps_*.ckpt``, ``model.``-prefix slicing
of the saved state_dict, and non-strict shape-mismatch pruning — plus conversion
into this framework's Flax param trees (convert/torch_names.py).
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Dict, Optional

import numpy as np

from diffsinger_tpu.convert import torch_names as tn


def find_latest_ckpt(path: str) -> Optional[str]:
    """Path may be a direct .ckpt file or an experiment dir
    (reference utils/__init__.py:183-190)."""
    if os.path.isfile(path):
        return path
    pattern = os.path.join(path, "model_ckpt_steps_*.ckpt")
    cands = glob.glob(pattern)
    if not cands:
        return None
    return max(cands, key=lambda p: int(re.findall(r"steps_(\d+)\.ckpt", p)[0]))


def load_torch_state_dict(ckpt_path, prefix: str = "model.") -> Dict[str, np.ndarray]:
    """torch.load -> numpy dict, sliced to keys under ``prefix``.

    ``ckpt_path`` may also be an already-torch.load'ed checkpoint dict, so
    callers that inspect the raw checkpoint first don't pay a second load."""
    if isinstance(ckpt_path, dict):
        ckpt = ckpt_path
    else:
        import torch

        ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]

    def _flatten(d, base=""):
        # official PWG pkls nest dicts (ckpt["model"]["generator"] -> flat sd,
        # reference vocoders/pwg.py:30); flatten to dotted keys
        for k, v in d.items():
            key = f"{base}{k}"
            if isinstance(v, dict):
                yield from _flatten(v, key + ".")
            else:
                yield key, v

    out = {}
    for k, v in _flatten(sd):
        if prefix and not k.startswith(prefix):
            continue
        key = k[len(prefix):] if prefix else k
        out[key] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    if not out and prefix:  # fall back to unprefixed dicts (vocoder ckpts etc.)
        return load_torch_state_dict(ckpt_path, prefix="")
    return out


def _slice_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def convert_fs2(sd: Dict[str, np.ndarray]) -> Dict:
    return tn.to_nested(tn.apply_rules(sd, tn.FS2_RULES))


def convert_diffusion_ckpt(sd: Dict[str, np.ndarray]) -> Dict:
    """GaussianDiffusion state dict -> {'fs2': ..., 'denoiser': ...}."""
    fs2 = convert_fs2(_slice_prefix(sd, "fs2."))
    denoiser = tn.to_nested(tn.apply_rules(_slice_prefix(sd, "denoise_fn."),
                                           tn.DIFFNET_RULES))
    return {"fs2": fs2, "denoiser": denoiser}


def convert_hifigan(sd: Dict[str, np.ndarray]) -> Dict:
    return tn.to_nested(tn.apply_rules(tn.fold_weight_norm(sd), tn.HIFIGAN_RULES))


def convert_pwg(sd: Dict[str, np.ndarray]) -> Dict:
    return tn.to_nested(tn.apply_rules(tn.fold_weight_norm(sd), tn.PWG_RULES))


def convert_pe(sd: Dict[str, np.ndarray]) -> Dict:
    params = tn.to_nested(tn.apply_rules(sd, tn.PE_RULES))
    stats = tn.to_nested(tn.apply_rules(sd, tn.PE_STATS_RULES))
    return {"pe": params, "batch_stats": stats}


def merge_params(dst, src, path=""):
    """Overlay src onto dst, pruning shape mismatches with a warning
    (reference utils/__init__.py:197-207 non-strict mode)."""
    if not isinstance(src, dict):
        if dst is not None and hasattr(dst, "shape") and tuple(dst.shape) != tuple(
                np.asarray(src).shape):
            print(f"| skip loading {path}: shape {np.asarray(src).shape} != "
                  f"{tuple(dst.shape)}")
            return dst
        return np.asarray(src)
    out = dict(dst) if isinstance(dst, dict) else {}
    for k, v in src.items():
        out[k] = merge_params(out.get(k), v, f"{path}/{k}")
    return out


def load_warm_start_params(hp: Dict[str, Any], params: Dict) -> Dict:
    """Apply fs2_ckpt / load_ckpt warm starts onto freshly-initialized params
    (reference usr/diffspeech_task.py:33-38, usr/diffsinger_task.py:60-64)."""
    fs2_ckpt = hp.get("fs2_ckpt") or ""
    if fs2_ckpt:
        path = find_latest_ckpt(fs2_ckpt)
        if path is None:
            print(f"| warning: fs2_ckpt {fs2_ckpt} not found; training from scratch")
        elif path.endswith(".ckpt"):
            sd = load_torch_state_dict(path)
            params = dict(params)
            params["fs2"] = merge_params(params["fs2"], convert_fs2(sd))
            print(f"| warm-started fs2 from {path}")
        else:
            raise NotImplementedError(f"unsupported fs2_ckpt format: {path}")
    return params
